"""dd09 connected components must equal a driver-side union-find over the
same candidate pairs (cluster membership AND sizes)."""

from __future__ import annotations

from api_etl_pipeline_spark.registry import all_queries
from tests.conftest import SF_SMOKE

_Q = all_queries()


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {x: find(x) for x in parent}


def test_dd09_matches_union_find(spark):
    pairs = [
        (r.doc_a, r.doc_b)
        for r in _Q["dd04_minhash_lsh_pairs"].fn(spark, SF_SMOKE).collect()
    ]
    assert pairs, "no candidate pairs at smoke sf — test would be vacuous"
    want = _union_find(pairs)

    got = {
        r.doc_id: (r.cluster_keeper, r.cluster_size)
        for r in _Q["dd09_dup_clusters"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    from collections import Counter

    sizes = Counter(want.values())
    for doc, root in want.items():
        keeper, size = got[doc]
        assert keeper == root, f"doc {doc}: keeper {keeper} != {root}"
        assert size == sizes[root], f"doc {doc}: size {size} != {sizes[root]}"


def test_dd10_keeper_is_cluster_quality_argmax(spark):
    from pyspark.sql import functions as F

    from api_etl_pipeline_spark.tables import load_table

    pairs = [
        (r.doc_a, r.doc_b)
        for r in _Q["dd04_minhash_lsh_pairs"].fn(spark, SF_SMOKE).collect()
    ]
    comp = _union_find(pairs)
    d = load_table(spark, SF_SMOKE, "documents")
    toks = F.split("text", " ")
    quality = {
        r.doc_id: r.q
        for r in d.select(
            "doc_id", (F.size(F.array_distinct(toks)) / F.size(toks)).alias("q")
        ).collect()
    }
    want = {}
    for doc, root in comp.items():
        cur = want.get(root)
        cand = (quality[doc], -doc)
        if cur is None or cand > cur[0]:
            want[root] = (cand, doc)
    got = {
        r.cluster_id: (r.keeper_doc_id, r.cluster_size)
        for r in _Q["dd10_keep_best_dedup"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    from collections import Counter

    sizes = Counter(comp.values())
    for root, (_, keeper) in want.items():
        assert got[root][0] == keeper, (root, got[root], keeper)
        assert got[root][1] == sizes[root]


def test_dd11_detects_injected_repeated_span(spark, tmp_path):
    """Two documents sharing an exact 25-token span at DIFFERENT offsets
    must both report repeated fingerprints (winnowing's alignment
    guarantee: any shared run >= K+W-1 = 12 tokens fingerprints
    identically regardless of position — a fixed-stride window hasher
    fails exactly this case); a document of unique tokens must report
    zero. Constructed ground truth, independent of the synthetic
    corpus's organic repeats."""
    from api_etl_pipeline_spark.registry import all_queries

    span = " ".join(f"shared{i}" for i in range(25))
    docs = [
        (1, "intro one " + span + " tail one"),  # span at offset 3
        (2, "different opening words here " + span),  # span at offset 5
        (3, " ".join(f"unique{i}" for i in range(40))),
        (4, "short doc"),  # < 12 tokens: no fingerprints at all
    ]
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.doc_id: r
        for r in all_queries()["dd11_repeated_substrings"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out[1].n_repeated > 0 and out[2].n_repeated > 0
    assert out[3].n_repeated == 0 and out[3].n_fingerprints > 0
    assert 4 not in out  # sub-threshold doc drops out on both engines


def test_dd12_removes_later_segment_copies(spark, tmp_path):
    """Constructed ground truth for the segment-dedup TRANSFORM: doc 2
    repeats doc 1's first 10-token segment (same segment content, doc 2
    comes later in (doc_id, seg_idx) order), so doc 1 keeps everything
    and doc 2 loses exactly that one segment from clean_text; a fully
    unique doc is untouched; an exact full duplicate of doc 1 keeps
    NOTHING (every segment already seen) — one copy of each segment
    survives corpus-wide, never zero."""
    from api_etl_pipeline_spark.registry import all_queries

    seg_a = " ".join(f"boiler{i}" for i in range(10))  # exactly one segment
    own = " ".join(f"own{i}" for i in range(10))
    uniq = " ".join(f"solo{i}" for i in range(15))
    docs = [
        (1, seg_a + " " + own),  # segments: [seg_a, own]
        (2, seg_a + " " + " ".join(f"two{i}" for i in range(10))),
        (3, uniq),  # 15 tokens -> 2 segments (10 + 5-token tail)
        (4, seg_a + " " + own),  # full duplicate of doc 1
    ]
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.doc_id: r
        for r in all_queries()["dd12_segment_dedup_clean"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert (out[1].n_kept, out[1].n_segments) == (2, 2)
    assert out[1].clean_text == seg_a + " " + own
    assert (out[2].n_kept, out[2].n_segments) == (1, 2)
    assert out[2].clean_text == " ".join(f"two{i}" for i in range(10))
    assert (out[3].n_kept, out[3].n_segments) == (2, 2)
    assert out[3].clean_text == uniq
    assert (out[4].n_kept, out[4].n_segments) == (0, 2)
    assert out[4].clean_text == ""


def test_dd12_conserves_distinct_segments(spark):
    """Corpus-level conservation law: keep-first dedup keeps EXACTLY one
    copy of every distinct segment, so sum(n_kept) over the corpus must
    equal the number of distinct segment strings, and no document may
    gain segments."""
    from pyspark.sql import functions as F

    from api_etl_pipeline_spark.llm_ops.dedup import SEG_TOKENS
    from api_etl_pipeline_spark.registry import all_queries
    from api_etl_pipeline_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    out = all_queries()["dd12_segment_dedup_clean"].fn(spark, SF_SMOKE)
    kept_total = out.agg(F.sum("n_kept")).collect()[0][0]

    d = load_table(spark, SF_SMOKE, "documents").select(
        F.split("text", " ").alias("w")
    )
    nseg = F.floor((F.size("w") + F.lit(SEG_TOKENS - 1)) / F.lit(SEG_TOKENS)).cast("int")
    idx = F.when(nseg > 0, F.sequence(F.lit(0), nseg - 1)).otherwise(
        F.array().cast("array<int>")
    )
    segs = d.select(
        F.explode(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice("w", i * SEG_TOKENS + 1, SEG_TOKENS)))
        ).alias("seg")
    )
    distinct_total = segs.distinct().count()
    assert kept_total == distinct_total
    assert out.filter(F.col("n_kept") > F.col("n_segments")).count() == 0

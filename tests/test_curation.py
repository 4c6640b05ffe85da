"""Semantic property tests for the curation / round-3 operators.

The DuckDB differential oracle (test_queries_oracle) proves cross-engine
value equality; these pin the SEMANTICS the oracle can't express —
invariants that must hold for the operator to mean what its name says
(decontamination really excludes the benchmark, chunking really covers
the document, sharding really partitions the corpus).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from api_etl_pipeline_spark.registry import all_queries
from tests.conftest import SF_DIR

_Q = all_queries()


def _run(name, spark):
    return _Q[name].fn(spark, SF_DIR)


def test_decon01_excludes_benchmark_docs(spark):
    out = _run("decon01_ngram_overlap", spark)
    assert out.filter(F.col("doc_id") % 20 == 0).count() == 0
    bad = out.filter(
        (F.col("n_contaminated") > F.col("n_grams"))
        | (F.col("contamination") < 0)
        | (F.col("contamination") > 1)
    )
    assert bad.count() == 0


def test_cur01_cap_is_enforced_per_source(spark):
    out = _run("cur01_domain_cap", spark)
    per_source = out.groupBy("source").count().collect()
    assert per_source and all(r["count"] <= 40 for r in per_source)
    # ranks are dense 1..k within each source
    ranks = out.groupBy("source").agg(
        F.max("source_rank").alias("mx"), F.count("*").alias("n")
    )
    assert ranks.filter(F.col("mx") != F.col("n")).count() == 0


def test_mix01_rates_shrink_large_sources(spark):
    rows = _run("mix01_token_budget_mix", spark).collect()
    assert rows and all(0 <= r["keep_pct"] <= 100 for r in rows)
    # a source at/below its equal share keeps everything (pct 100)
    assert any(r["keep_pct"] == 100 for r in rows) or len(rows) == 1


def test_shuf01_is_a_partition_of_the_corpus(spark):
    from api_etl_pipeline_spark.tables import load_table

    out = _run("shuf01_deterministic_shards", spark)
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    # pos is dense 1..k within every shard
    bad = out.groupBy("shard").agg(
        F.max("pos").alias("mx"), F.count("*").alias("n")
    ).filter(F.col("mx") != F.col("n"))
    assert bad.count() == 0
    # determinism: a second run produces the identical assignment
    again = {(r["doc_id"], r["shard"], r["pos"]) for r in out.collect()}
    rerun = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in _run("shuf01_deterministic_shards", spark).collect()
    }
    assert again == rerun


def test_chunk01_covers_every_word(spark):
    from api_etl_pipeline_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    chunks = _run("chunk01_sliding_chunks", spark)
    # stride 24 < size 32 ⇒ consecutive chunk starts overlap, so summed
    # coverage (n_words per chunk at stride 24) reaches the last word of
    # every document with >= 8 words
    joined = (
        chunks.groupBy("doc_id")
        .agg(F.max(F.col("chunk_idx") * 24 + F.col("n_words")).alias("covered"))
        .join(
            docs.select("doc_id", F.size(F.split("text", " ")).alias("n_words_doc")),
            "doc_id",
        )
    )
    assert joined.filter(F.col("covered") < F.col("n_words_doc")).count() == 0


def test_samp03_exact_size_and_stability(spark):
    a = _run("samp03_fixed_size_sample", spark)
    assert a.count() == 200
    ids = sorted(r["doc_id"] for r in a.collect())
    ids2 = sorted(r["doc_id"] for r in _run("samp03_fixed_size_sample", spark).collect())
    assert ids == ids2


def test_tx13_entropy_bounds(spark):
    out = _run("tx13_word_entropy", spark)
    bad = out.filter(
        (F.col("entropy") < 0)
        | (F.col("entropy") > F.log2(F.col("n_distinct").cast("double")) + 1e-6)
        | (F.col("ttr") <= 0)
        | (F.col("ttr") > 1)
    )
    assert bad.count() == 0


def test_ev12_sweep_is_balanced(spark):
    out = _run("ev12_peak_concurrency", spark)
    rows = out.collect()
    assert rows and all(r["peak_concurrent"] >= 1 for r in rows)
    # boundary deltas pair up: total boundaries = 2 × number of sessions
    n_sessions = (
        _Q["ev02_gaps_islands"].fn(spark, SF_DIR).count()
    )
    assert sum(r["n_boundaries"] for r in rows) == 2 * n_sessions


def test_stats01_profile_matches_direct_aggregates(spark):
    from api_etl_pipeline_spark.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    prof = {r["col"]: r for r in _run("stats01_table_profile", spark).collect()}
    direct = li.agg(
        F.count("*").alias("n"), F.count_distinct("l_suppkey").alias("ndv")
    ).collect()[0]
    assert prof["l_suppkey"]["n_rows"] == direct["n"]
    assert prof["l_suppkey"]["ndv"] == direct["ndv"]


def test_hashed_ngrams_agree_with_string_ngrams(spark):
    """_hashed_word_ngrams is the membership-only twin of _word_ngrams
    (the 100 TB flip for decon01 when the benchmark gram broadcast grows):
    per doc it must yield the same distinct-gram COUNT, and two docs'
    fingerprint sets must intersect exactly where their string-gram sets
    do (no collisions across a real corpus slice)."""
    from api_etl_pipeline_spark.llm_ops.curation import (
        _hashed_word_ngrams,
        _word_ngrams,
    )
    from api_etl_pipeline_spark.tables import load_table

    d = (
        load_table(spark, SF_DIR, "documents")
        .limit(200)
        .select("doc_id", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            F.array_distinct(_word_ngrams(F.col("w"), 3)).alias("sg"),
            F.array_distinct(_hashed_word_ngrams(F.col("w"), 3)).alias("hg"),
        )
    )
    mismatch = d.filter(F.size("sg") != F.size("hg"))
    assert mismatch.count() == 0
    pairs = (
        d.alias("a")
        .crossJoin(d.alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.size(F.array_intersect("a.sg", "b.sg")).alias("s_overlap"),
            F.size(F.array_intersect("a.hg", "b.hg")).alias("h_overlap"),
        )
        .filter(F.col("s_overlap") != F.col("h_overlap"))
    )
    assert pairs.count() == 0


def test_tx16_bm25_ranking_semantics(spark, tmp_path):
    """Constructed ground truth for BM25's two core orderings: (a) with
    equal doc length, a doc matching MORE query terms outranks a doc
    matching fewer; (b) among docs matching the same single term with
    the same tf, the SHORTER doc ranks higher (length normalization).
    Padding is unique filler so df of query terms stays fixed."""
    from api_etl_pipeline_spark.llm_ops.text import BM25_QUERIES
    from api_etl_pipeline_spark.registry import all_queries

    qid, terms = BM25_QUERIES[0][0], list(BM25_QUERIES[0][1])

    def pad(tag, n):
        return " ".join(f"{tag}{i}" for i in range(n))

    docs = [
        (1, " ".join(terms) + " " + pad("a", 17)),       # all 3 terms, len 20
        (2, " ".join(terms[:2]) + " " + pad("b", 18)),   # 2 terms, len 20
        (3, terms[0] + " " + pad("c", 9)),               # 1 term, len 10
        (4, terms[0] + " " + pad("d", 39)),              # 1 term, len 40
    ]
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.doc_id: r
        for r in all_queries()["tx16_bm25_topk"]
        .fn(spark, str(tmp_path))
        .collect()
        if r.query_id == qid
    }
    assert out[1].n_terms == 3 and out[2].n_terms == 2
    assert out[1].score > out[2].score > out[4].score
    assert out[3].score > out[4].score  # same tf/df, shorter doc wins
    ranks = {d: out[d].rk for d in out}
    assert ranks[1] == 1 and ranks[2] == 2


def test_ev13_twa_weights_by_holding_time(spark, tmp_path):
    """Constructed ground truth: user 1 holds value 10 for 1s then value
    20 for 3s (last event holds for zero time) -> TWA = (10*1 + 20*3)/4
    = 17.5, while the naive mean of observed values is 20 — the burst
    bias the operator exists to remove. A single-event user has zero
    span and a NULL TWA."""
    import datetime as dt

    from api_etl_pipeline_spark.registry import all_queries

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "m", 10.0, "{}"),
        (2, t0 + dt.timedelta(seconds=1), 1, "m", 20.0, "{}"),
        (3, t0 + dt.timedelta(seconds=4), 1, "m", 99.0, "{}"),
        (4, t0, 2, "m", 7.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.user_id: r
        for r in all_queries()["ev13_time_weighted_value"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out[1].span_us == 4_000_000
    assert abs(out[1].twa_value - 17.5) < 1e-9
    assert out[2].span_us == 0 and out[2].twa_value is None


def test_ev13_twa_invariants_constant_and_shift(spark, tmp_path):
    """Two algebraic invariants: (a) a constant-valued series has TWA ==
    that constant no matter how irregular the spacing; (b) shifting all
    timestamps by a uniform offset changes nothing (TWA depends only on
    deltas)."""
    import datetime as dt

    from api_etl_pipeline_spark.registry import all_queries

    t0 = dt.datetime(2024, 3, 1)
    gaps = [0, 1, 4, 9, 11, 60]  # seconds, deliberately irregular
    rows = [
        (i, t0 + dt.timedelta(seconds=g), 1, "m", 42.5, "{}")
        for i, g in enumerate(gaps)
    ] + [
        (100 + i, t0 + dt.timedelta(hours=7, seconds=g), 2, "m", 42.5, "{}")
        for i, g in enumerate(gaps)
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.user_id: r
        for r in all_queries()["ev13_time_weighted_value"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out[1].twa_value == 42.5  # constant series: exactly the constant
    assert out[2].twa_value == out[1].twa_value  # shift invariance
    assert out[2].span_us == out[1].span_us == 60_000_000
def test_ret01_degrades_to_lexical_when_seed_has_no_embedding(spark, tmp_path):
    """If a query's BM25 rank-1 document has no embedding row, the
    semantic leg is empty and RRF must degrade to lexical-only —
    deterministically, not error (the sf0.1 shipped data has docs
    without vectors, so this path is real)."""
    from api_etl_pipeline_spark.llm_ops.retrieval import ret01_hybrid_rrf

    docs = [
        # doc 0 is the strongest lexical match for q1 (spark/window/agg)
        (0, "spark window agg spark window agg filler one two", "en", "s1", 48),
        (1, "spark window agg other words here padding x y", "en", "s1", 45),
        (2, "spark only appears here with words padding a b", "en", "s2", 46),
        (3, "nothing relevant at all just plain filler words", "en", "s2", 47),
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars int"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    # embeddings ONLY for docs 2 and 3 — the lexical winners 0/1 have none
    vecs = [(2, [1.0] * 64, 0), (3, [0.5] * 64, 0)]
    spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    rows = ret01_hybrid_rrf(spark, str(tmp_path)).collect()
    assert rows, "lexical-only fusion must still produce results"
    for r in rows:
        assert r.query_id == "q1"  # q2/q3 terms absent from the corpus
        assert r.sem_rk is None, "no seed embedding -> semantic leg must be empty"
        assert r.lex_rk is not None
        assert abs(r.rrf - 1.0 / (60 + r.lex_rk)) < 1e-15
    # rank-1 by fusion == rank-1 lexical
    top = min(rows, key=lambda r: r.rrf_rk)
    assert top.lex_rk == 1 and top.doc_id == 0

"""End-to-end training-corpus cleaning pipeline — the composite workload
this engine exists for at 100 TB: ingest-grade documents go in, a
deduplicated, quality-filtered, fingerprinted corpus comes out.

Stage chain (each stage is a pure DataFrame transformation; the whole
chain is ONE lazy plan — Catalyst fuses the filters and the dedup
shuffles are the only exchanges):

1. quality gate   — tx02 rules: length ≥ 8 tokens, lexical diversity,
                    stopword ratio (junk drops here, cheapest first);
2. exact dedup    — keeper = min(doc_id) per content sha256;
3. near dedup     — keeper = min(doc_id) per MinHash band bucket: docs
                    agreeing on ANY band collapse to the bucket keeper
                    (transitively resolved per band pass — one pass is
                    the standard large-scale approximation);
4. emission       — canonical record: fingerprint, token stats, language.

Every stage is SQL-expressible, so the WHOLE pipeline is verified by the
DuckDB differential oracle (llm01) — rare for a multi-stage pipeline and
exactly the point of building it declaratively. llm02 reports the
per-stage funnel counts (the data-loss audit every corpus build needs).
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from api_etl_pipeline_spark.llm_ops.curation import (
    CUR05_PATH_BUCKETS,
    CUR06_EMAIL_RE,
    CUR06_PHONE_RE,
    CUR06_SSN_RE,
    cur05_canonical_url,
    cur05_raw_url,
    cur06_no_ssn,
    cur06_redacted,
    cur06_seeded,
    cur07_extract,
    cur07_extract_sql,
)
from api_etl_pipeline_spark.llm_ops.dedup import (
    _DUCK_SIGNATURES,
    _duck_bands_from,
    _lsh_bands,
    _signatures,
)
from api_etl_pipeline_spark.llm_ops.sampling import SAMP07_BUCKETS, dsir_log_weights
from api_etl_pipeline_spark.llm_ops.text import EN_STOPWORDS
from api_etl_pipeline_spark._memo import session_memo
from api_etl_pipeline_spark.checkpoint import lazy_checkpoint
from api_etl_pipeline_spark.registry import query
from api_etl_pipeline_spark.tables import load_table

_DUCK_QUALITY = f"""
    SELECT doc_id, text, lang, source, n_chars
    FROM (
        SELECT *, string_split(text, ' ') AS toks FROM documents
    )
    WHERE len(toks) >= 8
      AND (len(list_distinct(toks)) / len(toks)) >= 0.3
      AND (len(list_filter(toks, t -> t IN {EN_STOPWORDS})) / len(toks)) <= 0.5
"""

# exact-dedup keepers among quality survivors
_DUCK_EXACT = f"""
    SELECT q.* FROM ({_DUCK_QUALITY}) q
    JOIN (
        SELECT MIN(doc_id) AS keeper FROM ({_DUCK_QUALITY}) GROUP BY sha256(text)
    ) k ON q.doc_id = k.keeper
"""

# near-dedup: smallest doc_id within any shared MinHash (band, bucket)
# wins — the band table comes from the SAME generated geometry as
# dd04's (_duck_bands_from), so the funnel's near-dup stage can never
# drift from the production index
_DUCK_NEAR = f"""
    WITH sig AS ({_DUCK_SIGNATURES}),
    bands AS (
        {_duck_bands_from("sig")}
    ),
    exact AS ({_DUCK_EXACT}),
    demoted AS (
        SELECT DISTINCT b.doc_id
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                    AND a.doc_id < b.doc_id
        WHERE a.doc_id IN (SELECT doc_id FROM exact)
          AND b.doc_id IN (SELECT doc_id FROM exact)
    )
    SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM demoted)
"""


def _quality_flag(toks) -> "F.Column":
    """tx02 quality rules as a boolean expression — shared by the
    filtering stage (quality_gate) and the flag-based funnel audit
    (llm02) so the two can never drift."""
    return (
        (F.size(toks) >= 8)
        & ((F.size(F.array_distinct(toks)) / F.size(toks)) >= 0.3)
        & (
            (F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))) / F.size(toks))
            <= 0.5
        )
    )


def quality_gate(d: DataFrame) -> DataFrame:
    return (
        d.withColumn("toks", F.split("text", " "))
        .filter(_quality_flag(F.col("toks")))
        .drop("toks")
    )


def exact_dedup_keep_min(d: DataFrame) -> DataFrame:
    keepers = (
        d.groupBy(F.sha2(F.col("text").cast("binary"), 256).alias("_h"))
        .agg(F.min("doc_id").alias("keeper"))
        .select("keeper")
    )
    return d.join(keepers, d.doc_id == keepers.keeper, "left_semi")


def near_dup_demoted_ids(
    spark: SparkSession, sf_dir: str, survivors: DataFrame
) -> DataFrame:
    """doc_ids DEMOTED by the MinHash band rule among `survivors` (any
    doc sharing a band bucket with a lower surviving doc_id). Exposed
    separately from the filtering wrapper so flag-style consumers
    (llm02's single-pass funnel) can mark instead of drop."""
    from api_etl_pipeline_spark.llm_ops.dedup import dd04_bands

    # the full-corpus band table is the shared checkpointed build (r14,
    # dedup.dd04_bands) — the shingle->signature subtree is paid once per
    # session, not per funnel construction
    bands = dd04_bands(spark, sf_dir)
    # the live band table is narrow (N_BANDS rows per doc) but sits on
    # BOTH sides of the self-join — materialize it once (localCheckpoint
    # truncates the lineage; at cluster scale use a reliable checkpoint dir)
    live_bands = lazy_checkpoint(bands.join(survivors, "doc_id", "left_semi"))
    a, b = live_bands.alias("a"), live_bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )


def near_dedup_keep_min(spark: SparkSession, sf_dir: str, d: DataFrame) -> DataFrame:
    demoted = near_dup_demoted_ids(spark, sf_dir, d.select("doc_id"))
    return d.join(demoted, "doc_id", "left_anti")


@query("llm01_clean_corpus", oracle=_DUCK_NEAR)
def llm01_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaned corpus: quality gate → exact dedup → MinHash near-dedup,
    keeper = min doc_id at every stage (deterministic)."""
    d = load_table(spark, sf_dir, "documents")
    q = quality_gate(d)
    e = exact_dedup_keep_min(q)
    return near_dedup_keep_min(spark, sf_dir, e).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def run_corpus_workload(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    """The production shape of llm01/llm02: one job that cleans the corpus,
    enriches the survivors (fingerprint + token count — the tx04/tx01
    projections), writes them lang-partitioned to `out_dir`, and returns
    the funnel metrics. The funnel aggregate and the write share the same
    lazy stage chain, so Spark computes the quality/dedup stages once per
    action — and at 100 TB you'd `persist()` the cleaned frame between the
    two actions (here the sf inputs make recompute cheaper than caching).

    Lang-partitioning the output is the layout downstream training-data
    samplers want (per-language mixture weights = partition pruning, no
    full scan)."""
    import time

    t0 = time.monotonic()
    d = load_table(spark, sf_dir, "documents")
    q = quality_gate(d)
    e = exact_dedup_keep_min(q)
    n = near_dedup_keep_min(spark, sf_dir, e)
    enriched = n.select(
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars",
        F.md5(F.lower("text").cast("binary")).alias("fingerprint"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    funnel = (
        d.agg(F.count("*").alias("n_input"))
        .crossJoin(q.agg(F.count("*").alias("n_quality")))
        .crossJoin(e.agg(F.count("*").alias("n_exact_unique")))
        .crossJoin(n.agg(F.count("*").alias("n_clean")))
        .collect()[0]
    )
    enriched.write.partitionBy("lang").mode("overwrite").parquet(out_dir)
    return {
        "n_input": funnel["n_input"],
        "n_quality": funnel["n_quality"],
        "n_exact_unique": funnel["n_exact_unique"],
        "n_clean": funnel["n_clean"],
        "out_dir": out_dir,
        "seconds": round(time.monotonic() - t0, 3),
    }


@query(
    "llm02_corpus_funnel",
    oracle=f"""
    SELECT (SELECT COUNT(*) FROM documents)::BIGINT        AS n_input,
           (SELECT COUNT(*) FROM ({_DUCK_QUALITY}))::BIGINT AS n_quality,
           (SELECT COUNT(*) FROM ({_DUCK_EXACT}))::BIGINT   AS n_exact_unique,
           (SELECT COUNT(*) FROM ({_DUCK_NEAR}))::BIGINT    AS n_clean
    """,
)
def llm02_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage funnel counts — the survival audit of the corpus build.

    Round-4 rewrite — FLAGS, not four branch aggregates: the old
    formulation crossJoined one count per stage frame, and because the
    stage frames nest (near ⊃ exact ⊃ quality ⊃ input) the corpus
    subtree re-executed per branch (6 parquet scans; pruning-divergent
    branches defeat ReusedExchange — the decon02 lesson). Now every doc
    flows through ONCE carrying (quality, exact-keeper) flags — the
    exact keeper is a min-over-content-hash window on the same pass,
    using the SAME _quality_flag expression the filtering stages use so
    semantics cannot drift — then the near-dup demote set (the one
    genuinely separate subtree: signatures + band self-join) marks
    instead of drops, and ONE aggregation emits all four counts.
    2 scans, and the funnel cost no longer multiplies with the number
    of audited stages."""
    d = load_table(spark, sf_dir, "documents")
    q_flag = _quality_flag(F.split("text", " "))
    keeper = F.min(F.when(F.col("q"), F.col("doc_id"))).over(
        Window.partitionBy(F.sha2(F.col("text").cast("binary"), 256))
    )
    flags = (
        d.select("doc_id", "text", q_flag.alias("q"))
        .withColumn("e", F.col("q") & (F.col("doc_id") == keeper))
        .select("doc_id", "q", "e")
        .transform(lazy_checkpoint)
    )
    demoted = near_dup_demoted_ids(
        spark, sf_dir, flags.filter(F.col("e")).select("doc_id")
    ).withColumn("dem", F.lit(1))
    # no broadcast hint on the demoted side: its size scales with the
    # corpus duplication rate (30-50% of docs in real crawls), which at
    # 100 TB blows past Spark's broadcast/driver limits — let AQE pick
    # the strategy from the set's actual runtime size (round-5 advice)
    return (
        flags.join(demoted, "doc_id", "left")
        .agg(
            F.count("*").alias("n_input"),
            F.count(F.when(F.col("q"), 1)).alias("n_quality"),
            F.count(F.when(F.col("e"), 1)).alias("n_exact_unique"),
            F.count(F.when(F.col("e") & F.col("dem").isNull(), 1)).alias("n_clean"),
        )
    )


def run_pretrain_export(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    token_budget: int = 128,
    n_shards: int = 32,
) -> dict:
    """The full pretraining-data export: clean corpus (llm01's quality →
    exact-dedup → near-dedup funnel) → deterministic 80/10/10 hash split
    (samp01's bucket rule — membership is a pure function of doc_id) →
    greedy sequence packing into token-budget context windows per
    (split, shard) (pack01's next-fit) → split-partitioned parquet plus a
    packing manifest. This is the job a training run points at: the
    output layout is `split=train/…` for partition-pruned mixture
    sampling, and the manifest rows say which documents share a context
    window.

    Scale shape: the clean stage is llm01's plan (broadcast LSH bands),
    the split is a pure map, and packing shuffles once on
    (split, shard_id) into n_shards×3 Arrow groups — at 100 TB shard
    count scales packing parallelism with no cross-shard coordination."""
    import time

    from api_etl_pipeline_spark.llm_ops.packing import make_packer
    from api_etl_pipeline_spark.llm_ops.sampling import hash_bucket

    t0 = time.monotonic()
    d = load_table(spark, sf_dir, "documents")
    q = quality_gate(d)
    e = exact_dedup_keep_min(q)
    clean = near_dedup_keep_min(spark, sf_dir, e)

    bucket = hash_bucket(F.col("doc_id"), 100)
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    staged = clean.select(
        "doc_id",
        "text",
        "lang",
        split.alias("split"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        (F.col("doc_id") % n_shards).alias("shard_id"),
    )

    pack_schema = (
        "split STRING, shard_id BIGINT, doc_id BIGINT, n_tokens BIGINT, "
        "bin_id BIGINT, bin_fill BIGINT"
    )
    packer = make_packer(token_budget)

    def pack_group(pdf):
        out = packer(pdf[["shard_id", "doc_id", "n_tokens"]].copy())
        out.insert(0, "split", pdf["split"].iloc[0])
        return out

    manifest = staged.groupBy("split", "shard_id").applyInPandas(
        pack_group, schema=pack_schema
    )

    staged.write.partitionBy("split").mode("overwrite").parquet(f"{out_dir}/docs")
    manifest.write.partitionBy("split").mode("overwrite").parquet(f"{out_dir}/manifest")

    stats = {
        r["split"]: r
        for r in spark.read.parquet(f"{out_dir}/manifest")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.count_distinct("shard_id", "bin_id").alias("n_windows"),
        )
        .collect()
    }
    return {
        "out_dir": out_dir,
        "token_budget": token_budget,
        "n_shards": n_shards,
        "splits": {
            s: {
                "n_docs": r["n_docs"],
                "n_tokens": r["n_tokens"],
                "n_windows": r["n_windows"],
            }
            for s, r in sorted(stats.items())
        },
        "seconds": round(time.monotonic() - t0, 3),
    }


@query(
    "llm03_dataset_card",
    oracle="""
    WITH per AS (
        SELECT source, lang,
               COUNT(*)::BIGINT AS n_docs,
               SUM(n_chars)::BIGINT AS total_chars,
               SUM(len(string_split(text, ' ')))::BIGINT AS total_tokens,
               MIN(n_chars)::BIGINT AS min_chars,
               MAX(n_chars)::BIGINT AS max_chars
        FROM documents
        GROUP BY source, lang
    )
    SELECT source, lang, n_docs, total_chars, total_tokens,
           min_chars, max_chars,
           CAST(total_chars AS DOUBLE)
               / (SELECT SUM(n_chars) FROM documents) AS char_share,
           CAST(total_tokens AS DOUBLE) / n_docs AS avg_tokens_per_doc
    FROM per
    """,
)
def llm03_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics: per (source, language) document/char/token
    counts, length extrema, corpus char share, and mean document length —
    the summary table a training-data release publishes (and the input
    mix01 rebalances against).

    One hash aggregation over the corpus plus a broadcast single-row
    total; token counts are integer sums (order-free), the two ratios are
    single IEEE divisions of exact integers. At 100 TB this is the cheap
    always-on observability query: it reads two columns and the text
    length, never materializes tokens."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_tokens"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )
    total = d.agg(F.sum("n_chars").alias("corpus_chars"))
    return per.crossJoin(F.broadcast(total)).select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        "total_tokens",
        "min_chars",
        "max_chars",
        (F.col("total_chars").cast("double") / F.col("corpus_chars")).alias("char_share"),
        (F.col("total_tokens").cast("double") / F.col("n_docs")).alias("avg_tokens_per_doc"),
    )


# llm04 — the composed curation funnel over the round-7/8/9 stages:
# URL-canonical dedup (cur05) → HTML main-text extraction (cur07) →
# PII scrub (cur06) → exact content dedup → DSIR selection (samp07),
# audited llm02-style as ONE single-pass flag funnel. Every stage
# reuses the exact helper the standalone operator runs (cur05_*,
# cur07_extract / cur07_extract_sql, cur06_*, dsir_log_weights), so
# the funnel and the per-stage queries cannot drift.
_DUCK_LLM04 = f"""
    WITH seeded_docs AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 10 = 9
                    THEN 'duplicate landing page boilerplate copy shared '
                         || 'across mirrors block ' || (doc_id // 1000)::VARCHAR
                    ELSE text END AS text
        FROM documents
    ),
    base AS (
        SELECT doc_id, source, text,
               regexp_replace(regexp_replace(regexp_replace(lower(
                   'https://'
                   || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END
                   || CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END
                   || '.example.org/doc/'
                   || CAST(doc_id // {CUR05_PATH_BUCKETS} AS VARCHAR)
                   || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
                   || CASE WHEN doc_id % 4 = 0
                           THEN '?utm_campaign=x&utm_medium=y' ELSE '' END),
                   '[?]utm.*$', ''),
                   '^https://www\\.', 'https://'),
                   '/$', '') AS curl,
               md5(text) AS h
        FROM seeded_docs
    ),
    {cur07_extract_sql('base', carry=', curl, h')},
    pii AS (
        SELECT doc_id, source, curl, h,
               length(main_text) > 0 AS nonempty,
               main_text
                 || CASE WHEN doc_id % 5 = 0
                         THEN ' contact user' || doc_id::VARCHAR || '@example.com'
                         ELSE '' END
                 || CASE WHEN doc_id % 7 = 0
                         THEN ' call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                         ELSE '' END
                 || CASE WHEN doc_id % 11 = 0
                         THEN ' id 987-65-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                         ELSE '' END AS seeded
        FROM fin
    ),
    scrub AS (
        SELECT doc_id, source, curl, h, nonempty,
               (len(regexp_extract_all(seeded, '{CUR06_EMAIL_RE}'))
                + len(regexp_extract_all(seeded, '{CUR06_SSN_RE}'))
                + len(regexp_extract_all(
                      regexp_replace(seeded, '{CUR06_SSN_RE}', '[SSN]', 'g'),
                      '{CUR06_PHONE_RE}')))::BIGINT AS pii_hits,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(seeded, '{CUR06_SSN_RE}', '[SSN]', 'g'),
                       '{CUR06_PHONE_RE}', '[PHONE]', 'g'),
                   '{CUR06_EMAIL_RE}', '[EMAIL]', 'g') AS redacted
        FROM pii
    ),
    perrow AS (
        SELECT *,
               (len(regexp_extract_all(redacted, '{CUR06_EMAIL_RE}'))
                + len(regexp_extract_all(redacted, '{CUR06_PHONE_RE}'))
                + len(regexp_extract_all(redacted, '{CUR06_SSN_RE}')))::BIGINT
                   AS resid,
               ('0x' || substr(md5(redacted), 1, 8))::BIGINT AS ck
        FROM scrub
    ),
    f1 AS (
        SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY curl) AS u FROM perrow
    ),
    f2 AS (SELECT *, u AND nonempty AS x FROM f1),
    f3 AS (
        SELECT *,
               x AND doc_id = MIN(CASE WHEN x THEN doc_id END)
                                 OVER (PARTITION BY h) AS e
        FROM f2
    ),
    surv AS (
        SELECT doc_id, doc_id % 2 = 0 AS is_t, redacted, ck
        FROM f3 WHERE e
    ),
    toks AS (
        SELECT doc_id, is_t, unnest(string_split(redacted, ' ')) AS tok
        FROM surv
    ),
    b AS (
        SELECT doc_id, is_t,
               ('0x' || substr(md5(tok), 1, 8))::BIGINT % {SAMP07_BUCKETS}
                   AS bucket
        FROM toks
    ),
    spine AS (SELECT unnest(generate_series(0, {SAMP07_BUCKETS - 1}))::BIGINT
                  AS bucket),
    ct AS (SELECT bucket, COUNT(*)::BIGINT AS c FROM b WHERE is_t GROUP BY bucket),
    cr AS (SELECT bucket, COUNT(*)::BIGINT AS c FROM b WHERE NOT is_t GROUP BY bucket),
    sm AS (
        SELECT s.bucket,
               (COALESCE(ct.c, 0) + 1)::BIGINT AS st,
               (COALESCE(cr.c, 0) + 1)::BIGINT AS sr
        FROM spine s LEFT JOIN ct USING (bucket) LEFT JOIN cr USING (bucket)
    ),
    tot AS (SELECT SUM(st)::BIGINT AS tt, SUM(sr)::BIGINT AS tr FROM sm),
    lr AS (
        SELECT bucket, ln((st / tt::DOUBLE) / (sr / tr::DOUBLE)) AS r
        FROM sm, tot
    ),
    dc AS (
        SELECT doc_id, bucket, COUNT(*)::BIGINT AS cnt
        FROM b WHERE NOT is_t GROUP BY 1, 2
    ),
    w AS (
        SELECT doc_id, SUM(cnt)::BIGINT AS n_toks,
               list_reduce(list(cnt * r ORDER BY bucket), (a, x) -> a + x) AS lw
        FROM dc JOIN lr USING (bucket) GROUP BY doc_id
    ),
    sel AS (SELECT doc_id, n_toks FROM w WHERE ROUND(lw, 6) > 0)
    SELECT COUNT(*)::BIGINT AS n_input,
           COUNT(CASE WHEN u THEN 1 END)::BIGINT AS n_url_unique,
           COUNT(CASE WHEN x THEN 1 END)::BIGINT AS n_extracted,
           COUNT(CASE WHEN e THEN 1 END)::BIGINT AS n_unique_text,
           COUNT(CASE WHEN e AND pii_hits > 0 THEN 1 END)::BIGINT AS n_pii_docs,
           COALESCE(SUM(CASE WHEN e THEN resid END), 0)::BIGINT AS n_residual,
           COUNT(CASE WHEN e AND doc_id % 2 = 0 THEN 1 END)::BIGINT AS n_target,
           (SELECT COUNT(*) FROM sel)::BIGINT AS n_dsir_selected,
           (SELECT COALESCE(SUM(n_toks), 0) FROM sel)::BIGINT AS selected_tokens,
           (SELECT COALESCE(SUM(surv.ck), 0)
            FROM sel JOIN surv USING (doc_id))::BIGINT AS selected_checksum
    FROM f3
"""


@query("llm04_curation_funnel", oracle=_DUCK_LLM04)
def llm04_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED curation funnel — the round-8 verdict's "whole
    pipeline as one verified query" artifact: URL-canonical dedup
    (cur05's device) → HTML main-text extraction (cur07) → PII scrub
    (cur06) → exact content dedup → DSIR importance selection (samp07),
    with the per-stage survival counts, the scrub-convergence residual
    (must be 0), the DSIR token budget, and a checksum of the FINAL
    selected redacted text all in one driver-hashed row. This is what
    an adopter of the engine evaluates first: every stage is the exact
    helper the standalone operator runs (cur05_*/cur07_extract/
    cur06_*/dsir_log_weights — shared on the DuckDB side too via
    cur07_extract_sql), so the funnel cannot drift from the parts.

    Stage semantics: `u` keeps min doc_id per canonical URL; `x` = u
    survivors whose extracted main text is non-empty (cur07's
    boilerplate rules could empty a degenerate doc — in THIS fixture the
    wrapper's content line always survives, so n_extracted ==
    n_url_unique is a pinned invariant: if the extractor ever starts
    emptying real documents, this count breaks before any downstream
    quality signal does); `e` = x survivors keeping min doc_id per md5
    of the PRE-WRAP text (cur07's injection embeds doc_id in the
    extracted content, so the fixture's content-dedup key is the raw
    payload hash — in production the key is the extracted text itself,
    same plan shape; a sentinel-duplicate device makes this stage fire
    at a known ~10% rate, see inline comment); DSIR then scores
    e-survivors' REDACTED text against the doc_id%2 target slice
    (fitted on survivors only — selection must not resurrect text that
    dedup removed).

    Plan shape, llm02's single-pass flag discipline sharpened: ONE
    corpus scan materializes the per-row transform chain (checkpoint —
    wrap, extract, seed, scrub, per-row md5/ck/resid); the flag windows
    then ride a NARROW projection (doc_id + keys + counters, ~100
    bytes — the corpus TEXT never enters the u/e exchanges, unlike a
    naive window-over-rows funnel); the only text-bearing shuffle is
    the survivor semi-join feeding DSIR's token explode. At 100 TB:
    two narrow key shuffles + one id semi-join + samp07's one
    (doc,bucket) shuffle, everything else broadcast or constant."""
    def _build_per() -> DataFrame:
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            # duplicate-injection device (the cur06 pattern — every drop stage
            # must be PROVEN to fire at a known rate; the corpus itself has
            # zero exact dups at the driver SF): every %10==9 doc's text is
            # replaced by a per-1000-block sentinel, so the exact-dedup stage
            # removes a scale-stable ~10% of URL survivors.
            F.when(
                F.col("doc_id") % 10 == 9,
                F.concat(
                    F.lit(
                        "duplicate landing page boilerplate copy shared "
                        "across mirrors block "
                    ),
                    F.expr("doc_id div 1000").cast("string"),
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        base = d.withColumn(
            "curl",
            # div-bucket, not cur05's modulo bucket: source is a pure function
            # of doc_id % 20 in this fixture, so the %100 bucket caps canonical
            # URLs at 100 groups at every scale — the div bucket keeps the
            # URL-dup RATE constant (~5x collapse) as the corpus grows.
            cur05_canonical_url(
                cur05_raw_url(F.expr(f"doc_id div {CUR05_PATH_BUCKETS}"))
            ),
        ).withColumn("h", F.md5(F.col("text").cast("binary")))
        ext = cur07_extract(base)
        seeded = cur06_seeded(F.col("main_text"))
        redacted = cur06_redacted(cur06_no_ssn(seeded))
        residual = (
            F.regexp_count(F.col("redacted"), F.lit(CUR06_EMAIL_RE))
            + F.regexp_count(F.col("redacted"), F.lit(CUR06_PHONE_RE))
            + F.regexp_count(F.col("redacted"), F.lit(CUR06_SSN_RE))
        ).cast("bigint")
        return (
            ext.select(
                "doc_id",
                "curl",
                "h",
                (F.length("main_text") > 0).alias("nonempty"),
                (
                    F.regexp_count(seeded, F.lit(CUR06_EMAIL_RE))
                    + F.regexp_count(seeded, F.lit(CUR06_SSN_RE))
                    + F.regexp_count(cur06_no_ssn(seeded), F.lit(CUR06_PHONE_RE))
                ).cast("bigint").alias("pii_hits"),
                redacted.alias("redacted"),
            )
            .withColumn("resid", residual)
            .withColumn(
                "ck",
                F.conv(
                    F.substring(F.md5(F.col("redacted").cast("binary")), 1, 8), 16, 10
                ).cast("bigint"),
            )
        )

    # the per-row regex/transform chain is a PURE plan — its analyzed
    # handle is session-memoized (r14, the _memo contract: ~0.8 s of
    # py4j regexp-Column building per construction); the checkpoint
    # below stays per-construction, so every timed run still
    # materializes the chain from the parquet scan.
    per = lazy_checkpoint(  # ONE materialization of the regex chain
        session_memo(
            spark,
            # live-read module constants in the key (r14 advice): a test
            # that rebinds the bucket count or a PII regex must never be
            # served a stale memoized plan (the dd14/dd22 key precedent)
            (
                "llm04_per",
                sf_dir,
                CUR05_PATH_BUCKETS,
                CUR06_EMAIL_RE,
                CUR06_SSN_RE,
                CUR06_PHONE_RE,
            ),
            _build_per,
            wall_label=f"llm04_per[{_os.path.basename(sf_dir.rstrip('/'))}]",
        )
    )
    flags = (
        per.drop("redacted")  # narrow: text never enters the flag exchanges
        .withColumn("u", F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("curl")))
        .withColumn("x", F.col("u") & F.col("nonempty"))
        .withColumn(
            "e",
            F.col("x")
            & (
                F.col("doc_id")
                == F.min(F.when(F.col("x"), F.col("doc_id"))).over(
                    Window.partitionBy("h")
                )
            ),
        )
        .select("doc_id", "u", "x", "e", "pii_hits", "resid", "ck")
        .transform(lazy_checkpoint)  # feeds counts, survivor ids, sel join
    )
    counts = flags.agg(
        F.count("*").alias("n_input"),
        F.count(F.when(F.col("u"), 1)).alias("n_url_unique"),
        F.count(F.when(F.col("x"), 1)).alias("n_extracted"),
        F.count(F.when(F.col("e"), 1)).alias("n_unique_text"),
        F.count(F.when(F.col("e") & (F.col("pii_hits") > 0), 1)).alias("n_pii_docs"),
        F.coalesce(F.sum(F.when(F.col("e"), F.col("resid"))), F.lit(0))
        .cast("bigint")
        .alias("n_residual"),
        F.count(F.when(F.col("e") & (F.col("doc_id") % 2 == 0), 1)).alias("n_target"),
    )
    surv_ids = flags.filter("e").select("doc_id")
    docs4 = per.join(surv_ids, "doc_id", "left_semi").select(
        "doc_id",
        # %2, not samp07's %20: URL keepers are one id per (div-100 group,
        # source) — a %20 slice of those leaves a handful of target docs at
        # the driver SF, an underfitted model whose negative smoothing tail
        # degenerately selects ~nothing. %2 keeps half the survivors as the
        # target slice at every scale, so the selection stage has a real
        # accept/reject margin.
        (F.col("doc_id") % 2 == 0).alias("is_t"),
        F.col("redacted").alias("text"),
    )
    sel = dsir_log_weights(docs4).filter("selected").select("doc_id", "n_toks")
    selagg = sel.join(flags.select("doc_id", "ck"), "doc_id").agg(
        F.count("*").alias("n_dsir_selected"),
        F.coalesce(F.sum("n_toks"), F.lit(0)).cast("bigint").alias("selected_tokens"),
        F.coalesce(F.sum("ck"), F.lit(0)).cast("bigint").alias("selected_checksum"),
    )
    return counts.crossJoin(selagg)

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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from api_etl_pipeline_spark.llm_ops.dedup import _DUCK_SIGNATURES, _signatures
from api_etl_pipeline_spark.llm_ops.text import EN_STOPWORDS
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

# near-dedup: smallest doc_id within any shared MinHash band bucket wins
_DUCK_NEAR = f"""
    WITH sig AS ({_DUCK_SIGNATURES}),
    bands AS (
        SELECT doc_id, md5(mh0::VARCHAR || '_' || mh1::VARCHAR) AS bucket FROM sig
        UNION ALL
        SELECT doc_id, md5(mh2::VARCHAR || '_' || mh3::VARCHAR) AS bucket FROM sig
    ),
    exact AS ({_DUCK_EXACT}),
    demoted AS (
        SELECT DISTINCT b.doc_id
        FROM bands a
        JOIN bands b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
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
    sig = _signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                F.md5(F.concat_ws("_", F.col("mh0").cast("string"), F.col("mh1").cast("string")).cast("binary")),
                F.md5(F.concat_ws("_", F.col("mh2").cast("string"), F.col("mh3").cast("string")).cast("binary")),
            )
        ).alias("bucket"),
    )
    # the band table is tiny (2 rows per doc) but sits on BOTH sides of the
    # self-join — materialize it once instead of recomputing the whole
    # shingle->signature subtree per side (localCheckpoint truncates the
    # lineage; at cluster scale use a reliable checkpoint dir)
    live_bands = lazy_checkpoint(bands.join(survivors, "doc_id", "left_semi"))
    a, b = live_bands.alias("a"), live_bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")),
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

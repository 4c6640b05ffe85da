"""Deterministic sampling / splitting operators for corpus curation.

A 100 TB training-data pipeline cannot use `rand()`-based sampling for
anything that must be reproducible (train/val/test membership, eval
holdouts, rerun-stable subsamples): a retry on another executor would
re-draw. Everything here keys on a content/id hash instead — membership
is a pure function of the row, so any re-execution, re-partitioning, or
engine swap produces the identical sample. The md5-hex prefix is used as
the shared entropy source because both engines agree on it byte-for-byte
(see x01_hash_functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from api_etl_pipeline_spark.registry import query
from api_etl_pipeline_spark.tables import load_table


def hash_bucket(col, n_buckets: int = 100):
    """Deterministic [0, n_buckets) bucket from an id column: first 8 hex
    chars of md5 → int → mod. Cross-engine twin of DuckDB
    ``('0x' || substr(md5(x::VARCHAR), 1, 8))::BIGINT % n``."""
    hex8 = F.substring(F.md5(col.cast("string").cast("binary")), 1, 8)
    return F.conv(hex8, 16, 10).cast("bigint") % n_buckets


@query(
    "samp01_hash_split",
    oracle="""
    WITH assigned AS (
        SELECT doc_id, n_chars,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*)::BIGINT     AS n_docs,
           SUM(n_chars)::BIGINT AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM assigned
    GROUP BY 1
    """,
)
def samp01_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by id-hash bucket, with
    per-split size accounting. Membership is a pure function of doc_id —
    stable under retries, repartitioning, and incremental re-ingest (a new
    document never moves an old one between splits, unlike rand() or
    row_number-based splitting). One narrow map + one small hash agg."""
    d = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"), 100)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        )
    )


@query(
    "samp02_stratified_sample",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(doc_id::VARCHAR), doc_id
               ) AS sample_rank,
               COUNT(*) OVER (PARTITION BY lang) AS n_lang
        FROM documents
    )
    SELECT doc_id, lang, n_chars, sample_rank::BIGINT AS sample_rank
    FROM ranked
    WHERE sample_rank * 10 <= n_lang
    """,
)
def samp02_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 10% sample: within each language stratum, rank documents
    by id-hash (a reproducible shuffle order) and keep the first
    floor(n/10). Equal sampling pressure per stratum regardless of how
    skewed the language mix is — the standard recipe for building eval
    slices from an imbalanced corpus. The md5 rank order is uniform in
    doc_id, so the sample is unbiased w.r.t. any id-correlated drift.

    One window over the lang partitioning (strata are few → salting is
    not needed; the heavy lifting is the sort within each stratum)."""
    d = load_table(spark, sf_dir, "documents")
    order_key = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w = Window.partitionBy("lang").orderBy(order_key, "doc_id")
    wc = Window.partitionBy("lang")
    return (
        d.select(
            "doc_id",
            "lang",
            "n_chars",
            F.row_number().over(w).cast("bigint").alias("sample_rank"),
            F.count("*").over(wc).alias("n_lang"),
        )
        .filter(F.col("sample_rank") * 10 <= F.col("n_lang"))
        .drop("n_lang")
    )


@query(
    "samp03_fixed_size_sample",
    oracle="""
    SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT doc_id, source, n_chars,
               row_number() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
        FROM documents
    )
    WHERE rk <= 200
    """,
)
def samp03_fixed_size_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N deterministic global sample: order the corpus by id-hash
    and take the first 200. Unlike rate-based sampling (samp01) the size
    is exact, and unlike reservoir sampling the membership is a pure
    function of the ids present — reruns and engine swaps agree.

    Scale shape: orderBy(hash).limit(N) plans as TakeOrderedAndProject —
    each task keeps a local top-N heap and only N rows per task reach
    the driver-side merge, so there is NO global sort and NO single-task
    window over the corpus. The rank is re-derived afterwards on the
    N-row result (trivial)."""
    d = load_table(spark, sf_dir, "documents")
    hk = F.md5(F.col("doc_id").cast("string").cast("binary"))
    top = (
        d.select("doc_id", "source", "n_chars", hk.alias("hk"))
        .orderBy("hk", "doc_id")
        .limit(200)
    )
    w = Window.orderBy("hk", "doc_id")
    return top.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w).cast("bigint").alias("rk"),
    )

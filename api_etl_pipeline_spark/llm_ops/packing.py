"""Sequence packing — batching documents into fixed token-budget context
windows, the last step before an LLM training run tokenizes shards.

The packer is greedy next-fit in doc_id order within a shard: documents
stream into the current bin until the next one would overflow the budget,
then a new bin opens. Next-fit (vs first-fit/best-fit) is chosen because
it is single-pass and streaming-friendly — each shard packs in O(n) with
O(1) state, which is what you want when a shard is a multi-GB partition
on an executor. An oversized document (> budget alone) gets its own bin
rather than being dropped or split.

Sharding is by deterministic doc_id mod: at 100 TB each shard is one
`applyInPandas` group, so packing parallelism = shard count and no
cross-shard coordination exists (bin ids are (shard, local) pairs). The
whole operator is a single shuffle on shard_id followed by an Arrow-batch
Python stage.

The DuckDB oracle expresses the same greedy fold as a recursive CTE over
rank-ordered rows — sequential semantics pinned exactly, not just
invariant-checked.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_etl_pipeline_spark.registry import query
from api_etl_pipeline_spark.tables import load_table

TOKEN_BUDGET = 128
N_SHARDS = 32

PACK_SCHEMA = (
    "shard_id BIGINT, doc_id BIGINT, n_tokens BIGINT, bin_id BIGINT, bin_fill BIGINT"
)


def make_packer(budget: int):
    """Greedy next-fit packer as a closure (cloudpickle ships it by value,
    so the UDF survives the driver importing this package from a foreign
    cwd)."""

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fills = [], []
        bin_id, fill = 0, 0
        for n in pdf["n_tokens"]:
            if fill > 0 and fill + n > budget:
                bin_id += 1
                fill = 0
            fill += int(n)
            bins.append(bin_id)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf[["shard_id", "doc_id", "n_tokens", "bin_id", "bin_fill"]]

    return pack_shard


# the recursive next-fit CTE chain shared by pack01 (manifest) and
# pack03 (efficiency audit): sequential greedy semantics stated once
_PACK01_CTES = f"""
    WITH RECURSIVE docs AS (
        SELECT doc_id % {N_SHARDS} AS shard_id, doc_id,
               len(string_split(text, ' '))::BIGINT AS n_tokens,
               row_number() OVER (PARTITION BY doc_id % {N_SHARDS} ORDER BY doc_id) AS rn
        FROM documents
    ),
    packed AS (
        SELECT shard_id, doc_id, n_tokens, rn,
               0::BIGINT AS bin_id, n_tokens AS bin_fill
        FROM docs WHERE rn = 1
        UNION ALL
        SELECT d.shard_id, d.doc_id, d.n_tokens, d.rn,
               CASE WHEN p.bin_fill + d.n_tokens > {TOKEN_BUDGET}
                    THEN p.bin_id + 1 ELSE p.bin_id END,
               CASE WHEN p.bin_fill + d.n_tokens > {TOKEN_BUDGET}
                    THEN d.n_tokens ELSE p.bin_fill + d.n_tokens END
        FROM docs d JOIN packed p
          ON d.shard_id = p.shard_id AND d.rn = p.rn + 1
    )"""


@query(
    "pack01_sequence_packing",
    oracle=_PACK01_CTES
    + """
    SELECT shard_id, doc_id, n_tokens, bin_id, bin_fill FROM packed
    """,
)
def pack01_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into {TOKEN_BUDGET}-token context windows, greedy
    next-fit per shard (see module docstring). Returns one row per
    document with its (shard, bin) assignment and the bin's running fill
    after placement — the manifest a tokenizer shard-writer consumes."""
    d = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % N_SHARDS).alias("shard_id"),
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    return d.groupBy("shard_id").applyInPandas(make_packer(TOKEN_BUDGET), schema=PACK_SCHEMA)


@query(
    "pack02_concat_cut",
    oracle="""
    WITH ordered AS (
        SELECT doc_id,
               len(string_split(text, ' '))::BIGINT AS n_tokens,
               md5(doc_id::VARCHAR) AS ord
        FROM documents
    ),
    cum AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (
                   ORDER BY ord, doc_id ROWS UNBOUNDED PRECEDING
               ) AS cum_tokens
        FROM ordered
    )
    SELECT CAST(FLOOR((cum_tokens - n_tokens) / 2048.0) AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens,
           CAST(MIN(cum_tokens - n_tokens) AS BIGINT) AS start_offset
    FROM cum
    GROUP BY 1
    """,
)
def pack02_concat_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-cut sequence packing: documents are laid end-to-end in a
    deterministic hash order and the stream is cut every 2048 tokens —
    the packing most pretraining runs actually use (documents may
    straddle a cut; attention masks handle the seam). Each doc's bin is
    a pure function of the running-token prefix sum, so unlike pack01's
    greedy bin-search there is NO per-bin state: one window cumsum and a
    groupBy.

    The global cumsum is the deliberate single-ordered-pass over doc
    METADATA (two ints per doc); at 100 TB this runs per training shard
    (shuf01's partitioning) with a prefix-carry of per-shard totals —
    same operator, one extra tiny exchange. Every output is exact
    integer arithmetic — hash-stable by construction."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    ordered = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("ord"),
    )
    w = W.orderBy("ord", "doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = ordered.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    start = F.col("cum_tokens") - F.col("n_tokens")
    return (
        cum.groupBy(F.floor(start / 2048.0).cast("bigint").alias("bin_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens"),
            F.min(start).cast("bigint").alias("start_offset"),
        )
    )


@query(
    "pack03_packing_efficiency",
    oracle=_PACK01_CTES
    + f""",
    bins AS (
        SELECT shard_id, bin_id,
               MAX(bin_fill)::BIGINT AS bin_tokens,
               COUNT(*)::BIGINT AS docs_in_bin
        FROM packed GROUP BY shard_id, bin_id
    )
    SELECT shard_id,
           SUM(docs_in_bin)::BIGINT AS n_docs,
           COUNT(*)::BIGINT AS n_bins,
           SUM(bin_tokens)::BIGINT AS total_tokens,
           ((SUM(bin_tokens) + {TOKEN_BUDGET} - 1) // {TOKEN_BUDGET})::BIGINT
               AS lb_bins,
           SUM(CASE WHEN bin_tokens > {TOKEN_BUDGET} THEN 1 ELSE 0
               END)::BIGINT AS n_oversized_bins,
           SUM(CASE WHEN bin_tokens > {TOKEN_BUDGET} THEN 0
                    ELSE {TOKEN_BUDGET} - bin_tokens END)::BIGINT
               AS padding_tokens,
           ROUND(SUM(bin_tokens)::DOUBLE / (COUNT(*) * {TOKEN_BUDGET}), 6)
               AS fill_rate,
           ROUND(((SUM(bin_tokens) + {TOKEN_BUDGET} - 1) // {TOKEN_BUDGET})::DOUBLE
                 / COUNT(*), 6) AS efficiency
    FROM bins
    GROUP BY shard_id
    """,
)
def pack03_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit of the shipped next-fit packer: per
    shard, the bin count against the LP lower bound ceil(total/budget),
    the PADDING tokens a trainer actually pays for (unused positions in
    every non-oversized bin — wasted attention FLOPs, the number that
    decides whether to switch packers), fill rate, and oversized-bin
    count. `efficiency` = lb_bins/n_bins: 1.0 means next-fit hit the
    information-theoretic floor for that shard; next-fit's guarantee is
    ≥ 0.5 everywhere (each pair of adjacent bins jointly exceeds the
    budget), which the pytest pins along with an independent replay of
    the whole audit from pack01's own manifest.

    Exact-integer discipline: bin totals are MAX over the running fill
    (monotone within a bin), the lower bound is integer ceiling
    division, and the two rates divide exact BIGINTs once then ROUND(6)
    — the report is hash-pinned like maint01's work order.

    Plan shape: inherits pack01's single shard shuffle + Arrow packer;
    the audit adds two map-side-combined aggregates over the manifest
    ((shard, bin) then shard — |bins| rows, never documents). At
    100 TB the audit rides the packing job's own output manifest; no
    second corpus pass exists."""
    packed = pack01_sequence_packing(spark, sf_dir)
    bins = packed.groupBy("shard_id", "bin_id").agg(
        F.max("bin_fill").alias("bin_tokens"),
        F.count("*").alias("docs_in_bin"),
    )
    b = TOKEN_BUDGET
    lb = F.expr(f"(sum(bin_tokens) + {b - 1}) div {b}")
    return bins.groupBy("shard_id").agg(
        F.sum("docs_in_bin").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_bins"),
        F.sum("bin_tokens").cast("bigint").alias("total_tokens"),
        lb.cast("bigint").alias("lb_bins"),
        F.sum(F.when(F.col("bin_tokens") > b, 1).otherwise(0))
        .cast("bigint")
        .alias("n_oversized_bins"),
        F.sum(F.when(F.col("bin_tokens") > b, 0).otherwise(b - F.col("bin_tokens")))
        .cast("bigint")
        .alias("padding_tokens"),
        F.round(
            F.sum("bin_tokens").cast("double") / (F.count("*") * b), 6
        ).alias("fill_rate"),
        F.round(lb.cast("double") / F.count("*"), 6).alias("efficiency"),
    )

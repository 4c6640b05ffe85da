"""Skew mitigation helpers (SURVEY.md §4.2 — 100 TB design).

AQE's skew-join splitting handles most hot keys automatically
(spark.sql.adaptive.skewJoin.enabled, on in session.py); these helpers
cover the cases AQE can't: a grouped aggregation where one key holds a
large fraction of all rows (AQE splits join partitions, not aggregation
groups).

`salted_agg` is the classic two-stage rewrite: append a random-free
deterministic salt (hash of a spread column, NOT rand() — keeps results
reproducible and retry-safe), aggregate per (key, salt) — this is the
map-side-combine stage that caps any single reducer's load at
1/buckets of the hot key — then aggregate the partials per key. Only
algebraic aggregates (sum/count/min/max) can ride this; avg must be
decomposed into sum+count by the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, spread_col: str, buckets: int = 16,
              out: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, buckets): hash of a high-cardinality
    column (e.g. the row's natural id), stable across retries."""
    return df.withColumn(out, F.pmod(F.xxhash64(F.col(spread_col)), F.lit(buckets)))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    spread_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Manual skew-join: salt the left side by a per-row unique column
    (`spread_col` — must vary WITHIN the hot key, e.g. the row's natural
    id; salting by the key itself would put the whole hot key back in one
    bucket) and replicate the right side `buckets`× so every (key, salt)
    pair finds its match. One hot key's rows now land on `buckets`
    reducers instead of one.

    Cost: the right side is materialized buckets× — use only when right
    ≪ left (the usual skew shape: a huge skewed fact against a modest
    table that is still too big to broadcast). AQE's skew-split handles
    sort-merge joins automatically (on in session.py); this is for when
    AQE is unavailable or the skew sits upstream of a non-join exchange."""
    salted_left = with_salt(left, spread_col, buckets)
    replicated_right = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(buckets)]))
    )
    return salted_left.join(replicated_right, [key, "_salt"]).drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    spread_col: str,
    aggs: dict[str, tuple[Column, Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output name -> (partial_agg_expr, final_agg_expr(partial)),
    e.g. {"n": (F.count("*"), F.sum), "total": (F.sum("v"), F.sum)} where the
    final expr is applied to the partial column.
    """
    partial = (
        with_salt(df, spread_col, buckets)
        .groupBy(key, "_salt")
        .agg(*[expr.alias(f"_p_{name}") for name, (expr, _) in aggs.items()])
    )
    return partial.groupBy(key).agg(
        *[final(f"_p_{name}").alias(name) for name, (_, final) in aggs.items()]
    )

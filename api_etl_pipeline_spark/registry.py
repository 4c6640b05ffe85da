"""Named-query registry — the engine's verifiable operator surface.

Every operator the engine implements is registered here as a ``QuerySpec``:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
an equivalent DuckDB oracle SQL string over the same parquet tables. The
driver's correctness gate runs both sides and compares row-count + schema +
order-insensitive value-hash, so:

- every computed column is aliased identically on both sides;
- float aggregates are rounded on both sides (cross-engine summation order
  differs; rounding makes the hash stable);
- ORDER BY is irrelevant to the hash but deterministic tie-breaks matter for
  row_number-style operators, so ranking queries always order by a unique key
  last.

Modules register via the ``@query`` decorator at import time.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a named query. Usage:

    @query("q01_pricing_summary", oracle="SELECT ...")
    def q01(spark, sf_dir): ...
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _load_all() -> None:
    # Import for registration side effects; keep cheap (no Spark work at import).
    from api_etl_pipeline_spark.ops import (  # noqa: F401
        advanced,
        events_analytics,
        graph,
        maintenance,
        python_udfs,
        quality,
        relational,
        scalar,
        sql_surface,
        tpch_extra,
        windows,
    )
    from api_etl_pipeline_spark import ingest  # noqa: F401
    from api_etl_pipeline_spark.ingest import queries as ingest_queries  # noqa: F401
    from api_etl_pipeline_spark.llm_ops import (  # noqa: F401
        corpus_pipeline,
        curation,
        dedup,
        multimodal,
        packing,
        retrieval,
        sampling,
        similarity,
        text,
    )
    from api_etl_pipeline_spark.streaming import batch_windows  # noqa: F401


# Driver-coverage rotation. The driver's per-round correctness gate samples
# the FIRST 50 entries of queries() in dict order. Rounds 1-5 cumulatively
# drove 165 of 216 names; this round-6 prefix front-loads the 51 queries
# that have NEVER had a driver CORRECTNESS row (computed against
# CORRECTNESS_r01..r05): st06/07/09 (now full-oracle — see
# batch_windows.py, the live stream drains a bounded source so the batch
# SQL is its oracle), st10, mm01-mm06, tx17-19, gr01-03, q39-q50, q52,
# x14-x26, sim06/09/10, ev14/ev15, hh01, dq01/dq02, ret01, samp05. Only
# 50 fit the sample; x22_negative_div_mod (trivial scalar semantics,
# pytest-oracle green every session) is deliberately slot 51. Queries
# ADDED in round 6 (decon03, cur02, tx20, ev16, st11, st12, then the
# late wave dq03, sim11, dd13, dq04, mix02, ev17, inc01, inc02, samp06,
# tx21 — registry 216 -> 232, all full-oracle) are placed AFTER this
# prefix; the round-7 rotation should front-load exactly those 16 plus
# x22 and whatever round-7 adds. Nothing is removed — every query
# stays registered and the pytest mirror in
# tests/test_queries_oracle.py still covers all of them.
_DRIVER_SAMPLE_PREFIX = [
    "st06", "st07", "st09", "st10",
    "mm01", "mm02", "mm03", "mm04", "mm05", "mm06",
    "tx17", "tx18", "tx19",
    "gr01", "gr02", "gr03",
    *[f"q{i:02d}" for i in range(39, 51)],
    "q52",
    *[f"x{i:02d}" for i in range(14, 22)],
    "x23", "x24", "x26",
    "sim06", "sim09", "sim10",
    "ev14", "ev15",
    "hh01", "dq01", "dq02", "ret01", "samp05",
    "x22",  # slot 51 — outside the 50-row sample, by design
]


def _rotated(registry: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    by_prefix: dict[str, str] = {}
    for name in registry:
        stem = name.split("_", 1)[0]
        by_prefix.setdefault(stem, name)
    ordered: dict[str, QuerySpec] = {}
    for key in _DRIVER_SAMPLE_PREFIX:
        full = registry.get(key) and key or by_prefix.get(key)
        if full and full not in ordered:
            ordered[full] = registry[full]
    for name, spec in registry.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    return _rotated(dict(_REGISTRY))

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
# the FIRST 50 entries of queries() in dict order. Rounds 1-4 cumulatively
# drove 115 of 199 names; this round-5 prefix front-loads 50 of the 84
# then-never-driver-checked queries (qsql*, tx01-16, llm*,
# decon/cur/mix/shuf/chunk, samp*, pack*, st01-05/st08, plus
# ev13/x13/dd11/dd12), all oracle-bearing, lifting cumulative coverage to
# 165. Round 5 also ADDED tx17, tx18, mm06, ret01, samp05, st10, dq01,
# ev14 and ev15 — then gr01, gr02, gr03, q52, x26, hh01, tx19 and dq02
# in the continuation session — so the registry is 216 and the
# never-driver-checked remainder for the round-6 rotation is 51:
# x14-x24, q39-q50, mm01-mm06, sim06/09/10, st06/07/09/10, tx17, tx18,
# ret01, samp05, dq01, ev14, ev15, gr01, gr02, gr03, q52, x26, hh01, tx19, dq02.
# Nothing is removed —
# every query stays registered and the pytest mirror in
# tests/test_queries_oracle.py still covers all of them.
_DRIVER_SAMPLE_PREFIX = [
    *[f"qsql{i:02d}" for i in range(1, 10)],
    *[f"tx{i:02d}" for i in range(1, 17)],
    "llm01", "llm02", "llm03",
    "decon01", "decon02", "cur01", "mix01", "shuf01", "chunk01",
    "samp01", "samp02", "samp03", "samp04",
    "pack01", "pack02",
    "st01", "st02", "st03", "st04", "st05", "st08",
    "ev13", "x13", "dd11", "dd12",
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

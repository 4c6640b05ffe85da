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
        maintenance,
        python_udfs,
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
        sampling,
        similarity,
        text,
    )
    from api_etl_pipeline_spark.streaming import batch_windows  # noqa: F401


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)

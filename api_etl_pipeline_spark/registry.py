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
  last;
- NEVER return a raw DECIMAL final column: compute in DECIMAL (order-free
  sums) but ``CAST(... AS DOUBLE)`` after the final ROUND on BOTH sides —
  Spark pandas-collects Decimal('100.10') where DuckDB gives float64 100.1,
  and the driver's string canonicalization diverges on trailing zeros (the
  r07 ev16/inc01/stats02 hash fails; the ev15 convention);
- NEVER return a DATE final column: cast to timestamp_ntz (Spark) /
  TIMESTAMP (oracle) — Spark DATE collects as datetime.date, DuckDB DATE as
  datetime64[us]; same canonicalization divergence. Zoned TIMESTAMP finals
  are likewise banned (process-timezone-dependent) — timestamp_ntz only.
  All three conventions are enforced mechanically by
  ``tests/oracle.py::compare``, which every query's pytest mirror runs.

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

    Output-typing contract (driver hash compatibility — see module
    docstring): final schemas must contain NO raw DECIMAL, DATE, zoned
    TIMESTAMP, or complex (array/map/struct) columns. DECIMAL → cast the
    output to DOUBLE after the final ROUND on both engine sides; DATE →
    timestamp_ntz / TIMESTAMP; arrays → array_join/to_json. The pytest
    mirror (tests/oracle.py::compare) rejects violations.
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
# the FIRST 50 entries of queries() in dict order. As of round 7 every
# registered query has at least one driver CORRECTNESS row (cumulative
# 244/244). This round-8 prefix (per the round-7 verdict tasks 1/4)
# front-loads, in order:
#   1. the three r07 hash-FAIL queries, now fixed (raw DECIMAL finals →
#      CAST AS DOUBLE, the ev15 convention): ev16, inc01, stats02 — the
#      re-check that closes the regression.
#   2. the round-8 additions: ing21 (T4 offset pagination), st14
#      (composed streaming incremental sync), dq07 (windowed PSI drift
#      vs frozen baseline), cur06 (PII scrub audit), samp07 (DSIR
#      importance resampling), sim12 (product-quantization ANN), maint01 (distributed
#      compaction planner), tx23 (Zipf/Heaps corpus-law audit).
#   3. the seven queries whose OUTPUT CODE changed this round (DATE
#      finals re-typed to timestamp_ntz — same canonicalization class
#      as the decimal bug): ev04, ev05, ev14, x11, x24, w03, ing05.
#   4. freshness fill from the queries whose LATEST driver row is
#      pre-r4 (46 such; 37 fit): all ev01-ev12 / q19-q38 /
#      stats01 / udaf01 / udtf01 — deferring the eleven pre-r4
#      scalar projections (x01-x10, x25: zero code change since round
#      1, pytest-oracle green every session, lowest divergence risk;
#      x25 additionally re-measured min-of-7 in the r7 adjudication)
#      to the round-9 fill, which x01/x05/x04/x07/x25 lead from
#      positions 51-55.
# Nothing is removed — every query stays registered and the pytest
# mirror in tests/test_queries_oracle.py still covers all.
_DRIVER_SAMPLE_PREFIX = [
    "ev16", "inc01", "stats02",
    "ing21", "st14", "dq07", "cur06", "samp07", "sim12", "maint01",
    "tx23",
    "ev04", "ev05", "ev14", "x11", "x24", "w03", "ing05",
    "ev01", "ev02", "ev03", "ev06", "ev07", "ev08",
    "ev09", "ev10", "ev11", "ev12",
    *[f"q{i:02d}" for i in range(19, 39)],
    "stats01", "udaf01", "udtf01",
    "x01", "x05", "x04", "x07", "x25",  # 50 cuts at udtf01; tail leads round 9
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

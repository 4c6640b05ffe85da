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
# the FIRST 50 entries of queries() in dict order. Rounds 1-6 cumulatively
# drove 215 of the 236 round-6 names; this round-7 prefix (per the round-6
# verdict task 1) front-loads, in order:
#   1. x12_array_functions — its ONLY driver row is round 1's harness
#      abort (pandas could not sort raw array columns); the root cause
#      was fixed in round 2 (arrays serialized via array_join,
#      ops/scalar.py) and it has been pytest-oracle green since, but no
#      driver row has superseded the stale FAIL. Slot 1 closes that.
#   2. the round-7 additions tx22 (apply-BPE tokenize), dd14
#      (incremental snapshot-aware dedup), st13 (live streaming
#      redelivery dedup), dd15 (SemDeDup centroid-cell pruning), dq05
#      (referential-integrity audit), cur04 (token drift),
#      dq06 (PSI feature drift), and cur05 (URL canonicalization
#      dedup — w03 moved out of the 50-prefix to make room; it keeps
#      its r4 driver row and its pytest-oracle mirror).
#   3. the 21 queries that have never had a driver CORRECTNESS row
#      (round-6 late wave): decon03, cur02, cur03, tx20, tx21, ev16,
#      ev17, ev18, inc01, inc02, mix02, samp06, sim11, dd13, dq03,
#      dq04, stats02, ab01, st11, st12, x22.
#   4. freshness re-verification on the OLDEST-checked round-1 names
#      (q01-q18 plus w01-w02 — w03-w04/x01-x04 did not fit the 50).
# With all 50 green, cumulative distinct driver-checked closes to the
# full registry. Nothing is removed — every query stays registered and
# the pytest mirror in tests/test_queries_oracle.py still covers all.
_DRIVER_SAMPLE_PREFIX = [
    "x12",
    "tx22", "dd14", "st13", "dd15", "dq05", "cur04", "dq06", "cur05",
    "decon03", "cur02", "cur03", "tx20", "tx21",
    "ev16", "ev17", "ev18", "inc01", "inc02",
    "mix02", "samp06", "sim11", "dd13",
    "dq03", "dq04", "stats02", "ab01",
    "st11", "st12", "x22",
    *[f"q{i:02d}" for i in range(1, 19)],
    "w01", "w02",
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

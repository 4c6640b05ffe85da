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
# the FIRST 50 entries of queries() in dict order. This round-11 prefix (per
# the round-10 verdict tasks 1+2) front-loads, in order:
#   1. ALL 38 queries whose latest driver row is still round 5 — the
#      oldest cohort left in the registry: qsql08, qsql09, x13,
#      tx01-tx16, cur01, chunk01, dd11, dd12, decon01, decon02, ev13,
#      llm01-llm03, mix01, pack01, pack02, samp01-samp04, shuf01, st08.
#      The freshness-floor gate leg (tools/round_close.py) fails at the
#      r11 close unless every one of these sits in the prefix.
#   2. the round-11 additions needing a FIRST driver row: ing22
#      (reconcile-by-hash — T5's driver-oracle query, the last §2 row
#      that was pytest-only), dd20 (production-k SemDeDup: cell-size-
#      bounded codebook, dd15's verdict machinery), dd21 (cross-doc
#      arbitrary-offset substring dedup — Lee et al. 2022 semantics on
#      dd19's machinery), dd22 (two-level-codebook SemDeDup assignment —
#      the O(n*sqrt(k)*d) fix dd20's own 100x probe row motivates).
#      Names listed here before the op lands are skipped by _rotated
#      until registered.
#   3. r12-crunch stagger (round-10 verdict task 2): the r6 cohort is 48
#      names and ALL of them hit the freshness floor at r12; pulling 8
#      forward now (hh01, q52, x26, ev15, gr01, gr02, gr03, dq01 —
#      first-registered order within the cohort) leaves the r12 fill
#      queue at 40 names, which fits the 50-slot prefix with room for
#      r12's own new ops.
# 38 + 4 + 8 = 50 exactly. The r12 fill queue (remaining r6 cohort, 40):
# dq02, x14-x21, x23, q39-q50, samp05, sim06, sim09, sim10, tx17, tx18,
# tx19, mm01-mm06, ret01, st06, st07, st09, st10. Nothing is removed —
# every query stays registered and the pytest mirror in
# tests/test_queries_oracle.py still covers all 281.
_DRIVER_SAMPLE_PREFIX = [
    "qsql08", "qsql09", "x13",
    *[f"tx{i:02d}" for i in range(1, 17)],
    "cur01", "chunk01", "dd11", "dd12", "decon01", "decon02", "ev13",
    "llm01", "llm02", "llm03", "mix01", "pack01", "pack02",
    "samp01", "samp02", "samp03", "samp04", "shuf01", "st08",
    "ing22", "dd20", "dd21", "dd22",
    "hh01", "q52", "x26", "ev15", "gr01", "gr02", "gr03", "dq01",
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

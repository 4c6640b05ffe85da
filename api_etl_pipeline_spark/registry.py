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
        classifier,
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
# the FIRST 50 entries of queries() in dict order. This round-14 prefix (per
# the round-13 verdict task 1) front-loads, in order:
#   1. ALL 45 queries whose latest driver row is still round 8 — the
#      entire r8 cohort, verified against the latest-round histogram
#      (r8×45, r9×44, r10×50, r11×48, r12×48, r13×50) at the start of
#      round 14: cur06, dq07, ev01-ev12, ev14, ev16, inc01, q19-q38,
#      st14, stats01, stats02, tx23, udaf01, w03, x11, x24. The
#      freshness-floor gate leg (tools/round_close.py) fails at the
#      r14 close unless every one of these sits in the prefix.
#   2. the 5 geometry-changed pull-forwards staged at r13: dd03 and
#      llm01-llm04 — their outputs changed with the b32r2/64-hash
#      production geometry but did not fit the r13 prefix; the r13
#      judge swept them 4+1 green at sf0.01 and staged them here.
# 45 + 5 = 50 exactly — zero free slots, exactly as the r13 verdict
# item 2 predicted (no r8 name was refreshed since). Consequence: any
# NEW round-14 operator (dd25 simhash-recall audit) is registered with
# a live oracle + pytest third-engine replay now and queued for its
# FIRST driver row in the r15 prefix, the r13-staging precedent.
# R15 fill queue = the 44-name r9 cohort (latest-round histogram at
# r14 start) + dd25 + remaining slack. Nothing is removed — every
# query stays registered and the pytest mirror in
# tests/test_queries_oracle.py still covers all of them.
_DRIVER_SAMPLE_PREFIX = [
    "cur06", "dq07",
    *[f"ev{i:02d}" for i in range(1, 13)], "ev14", "ev16",
    "inc01",
    *[f"q{i:02d}" for i in range(19, 39)],
    "st14", "stats01", "stats02", "tx23", "udaf01", "w03", "x11", "x24",
    "dd03", "llm01", "llm02", "llm03", "llm04",
]

# Round-14 additions with NO driver row yet, explicitly staged for
# their FIRST row in the r15 prefix (the r13 verdict's consequence of
# the zero-slack r14 rotation: "any NEW round-14 operator is registered
# with a live oracle + pytest third-engine replay now and queued for
# its FIRST driver row in the r15 prefix"). The freshness gate
# (tools/round_close.py::leg_driver_freshness) treats ONLY names listed
# here as allowed to be never-checked outside the prefix, and prints
# them as the staged set — an op left off both this list and the prefix
# still fails the leg, so nothing can stay unchecked silently. MUST be
# folded into _DRIVER_SAMPLE_PREFIX (and emptied) at the r15 rotation.
DRIVER_STAGED_NEXT_ROUND = [
    "dd25_simhash_recall_audit",
    "cls02_classifier_auc_audit",
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

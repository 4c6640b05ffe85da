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
# the FIRST 50 entries of queries() in dict order. This round-10 prefix (per
# the round-9 verdict task 1) front-loads, in order:
#   1. ALL 32 queries whose latest driver row is still round 4 — the last
#      pre-r5 tail in the registry: w07-w11, ing01-ing04, ing06-ing20
#      (ing05 does not exist; the ing numbering skips it), dd08, and
#      sim01-sim05/sim07/sim08. After this round no registered query's
#      newest driver row predates r5, and the freshness-floor gate leg
#      (tools/round_close.py) enforces that invariant mechanically from
#      now on.
#   2. the round-10 additions / code-changed queries that need a first or
#      fresh driver row: dd19 (span-level exact dedup, C4's
#      three-sentence rule), dq09 (sampled/sketched FD profile — the
#      production-scale companion to dq08), st17 (dd19's live streaming
#      twin: span keep-first against standing per-hash GroupState),
#      cur09 (key-coherent pseudonymization audit) and ev19 (journey
#      patterns, reworked with the bounded-history guard the round-9
#      verdict ordered). Names listed here before the op lands are
#      skipped by _rotated until registered.
#   3. freshness fill from the r5 tail (50 queries), oldest evidence
#      first: st01-st05 (the streaming-semantics driver evidence the
#      verdict explicitly queued) and qsql01-qsql07 (the shared-SQL
#      surface). ing05 (fresh, r8) rides along because the ingest block
#      is contiguous. The 38 r5 leftovers (qsql08, qsql09, x13,
#      tx01-tx16, cur01, chunk01, dd11, dd12, decon01, decon02, ev13,
#      llm01-llm03, mix01, pack01, pack02, samp01-samp04, shuf01, st08)
#      lead the round-11 fill from positions 51+.
# 33 + 5 + 12 = 50 exactly. Nothing is removed — every query stays
# registered and the pytest mirror in tests/test_queries_oracle.py still
# covers all.
_DRIVER_SAMPLE_PREFIX = [
    *[f"w{i:02d}" for i in range(7, 12)],
    *[f"ing{i:02d}" for i in range(1, 21)],
    "dd08",
    "sim01", "sim02", "sim03", "sim04", "sim05", "sim07", "sim08",
    "dd19", "dq09", "st17", "cur09", "ev19",
    "st01", "st02", "st03", "st04", "st05",
    *[f"qsql{i:02d}" for i in range(1, 8)],
    # round-11 fill queue (r5 tail leftovers): qsql08, qsql09, x13,
    # tx01-tx16, cur01, chunk01, dd11, dd12, decon01, decon02, ev13,
    # llm01-llm03, mix01, pack01, pack02, samp01-samp04, shuf01, st08
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

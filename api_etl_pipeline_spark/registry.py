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
# the FIRST 50 entries of queries() in dict order. This round-12 prefix (per
# the round-11 verdict task 1) front-loads, in order:
#   1. ALL 40 queries whose latest driver row is still round 6 — the
#      entire remaining r6 cohort, exactly the fill queue the round-11
#      prefix note staged: dq02, x14-x21, x23, q39-q50, samp05, sim06,
#      sim09, sim10, tx17-tx19, mm01-mm06, ret01, st06, st07, st09,
#      st10. The freshness-floor gate leg (tools/round_close.py) fails
#      at the r12 close unless every one of these sits in the prefix.
#   2. dd22 — its latest row is r11 (fresh), but BOTH its sides change
#      this round (oracle moved to rank-based centroid selection per the
#      r11 advice; assignment gained the vectorized grouping + broadcast
#      codebook path), so it must be re-hash-pinned by the incoming
#      driver run rather than coast on the r11 row of the old form.
#   3. the round-12 additions needing a FIRST driver row: dd23
#      (trained-codebook SemDeDup — spherical-k-means training on
#      dd22's two-level assignment machinery, sim09-style invariant
#      oracle), dd24 (incremental SemDeDup: delta batch vs a standing
#      store's codebook, the dd14 refresh pattern for embeddings), and
#      sim15 (IVF+PQ composed ADC search — the faiss IVFPQ production
#      read path). Names listed here before the op lands are skipped by
#      _rotated until registered.
#   4. r13-crunch stagger: the r7 cohort is 47 names and ALL of them hit
#      the freshness floor at r13; pulling 6 forward now (ev17, inc02,
#      ab01, ev18, dd13, dd14 — first-registered order within the
#      cohort) leaves the r13 fill queue at 41 names, which fits the
#      50-slot prefix with room for r13's own new ops.
# 40 + 1 + 3 + 6 = 50 exactly. The r13 fill queue (remaining r7 cohort,
# 41): cur02-cur05, dd15, decon03, dq03-dq06, mix02, q01-q18, samp06,
# sim11, st11-st13, tx20-tx22, w01, w02, x12, x22. Nothing is removed —
# every query stays registered and the pytest mirror in
# tests/test_queries_oracle.py still covers all 284.
_DRIVER_SAMPLE_PREFIX = [
    "dq02", *[f"x{i}" for i in range(14, 22)], "x23",
    *[f"q{i}" for i in range(39, 51)],
    "samp05", "sim06", "sim09", "sim10", "tx17", "tx18", "tx19",
    *[f"mm{i:02d}" for i in range(1, 7)],
    "ret01", "st06", "st07", "st09", "st10",
    "dd22", "dd23", "dd24", "sim15",
    "ev17", "inc02", "ab01", "ev18", "dd13", "dd14",
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

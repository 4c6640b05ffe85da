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
# the FIRST 50 entries of queries() in dict order. This round-9 prefix (per
# the round-8 verdict task 1) front-loads, in order:
#   1. ALL 12 queries whose latest driver row predates round 4 — the last
#      such tail in the registry: x01-x10 (latest row r1), x25 and
#      udtf01_bigram_expand (latest row r3). After this round no
#      registered query's newest driver row predates r4.
#   2. the queries whose code or oracle changed in round 9 and therefore
#      need a fresh driver row: samp07 (`selected` now derives from the
#      ROUNDED log-weight on both sides), maint01 (group_id via exact
#      integer `div`, not floor-of-double), ing21 (oracle page size now
#      interpolated from _PAGE_SIZE), sim12 (top-k rewritten to the
#      per-partition partial top-k shape), plus the round-9 additions
#      cur07 (HTML main-text extraction), llm04 (composed curation
#      funnel), cur08 (Gopher quality-rule battery), dd16 (LSH recall
#      audit), dd17 (band-geometry sweep), ev19 (journey pattern
#      matching), st15 (its applyInPandasWithState live twin, full
#      oracle), maint02 (retention/TTL delete planner), sim13 (MMR
#      diversified re-rank), hh02 (Count-Min accuracy audit), maint03
#      (zone-map skip estimator), tx24 (tokenizer fertility audit),
#      st16 (live streaming Count-Min maintenance), mix03
#      (quality-annealed epoch schedule), dq08 (FD/key-candidate
#      profiler), ret02 (ANN rank-quality eval), pack03 (packing
#      efficiency audit), samp08 (temporal split with embargo), w12
#      (time-range window frame), sim14 (SQ8 quantized top-k) and dd18
#      (exact-threshold prefix-filter join). Names listed here before
#      the op lands are skipped by _rotated until registered.
#   3. freshness fill, oldest first: 13 of the 45 queries whose latest
#      driver row is r4, in registry order (q51, dd01-dd07/dd09/dd10,
#      w04-w06). The 32 r4 leftovers (w07-w11, ing01-ing20, dd08,
#      sim01-sim05, sim07, sim08) lead the round-10 fill from
#      positions 51+.
# 12 + 25 + 13 = 50 exactly. Nothing is removed — every query stays
# registered and the pytest mirror in tests/test_queries_oracle.py still
# covers all.
_DRIVER_SAMPLE_PREFIX = [
    *[f"x{i:02d}" for i in range(1, 11)], "x25", "udtf01",
    "samp07", "maint01", "ing21", "sim12", "cur07", "llm04", "cur08", "dd16",
    "dd17", "ev19", "st15", "maint02", "sim13", "hh02", "maint03", "tx24",
    "st16", "mix03", "dq08", "ret02", "pack03", "samp08", "w12", "sim14",
    "dd18",
    "q51",
    "dd01", "dd02", "dd03", "dd04", "dd05", "dd06", "dd07", "dd09", "dd10",
    *[f"w{i:02d}" for i in range(4, 7)],
    # round-10 fill queue: w07-w11, ing01-ing20, dd08,
    # sim01-sim05, sim07, sim08
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

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
# the FIRST 50 entries of queries() in dict order. This round-13 prefix (per
# the round-12 verdict task 1) front-loads, in order:
#   1. ALL 41 queries whose latest driver row is still round 7 — the
#      entire r7 cohort, exactly the fill queue the round-12 prefix
#      note staged: cur02-cur05, dd15, decon03, dq03-dq06, mix02,
#      q01-q18, samp06, sim11, st11-st13, tx20-tx22, w01, w02, x12,
#      x22. The freshness-floor gate leg (tools/round_close.py) fails
#      at the r13 close unless every one of these sits in the prefix.
#   2. the near-dup geometry re-pin set (round-12 verdict task 2): the
#      production LSH geometry flipped from 2 bands × 2 rows / 4 hashes
#      to 32 bands × 2 rows / 64 hashes (llm_ops/dedup.py), changing
#      the output of every pair consumer. The judge-named consumers get
#      fresh driver rows THIS round: dd04 itself, dd09, dd10, dd13,
#      dd14, gr03 (samp06 is already in the queue above), plus the two
#      audits that prove the uplift — dd16 (recall 0.18 → 0.967 at
#      sf0.01) and dd17 (the six-geometry measured ladder).
#   3. the round-13 addition needing a FIRST driver row: cls01 (learned
#      quality-classifier scoring — fastText-style centroid/logistic
#      scorer with weights folded in as literals, the DSIR/sim04
#      device). Names listed here before the op lands are skipped by
#      _rotated until registered.
# 41 + 8 + 1 = 50 exactly. Geometry-changed names that do NOT fit this
# prefix — dd03 and llm01-llm04 — stay registered with live spark-vs-
# oracle agreement (both sides derive from the same generated geometry)
# and are the staged r14 pull-forwards: the r14 fill queue is the
# 45-name r8 cohort (cur06, dq07, ev01-ev12, ev14, ev16, inc01,
# q19-q38, st14, stats01, stats02, tx23, udaf01, w03, x11, x24), and
# dd03 + llm01-04 fill the remaining 5 slots exactly. Nothing is
# removed — every query stays registered and the pytest mirror in
# tests/test_queries_oracle.py still covers all of them.
_DRIVER_SAMPLE_PREFIX = [
    "cur02", "cur03", "cur04", "cur05", "dd15", "decon03",
    "dq03", "dq04", "dq05", "dq06", "mix02",
    *[f"q{i:02d}" for i in range(1, 19)],
    "samp06", "sim11", "st11", "st12", "st13",
    "tx20", "tx21", "tx22", "w01", "w02", "x12", "x22",
    "dd04", "dd09", "dd10", "dd13", "dd14", "gr03", "dd16", "dd17",
    "cls01",
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

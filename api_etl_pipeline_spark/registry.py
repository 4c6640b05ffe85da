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
# the FIRST 50 entries of queries() in dict order. This round-15 prefix
# (the r14 staging plan executed) front-loads, in order:
#   1. ALL 42 queries whose latest passing driver row is still round 9 —
#      the entire r9 cohort, verified against the latest-round histogram
#      at the start of round 15 (r9×42, r10×50, r11×45, r12×48, r13×50,
#      r14×50, never×2). Note two touched-this-round names (dd18, ret02)
#      are in this cohort — their r15 rewrites get a same-round driver
#      row, exactly the freshness the rotation exists to provide.
#   2. the two staged round-14 additions with no driver row yet: dd25
#      (simhash recall audit) and cls02 (classifier AUC audit) — the
#      zero-slack r14 rotation queued them here; DRIVER_STAGED_NEXT_ROUND
#      is emptied in the same commit, per its contract.
#   3. 6 fill slots from the r10 cohort, oldest-first alphabetical:
#      cur09, dd08, dd19, dq09, ev19, ing01.
# 42 + 2 + 6 = 50 exactly. Nothing is removed — every query stays
# registered and the pytest mirror in tests/test_queries_oracle.py
# still covers all of them.
_DRIVER_SAMPLE_PREFIX = [
    "cur07_html_main_text", "cur08_gopher_rules",
    "dd01_exact_dup_groups", "dd02_dedup_keep_first",
    "dd05_ngram_jaccard", "dd06_simhash", "dd07_simhash_hamming",
    "dd18_prefix_filter_join", "dq08_fd_profile", "hh02_countmin_audit",
    "ing21_offset_pagination", "maint01_compaction_plan",
    "maint02_retention_plan", "maint03_zone_map_skip",
    "mix03_anneal_schedule", "pack03_packing_efficiency",
    "q51_hll_mergeable_distinct", "ret02_ann_rank_quality",
    "samp07_dsir_importance", "samp08_temporal_split",
    "sim12_pq_topk", "sim13_mmr_rerank", "sim14_sq8_topk",
    "st15_journey_patterns_live", "st16_countmin_live",
    "tx24_tokenizer_fertility", "udtf01_bigram_expand",
    "w04_running_sum", "w05_ntile", "w06_first_last",
    "w12_time_range_window",
    *[f"x{i:02d}" for i in range(1, 11)], "x25_mad_outliers",
    "dd25_simhash_recall_audit", "cls02_classifier_auc_audit",
    "cur09_pseudonymize_ids", "dd08_embedding_near_dup",
    "dd19_span_dedup", "dq09_fd_profile_sampled",
    "ev19_journey_patterns", "ing01_dedup_insert",
]

# Round-15 additions with NO driver row yet, staged for their FIRST row
# in the next round's prefix. EMPTY this round: r15 is an optimization
# round and adds no operators; the two r14-staged names (dd25, cls02)
# were folded into _DRIVER_SAMPLE_PREFIX above, per this list's
# contract. The freshness gate (tools/round_close.py::
# leg_driver_freshness) treats ONLY names listed here as allowed to be
# never-checked outside the prefix.
DRIVER_STAGED_NEXT_ROUND: list[str] = []


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

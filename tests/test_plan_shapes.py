"""Physical-plan regression tests — the scale properties that profiling
bought (see README 'Scale design') must not silently rot:

- filters/column pruning reach the parquet scan;
- star joins broadcast their dimensions (no sort-merge);
- hot aggregations stay hash-based (a string MIN or an inlined split()
  would silently fall back to SortAggregate / quadratic lambdas);
- no driver-side collect in any registered query (checked structurally:
  every query returns a DataFrame, and plans contain no LocalTableScan
  of collected results).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from api_etl_pipeline_spark.registry import all_queries
from tests.conftest import SF_DIR

_Q = all_queries()


def _plan(spark, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _Q[name].fn(spark, SF_DIR).explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    p = _plan(spark, "q03_filter_project")
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert pushed and "GreaterThanOrEqual(l_shipdate" in pushed[0]
    assert "LessThan(l_quantity,24.0)" in pushed[0]


def test_column_pruning_reaches_scan(spark):
    p = _plan(spark, "q03_filter_project")
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    # 11-column table, 6 read (filter + projection columns only)
    assert "l_orderkey" in read and "l_tax" not in read and "l_returnflag" not in read


def test_star_join_broadcasts_dimensions(spark):
    p = _plan(spark, "q18_multiway_join")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_minhash_stays_hash_aggregated(spark):
    p = _plan(spark, "dd03_minhash_signatures")
    assert "SortAggregate" not in p
    assert "HashAggregate" in p


def test_shingle_split_not_inlined(spark):
    # the Generate (explode) must consume a materialized tokens column,
    # not re-evaluate split() per element_at (the quadratic regression)
    p = _plan(spark, "dd03_minhash_signatures")
    gen = [ln for ln in p.splitlines() if "explode" in ln.lower() and "Arguments" in ln]
    assert gen, "no Generate node found"
    assert "split(text" not in gen[0], "split() re-inlined into the shingle lambda"


def test_topk_uses_take_ordered(spark):
    p = _plan(spark, "q16_topk_orders")
    assert "TakeOrderedAndProject" in p


@pytest.mark.parametrize("name", ["q01_pricing_summary", "q02_revenue_by_segment"])
def test_no_cartesian_products(spark, name):
    p = _plan(spark, name)
    assert "CartesianProduct" not in p


def test_q32_exists_folds_into_one_aggregation(spark):
    # the EXISTS / NOT EXISTS pair is answered by ONE per-order
    # aggregation (distinct-supplier counts), not semi/anti self-joins —
    # the self-join shape reshuffles the full lineitem a second time
    p = _plan(spark, "q32_waiting_orders")
    assert "LeftSemi" not in p and "LeftAnti" not in p
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p
    assert "HashAggregate" in p


def test_q33_having_filter_broadcasts_joins(spark):
    # the >300 HAVING shrinks the aggregate below both joins, so neither
    # join may fall back to sort-merge
    p = _plan(spark, "q33_large_volume_customer")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_sim05_candidate_joins_are_hash_joins(spark):
    # codebook-as-literal rebuild: cell assignment is pure projection (no
    # centroid join at all — no nested-loop, no cross join), and the ONLY
    # join left is the equi hash join expanding probes into candidates;
    # embeddings + norms ride through it, so no lookup joins either
    p = _plan(spark, "sim05_ivf_probe_topk")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p
    # exactly one join node, counted on tree lines only ("(n) NodeName")
    # so the assertion is insensitive to how the detail section renders
    import re

    n_bhj = len(re.findall(r"^\(\d+\) BroadcastHashJoin", p, flags=re.M))
    assert n_bhj == 1, f"expected exactly 1 BroadcastHashJoin node, got {n_bhj}"


def test_q41_six_table_join_single_shuffle_join(spark):
    # only lineitem⋈orders may shuffle; the four dimension joins broadcast
    p = _plan(spark, "q41_local_supplier_volume")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_q43_disjunction_stays_single_join(spark):
    # the OR of brand/size/quantity legs must stay one broadcast join with
    # a residual predicate, not a union of three plans
    p = _plan(spark, "q43_disjunctive_pred")
    n_scans = p.count("Location: InMemoryFileIndex")
    assert n_scans == 2, f"disjunction exploded into {n_scans} scans"
    assert "BroadcastHashJoin" in p
    # the implied quantity-range superset of the OR must reach the scan
    assert "GreaterThanOrEqual(l_quantity,1.0)" in p


def test_q44_nested_in_becomes_semi_join(spark):
    p = _plan(spark, "q44_part_promotion")
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_ev02_windows_share_one_exchange(spark):
    # lag, running sum, and the final groupBy all partition on user_id —
    # exactly one exchange may appear in the plan
    p = _plan(spark, "ev02_gaps_islands")
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange$", p, flags=re.M))
    assert n_exchanges == 1, f"expected 1 exchange, plan has {n_exchanges}"


def test_tx08_df_table_broadcasts(spark):
    # round-4 shape: one doc_id token shuffle (serves tf agg AND final
    # argmax), one vocab-collapsed term shuffle, one 1-row n_docs agg —
    # 3 shuffle exchanges, df table broadcast, and NO window sort (the
    # per-doc argmax is a min-of-struct hash aggregation)
    import re

    p = _plan(spark, "tx08_tfidf_top_term")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange$", p, flags=re.M))
    assert n_exchanges == 3, f"expected 3 shuffle exchanges, got {n_exchanges}"
    # no per-doc window: the argmax is a min_by aggregation (it plans as
    # SortAggregate — struct buffers aren't hash-aggregatable — but the
    # sort rides the existing doc_id partitioning: no extra exchange)
    assert "Window" not in p


def test_partition_pruning_on_partitioned_write(spark, tmp_path):
    """Hive-style partitioned writes must prune at the source: a query for
    one event_date reads exactly one partition directory (PartitionFilters
    in the scan, not a post-scan filter) — the 100 TB layout for the
    responses/attempts tables (SCALE.md storage table)."""
    from pyspark.sql import functions as F

    from api_etl_pipeline_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "events_by_date")
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.mode("overwrite").partitionBy("event_date").parquet(out)

    q = (
        spark.read.parquet(out)
        .filter(F.col("event_date") == "2024-01-05")
        .groupBy("event_type")
        .count()
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "event_date" in pf[0], "partition filter did not reach the scan"
    # correctness: pruned read equals filtered full read
    full = {
        (r["event_type"], r["count"])
        for r in ev.filter(F.col("event_date") == "2024-01-05")
        .groupBy("event_type")
        .count()
        .collect()
    }
    pruned = {(r["event_type"], r["count"]) for r in q.collect()}
    assert pruned == full


def test_join_strategy_hints_are_honored(spark):
    """The engine exposes Spark's join-strategy hints: a dimension join
    forced to shuffle-hash / sort-merge must plan that node (how an
    operator author overrides the planner when the statistics lie)."""
    from pyspark.sql import functions as F

    from api_etl_pipeline_spark.tables import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")

    def plan_of(df):
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    smj = plan_of(li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey))
    assert "SortMergeJoin" in smj
    shj = plan_of(li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey))
    assert "ShuffledHashJoin" in shj
    bhj = plan_of(li.join(o.hint("broadcast"), li.l_orderkey == o.o_orderkey))
    assert "BroadcastHashJoin" in bhj


def test_aqe_coalesces_small_shuffles(spark):
    """AQE must shrink the configured 32 shuffle partitions to a handful
    at runtime when the data is tiny — the knob SCALE.md relies on
    instead of hand-tuning spark.sql.shuffle.partitions per query."""
    from pyspark.sql import functions as F

    from api_etl_pipeline_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    out = (
        load_table(spark, SF_SMOKE, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    out.collect()
    n_parts = out.rdd.getNumPartitions()
    assert n_parts < int(spark.conf.get("spark.sql.shuffle.partitions")), (
        f"AQE did not coalesce: {n_parts} partitions"
    )


def test_chunk01_has_zero_exchanges(spark):
    # chunking is pure narrow codegen: no shuffle anywhere in the plan
    p = _plan(spark, "chunk01_sliding_chunks")
    assert "Exchange" not in p


def test_sim04_assignment_is_scan_project(spark):
    # codebook-as-literal: no join, no window, no exchange — scan → project
    p = _plan(spark, "sim04_ivf_assign")
    assert "Exchange" not in p
    assert "Join" not in p
    assert "Window" not in p


def test_decon01_benchmark_set_broadcasts(spark):
    # the benchmark gram set must broadcast (eval sets are tiny vs corpus);
    # per-doc dedup is row-local array_distinct, so no corpus-wide
    # distinct aggregation appears before the broadcast join
    p = _plan(spark, "decon01_ngram_overlap")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_mix01_rates_broadcast_back(spark):
    # per-source keep-rates join map-side; the corpus is never shuffled
    # for the rebalance itself (only the tiny rate/size aggregations)
    p = _plan(spark, "mix01_token_budget_mix")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_samp03_plans_take_ordered(spark):
    # exactly-N sampling must be TakeOrderedAndProject (local heaps),
    # never a global Sort of the corpus
    p = _plan(spark, "samp03_fixed_size_sample")
    assert "TakeOrderedAndProject" in p


def test_dd12_two_exchanges_no_joins(spark):
    # round-4 shape: ONE segment-keyed window shuffle (keep-first) + ONE
    # per-doc rollup — the keep-first decision must never become a
    # self-join (agg + join back would shuffle the segment relation twice)
    import re

    p = _plan(spark, "dd12_segment_dedup_clean")
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange$", p, flags=re.M))
    assert n_exchanges == 2, f"expected 2 exchanges, got {n_exchanges}"
    assert "Join" not in p


def test_tx16_tf_stage_is_map_only(spark):
    # round-4 shape: tf extraction is array-local on the scan; the only
    # exchanges are the query_id repartition (shared by score agg + rank
    # window), the ≤9-row df agg, and the single-row stats agg — 3 total,
    # all small sides broadcast
    import re

    p = _plan(spark, "tx16_bm25_topk")
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange$", p, flags=re.M))
    assert n_exchanges == 3, f"expected 3 exchanges, got {n_exchanges}"
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_ev13_window_and_rollup_share_one_exchange(spark):
    # lead() window and the per-user rollup both partition on user_id
    import re

    p = _plan(spark, "ev13_time_weighted_value")
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange$", p, flags=re.M))
    assert n_exchanges == 1, f"expected 1 exchange, got {n_exchanges}"


def test_st08_dimension_broadcasts(spark):
    p = _plan(spark, "st08_enriched_segment_windows")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_sim10_is_pure_scan_project(spark):
    # the JL sign matrix folds in as literals: no exchange, no join, no
    # Python — a narrow map stage end to end
    import re

    p = _plan(spark, "sim10_random_projection")
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange$", p, flags=re.M))
    assert n_exchanges == 0, f"expected 0 exchanges, got {n_exchanges}"
    assert "Join" not in p


def test_sim12_partial_topk_below_exchange(spark):
    # Round-9 verdict task 5: the per-query top-k must be TakeOrdered-shaped
    # — a PARTIAL WindowGroupLimit (SPARK-37099 rank-limit pushdown) below
    # the query_id exchange, so map tasks emit ≤ k rows per query and the
    # exchange never carries the full scored stream. The simple-string plan
    # prints children below parents, so Partial must appear AFTER Exchange.
    from api_etl_pipeline_spark.registry import all_queries

    df = all_queries()["sim12_pq_topk"].fn(spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    i_exch = p.find("Exchange hashpartitioning(query_id")
    i_partial = p.find("row_number(), 3, Partial")
    i_final = p.find("row_number(), 3, Final")
    assert i_exch != -1, "expected a query_id exchange"
    assert i_partial != -1, "rank-limit pushdown missing: no Partial WindowGroupLimit"
    assert i_final != -1 and i_final < i_exch < i_partial, (
        "Partial WindowGroupLimit must sit upstream (below) the exchange"
    )

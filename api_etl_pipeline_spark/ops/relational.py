"""Relational core: scans, filters, joins, aggregations, sorts, set ops.

Covers SURVEY.md §2.2 (F-rows), §2.3 (J-rows), §2.4 (A-rows), §2.6
(L-rows), §2.7 (set ops) re-expressed as analytics queries over the star
schema. All plans are declarative DataFrame chains so Catalyst applies
predicate pushdown, column pruning, and join selection; at 100 TB the
dimension joins below (region/nation/customer/supplier/part) stay
broadcast-able, and fact-fact joins shuffle on their equi-keys where AQE
can coalesce/skew-split them.

Cross-engine hash-stability conventions (see ops/_compat.py):
- money aggregates go through exact DECIMAL sums (summation order differs
  between engines; round() boundaries differ too — never round doubles);
- integer aggregates cast to BIGINT on both sides (DuckDB sum(int) is
  HUGEINT, Spark is long);
- top-k orderings always carry a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_etl_pipeline_spark.ops._compat import davg, dsum
from api_etl_pipeline_spark.registry import query
from api_etl_pipeline_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- scans / filters / projections -----------------------------------------


@query(
    "q03_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS disc_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q03_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection (F5/F6 analog); filters push to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
            .cast("double")
            .alias("disc_price"),
        )
    )


# --- aggregations -----------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity)                                                          AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)              AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           SUM(l_quantity) / COUNT(l_quantity)                                      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*)::BIGINT                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped rollup (A1/A3 analog): partial aggregation is
    map-side; the only exchange is on the 2-column group key."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax")), 6).alias("sum_charge"),
            (F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice"), 2).alias("avg_price"),
            davg(F.col("l_discount"), 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q06_agg_filter",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*)::BIGINT AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate <  TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped global aggregate over a pushed-down predicate."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q10_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey)::BIGINT AS n_supp,
           COUNT(DISTINCT l_partkey)::BIGINT AS n_part,
           COUNT(*)::BIGINT AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q10_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand + two-phase agg under the hood)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q11_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           GROUPING(l_returnflag)::BIGINT + 2 * GROUPING(l_linestatus)::BIGINT AS grouping_id,
           SUM(l_quantity) AS sum_qty,
           COUNT(*)::BIGINT AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals (§2.4 'not present in reference' — exposed
    as Spark built-in)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count("*").alias("n_rows"),
        (
            F.grouping("l_returnflag").cast("bigint")
            + 2 * F.grouping("l_linestatus").cast("bigint")
        ).alias("grouping_id"),
    ).select(
        F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
        "grouping_id",
        "sum_qty",
        "n_rows",
    )


@query(
    "q12_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>')   AS orderstatus,
           COALESCE(o_orderpriority, '<all>') AS orderpriority,
           GROUPING(o_orderstatus)::BIGINT + 2 * GROUPING(o_orderpriority)::BIGINT AS grouping_id,
           COUNT(*)::BIGINT AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two order dimensions."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice"), 2).alias("sum_price"),
        (
            F.grouping("o_orderstatus").cast("bigint")
            + 2 * F.grouping("o_orderpriority").cast("bigint")
        ).alias("grouping_id"),
    ).select(
        F.coalesce("o_orderstatus", F.lit("<all>")).alias("orderstatus"),
        F.coalesce("o_orderpriority", F.lit("<all>")).alias("orderpriority"),
        "grouping_id",
        "n_orders",
        "sum_price",
    )


@query(
    "q15_having",
    oracle="""
    SELECT l_suppkey, SUM(l_quantity) AS total_qty,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem
    GROUP BY l_suppkey
    HAVING SUM(l_quantity) > 15000
    """,
)
def q15_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.count("*").alias("n_lines"),
        )
        .filter(F.col("total_qty") > 15000)
    )


# --- joins ------------------------------------------------------------------


@query(
    "q02_revenue_by_segment",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*)::BIGINT AS n_lines,
           COUNT(DISTINCT o.o_orderkey)::BIGINT AS n_orders,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q02_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship spine (SURVEY §7.2): fact-fact join on the shuffle key plus a
    broadcast-able dimension join (J1 analog), grouped revenue rollup.

    Plan shape: lineitem is pre-aggregated per orderkey BEFORE the join
    (partial-agg-below-join): the join input shrinks ~4x, the
    COUNT(DISTINCT orderkey) becomes a plain count (no Expand pass), and
    the exact-decimal revenue sum is associative so the two-level sum is
    byte-identical. customer is tiny at every SF — broadcast it."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").alias("_lines"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
        ).alias("_rev"),
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.sum("_lines").alias("n_lines"),
            F.count("o_orderkey").alias("n_orders"),
            F.sum("_rev").cast("double").alias("revenue"),
        )
    )


@query(
    "q04_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def q04_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS (J2-adjacent; reference dedup's positive half)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q05_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def q05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS — the reference's INSERT OR IGNORE dedup
    semantics (S6/J2: insert rows whose key is absent)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q07_outer_join_histogram",
    oracle="""
    SELECT c_count, COUNT(*)::BIGINT AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey)::BIGINT AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q07_outer_join_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped left outer join + double aggregation (null-preserving
    counts: COUNT(col) skips the unmatched side)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q08_full_outer",
    oracle="""
    SELECT COALESCE(c.c_nationkey, s.s_nationkey)::BIGINT AS nationkey,
           COUNT(c.c_custkey)::BIGINT AS n_cust,
           COUNT(s.s_suppkey)::BIGINT AS n_supp
    FROM (SELECT c_custkey, c_nationkey FROM customer) c
    FULL OUTER JOIN (SELECT s_suppkey, s_nationkey FROM supplier) s
      ON c.c_nationkey = s.s_nationkey
    GROUP BY COALESCE(c.c_nationkey, s.s_nationkey)
    """,
)
def q08_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: nations having customers, suppliers, or either."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
        .groupBy(
            F.coalesce(F.col("c_nationkey"), F.col("s_nationkey"))
            .cast("bigint")
            .alias("nationkey")
        )
        .agg(
            F.count("c_custkey").alias("n_cust"),
            F.count("s_suppkey").alias("n_supp"),
        )
    )


@query(
    "q09_cross_join",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name
    FROM region r CROSS JOIN nation n
    """,
)
def q09_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two small dims (BroadcastNestedLoopJoin)."""
    r = _t(spark, sf_dir, "region").select(F.col("r_name").alias("region_name"))
    n = _t(spark, sf_dir, "nation").select(F.col("n_name").alias("nation_name"))
    return r.crossJoin(n)


@query(
    "q18_multiway_join",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*)::BIGINT AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1994-01-01'
    GROUP BY r.r_name, n.n_name
    """,
)
def q18_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join (TPC-H Q5-shaped): one shuffle join on the fact key,
    then a broadcast chain over the dimension tables — the plan Catalyst
    should pick at any scale once the dims are below the broadcast
    threshold."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1994-01-01")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        )
    )


# --- sorts / limits / top-k ---------------------------------------------------


@query(
    "q16_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 15
    """,
)
def q16_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (L3 analog) — TakeOrderedAndProject, no full sort. The
    unique o_orderkey tie-break makes the k-boundary deterministic."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@query(
    "q19_limit_min_one",
    oracle="SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey LIMIT 1",
)
def q19_limit_min_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan-truncation limit with the reference's min-1 guard
    (F11/L1: `[:max(limit, 1)]`, sec_edgar.py:14)."""
    requested_limit = 0  # reference semantics: floor at 1
    r = _t(spark, sf_dir, "region")
    return r.orderBy("r_regionkey").limit(max(requested_limit, 1)).select(
        "r_regionkey", "r_name"
    )


# --- set operations -----------------------------------------------------------


@query(
    "q13_set_ops",
    oracle="""
    SELECT custkey FROM (
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    )
    INTERSECT
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q13_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT with SQL set (distinct) semantics (§2.7)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    rich = c.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("custkey"))
    with_orders = o.select(F.col("o_custkey").alias("custkey"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return building.union(rich).distinct().intersect(with_orders).subtract(urgent)


@query(
    "q17_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q17_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = hash aggregate on all columns."""
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "q14_union_by_name",
    oracle="""
    SELECT nationkey, kind, COUNT(*)::BIGINT AS n
    FROM (
        SELECT c_nationkey::BIGINT AS nationkey, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_nationkey::BIGINT AS nationkey, 'supplier' AS kind FROM supplier
    )
    GROUP BY nationkey, kind
    """,
)
def q14_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) + grouped count over the combined stream."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("bigint").alias("nationkey"),
        F.lit("customer").alias("kind"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("bigint").alias("nationkey"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s).groupBy("nationkey", "kind").agg(F.count("*").alias("n"))


@query(
    "q20_min_cost_supplier",
    oracle="""
    WITH cheapest AS (
        SELECT l_partkey, MIN(l_extendedprice) AS min_price
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l.l_partkey, l.l_suppkey,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
    FROM lineitem l
    JOIN cheapest c ON l.l_partkey = c.l_partkey AND l.l_extendedprice = c.min_price
    """,
)
def q20_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the correlated 'rows equal to the per-group minimum'
    subquery decorrelated into an aggregate + self-join — the plan Catalyst
    produces for the correlated form as well. (Float equality is safe:
    both sides compare the same stored doubles, no arithmetic.)"""
    li = _t(spark, sf_dir, "lineitem").alias("l")
    cheapest = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("c_partkey"))
        .agg(F.min("l_extendedprice").alias("min_price"))
    )
    return (
        li.join(
            cheapest,
            (F.col("l.l_partkey") == F.col("c_partkey"))
            & (F.col("l.l_extendedprice") == F.col("min_price")),
        )
        .select(
            F.col("l.l_partkey").alias("l_partkey"),
            "l_suppkey",
            F.col("l.l_extendedprice").cast("decimal(18,2)").cast("double").alias("price"),
        )
    )


@query(
    "q29_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q29_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate → scalar-subquery max → equality filter.
    The exact-decimal revenue makes the max comparison deterministic (no
    float-equality hazard across engines)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q30_promo_share",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                    THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS promo_share,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
)
def q30_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio per month (promo revenue
    share). Both sums are exact decimals; the single final division is the
    only float op — deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").cast("timestamp_ntz").alias("ship_month"))
        .agg(
            (F.sum(promo).cast("double") / F.sum(rev).cast("double")).alias("promo_share"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q31_small_qty_revenue",
    oracle="""
    WITH avg_qty AS (
        SELECT l_partkey AS ap_partkey,
               SUM(l_quantity) / COUNT(l_quantity) AS part_avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem l
    JOIN avg_qty a ON l.l_partkey = a.ap_partkey
    WHERE l.l_quantity < 0.5 * a.part_avg_qty
    """,
)
def q31_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average decorrelated into an
    aggregate + join; the threshold comparison is deterministic because
    the per-part average is an exact-integer sum divided once."""
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.sum("l_quantity") / F.count("l_quantity")).alias("part_avg_qty")
    )
    return (
        li.join(avg_qty, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("part_avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_lines"),
        )
    )


_DUCK_LATE_LINES = """
    SELECT l.l_orderkey, l.l_suppkey
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
"""


@query(
    "q32_waiting_orders",
    oracle=f"""
    WITH late AS ({_DUCK_LATE_LINES})
    SELECT s.s_name, COUNT(*)::BIGINT AS numwait
    FROM late l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
      AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          )
    GROUP BY s.s_name
    """,
)
def q32_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone shipped late (>60 days after
    order date, finalized orders) in a multi-supplier order.

    The EXISTS + NOT EXISTS pair is NOT executed as semi/anti self-joins
    (that shape reshuffles the full lineitem a second time for the semi
    probe). Both quantifiers are order-scoped facts answered by
    aggregation — and the distinct-supplier counts are computed as a
    TWO-LEVEL aggregation, (l_orderkey, l_suppkey) grain then l_orderkey,
    rather than two count_distincts in one groupBy: multi-distinct plans
    through an Expand that triples every joined row before the exchange,
    while both levels here cluster on l_orderkey so Catalyst reuses the
    join's partitioning — two big exchanges total, no Expand, and the
    map-side partial agg compacts each level before any wire transfer
    (~25% faster at sf0.1, and the savings grow with row width at scale).
    EXISTS other-supplier ⇔ n_supp ≥ 2; NOT EXISTS other-late ⇔
    n_late_supp = 1, whose sole supplier max() recovers. Then a broadcast
    supplier join over the tiny qualified set. (Testdata has no
    receiptdate/commitdate, so lateness is ship-lag.)"""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    joined = li.join(o, li.l_orderkey == o.o_orderkey, "left").select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("o_orderdate").isNotNull()
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        ).alias("is_late"),
    )
    per_supp = joined.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late"),
        F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("late_lines"),
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.when(F.col("supp_late"), 1).otherwise(0)).alias("n_late_supp"),
        F.max(F.when(F.col("supp_late"), F.col("l_suppkey"))).alias("sole_supp"),
        F.sum(F.when(F.col("supp_late"), F.col("late_lines")).otherwise(0)).alias(
            "n_late_lines"
        ),
    )
    qualified = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        qualified.join(F.broadcast(s), qualified.sole_supp == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("bigint").alias("numwait"))
    )


@query(
    "q33_large_volume_customer",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q33_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 300, joined
    back to their customers. The HAVING filter shrinks the aggregate to a
    few hundred keys before any join, so both joins broadcast (AQE would
    convert them anyway; the hint makes the plan explicit). Quantities are
    integer-valued doubles — SUM is exact and order-independent."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp_ntz").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
    )


@query(
    "q35_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*)::BIGINT AS n_lines
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l.l_shipdate)::BIGINT AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1995-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q35_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation pair per year — a
    6-table join with a disjunctive cross-dimension predicate. The
    disjunction spans two dimensions so Catalyst can't push it down, but
    it IMPLIES each side's nation is one of the pair — so we push that
    weaker predicate manually: supplier and customer are pre-joined to
    the two-nation slice (broadcast), which prunes ~92% of lineitem and
    orders BEFORE the only fact-fact shuffle. The exact pair filter then
    runs on the tiny joined remainder. At 100 TB this manual inference is
    the difference between shuffling the full fact tables and shuffling
    2/25ths of them."""
    pair_nations = ("NATION_1", "NATION_2")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair_nations))
    s2 = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c2 = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    pair = (
        (F.col("supp_nation") == pair_nations[0]) & (F.col("cust_nation") == pair_nations[1])
    ) | ((F.col("supp_nation") == pair_nations[1]) & (F.col("cust_nation") == pair_nations[0]))
    return (
        li.join(F.broadcast(s2), li.l_suppkey == s2.s_suppkey)
        .join(o.join(F.broadcast(c2), o.o_custkey == c2.c_custkey),
              li.l_orderkey == o.o_orderkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q36_market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                    THEN CAST(volume AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share,
           COUNT(*)::BIGINT AS n_lines
    FROM (
        SELECT year(o.o_orderdate)::BIGINT AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    )
    GROUP BY o_year
    """,
)
def q36_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for a part
    type, per year — the widest join in the suite (8 tables). Every
    dimension broadcasts; the part-type filter is applied before the
    lineitem join so the fact stream shrinks at its first join; the
    region filter prunes the customer side the same way. The share is a
    conditional-decimal / total-decimal division done once per group —
    deterministic across engines."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(F.col("n_nationkey").alias("n1_key"))
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    c2 = (
        c.join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .select("c_custkey")
    )
    s2 = (
        s.join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select("s_suppkey", "supp_nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    share_num = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s2), li.l_suppkey == s2.s_suppkey)
        .join(o.join(F.broadcast(c2), o.o_custkey == c2.c_custkey),
              li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (F.sum(share_num).cast("double") / F.sum(vol).cast("double")).alias("mkt_share"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q37_returned_item_topk",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue,
           COUNT(*)::BIGINT AS n_lines
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1995-10-01'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q37_returned_item_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in one
    quarter. The quarter filter prunes orders at the scan; the returnflag
    filter prunes lineitem at the scan; the group key is the customer
    (cardinality ≫ cores — no hot reducer), and the final top-20 plans
    as TakeOrderedAndProject (per-partition heaps + driver merge, never a
    global sort). Revenue is an exact decimal sum, and c_custkey breaks
    ties so LIMIT is deterministic across engines."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "q34_dormant_rich_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS ab
        FROM customer WHERE c_acctbal > 0
    ),
    active AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    )
    SELECT c.c_nationkey, COUNT(*)::BIGINT AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM active a WHERE a.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
)
def q34_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders (none since 2000-01-01), rolled up per nation. The scalar
    average is an exact decimal sum divided once (bit-identical across
    engines, so the > threshold never flips); the NOT EXISTS is a
    left-anti join against the distinct active-customer keys — at scale
    the distinct pre-shrinks the anti-join build side by the order
    multiplicity."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((dsum(F.col("c_acctbal"), 2) / F.count("*")).alias("ab"))
    )
    active = (
        o.filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(active, c.c_custkey == active.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
    )

"""Classic decision-support query shapes (TPC-H Q3/Q4/Q5/Q9/Q12/Q19/Q20)
adapted to the testdata star schema (no partsupp/shipmode/commitdate
columns — each docstring names the substitution).

These widen §2.3/§2.4 coverage with the join/agg patterns the round-1 set
did not yet exercise: date-windowed 3-way join with top-k
(q39), EXISTS with a non-equi correlated predicate (q40), a 6-table join
chain with a cross-dimension equality (q41), conditional counts (q42),
join under a disjunction of conjunctions (q43), nested-aggregate IN
(q44), and a multi-fact profit rollup (q45).

Scale notes (100 TB): every dimension here (region/nation/supplier/part/
customer at TPC-H ratios) broadcasts; the only shuffles are fact-side
groupBys on their natural keys. q41's customer-nation == supplier-nation
equality is applied AFTER the equi-joins as a cheap filter rather than as
a join key, so no extra exchange is introduced. q43's disjunction is a
single scan-side predicate (Catalyst pushes the p_brand/p_size legs into
the broadcast-hash-join build side; no union-of-three-scans blowup).

Reference parity: the reference has no joins beyond its FK lookup
(storage/db.py:29) — these shapes are the analytics layer mandated by
SURVEY.md §2.3 ("the analytics layer will still expose the standard join
suite") and BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_etl_pipeline_spark.ops._compat import dsum
from api_etl_pipeline_spark.registry import query
from api_etl_pipeline_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_REV_DEC = "CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))"


@query(
    "q39_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-03-15'
      AND l.l_shipdate  > TIMESTAMP '1996-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q39_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue top-k for one market segment
    (o_orderpriority stands in for the missing o_shippriority). The
    customer filter broadcasts; revenue is an exact decimal sum so the
    ORDER BY doubles are bit-identical cross-engine, with l_orderkey as
    the unique tie-break."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1996-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-03-15")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q40_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*)::BIGINT AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          )
    GROUP BY o.o_orderpriority
    """,
)
def q40_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a quarter with at least one line shipped
    >30 days after the order date (ship-lag substitutes for the missing
    commit/receipt dates). The correlated EXISTS decorrelates into a
    left-semi join whose condition carries the non-equi lag predicate —
    one shuffle on l_orderkey, then a tiny groupBy."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "q41_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue,
           COUNT(*)::BIGINT AS n_lines
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q41_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from lines where the customer and supplier
    share a nation inside one region/year. Six tables, but only the
    lineitem⋈orders join shuffles — supplier/nation/region/customer all
    broadcast, and the customer-nation == supplier-nation condition is a
    post-join filter, not an extra exchange."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(rev).alias("revenue"), F.count("*").alias("n_lines"))
    )


@query(
    "q42_priority_shipping",
    oracle="""
    SELECT l.l_linestatus,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q42_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts of high- vs low-priority order
    lines per line status (l_linestatus stands in for the missing
    l_shipmode). Integer CASE sums — exact on both engines."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q43_disjunctive_pred",
    oracle=f"""
    SELECT CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q43_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a disjunction of brand/size/quantity
    conjunctions (p_size substitutes for the missing p_container). Stays
    ONE broadcast join with a residual OR predicate — Catalyst derives the
    implied p_brand IN (...) superset predicate and pushes it to the part
    scan, rather than a union of three plans."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    leg = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & q.between(qlo, qhi)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(leg("Brand#12", 15, 1, 11) | leg("Brand#23", 25, 10, 20) | leg("Brand#3", 35, 20, 30))
        .agg(dsum(rev).alias("revenue"), F.count("*").alias("n_lines"))
    )


@query(
    "q44_part_promotion",
    oracle="""
    SELECT s.s_name, s.s_suppkey
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE 'red%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(l.l_quantity) > 50
    )
    """,
)
def q44_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved >50 units of some 'red%' part
    in a year (the partsupp availability threshold becomes a fixed
    quantity threshold). Nested aggregate-IN decorrelates into
    groupBy → left-semi; the inner aggregate shrinks lineitem to
    (suppkey, partkey) pairs before the semi join, so the join input is
    tiny and broadcasts."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    s = _t(spark, sf_dir, "supplier")
    movers = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return s.join(
        F.broadcast(movers), s.s_suppkey == movers.l_suppkey, "left_semi"
    ).select("s_name", "s_suppkey")


@query(
    "q45_profit_by_nation",
    oracle="""
    SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                    - CAST(0.6 * p.p_retailprice * l.l_quantity AS DECIMAL(18,4)))
                AS DOUBLE) AS profit,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q45_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year for one part
    family; cost is 0.6 × retail price × quantity (partsupp.ps_supplycost
    does not exist in the testdata). The cost product is evaluated with
    identical left-associated IEEE ops on both engines, then snapped to an
    exact decimal before the order-independent SUM. Orders is the only
    non-broadcast join side besides lineitem itself."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    cost = (F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(
            F.sum(rev - cost).cast("double").alias("profit"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q46_important_stock_nations",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS nation_bal,
           COUNT(*)::BIGINT AS n_suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_acctbal > 0
    GROUP BY n.n_name
    HAVING CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) >
           (SELECT 0.04 * CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
            FROM supplier WHERE s_acctbal > 0)
    """,
)
def q46_important_stock_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose share of a GLOBAL aggregate exceeds
    a fraction (supplier account balances stand in for the missing
    partsupp stock value). The scalar total broadcasts to the HAVING
    filter; both sides of the comparison are exact-decimal sums cast to
    double and scaled by the same literal, so the boundary decision is
    IEEE-identical cross-engine."""
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0)
    n = _t(spark, sf_dir, "nation")
    bal = F.col("s_acctbal").cast("decimal(18,2)")
    total = s.agg(F.sum(bal).cast("double").alias("total"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(bal).cast("double").alias("nation_bal"),
            F.count("*").alias("n_suppliers"),
        )
        .join(F.broadcast(total), F.col("nation_bal") > 0.04 * F.col("total"))
        .select("n_name", "nation_bal", "n_suppliers")
    )


@query(
    "q47_parts_supplier_relationship",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT LIKE 'small%'
      AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
          )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q47_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute group
    with negated predicates and a NOT IN supplier exclusion (lineitem is
    the part↔supplier relation since partsupp doesn't exist; '%7' names
    stand in for the complaints pattern). NOT IN over the non-null key
    becomes a broadcast left-anti join; the distinct-agg shuffles once on
    the group keys."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & ~F.col("p_type").startswith("small")
    )
    excluded = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_name").endswith("7"))
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q48_range_join_banded",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           COUNT(c.event_id)::BIGINT AS clicks_last_hour,
           CAST(SUM(CAST(COALESCE(c.value, 0) AS DECIMAL(18,2))) AS DOUBLE) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts > p.ts - INTERVAL 1 HOUR
     AND c.ts <= p.ts
    GROUP BY p.event_id, p.user_id
    """,
)
def q48_range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join — q22's semantics (clicks in the hour before
    each purchase) with the hour-bucket IN THE JOIN KEY. q22 shuffles on
    user_id alone and evaluates the range predicate inside each key
    group: O(purchases × clicks) per user, which melts down on power
    users at 100 TB. Here each purchase explodes into its two candidate
    hour buckets and the join key is (user_id, hour_bucket), so a key
    group only holds one user-hour of clicks — per-key work is bounded
    by activity density, not total history, and the hot-user skew moves
    into MORE keys instead of bigger ones. Each click lives in exactly
    one bucket, so no dedup is needed; purchases with no clicks are
    restored by the left join of aggregated counts back onto the
    purchase set. Identical oracle to q22 — the rewrite is
    result-preserving by construction and by differential check."""
    e = load_table(spark, sf_dir, "events")
    hb = lambda c: F.floor(F.unix_timestamp(c) / 3600).cast("bigint")  # noqa: E731
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            hb(F.col("ts")).alias("p_hb"),
        )
        .withColumn("hb", F.explode(F.array(F.col("p_hb"), F.col("p_hb") - 1)))
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
        hb(F.col("ts")).alias("hb"),
    )
    matched = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (p.hb == c.hb)
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).groupBy("purchase_id").agg(
        F.count("click_id").alias("n_clicks"),
        F.sum(F.col("c_value").cast("decimal(18,2)")).alias("v_sum"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id"
    )
    return purchases.join(matched, "purchase_id", "left").select(
        "purchase_id",
        "user_id",
        F.coalesce(F.col("n_clicks"), F.lit(0)).cast("bigint").alias("clicks_last_hour"),
        F.coalesce(F.col("v_sum"), F.lit(0).cast("decimal(18,2)"))
        .cast("double")
        .alias("click_value"),
    )


@query(
    "q49_null_safe_join",
    oracle="""
    WITH c AS (
        SELECT NULLIF(c_custkey % 7, 3) AS bucket, COUNT(*)::BIGINT AS n_cust
        FROM customer GROUP BY 1
    ),
    o AS (
        SELECT NULLIF(o_orderkey % 7, 3) AS bucket, COUNT(*)::BIGINT AS n_ord
        FROM orders GROUP BY 1
    )
    SELECT c.bucket AS bucket, c.n_cust, o.n_ord
    FROM c JOIN o ON c.bucket IS NOT DISTINCT FROM o.bucket
    """,
)
def q49_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe join semantics: NULL keys MATCH each other (Spark
    eqNullSafe / <=>, DuckDB IS NOT DISTINCT FROM) — the opposite of
    ordinary equi-join NULL dropping, and the semantics a dedup merge
    needs when the key itself is nullable. The NULLIF-manufactured NULL
    bucket on both sides proves the NULL row survives the join on both
    engines. Note eqNullSafe keys still hash-partition normally (all
    NULLs co-locate) — no cartesian fallback."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.nullif(F.col("c_custkey") % 7, F.lit(3)).alias("bucket"))
        .agg(F.count("*").alias("n_cust"))
    )
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.nullif(F.col("o_orderkey") % 7, F.lit(3)).alias("b2"))
        .agg(F.count("*").alias("n_ord"))
    )
    return c.join(o, F.col("bucket").eqNullSafe(F.col("b2"))).select(
        "bucket", "n_cust", "n_ord"
    )


@query(
    "q50_salted_skew_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*)::BIGINT AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           CAST(SUM(l_quantity) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q50_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage aggregation (ops/skew.py::salted_agg) proven
    result-identical to the plain groupBy by the differential oracle —
    the ing18 pattern applied to the salting rewrite. l_returnflag has
    only 3 values (extreme key skew by construction): the salt spreads
    each hot key over 16 reducers in stage one, and stage two merges 48
    partial rows. Decimal partials keep the two-stage sum exact, so the
    rewrite is hash-identical, not approximately equal."""
    from api_etl_pipeline_spark.ops.skew import salted_agg

    li = _t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        key="l_returnflag",
        spread_col="l_orderkey",
        aggs={
            "n_lines": (F.count("*"), F.sum),
            "total_price_dec": (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")),
                F.sum,
            ),
            "total_qty_d": (F.sum("l_quantity"), F.sum),
        },
    )
    return out.select(
        "l_returnflag",
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("total_price_dec").cast("double").alias("total_price"),
        F.col("total_qty_d").cast("bigint").alias("total_qty"),
    )

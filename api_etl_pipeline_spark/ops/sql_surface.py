"""Shared-dialect SQL surface: queries whose ONE ANSI SQL string runs
verbatim on BOTH Spark SQL and the DuckDB oracle.

This is the strongest form of the driver's differential check — there is
no Spark-side translation at all, so any result divergence would be an
engine-semantics difference, not a query-authoring difference. It also
demonstrates the `spark.sql` entry point as a first-class engine surface
(the reference has no SQL surface; SURVEY.md §2 mandates the analytics
layer expose one).

Dialect discipline (the subset both engines parse identically):
- CAST(x AS BIGINT/DOUBLE/DECIMAL(p,s)) — never `::` casts;
- TIMESTAMP 'literal' date bounds;
- exact-decimal money sums (ops/_compat.py convention) spelled longhand;
- ROW_NUMBER over (ORDER BY double DESC, unique_key) with CAST to
  BIGINT (DuckDB row_number is BIGINT, Spark's is INT);
- GROUPING SETS with COALESCE'd labels for the super-aggregate rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from api_etl_pipeline_spark.registry import query
from api_etl_pipeline_spark.tables import register_views

_QSQL01 = """
    WITH rev AS (
        SELECT c.c_nationkey AS nationkey, c.c_custkey, c.c_name,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY c.c_nationkey, c.c_custkey, c.c_name
    )
    SELECT n.n_name, r.c_custkey, r.c_name, r.revenue,
           CAST(r.rnk AS BIGINT) AS rnk
    FROM (
        SELECT rev.*,
               ROW_NUMBER() OVER (
                   PARTITION BY nationkey ORDER BY revenue DESC, c_custkey
               ) AS rnk
        FROM rev
    ) r JOIN nation n ON r.nationkey = n.n_nationkey
    WHERE r.rnk <= 3
"""

_QSQL02 = """
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(CAST(year(o_orderdate) AS BIGINT), -1) AS o_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY GROUPING SETS (
        (o_orderpriority, year(o_orderdate)),
        (o_orderpriority),
        ()
    )
"""


@query("qsql01_topk_per_nation_shared_sql", oracle=_QSQL01)
def qsql01_topk_per_nation_shared_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by lifetime revenue per nation — the SAME SQL
    string Catalyst plans here is the DuckDB oracle (zero translation).
    Plan: one fact shuffle for the grouped revenue, broadcast nation
    join, per-nation window on the already-small aggregate."""
    register_views(spark, sf_dir)
    return spark.sql(_QSQL01)


@query("qsql02_grouping_sets_shared_sql", oracle=_QSQL02)
def qsql02_grouping_sets_shared_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-year order rollup over GROUPING SETS — same verbatim-SQL
    contract as qsql01, exercising super-aggregate NULL semantics and
    the exact-decimal money convention in shared dialect."""
    register_views(spark, sf_dir)
    return spark.sql(_QSQL02)


_QSQL03 = """
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o2
            WHERE o2.o_custkey = c.c_custkey
              AND o2.o_orderstatus = 'F'
              AND o2.o_totalprice > 400000
          )
"""

_QSQL04 = """
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_run
                AS DOUBLE) AS running_spend,
           CAST(COUNT(*) OVER w_last3 AS BIGINT) AS last3
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_last3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


@query("qsql03_exists_not_exists_shared_sql", oracle=_QSQL03)
def qsql03_exists_not_exists_shared_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS + IN-list in shared dialect — both engines
    decorrelate to semi/anti joins from the same verbatim string."""
    register_views(spark, sf_dir)
    return spark.sql(_QSQL03)


@query("qsql04_window_frames_shared_sql", oracle=_QSQL04)
def qsql04_window_frames_shared_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clauses with explicit ROWS frames (running exact-
    decimal spend + trailing count) in shared dialect; ordering is total
    on (o_orderdate, o_orderkey) per the duplicate-key rule. Dialect
    trap: `OVER (w ROWS ...)` — extending a named window inline — parses
    in DuckDB but not Spark, so each frame gets its own named window."""
    register_views(spark, sf_dir)
    return spark.sql(_QSQL04)


_QSQL05 = """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
"""

_QSQL06 = """
    SELECT c.c_custkey, c.c_acctbal,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders,
           CAST((SELECT MAX(o2.o_totalprice) FROM orders o2
                 WHERE o2.o_custkey = c.c_custkey) AS DOUBLE) AS max_order
    FROM customer c
    WHERE c.c_custkey < 500
"""


@query("qsql05_set_ops_shared_sql", oracle=_QSQL05)
def qsql05_set_ops_shared_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT chain in shared dialect: both engines apply
    standard precedence (INTERSECT binds tighter than EXCEPT, so this is
    (A ∩ B) − C) and identical DISTINCT set semantics."""
    register_views(spark, sf_dir)
    return spark.sql(_QSQL05)


@query("qsql06_correlated_scalar_shared_sql", oracle=_QSQL06)
def qsql06_correlated_scalar_shared_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in the SELECT list — both engines
    decorrelate to aggregated left joins from the same string; COUNT is
    0 (not NULL) for order-less customers on both, MAX stays NULL."""
    register_views(spark, sf_dir)
    return spark.sql(_QSQL06)


_QSQL07 = """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
        SELECT c_name, c_acctbal FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 1
    ) t
"""


@query("qsql07_lateral_topk_shared_sql", oracle=_QSQL07)
def qsql07_lateral_topk_shared_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL top-1 per nation from one verbatim string —
    both engines decorrelate the ordered-limit lateral subquery (Spark
    plans it as a ranked window join). Nations with no customers drop
    (inner lateral) identically; tie-break on c_custkey keeps the
    ordered LIMIT deterministic."""
    register_views(spark, sf_dir)
    return spark.sql(_QSQL07)


_QSQL08 = """
    SELECT m.canonical_op, COUNT(*) AS n_orders
    FROM orders o
    JOIN (VALUES ('1-URGENT', 'expedite'),
                 ('2-HIGH', 'expedite'),
                 ('3-MEDIUM', 'standard'),
                 ('4-NOT SPECIFIED', 'standard'),
                 ('5-LOW', 'defer')) AS m(raw_priority, canonical_op)
      ON o.o_orderpriority = m.raw_priority
    GROUP BY m.canonical_op
"""


@query("qsql08_values_decode_shared_sql", oracle=_QSQL08)
def qsql08_values_decode_shared_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES decode table joined in shared dialect — the X16
    operator-name normalization (docs/Golden_Record_API_Dossiers.md
    :547,588-594: eq→equals-style mapping) as a literal dimension both
    engines broadcast. COUNT stays uncast here deliberately: both
    engines type plain COUNT(*) as BIGINT, pinning that the bare
    aggregate needs no dialect shim."""
    register_views(spark, sf_dir)
    return spark.sql(_QSQL08)


_QSQL09 = """
    WITH RECURSIVE bounds AS (
        SELECT CAST(year(MIN(o_orderdate)) AS INT) * 12
                   + CAST(month(MIN(o_orderdate)) AS INT) - 1 AS lo,
               CAST(year(MAX(o_orderdate)) AS INT) * 12
                   + CAST(month(MAX(o_orderdate)) AS INT) - 1 AS hi
        FROM orders
    ),
    months(mi, hi) AS (
        SELECT lo, hi FROM bounds
        UNION ALL
        SELECT mi + 1, hi FROM months WHERE mi < hi
    ),
    actual AS (
        SELECT CAST(year(o_orderdate) AS INT) * 12
                   + CAST(month(o_orderdate) AS INT) - 1 AS mi,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY 1
    )
    SELECT CAST(FLOOR(m.mi / 12.0) AS BIGINT) AS o_year,
           CAST(m.mi % 12 + 1 AS BIGINT) AS o_month,
           COALESCE(a.n_orders, 0) AS n_orders,
           COALESCE(a.total, 0.0) AS total
    FROM months m LEFT JOIN actual a ON a.mi = m.mi
"""


@query("qsql09_recursive_cte_shared_sql", oracle=_QSQL09)
def qsql09_recursive_cte_shared_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled monthly order series via WITH RECURSIVE (Spark 4's
    recursive-CTE support, same verbatim text on DuckDB): the recursion
    generates the complete month axis from the data's own bounds, so
    gap months surface as explicit zero rows — the time-series
    densification pattern ev05 does for days, here in pure shared SQL.
    Dialect notes: month index is an INT (date+INTERVAL month returns
    different types across engines) and the year split uses
    FLOOR(mi/12.0) because bare int division also diverges (Spark
    truncates after double-div; DuckDB CAST rounds). The stop bound
    rides through the recursion AS A COLUMN rather than a scalar
    subquery: Spark re-executes subqueries in the recursive arm on
    EVERY step (a full scan+agg per iteration — measured 8× slower);
    carrying it as data makes each step a pure local increment."""
    register_views(spark, sf_dir)
    return spark.sql(_QSQL09)

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

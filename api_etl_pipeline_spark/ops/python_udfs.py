"""The remaining Python-extension surfaces: grouped-aggregate pandas UDF
(UDAF) and Python UDTF — completing the engine's UDF story alongside the
scalar pandas_udf (ingest/dedup.py bloom probe), mapInPandas
(llm_ops/multimodal.py, similarity.py sim06), applyInPandas
(ops/advanced.py), and applyInPandasWithState (streaming/stateful.py).

Both carry full DuckDB oracles: the UDAF does its arithmetic on exact
integer cents so the single final division is IEEE-identical to the
oracle's decimal formulation, and the UDTF's n-gram expansion has an
exact SQL twin. That a Python extension point can still be
differentially verified against ANSI SQL is the point — extension ≠
escape hatch from the correctness gate.

Scale: grouped-agg pandas UDFs get Spark's normal partial shuffle only
for the grouping (full rows per group move to one executor — use only
when the aggregate genuinely can't be expressed with built-ins);
Arrow-optimized UDTFs stream batches through the Python worker like any
Generate node. Neither collects to the driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_etl_pipeline_spark.registry import query
from api_etl_pipeline_spark.tables import load_table


def _make_weighted_mean_udaf():
    """Closure-built (cloudpickle by-value) grouped-agg pandas UDF:
    quantity-weighted mean price from exact integer cents — the pandas
    computation is order-independent integer summation, so the result is
    bit-identical to the oracle's DECIMAL formulation."""
    from pyspark.sql.functions import pandas_udf

    # the pd.Series annotations must resolve from MODULE globals (that is
    # where get_type_hints looks when pandas_udf infers GROUPED_AGG from
    # the Series -> scalar signature); the function itself stays a
    # closure so cloudpickle ships it by value
    @pandas_udf("double")
    def weighted_mean_price(price: pd.Series, qty: pd.Series) -> float:
        cents = (price * 100).round().astype("int64")
        iqty = qty.astype("int64")
        num = int((cents * iqty).sum())  # exact: < 2^53
        den = int(iqty.sum())
        # num/100 is the exact decimal dollar total correctly rounded to
        # double (same value the oracle's DECIMAL->DOUBLE cast yields);
        # then ONE division by the exact integer weight sum
        return (num / 100.0) / float(den)

    # grouped-agg pandas UDFs cannot mix with built-in aggregates in one
    # agg() (INVALID_PANDAS_UDF_PLACEMENT) — the companion metrics are
    # pandas aggregates too, so the whole groupBy stays one operator
    @pandas_udf("bigint")
    def qty_sum(qty: pd.Series) -> int:
        return int(qty.astype("int64").sum())

    @pandas_udf("bigint")
    def row_count(qty: pd.Series) -> int:
        return int(len(qty))

    return weighted_mean_price, qty_sum, row_count


@query(
    "udaf01_weighted_mean_pandas",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(SUM(l_quantity) AS DOUBLE)                  AS weighted_mean_price,
           CAST(SUM(l_quantity) AS BIGINT)                      AS total_qty,
           COUNT(*)::BIGINT                                     AS n_lines
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def udaf01_weighted_mean_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the UDAF surface): quantity-weighted
    mean price per (returnflag, linestatus). The Python side sums exact
    integer cents; the oracle sums exact decimals — same value, one
    division, hash-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    wmean, qty_sum, row_count = _make_weighted_mean_udaf()
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        wmean(F.col("l_extendedprice"), F.col("l_quantity")).alias(
            "weighted_mean_price"
        ),
        qty_sum(F.col("l_quantity")).alias("total_qty"),
        row_count(F.col("l_quantity")).alias("n_lines"),
    )


@query(
    "udtf01_bigram_expand",
    oracle="""
    SELECT doc_id,
           (i - 1)::BIGINT AS pos,
           concat(toks[i], ' ', toks[i + 1]) AS bigram
    FROM (
        SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE doc_id < 100
        )
    )
    """,
)
def udtf01_bigram_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function surface): expand each document into
    positional bigrams via a lateral join — the UDTF emits (pos, bigram)
    rows per input row, exactly like tx05's JVM-side transform/explode
    but through the user-extensible table-function protocol. Verified
    against a pure-SQL generate_series twin."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, bigram string")
    class BigramUDTF:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield i, f"{toks[i]} {toks[i + 1]}"

    spark.udtf.register("engine_bigrams", BigramUDTF)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.createOrReplaceTempView("udtf01_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.bigram
        FROM udtf01_docs d, LATERAL engine_bigrams(d.text) t
        """
    )

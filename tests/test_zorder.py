"""Z-order layout effectiveness: range-clustering by the Morton key must
keep BOTH dimensions locally clustered, where a single-column sort only
clusters one.

The metric mirrors parquet min/max pruning: for each output partition
(stand-in for a file), the fraction of the [0,256) domain its min..max
span covers is the probability a random point predicate on that dimension
CANNOT prune the file. Lower = better pruning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from api_etl_pipeline_spark.registry import all_queries
from tests.conftest import SF_DIR

N_FILES = 16


def _avg_spans(df):
    spans = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("cust_bucket") - F.min("cust_bucket") + 1).alias("cust_span"),
            (F.max("day_bucket") - F.min("day_bucket") + 1).alias("day_span"),
        )
        .agg(F.avg("cust_span").alias("c"), F.avg("day_span").alias("d"))
        .collect()[0]
    )
    return spans["c"], spans["d"]


def test_zorder_clusters_both_dimensions(spark):
    z = all_queries()["x23_zorder_interleave"].fn(spark, SF_DIR)

    zordered = z.repartitionByRange(N_FILES, "z_value").sortWithinPartitions("z_value")
    single = z.repartitionByRange(N_FILES, "cust_bucket").sortWithinPartitions(
        "cust_bucket"
    )

    zc, zd = _avg_spans(zordered)
    sc, sd = _avg_spans(single)

    # single-key layout: near-perfect on its own key, useless on the other
    assert sc <= 40
    assert sd >= 200
    # z-order: both dimensions meaningfully clustered (≈64–128 of 256) —
    # every file prunes on EITHER predicate
    assert zc <= 160 and zd <= 160
    # and the worst z-order dimension beats the single-key layout's
    # neglected dimension by a wide margin
    assert max(zc, zd) < sd * 0.75

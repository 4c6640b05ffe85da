"""Bucketed co-located join: writing both join sides bucketed by the join
key lets Spark plan the join with ZERO exchanges — the 100 TB pattern for
repeated fact-fact joins (bucket pruning + shuffle elimination).

The assertion is on the physical plan: a SortMergeJoin with no Exchange
operators under it.
"""

from __future__ import annotations

import contextlib
import io
import uuid

import pytest
from pyspark.sql import functions as F

from api_etl_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark):
    suffix = uuid.uuid4().hex[:8]
    li_t, o_t = f"li_b_{suffix}", f"o_b_{suffix}"
    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders")
    try:
        (
            li.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(li_t)
        )
        (
            o.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(o_t)
        )
    except Exception as e:  # pragma: no cover - metastore-less environments
        pytest.skip(f"managed tables unavailable: {e}")

    # force the non-broadcast path (testdata is tiny; at scale both sides
    # are facts and broadcast is off the table anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(li_t)
            .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in join_section, (
            f"bucketed join still shuffles:\n{join_section}"
        )

        # and it's not just a plan artifact — the join answers correctly
        n = joined.agg(F.sum("n")).collect()[0][0]
        assert n == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    spark.sql(f"DROP TABLE IF EXISTS {li_t}")
    spark.sql(f"DROP TABLE IF EXISTS {o_t}")

"""As-of join: the scalable union-tag-window composition vs a per-group
pandas merge_asof fallback (the §2.10 applyInPandas surface) must agree.
Also pins the inclusive-match and no-match edge semantics."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from api_etl_pipeline_spark.ops.advanced import asof_join_last, q21_asof_join
from api_etl_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_asof_matches_pandas_merge_asof(spark):
    e = load_table(spark, SF_SMOKE, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")

    got = {
        (r.purchase_id, r.asof_ts)
        for r in asof_join_last(
            purchases, clicks, "user_id", "purchase_ts", "ts", ["ts"]
        ).collect()
    }

    pdf_p = purchases.toPandas().sort_values("purchase_ts")
    pdf_c = clicks.toPandas().sort_values("ts")
    merged = pd.merge_asof(
        pdf_p,
        pdf_c.rename(columns={"ts": "click_ts"}),
        left_on="purchase_ts",
        right_on="click_ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    want = {
        (int(r.purchase_id), None if pd.isna(r.click_ts) else r.click_ts.to_pydatetime())
        for r in merged.itertuples()
    }
    assert got == want and len(got) > 0


def test_asof_edge_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (2, 50, "c")], "k int, t int, lbl string"
    ).select("k", "t", "lbl", F.timestamp_seconds("t").alias("lts"))
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 150, 20.0), (2, 60, 30.0)], "k int, t int, v double"
    ).select("k", F.timestamp_seconds("t").alias("rts"), "v")
    out = {
        r.lbl: r.asof_v
        for r in asof_join_last(
            left.select("k", "lbl", "lts"), right, "k", "lts", "rts", ["v"]
        ).collect()
    }
    assert out["a"] == 10.0  # exact-timestamp match is inclusive
    assert out["b"] == 20.0  # latest preceding wins
    assert out["c"] is None  # no right row at-or-before → null


def test_q21_has_both_matched_and_unmatched(spark):
    rows = q21_asof_join(spark, SF_SMOKE).collect()
    matched = [r for r in rows if r.asof_click_ts is not None]
    assert len(rows) > 0 and len(matched) > 0
    assert all(r.asof_click_ts <= r.purchase_ts for r in matched)


def test_asof_join_nearest_directions_and_ties(spark):
    from datetime import datetime

    from api_etl_pipeline_spark.ops.advanced import asof_join_nearest

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 100, t(10)),   # clicks at 7 & 12 -> fwd nearer
         (2, 100, t(20)),   # clicks at 18 & 22 -> exact tie -> caller picks back
         (3, 200, t(10)),   # no clicks for user 200 -> both NULL
         (4, 300, t(10))],  # click exactly at 10 -> candidate both directions
        "id bigint, user_id bigint, lts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(100, t(7)), (100, t(12)), (100, t(18)), (100, t(22)), (300, t(10))],
        "user_id bigint, ts timestamp_ntz",
    )
    out = {
        r["id"]: (r["asof_back_ts"], r["asof_fwd_ts"])
        for r in asof_join_nearest(
            left, right, key="user_id", left_ts="lts", right_ts="ts"
        ).collect()
    }
    assert out[1] == (t(7), t(12))
    assert out[2] == (t(18), t(22))
    assert out[3] == (None, None)
    assert out[4] == (t(10), t(10))


def test_asof_join_nearest_null_timestamps_are_inert(spark):
    from datetime import datetime

    from api_etl_pipeline_spark.ops.advanced import asof_join_nearest

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 100, None),     # NULL left ts -> NO candidates either way
         (2, 100, t(10))],   # normal row unaffected
        "id bigint, user_id bigint, lts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(100, t(5)), (100, None), (100, t(12))],  # NULL right ts is skipped
        "user_id bigint, ts timestamp_ntz",
    )
    out = {
        r["id"]: (r["asof_back_ts"], r["asof_fwd_ts"])
        for r in asof_join_nearest(
            left, right, key="user_id", left_ts="lts", right_ts="ts"
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (t(5), t(12))


def test_asof_nearest_rejects_reserved_output_columns(spark):
    """Round-5 advice: a left frame already carrying asof_back_ts /
    asof_fwd_ts would get duplicate output columns — the helper must
    refuse up front instead."""
    import pytest

    from api_etl_pipeline_spark.ops.advanced import asof_join_nearest

    left = spark.createDataFrame(
        [(1, None)], "user_id bigint, asof_back_ts timestamp_ntz"
    ).withColumn("lts", F.col("asof_back_ts"))
    right = spark.createDataFrame([(1, None)], "user_id bigint, ts timestamp_ntz")
    with pytest.raises(ValueError, match="asof_back_ts"):
        asof_join_nearest(left, right, key="user_id", left_ts="lts", right_ts="ts")

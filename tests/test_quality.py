"""dq01 semantics on DIRTY data: the DuckDB oracle only proves both
engines agree on the (clean) testdata, where every check passes — this
test injects known violations into a constructed mini-warehouse and
asserts the exact violation counts, so the check logic itself is
exercised, not just cross-engine agreement."""

from __future__ import annotations

from datetime import datetime

from api_etl_pipeline_spark.ops.quality import dq01_quality_report


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.parquet(str(tmp_path / f"{name}.parquet"))


def test_dq01_counts_injected_violations(spark, tmp_path):
    # lineitem: one qty out of range (0), one discount out of range
    # (0.5), one tax out of range (0.9), one FK orphan (l_orderkey=999)
    li_schema = (
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate date"
    )
    d = datetime(2024, 1, 1).date()
    li = [
        (1, 1, 1, 1, 10.0, 100.0, 0.05, 0.02, "N", "O", d),
        (1, 2, 1, 2, 0.0, 100.0, 0.05, 0.02, "N", "O", d),    # qty violation
        (2, 1, 1, 1, 10.0, 100.0, 0.5, 0.02, "N", "O", d),    # discount violation
        (2, 2, 1, 2, 10.0, 100.0, 0.05, 0.9, "N", "O", d),    # tax violation
        (999, 1, 1, 1, 10.0, 100.0, 0.05, 0.02, "N", "O", d),  # FK orphan
        # references the DUPLICATED parent key 3: must count as one clean
        # row, not fan out through the dup parent
        (3, 1, 1, 1, 10.0, 100.0, 0.05, 0.02, "N", "O", d),
    ]
    _write(spark, tmp_path, "lineitem", li, li_schema)
    # orders: one non-positive totalprice, one duplicated key, one FK orphan
    od_schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string"
    )
    od = [
        (1, 10, "O", 100.0, d, "1-URGENT"),
        (2, 10, "O", -5.0, d, "1-URGENT"),   # totalprice violation
        (3, 77, "O", 50.0, d, "1-URGENT"),   # FK orphan (custkey 77)
        (3, 10, "O", 60.0, d, "1-URGENT"),   # duplicate o_orderkey
    ]
    _write(spark, tmp_path, "orders", od, od_schema)
    _write(
        spark, tmp_path, "customer",
        [(10, "c", "addr", 0, "p", 1.0, "SEG", "x")],
        "c_custkey bigint, c_name string, c_address string, c_nationkey bigint, "
        "c_phone string, c_acctbal double, c_mktsegment string, c_comment string",
    )
    # events: one null ts, one duplicated event_id
    ev = [
        (1, 1, "click", datetime(2024, 1, 1, 1), 1.0),
        (1, 2, "click", datetime(2024, 1, 1, 2), 1.0),  # dup event_id
        (2, 2, "click", None, 1.0),                     # null ts
    ]
    _write(
        spark, tmp_path, "events", ev,
        "event_id bigint, user_id bigint, event_type string, ts timestamp_ntz, value double",
    )

    report = {r.check_name: r for r in dq01_quality_report(spark, str(tmp_path)).collect()}
    expect = {
        "lineitem_qty_range": 1,
        "lineitem_discount_range": 1,
        "lineitem_tax_range": 1,
        "orders_totalprice_positive": 1,
        "orders_orderkey_unique": 1,
        "events_ts_nonnull": 1,
        "events_event_id_unique": 1,
        "orders_custkey_fk": 1,
        "lineitem_orderkey_fk": 1,
    }
    assert set(report) == set(expect)
    for name, n in expect.items():
        r = report[name]
        assert r.n_violations == n, f"{name}: {r.n_violations} != {n}"
        assert r.pass_ is False if hasattr(r, "pass_") else r["pass"] is False
    assert report["lineitem_qty_range"].n_rows == 6
    assert report["orders_orderkey_unique"].n_rows == 4
    assert report["lineitem_orderkey_fk"].n_rows == 6  # no dup-parent fanout
    assert report["events_ts_nonnull"].n_rows == 3

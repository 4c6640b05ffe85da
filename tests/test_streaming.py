"""Structured Streaming verification: drive the stream_ops transforms with
a file source over the events parquet and a memory sink, then check
stream results equal the batch twins (the oracle-checked queries in
streaming/batch_windows.py). processAllAvailable() drains the bounded
source synchronously (complete/append modes as appropriate)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from api_etl_pipeline_spark.streaming import stream_ops
from api_etl_pipeline_spark.streaming.batch_windows import (
    st01_tumbling_window,
    st03_sessionization,
)
from api_etl_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


_STREAM_DIR: str | None = None


def _events_stream(spark):
    # the file stream source requires a directory; stage the single parquet
    # file into one (once per test run)
    global _STREAM_DIR
    if _STREAM_DIR is None:
        import shutil
        import tempfile

        _STREAM_DIR = tempfile.mkdtemp(prefix="events_stream_")
        shutil.copy(f"{SF_SMOKE}/events.parquet", f"{_STREAM_DIR}/events.parquet")
    from api_etl_pipeline_spark.tables import load_events_stream

    batch = load_table(spark, SF_SMOKE, "events")
    return load_events_stream(spark, _STREAM_DIR), batch


def _run_to_memory(df, name, mode):
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


@pytest.fixture()
def qname():
    return "t" + uuid.uuid4().hex[:10]


def test_stream_tumbling_equals_batch(spark, qname):
    stream, _ = _events_stream(spark)
    out = stream_ops.tumbling_counts(stream)
    _run_to_memory(out, qname, "complete")
    got = {tuple(r) for r in spark.sql(f"SELECT * FROM {qname}").collect()}
    want = {tuple(r) for r in st01_tumbling_window(spark, SF_SMOKE).collect()}
    assert got == want and len(got) > 0


def test_stream_sessions_match_batch_sessionizer(spark, qname):
    stream, _ = _events_stream(spark)
    out = stream_ops.session_counts(stream)
    _run_to_memory(out, qname, "complete")
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in spark.sql(f"SELECT * FROM {qname}").collect()
    }
    want = {
        (r.user_id, r.session_start, r.n_events)
        for r in st03_sessionization(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def test_stream_dedup_within_watermark(spark, qname):
    stream, batch = _events_stream(spark)
    out = stream_ops.dedup_within_watermark(stream)
    _run_to_memory(out, qname, "append")
    got = spark.sql(f"SELECT user_id, event_type FROM {qname}").collect()
    keys = {(r.user_id, r.event_type) for r in got}
    # one survivor per key, covering every key present in the batch
    assert len(got) == len(keys)
    want_keys = {
        (r.user_id, r.event_type)
        for r in batch.select("user_id", "event_type").distinct().collect()
    }
    assert keys == want_keys


def test_stream_sliding_append_respects_watermark(spark, qname):
    """Append mode emits only watermark-finalized windows — a stricter
    structural check than row equality (late windows must be absent)."""
    stream, batch = _events_stream(spark)
    out = stream_ops.sliding_counts(stream, watermark="1 hour")
    _run_to_memory(out, qname, "append")
    rows = spark.sql(f"SELECT * FROM {qname}").collect()
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    # every emitted window is fully below the final watermark (max_ts - 1h)
    import datetime as dt

    horizon = max_ts - dt.timedelta(hours=1)
    assert all(r.window_start + dt.timedelta(hours=1) <= horizon + dt.timedelta(hours=1)
               for r in rows)
    assert len(rows) > 0


def test_foreach_batch_sink_idempotent_epochs(spark, tmp_path):
    from api_etl_pipeline_spark.streaming.stream_ops import write_with_foreach_batch

    stream, batch = _events_stream(spark)
    out = str(tmp_path / "sink")
    q = write_with_foreach_batch(stream.select("event_id", "user_id", "ts"), out)
    q.processAllAvailable()
    q.stop()
    written = spark.read.parquet(out)
    assert written.count() == batch.count()
    # exactly the source rows, no duplicates
    assert written.select("event_id").distinct().count() == batch.count()


def test_exactly_once_sink_skips_committed_epochs(spark, tmp_path):
    from api_etl_pipeline_spark.streaming.stream_ops import write_exactly_once

    stream, batch = _events_stream(spark)
    out, commits = str(tmp_path / "sink"), str(tmp_path / "commits")
    q, sink = write_exactly_once(stream.select("event_id", "user_id", "ts"), out, commits)
    q.processAllAvailable()
    q.stop()
    written = spark.read.parquet(out)
    assert written.count() == batch.count()
    committed = sorted(p.name for p in (tmp_path / "commits").iterdir())
    assert committed  # at least one epoch landed and was logged

    # replay epoch 0 with DIFFERENT data: the commit log must skip it,
    # leaving the original output untouched (exactly-once, not at-least-once)
    replacement = batch.select("event_id", "user_id", "ts").limit(1)
    sink(replacement, 0)
    assert spark.read.parquet(out).count() == batch.count()

    # an uncommitted epoch (marker removed = crash before commit) is
    # re-written idempotently via overwrite
    (tmp_path / "commits" / "0.committed").unlink()
    sink(replacement, 0)
    assert (tmp_path / "commits" / "0.committed").exists()
    assert spark.read.parquet(f"{out}/epoch=0").count() == 1


def test_stream_static_enrichment_equals_batch_join(spark, qname):
    from api_etl_pipeline_spark.streaming.stream_ops import enrich_with_dimension

    stream, batch = _events_stream(spark)
    dim = (
        batch.select("user_id").distinct()
        .withColumn("tier", (F.col("user_id") % 3).cast("bigint"))
    )
    out = enrich_with_dimension(stream.select("event_id", "user_id"), dim)
    _run_to_memory(out, qname, "append")
    got = {tuple(r) for r in spark.sql(f"SELECT event_id, user_id, tier FROM {qname}").collect()}
    want = {
        tuple(r)
        for r in batch.select("event_id", "user_id")
        .join(dim, "user_id")
        .select("event_id", "user_id", "tier")
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_stream_interval_join_equals_batch(spark, qname):
    from api_etl_pipeline_spark.streaming.stream_ops import purchase_click_stream_join

    stream, batch = _events_stream(spark)
    purchases = stream.filter(F.col("event_type") == "purchase")
    clicks = stream.filter(F.col("event_type") == "click")
    out = purchase_click_stream_join(purchases, clicks)
    _run_to_memory(out, qname, "append")
    got = {(r.purchase_id, r.click_id)
           for r in spark.sql(f"SELECT * FROM {qname}").collect()}

    bp = batch.filter(F.col("event_type") == "purchase").alias("p")
    bc = batch.filter(F.col("event_type") == "click").alias("c")
    want_df = bp.join(
        bc,
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("c.ts") > F.col("p.ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c.ts") <= F.col("p.ts")),
    ).select(F.col("p.event_id").alias("purchase_id"), F.col("c.event_id").alias("click_id"))
    want = {(r.purchase_id, r.click_id) for r in want_df.collect()}
    assert got == want and len(got) > 0


def test_watermark_drops_late_rows_and_accounts_them(spark, qname, tmp_path):
    """Late-data policy end-to-end: rows older than (max event time seen −
    delay) must be EXCLUDED from windowed aggregates in append mode, and
    the engine must account for them (numRowsDroppedByWatermark) — the
    observability contract ev10's batch disorder metric is used to tune."""
    import datetime as dt

    src = tmp_path / "src"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write_batch(name, rows):
        spark.createDataFrame(rows, "ts timestamp, user_id bigint").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / name))

    # batch 1: fresh events at t0+60min — advances the watermark far past t0
    write_batch("b1", [(t0 + dt.timedelta(minutes=60), 1), (t0 + dt.timedelta(minutes=61), 2)])

    stream = (
        spark.readStream.schema("ts timestamp, user_id bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a straggler at t0 — 60 min behind the frontier, beyond
        # the 10-min delay → must be dropped, not aggregated
        write_batch("b2", [(t0, 3)])
        q.processAllAvailable()
        # and a closing batch to push the watermark so windows finalize
        write_batch("b3", [(t0 + dt.timedelta(minutes=90), 4)])
        q.processAllAvailable()
        dropped = 0
        for p in q.recentProgress:
            for op in p["stateOperators"]:
                dropped += op.get("numRowsDroppedByWatermark", 0)
    finally:
        q.stop()
    rows = {r["w_start"]: r["n"] for r in spark.sql(f"SELECT * FROM {qname}").collect()}
    # the straggler's window (t0) never appears
    assert t0 not in rows
    # the fresh window finalized with only the on-time events
    assert rows.get(t0 + dt.timedelta(minutes=60)) == 2
    assert dropped >= 1


def test_events_stream_constructible_on_empty_directory(spark, tmp_path):
    """An empty staging directory must not break stream construction
    (round-4 advice fix): the probe falls back to the current-generation
    MICROS schema, and once files arrive the stream reads them."""
    from api_etl_pipeline_spark.tables import load_events_stream, load_table
    from tests.conftest import SF_SMOKE

    staging = tmp_path / "staging"
    staging.mkdir()
    stream = load_events_stream(spark, str(staging))  # must not raise
    assert dict(stream.dtypes)["ts"] == "timestamp"

    load_table(spark, SF_SMOKE, "events").limit(7).write.mode("append").parquet(
        str(staging)
    )
    import uuid

    qname = "t" + uuid.uuid4().hex[:10]
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql(f"SELECT * FROM {qname}").count() == 7
    finally:
        q.stop()


def test_streaming_enrich_pipeline_equals_batch_twin(spark):
    """The COMPOSED stream-static pipeline (enrich each micro-batch with
    the customer dimension, then watermarked tumbling windows per
    segment) must produce exactly the batch twin's result — this pins
    st09 (live) to st08 (oracle-checked batch) end to end, not just the
    join step."""
    from api_etl_pipeline_spark.registry import all_queries

    qs = all_queries()
    live = qs["st09_streaming_enrich_live"].fn(spark, SF_SMOKE)
    batch = qs["st08_enriched_segment_windows"].fn(spark, SF_SMOKE).withColumn(
        "window_start", F.col("window_start").cast("timestamp_ntz")
    )
    got = {tuple(r) for r in live.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_checkpointed_restart_is_exactly_once(spark, tmp_path):
    """T3 checkpoint semantics, actually exercised: run a checkpointed
    file-source→file-sink stream over half the data, STOP it, drop the
    second half into the source directory, and restart with the SAME
    checkpoint — the union of outputs must equal the full input exactly
    (no replayed rows from before the stop, no losses across it), and a
    restart with no new data must emit nothing."""
    from api_etl_pipeline_spark.tables import load_events_stream, load_table

    batch = load_table(spark, SF_SMOKE, "events")
    half1 = batch.filter(F.col("event_id") % 2 == 0)
    half2 = batch.filter(F.col("event_id") % 2 == 1)

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def add_file(df, name):
        # the file stream source lists FILES; a nested .write.parquet
        # directory would be invisible to it — stage a single part file
        import shutil

        tmp = tmp_path / f"_stage_{name}"
        df.coalesce(1).write.parquet(str(tmp))
        part = next(tmp.glob("part-*.parquet"))
        shutil.copy(part, src / name)

    add_file(half1, "part1.parquet")

    def run_once():
        stream = load_events_stream(spark, str(src)).select(
            "event_id", "user_id", "event_type"
        )
        q = (
            stream.writeStream.format("parquet")
            .option("checkpointLocation", str(ckpt))
            .option("path", str(out))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    n_after_first = spark.read.parquet(str(out)).count()
    assert n_after_first == half1.count()

    add_file(half2, "part2.parquet")
    run_once()  # restart from the same checkpoint picks up ONLY part2
    got = {r.event_id for r in spark.read.parquet(str(out)).collect()}
    want = {r.event_id for r in batch.select("event_id").collect()}
    assert got == want  # set equality: nothing lost, nothing replayed
    total = spark.read.parquet(str(out)).count()
    assert total == len(want)  # count equality: no duplicate rows either

    run_once()  # idle restart: no new input -> no new output
    assert spark.read.parquet(str(out)).count() == total


def test_stream_stream_left_join_equals_batch_up_to_watermark(spark, qname):
    """LEFT OUTER stream-stream join: matched rows must equal the batch
    twin exactly; NULL (no-click) rows are watermark-gated, so the live
    set must equal the batch twin's null rows with p_ts strictly below
    the query's FINAL watermark (state still held for newer purchases
    when a bounded source drains)."""
    from datetime import datetime

    from api_etl_pipeline_spark.streaming.batch_windows import st10_interval_left_join
    from api_etl_pipeline_spark.streaming.stream_ops import purchase_click_left_join

    stream, _ = _events_stream(spark)
    purchases = stream.filter(F.col("event_type") == "purchase")
    clicks = stream.filter(F.col("event_type") == "click")
    out = purchase_click_left_join(purchases, clicks)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .start()
    )
    q.processAllAvailable()
    wm_str = (q.lastProgress or {}).get("eventTime", {}).get("watermark")
    q.stop()
    assert wm_str, "no watermark reported by the streaming query"
    wm = datetime.fromisoformat(wm_str.replace("Z", ""))

    live = spark.sql(f"SELECT * FROM {qname}").collect()
    live_matched = {(r.purchase_id, r.click_id) for r in live if r.click_id is not None}
    live_nulls = {r.purchase_id for r in live if r.click_id is None}

    batch = st10_interval_left_join(spark, SF_SMOKE).collect()
    want_matched = {(r.purchase_id, r.click_id) for r in batch if r.click_id is not None}
    want_nulls = {r.purchase_id for r in batch if r.click_id is None and r.p_ts < wm}

    assert live_matched == want_matched and len(live_matched) > 0
    assert live_nulls == want_nulls and len(live_nulls) > 0
    # and nothing else leaked: every live null is a batch null
    all_batch_nulls = {r.purchase_id for r in batch if r.click_id is None}
    assert live_nulls <= all_batch_nulls

"""True Structured Streaming transforms (SURVEY.md §2.9).

Each function takes a *streaming* DataFrame (readStream) and returns the
transformed stream — the same logical expressions as the batch twins in
batch_windows.py, so correctness is pinned by (a) the batch oracle and
(b) stream-vs-batch equivalence tests (tests/test_streaming.py) that
drive these with a file source and a memory sink.

Watermarks bound state: the tumbling/sliding aggregations emit finalized
windows in append mode once the watermark passes window end; the dedup
holds keys only within the watermark horizon (T2 — the dossier's
overlap-window dedupe, docs/Golden_Record_API_Dossiers.md:228-241).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """T7: watermarked 1-hour tumbling aggregation (st01 twin)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """T7: watermarked sliding window (1 h / 30 min; st02 twin)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """T7: native session windows (st03 twin — same boundaries as the
    lag-gap batch sessionizer)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """T2: streaming dedup bounded by the watermark horizon (st04 twin —
    first arrival per (user_id, event_type) survives)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def dedup_redelivery(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """T2/T5: exactly-once projection of an at-least-once delivery stream
    — redelivered copies of the same event_id within the watermark
    horizon are suppressed, first arrival wins (the reconciliation
    guarantee a replayed source/retry loop needs). State holds one key
    per event_id seen inside the horizon; eviction past the watermark
    bounds it (st13 drives this live against a deliberately doubled
    stream)."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


def write_with_foreach_batch(stream: DataFrame, out_dir: str) -> "object":
    """Exactly-once-style file sink via foreachBatch (SURVEY guide: 'for
    exactly-once sinks: foreachBatch'): each micro-batch lands in an
    epoch-suffixed directory, so replays of an epoch overwrite rather
    than duplicate — idempotent against micro-batch retries. Returns the
    started query (caller drives/stops it)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return stream.writeStream.foreachBatch(sink).start()


def write_exactly_once(stream: DataFrame, out_dir: str, commit_dir: str):
    """foreachBatch sink with a batch-id commit log — the full
    exactly-once recipe. Structured Streaming re-runs an epoch after a
    failure; the epoch-dir overwrite (write_with_foreach_batch) makes the
    replay idempotent, and the commit marker written AFTER the data makes
    it cheap: a replayed epoch whose marker exists is skipped without any
    I/O, and the marker directory doubles as a durable audit of exactly
    which epochs landed (the role a Delta/Iceberg transaction log plays,
    minus the atomic table swap). A crash between data-write and marker
    leaves an uncommitted epoch dir that the replay simply overwrites —
    never duplicates.

    foreachBatch runs on the driver, so plain filesystem markers are
    correct in any deployment; on object storage point commit_dir at the
    same bucket as out_dir. Returns (query, sink) — the sink is exposed
    so tests can replay an epoch directly."""
    from pathlib import Path

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        marker = Path(commit_dir) / f"{epoch_id}.committed"
        if marker.exists():
            return
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")
        marker.parent.mkdir(parents=True, exist_ok=True)
        marker.touch()

    return stream.writeStream.foreachBatch(sink).start(), sink


def enrich_with_dimension(stream: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static join: each micro-batch equi-joins the (small) static
    dimension, broadcast so the stream side never shuffles and no join
    state accrues (unlike stream-stream joins, the static side needs no
    watermark). The static frame is re-resolved per micro-batch, so a
    dimension table updated in place is picked up on the next trigger —
    the streaming twin of the ingest layer's provider-dimension joins."""
    return stream.join(F.broadcast(dim), key)


def purchase_click_stream_join(purchases: DataFrame, clicks: DataFrame,
                               watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join (the q22 range-join semantics as two
    live streams): each purchase joins clicks of the same user within the
    preceding hour. Both sides carry watermarks + the time-range
    predicate, so Spark can bound the join state buffers on each side —
    without them the state would grow forever."""
    from pyspark.sql import functions as F

    p = (
        purchases.withWatermark("ts", watermark)
        .select(F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    )
    c = (
        clicks.withWatermark("ts", watermark)
        .select(F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    )
    return p.join(
        c,
        F.expr("c_user = p_user AND c_ts > p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"),
    ).select("purchase_id", F.col("p_user").alias("user_id"), "p_ts", "click_id", "c_ts")


def purchase_click_left_join(purchases: DataFrame, clicks: DataFrame,
                             watermark: str = "2 hours") -> DataFrame:
    """LEFT OUTER stream-stream interval join — the attribution shape
    "every purchase, with its preceding-hour clicks IF any": matched
    rows emit like the inner join; unmatched purchases emit with NULL
    click columns only once the watermark passes p_ts (no future click
    can still match), which is how Spark bounds the left side's state.
    Purchases newer than (max event time - watermark delay) are still
    held in state when a bounded source drains — the live run is a
    PREFIX of the batch twin's null rows (pinned precisely in
    tests/test_streaming.py via the query's final watermark)."""
    from pyspark.sql import functions as F

    p = (
        purchases.withWatermark("ts", watermark)
        .select(F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    )
    c = (
        clicks.withWatermark("ts", watermark)
        .select(F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    )
    return p.join(
        c,
        F.expr("c_user = p_user AND c_ts > p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"),
        "left_outer",
    ).select("purchase_id", F.col("p_user").alias("user_id"), "p_ts", "click_id", "c_ts")


def windowed_value_histogram(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """dq07's LIVE leg: per-(1-day window, fixed value bucket) counts —
    the corpus-scale half of the streaming drift monitor. The constant-
    size PSI tail (ops.quality.dq07_psi_surface) runs on the drained
    counts against the frozen baseline; tests/test_streaming_psi.py pins
    the live monitor row-identical to the dq07 batch twin."""
    from api_etl_pipeline_spark.ops.quality import _dq07_bucket

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day"), _dq07_bucket(F.col("value")).alias("bucket"))
        .agg(F.count("*").alias("cd"))
        .select(F.col("window.start").alias("day"), "bucket", "cd")
    )

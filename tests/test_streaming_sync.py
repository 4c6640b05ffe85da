"""st14 — the composed streaming incremental-sync loop (dossier :703-715):
standing table + doubled overlap re-fetch + in-stream dedupe + idempotent
foreachBatch merge. The driver oracle proves table == events exactly once;
these tests pin the properties the one-shot oracle can't see: two-run
idempotency (byte-identical table state after a full replay) and the
watermark advance."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_etl_pipeline_spark.streaming.batch_windows import (
    _ST14_CUT,
    run_streaming_sync,
)
from api_etl_pipeline_spark.tables import load_table
from tests.conftest import SF_DIR


def _state(df):
    return sorted(
        (r.event_id, r.user_id, r.event_type, str(r.ts), r.value)
        for r in df.collect()
    )


def test_sync_lands_every_event_exactly_once(spark, tmp_path):
    table_dir = str(tmp_path / "standing")
    out = run_streaming_sync(spark, SF_DIR, table_dir, runs=1)
    events = load_table(spark, SF_DIR, "events")
    assert out.count() == events.count()
    assert out.select("event_id").distinct().count() == events.count()


def test_rerun_is_idempotent(spark, tmp_path):
    # run 1 then a full replay (fresh stream, fresh checkpoint, same
    # standing table): the replay must insert ZERO rows — identical state
    d1, d2 = str(tmp_path / "once"), str(tmp_path / "twice")
    once = _state(run_streaming_sync(spark, SF_DIR, d1, runs=1))
    twice = _state(run_streaming_sync(spark, SF_DIR, d2, runs=2))
    assert once == twice


def test_watermark_advances_to_max_ts(spark, tmp_path):
    # step 5 of the sync loop: the next run's watermark = max(ts) landed
    table_dir = str(tmp_path / "standing")
    out = run_streaming_sync(spark, SF_DIR, table_dir, runs=1)
    advanced = out.agg(F.max("ts")).first()[0]
    source_max = load_table(spark, SF_DIR, "events").agg(F.max("ts")).first()[0]
    assert str(advanced) == str(source_max)
    cut = _ST14_CUT.split(" ")[0]
    assert str(advanced) > cut  # strictly past the stored watermark

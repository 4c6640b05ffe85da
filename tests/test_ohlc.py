"""ev15 OHLC: the open/close tie-break must be total-ordered — equal
timestamps inside a bar resolve by event_id on both engines (the
shipped data has no intra-bar ts ties, so the oracle can't exercise
this; a constructed tie does)."""

from __future__ import annotations

from datetime import datetime

from api_etl_pipeline_spark.ops.events_analytics import ev15_ohlc_bars


def test_ev15_tie_break_on_event_id(spark, tmp_path):
    t = datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # two ticks at the IDENTICAL timestamp: open must take event_id 1
        (2, 1, "trade", t, 50.0),
        (1, 1, "trade", t, 10.0),
        # later ticks, again tied: close must take the HIGHEST event_id
        (3, 1, "trade", datetime(2024, 1, 1, 10, 30, 0), 20.0),
        (5, 1, "trade", datetime(2024, 1, 1, 10, 45, 0), 30.0),
        (4, 1, "trade", datetime(2024, 1, 1, 10, 45, 0), 40.0),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, event_type string, ts timestamp_ntz, value double",
    ).write.parquet(str(tmp_path / "events.parquet"))
    bars = ev15_ohlc_bars(spark, str(tmp_path)).collect()
    assert len(bars) == 1
    b = bars[0]
    assert b.open == 10.0   # event_id 1 beats 2 at the tied first tick
    assert b.close == 30.0  # event_id 5 beats 4 at the tied last tick
    assert b.high == 50.0 and b.low == 10.0
    assert b.n_trades == 5 and b.volume == 150.0

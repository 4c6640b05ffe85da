"""applyInPandasWithState: the streaming per-user running totals must end
at exactly the batch groupBy result once the bounded stream drains (the
'update' outputs are snapshots; the final snapshot per key is the total).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from api_etl_pipeline_spark.streaming.stateful import running_user_totals
from api_etl_pipeline_spark.tables import load_table
from tests.test_streaming import _events_stream


def test_stateful_running_totals_match_batch(spark):
    stream, batch = _events_stream(spark)
    out = running_user_totals(stream)
    qname = "t" + uuid.uuid4().hex[:10]
    q = out.writeStream.outputMode("update").format("memory").queryName(qname).start()
    q.processAllAvailable()
    q.stop()

    # last snapshot per user (memory sink appends every update)
    snaps = spark.sql(f"SELECT * FROM {qname}")
    final = {
        r.user_id: r
        for r in snaps.orderBy("n_events").collect()  # later snapshots have larger n
    }
    want = {
        r.user_id: r
        for r in batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("total_value_cents"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert set(final) == set(want)
    for uid, w in want.items():
        g = final[uid]
        assert g.n_events == w.n_events, uid
        assert g.total_value_cents == w.total_value_cents, uid
        assert g.last_ts == w.last_ts, uid

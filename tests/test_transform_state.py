"""transformWithStateInPandas (arbitrary-state v2): the streamed per-user
dominant event type must equal the batch groupBy twin once the bounded
stream drains. Needs the RocksDB state store provider (bundled)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from api_etl_pipeline_spark.streaming import transform_state
from tests.test_streaming import _events_stream

pytestmark = pytest.mark.skipif(
    not transform_state.HAVE_TWS,
    # names the ACTUAL blocker for this runtime (Spark major version vs
    # the optional python protobuf dependency of the state-server
    # protocol) so a green-but-skipped CI run is self-explanatory
    reason=str(transform_state.TWS_UNAVAILABLE_REASON),
)

_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def test_dominant_type_matches_batch(spark):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    try:
        stream, batch = _events_stream(spark)
        out = transform_state.dominant_event_type(stream)
        qname = "t" + uuid.uuid4().hex[:10]
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName(qname)
            .start()
        )
        q.processAllAvailable()
        q.stop()

        snaps = spark.sql(f"SELECT * FROM {qname}")
        # later snapshots have a larger dominant_count per user
        final = {
            r.user_id: r for r in snaps.orderBy("dominant_count").collect()
        }

        counts = batch.groupBy("user_id", "event_type").count()
        want = {}
        for r in counts.collect():
            cur = want.get(r.user_id)
            cand = (r["count"], r.event_type)
            # dominant = count desc, type asc
            if (
                cur is None
                or cand[0] > cur[0]
                or (cand[0] == cur[0] and cand[1] < cur[1])
            ):
                want[r.user_id] = cand
        n_types = {
            r.user_id: r["nt"]
            for r in counts.groupBy("user_id")
            .agg(F.count("*").alias("nt"))
            .collect()
        }

        assert set(final) == set(want)
        for uid, (cnt, etype) in want.items():
            g = final[uid]
            assert g.dominant_type == etype, uid
            assert g.dominant_count == cnt, uid
            assert g.n_types == n_types[uid], uid
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

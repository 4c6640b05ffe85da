"""Custom stateful operator on the transformWithStateInPandas API
(Spark 4.x arbitrary-state v2): per-user per-event-type counters kept in
keyed MAP state, emitting each user's current dominant event type as the
stream evolves.

Why this exists alongside stateful.py's applyInPandasWithState operator:
the v1 API exposes ONE flat tuple of state per key, so a per-(key,
subkey) counter has to serialize the whole map into the tuple every
micro-batch. The v2 StatefulProcessor gives named state variables —
here a MapState keyed by event_type — whose entries update
incrementally in the RocksDB store (point writes, no full-map rewrite),
which is what bounds state-update cost at 100 TB: O(touched subkeys)
per batch rather than O(all subkeys ever seen).

Determinism in tests: counts are integers and the dominant-type
tie-break is lexicographic, so the final emission per user equals the
batch groupBy twin regardless of micro-batch slicing
(tests/test_transform_state.py).

Requires the RocksDB state store provider (bundled with Spark; set on
the writeStream via .config — see dominant_event_type()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id bigint, dominant_type string, dominant_count bigint, n_types bigint"

def _tws_unavailable_reason() -> str | None:
    """Why transformWithStateInPandas cannot run here, or None if it can.

    Two independent prerequisites, checked separately so the skip reason
    names the actual blocker:
    - Spark 4.x (the API does not exist on 3.x);
    - the python `protobuf` package — an OPTIONAL pyspark dependency that
      the TWS state-server protocol (pyspark.sql.streaming.proto.
      StateMessage_pb2) imports at worker startup; without it the worker
      crashes mid-query, so treat it as an availability gate.
    """
    import pyspark

    if int(pyspark.__version__.split(".", 1)[0]) < 4:
        return f"transformWithStateInPandas requires Spark 4.x (runtime is {pyspark.__version__})"
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return (
            f"Spark {pyspark.__version__} has the TWS API, but the python "
            "'protobuf' package (optional pyspark dependency used by the "
            "TWS state-server protocol) is not installed"
        )
    return None


TWS_UNAVAILABLE_REASON = _tws_unavailable_reason()
HAVE_TWS = TWS_UNAVAILABLE_REASON is None

try:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
except ImportError:  # pragma: no cover - Spark 3.x
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = object  # type: ignore[assignment,misc]


class DominantTypeProcessor(StatefulProcessor):
    """Keeps MapState[event_type -> count] per user_id; emits the current
    dominant (count desc, type asc) event type after each batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "type_counts", "event_type string", "n bigint"
        )

    def handleInputRows(self, key, rows, timerValues):  # noqa: N802 (API name)
        import pandas as pd

        for pdf in rows:
            for etype, cnt in pdf.groupby("event_type").size().items():
                prev = (
                    self._counts.getValue((etype,))
                    if self._counts.containsKey((etype,))
                    else None
                )
                prev_n = prev[0] if prev is not None else 0
                self._counts.updateValue((etype,), (prev_n + int(cnt),))
        entries = [(k[0], v[0]) for k, v in self._counts.iterator()]
        entries.sort(key=lambda kv: (-kv[1], kv[0]))
        top_type, top_n = entries[0]
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "dominant_type": [top_type],
                "dominant_count": [top_n],
                "n_types": [len(entries)],
            }
        )

    def close(self) -> None:
        pass


def dominant_event_type(events: DataFrame) -> DataFrame:
    """Streaming per-user dominant event type via named MapState.

    Caller must run the query with the RocksDB state store provider:
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    """
    if not HAVE_TWS:  # pragma: no cover
        raise NotImplementedError(TWS_UNAVAILABLE_REASON)
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=DominantTypeProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9/§2.10 — the 'custom stateful operators' extension point).

Per-user running aggregate: each micro-batch updates (n_events,
total_value, last_ts) state per user_id and emits the updated snapshot.
This is the pattern for operators Spark's built-in windowed aggregations
can't express (e.g. the reference's per-key sync-state advance, T3, kept
as queryable state instead of a no-op checkpoint hook).

State is per-key and constant-size, so the operator scales with keys,
not events; a GroupStateTimeout would bound idle-key state in a real
deployment (ProcessingTimeTimeout here would make tests nondeterministic,
so NoTimeout is used).

The update function is built as a closure (serialized by value — see
llm_ops/multimodal.py for why).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value_cents bigint, last_ts timestamp"
STATE_SCHEMA = "n_events bigint, total_value_cents bigint, last_ts timestamp"


def _make_update_fn():
    import pandas as pd

    def update(key, pdfs, state: GroupState):
        n, cents, last_ts = (
            state.get if state.exists else (0, 0, None)
        )
        for pdf in pdfs:
            n += len(pdf)
            # per-row cents then integer sum: exact regardless of how the
            # stream batches the rows
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
            batch_max = pdf["ts"].max()
            if last_ts is None or batch_max > last_ts:
                last_ts = batch_max
        state.update((n, cents, last_ts))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value_cents": [cents],
                "last_ts": [last_ts],
            }
        )

    return update


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit keyed state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Custom stateful streaming operator: per-user session tracking.

Demonstrates the applyInPandasWithState path for operators Structured
Streaming's built-ins can't express — here, incremental sessionization
with carried state (last-seen timestamp + open session count per user).
The batch equivalence is __spark_entry__.q_sessionization; this version
maintains the same counts incrementally across micro-batches, which is the
shape a 100 TB event pipeline actually deploys (state is partitioned by
key in the state store; each micro-batch touches only updated keys).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_ts_ms long, n_sessions long, n_events long"
GAP_MS = 30 * 60 * 1000


def _update_sessions(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_ts, n_sessions, n_events = state.get if state.exists else (None, 0, 0)
    ts_values: list[int] = []
    for pdf in batches:
        ts_values.extend(int(t) for t in pdf["ts_ms"])
    for ts in sorted(ts_values):
        if last_ts is None or ts - last_ts > GAP_MS:
            n_sessions += 1
        last_ts = ts
        n_events += 1
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame({"user_id": [user_id], "n_sessions": [n_sessions], "n_events": [n_events]})


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events stream (user_id long, ts_ms long) → per-user running session
    counts, state carried across micro-batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_sessions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

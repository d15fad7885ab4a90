"""Custom stateful streaming operator — applyInPandasWithState (ST9).

The reference's per-URL state machine is implicit (pending → parsed ok/fail,
detail.py:107-131); its `live` mode keeps per-region counters in driver
memory. This module shows the engine's explicit stateful surface: a
session counter per user maintained across micro-batches in Spark-managed
state (RocksDB/HDFS-backed on a cluster), with the same 30-minute-gap
semantics as the batch gaps-and-islands query (plans/relational.q26) — the
batch/streaming answers must agree when events arrive in event-time order.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_US = 1_800_000_000  # 30 min, microseconds

STATE_SCHEMA = "last_ts_us long, n_sessions integer"
OUTPUT_SCHEMA = "user_id long, n_sessions integer"


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user session counting across micro-batches.

    State = (last event ts in µs, sessions so far). Events are sorted within
    the batch; cross-batch ordering is the landing pipeline's contract (the
    crawl emits rounds in time order)."""
    if state.exists:
        last_ts_us, n_sessions = state.get
    else:
        last_ts_us, n_sessions = None, 0
    for pdf in pdfs:
        ts_us = pd.to_datetime(pdf["ts"]).astype("int64") // 1000
        for t in sorted(ts_us.tolist()):
            if last_ts_us is None or t - last_ts_us > SESSION_GAP_US:
                n_sessions += 1
            last_ts_us = t
    state.update((last_ts_us, n_sessions))
    yield pd.DataFrame({"user_id": [key[0]], "n_sessions": [n_sessions]})


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """events (user_id, ts) stream → running per-user session counts."""
    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""Custom stateful streaming operator via applyInPandasWithState —
the §2.12 'custom stateful operators' surface: per-key state the built-in
window/dedup operators can't express.

Implemented operator: per-user running engagement tracker. For every
micro-batch, each user's state (event count, value sum, EWMA of value,
last event time) updates from the batch's events (processed in event-time
order) and one summary row per updated user is emitted. The state lives
in the state store (checkpointed, recoverable); Arrow moves each user's
batch rows as pandas DataFrames.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("ewma_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("ewma_value", T.DoubleType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)

EWMA_ALPHA = 0.3


def _track_user(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, ewma, last_us = state.get
    else:
        n, total, ewma, last_us = 0, 0.0, None, 0
    rows = pd.concat(list(batches), ignore_index=True).sort_values("ts")
    for v in rows["value"]:
        v = float(v)
        n += 1
        total += v
        ewma = v if ewma is None else EWMA_ALPHA * v + (1 - EWMA_ALPHA) * ewma
    last_ts = rows["ts"].max()
    last_us = max(last_us, int(last_ts.value // 1000))
    state.update((n, total, ewma, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "ewma_value": [ewma],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def user_engagement_tracker(events: DataFrame) -> DataFrame:
    """Streaming: one updated summary row per user per micro-batch, with
    cumulative state across batches."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _track_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

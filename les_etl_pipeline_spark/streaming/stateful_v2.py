"""Custom stateful operator on the Spark 4 transformWithState API
(transformWithStateInPandas + StatefulProcessor): typed per-key state
primitives (here MapState) instead of applyInPandasWithState's single
state tuple — the successor API for arbitrary stateful processing.

Operator: per-user event-type histogram. Each user's MapState holds
event_type -> running count; every micro-batch the processor folds the
batch rows into the map and emits the user's FULL updated histogram
(update-mode semantics). State is store-backed (RocksDB provider — the
API requires it) and recoverable from the checkpoint.

Timers/TTL are part of the same handle API (registerTimer /
ttlDurationMs on the state getters) — not used here; watermark-driven
eviction stays on the windowed operators in streaming/windows.py.

ENVIRONMENT LIMIT (checked 2026-08-13): the transformWithState state
server speaks protobuf and `google.protobuf` is not installed in this
container (installs disallowed), so the runtime path crashes with
ImportError in transform_with_state_driver_worker; the covering test
skips itself when protobuf is absent (`HAVE_PROTOBUF`). On a standard
cluster image (protobuf present) the operator runs as written — the
applyInPandasWithState operator in streaming/stateful.py remains the
fully-tested custom-stateful path here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id long, event_type string, n long"

try:  # the TWS state-server protocol needs protobuf (see module docstring)
    import google.protobuf  # noqa: F401

    HAVE_PROTOBUF = True
except ImportError:
    HAVE_PROTOBUF = False

#: the transformWithState API requires the RocksDB state store provider
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class TypeHistogramProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "type_counts", "event_type string", "n long"
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        delta: dict[str, int] = {}
        for pdf in rows:
            for t in pdf["event_type"]:
                delta[t] = delta.get(t, 0) + 1
        for t, d in delta.items():
            prev = self._counts.getValue((t,)) if self._counts.containsKey((t,)) else None
            base = int(prev[0]) if prev is not None else 0
            self._counts.updateValue((t,), (base + d,))
        types, counts = [], []
        for k, v in self._counts.iterator():
            types.append(k[0])
            counts.append(int(v[0]))
        yield pd.DataFrame(
            {"user_id": [user_id] * len(types), "event_type": types, "n": counts}
        )

    def close(self) -> None:
        pass


def user_type_histogram(events: DataFrame) -> DataFrame:
    """Streaming: per micro-batch, each updated user's complete running
    event-type histogram (one row per type)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TypeHistogramProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

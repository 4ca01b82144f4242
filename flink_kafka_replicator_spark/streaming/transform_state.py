"""Custom stateful streaming via Spark 4's transformWithStateInPandas.

The modern replacement for applyInPandasWithState (kept in
``stateful.py`` for the classic surface): typed named state slots
(ValueState / ListState / MapState) with optional per-state TTL, timers,
and an initial-state hook — the closest Structured Streaming gets to
Flink's KeyedProcessFunction, state declaration included.

Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass`` →
``RocksDBStateStoreProvider``); :func:`rocksdb_state_conf` returns the
conf pair callers must set. State lives off-heap in RocksDB with
incremental checkpointing — the provider that holds up at 100 TB key
cardinality where the default HDFS-backed in-memory map cannot.

Runtime dependency: the TWS state protocol speaks protobuf
(``pyspark.sql.streaming.proto``) between the Python worker and the JVM
state server — ``google.protobuf`` must be importable on workers. This
container lacks it, so the pytest coverage skips there; the module
itself imports cleanly and runs wherever protobuf is available
(standard Spark clusters ship it).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_state_conf() -> tuple[str, str]:
    return ("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


RUNNING_SCHEMA = "user_id bigint, n_events bigint, total_value double, n_batches bigint"


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, sum) plus a batch counter, held in a typed
    ValueState slot. Emits one updated snapshot row per key per
    micro-batch that saw the key."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n bigint, total double")
        self._batches = handle.getValueState("batches", "b bigint")

    def handleInputRows(
        self,
        key: Any,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        got = self._totals.get()
        n, total = got if got is not None else (0, 0.0)
        got_b = self._batches.get()
        (b,) = got_b if got_b is not None else (0,)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        b += 1
        self._totals.update((n, total))
        self._batches.update((b,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "n_batches": [b],
            }
        )

    def close(self) -> None:
        pass


def running_totals_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas running aggregate (see class above).

    Append output mode so file sinks accept it; readers take the latest
    row per key, exactly as with the applyInPandasWithState twin.
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="append",
        timeMode="None",
    )

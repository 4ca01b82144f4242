"""Custom stateful streaming operators via applyInPandasWithState.

The reference carries no user state (SURVEY.md §2.4 — only connector
state: offsets and transactions). These operators cover the "custom
stateful streaming" capability class for the engine: arbitrary
per-key state with event-time timeouts, the Structured Streaming
equivalent of Flink's KeyedProcessFunction.

State is per group key, partitioned by the shuffle — scales to any
key cardinality; each micro-batch touches only keys present in the
batch plus expiring timers.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_COUNT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
RUNNING_COUNT_STATE = "n bigint, total double"


def _running_count_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate a per-user (count, sum) across micro-batches."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_count_per_user(events: DataFrame) -> DataFrame:
    """Streaming per-user running aggregate with explicit state.

    (A plain groupBy().agg() in update mode computes the same result;
    the point here is the arbitrary-state surface — the pattern that
    generalizes to sessionization, CDC reconciliation, enrichment
    caches, and other logic aggregates can't express.)

    Append output mode: each micro-batch appends the key's updated
    snapshot row (append is the only mode file sinks accept; readers
    take the latest row per key).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _running_count_fn,
        outputStructType=RUNNING_COUNT_SCHEMA,
        stateStructType=RUNNING_COUNT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SEEN_FIRST_SCHEMA = "user_id bigint, event_id bigint, ts timestamp"
SEEN_STATE = "max_seen bigint"


def _first_seen_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful dedup: emit only event_ids never seen before for this key
    (state keeps the max emitted id; ids are monotonic per source).

    Duplicates *within* a chunk are dropped too (drop_duplicates before
    the state filter) — producer-retry duplicates usually land close
    together in time, i.e. in the same micro-batch, so cross-batch
    state alone would pass them through.
    """
    (max_seen,) = state.get if state.exists else (-1,)
    out = []
    for pdf in batches:
        fresh = pdf.drop_duplicates(subset=["event_id"])
        fresh = fresh[fresh["event_id"] > max_seen]
        if len(fresh):
            out.append(fresh[["user_id", "event_id", "ts"]])
            max_seen = int(fresh["event_id"].max())
    state.update((max_seen,))
    if out:
        yield pd.concat(out)


def stateful_dedup_per_user(events: DataFrame) -> DataFrame:
    """Replay-tolerant streaming dedup with explicit per-key state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=SEEN_FIRST_SCHEMA,
        stateStructType=SEEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
SESSION_STATE = "start_ms bigint, end_ms bigint, n bigint"
SESSION_GAP_MS = 10 * 60 * 1000


def _session_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Timer-driven sessionizer: extend the open session with arriving
    events; when the event-time timer fires (watermark passed
    session_end + gap, i.e. the state timed out with no new events),
    emit the closed session and clear state.

    This is the Flink KeyedProcessFunction-with-timers pattern —
    emission is triggered by TIME, not by data arrival — which plain
    ``session_window`` aggregation can't express when the per-session
    output needs custom logic.
    """

    def emit(start_ms: int, end_ms: int, n: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(end_ms, unit="ms")],
                "n_events": [n],
            }
        )

    if state.hasTimedOut:
        start_ms, end_ms, n = state.get
        state.remove()
        yield emit(start_ms, end_ms, n)
        return

    start_ms, end_ms, n = state.get if state.exists else (None, None, 0)
    # applyInPandasWithState guarantees no intra-batch ordering: collect
    # the whole micro-batch's timestamps and sort before folding, or an
    # out-of-order event would prematurely split a session.
    ts_all: list[int] = []
    for pdf in batches:
        ts_all.extend((pdf["ts"].astype("int64") // 1_000_000).tolist())
    for t in sorted(ts_all):
        if start_ms is None:
            start_ms, end_ms, n = t, t, 1
        elif t - end_ms <= SESSION_GAP_MS:
            end_ms, n = max(end_ms, t), n + 1
        else:
            yield emit(start_ms, end_ms, n)  # gap exceeded in-stream
            start_ms, end_ms, n = t, t, 1
    if start_ms is not None:
        state.update((start_ms, end_ms, n))
        state.setTimeoutTimestamp(end_ms + SESSION_GAP_MS)


def sessionize_per_user(events: DataFrame) -> DataFrame:
    """Gap-based sessions via explicit state + event-time timers.

    Requires a watermark on ``ts`` upstream (the timer fires when the
    watermark passes session_end + gap). State per key is three longs —
    constant, regardless of session length.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

"""Streaming observability: per-batch progress metrics.

The reference relies on the Flink dashboard for throughput/lag
visibility; the Structured-Streaming-native equivalent is a
StreamingQueryListener receiving QueryProgressEvents. This one keeps a
bounded in-memory window of progress snapshots and running totals —
enough for a health endpoint or log shipper to poll — without touching
the data path (listeners run on the driver, off the query thread).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from threading import Lock

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class ProgressSnapshot:
    query_id: str
    batch_id: int
    num_input_rows: int
    batch_duration_ms: int
    sources: list = field(default_factory=list)


class ReplicationMetricsListener(StreamingQueryListener):
    """Collects per-batch input-row counts and durations.

    ``window`` bounds driver memory: only the most recent N snapshots
    are retained; totals are running sums. Attach with
    ``spark.streams.addListener(listener)``; detach with
    ``removeListener`` when the query stops.
    """

    def __init__(self, window: int = 256):
        self._lock = Lock()
        self.recent: deque[ProgressSnapshot] = deque(maxlen=window)
        self.total_rows = 0
        self.total_batches = 0

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (API name)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        snap = ProgressSnapshot(
            query_id=str(p.id),
            batch_id=p.batchId,
            num_input_rows=p.numInputRows,
            batch_duration_ms=p.batchDuration,
            sources=[s.description for s in p.sources],
        )
        with self._lock:
            self.recent.append(snap)
            self.total_rows += snap.num_input_rows
            self.total_batches += 1

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- polling surface ---------------------------------------------------
    def throughput_rows_per_sec(self) -> float:
        """Mean rows/sec over the retained window (0 when idle)."""
        with self._lock:
            ms = sum(s.batch_duration_ms for s in self.recent)
            rows = sum(s.num_input_rows for s in self.recent)
        return (rows * 1000.0 / ms) if ms > 0 else 0.0

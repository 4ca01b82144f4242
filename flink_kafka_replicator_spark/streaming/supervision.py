"""Driver-side restart supervision for streaming queries.

The reference configures Flink's fixed-delay restart strategy —
4 attempts, 10 s apart (FlinkKafkaReplicator.java:99) — and the Flink
runtime resumes the job from its last checkpoint on each restart.
Structured Streaming has no engine-side equivalent for a *stopped*
query, so SURVEY §2.3 maps it to this driver loop: restart the query
from its checkpoint location, which replays from committed offsets
exactly like Flink's restore.

Failure classification mirrors the reference's behavior:
  - errors raised while *starting* the query (bad config, missing
    source, analysis errors) are fatal — Flink would also fail the
    submission, not restart it;
  - errors raised while the query *runs* surface as
    StreamingQueryException from awaitTermination() — these are the
    transient class (broker hiccup, executor loss, sink timeout) the
    fixed-delay strategy exists for.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.errors import StreamingQueryException

# reference: fixedDelayRestart(4, Time.of(10, TimeUnit.SECONDS))
DEFAULT_MAX_RESTARTS = 4
DEFAULT_RESTART_DELAY_S = 10.0


def supervise(
    start_query: Callable[[], "object"],
    max_restarts: int = DEFAULT_MAX_RESTARTS,
    restart_delay_s: float = DEFAULT_RESTART_DELAY_S,
    sleep: Callable[[float], None] = time.sleep,
    on_restart: Callable[[int, Exception], None] | None = None,
) -> int:
    """Run a streaming query under fixed-delay restart supervision.

    ``start_query()`` must build AND start the query against the same
    checkpoint location every time — the restart resumes from committed
    offsets/state, it never reprocesses acknowledged data.

    Returns the number of restarts consumed once the query terminates
    normally (e.g. ``stop()`` or an exhausted availableNow trigger).
    Re-raises the query's error when ``max_restarts`` is exhausted, and
    lets startup errors propagate immediately (fatal, not restartable).
    """
    restarts = 0
    while True:
        query = start_query()
        try:
            query.awaitTermination()
            return restarts
        except StreamingQueryException as exc:
            if restarts >= max_restarts:
                raise
            restarts += 1
            if on_restart is not None:
                on_restart(restarts, exc)
            sleep(restart_delay_s)


def await_drained(query, timeout_sec: int, job_name: str) -> None:
    """Block until an availableNow query drains, failing LOUDLY on
    timeout. ``awaitTermination(timeout)`` returns False when the
    timeout elapsed with the query still running; exiting 0 there would
    let process exit kill the driver mid-write and report a partial run
    as success (the corpus-build/vector-search CLI contract). Stops the
    query and raises instead — re-running with the same checkpoint
    resumes exactly where the drain stopped."""
    drained = query.awaitTermination(timeout_sec)
    if query.exception() is not None:
        raise query.exception()
    if not drained:
        query.stop()
        raise RuntimeError(
            f"{job_name} did not drain within {timeout_sec}s; stopped "
            "the query — re-run with the same checkpoint to resume, or "
            "raise --timeout-sec"
        )

"""Shared streaming-test helpers.

`drain` replaces raw ``q.awaitTermination(timeout)`` calls: the raw form
silently returns False when the timeout elapses before the query finishes,
so under suite load a test could read a half-drained sink and fail on the
*assertion* instead of the real cause (VERDICT r9 "What's wrong" #1 —
the same unchecked-return bug class fixed in the CLIs in commit ef234d4).
"""

from __future__ import annotations


def drain(q, timeout_sec: float = 600) -> None:
    """Block until the streaming query terminates; fail loudly on timeout.

    Used with ``trigger(availableNow=True)`` / one-shot queries, which are
    guaranteed to terminate once all input is processed. Asserting the
    return converts a load-dependent half-drain into an explicit,
    attributable failure instead of a downstream sink-content mismatch.
    """
    done = q.awaitTermination(timeout_sec)
    if not done:
        # Grab what we can for the failure message, then stop the query so
        # the suite doesn't leak a running stream into later tests.
        status = None
        try:
            status = q.status
        finally:
            q.stop()
            q.awaitTermination(30)
        raise AssertionError(
            f"streaming query did not drain within {timeout_sec}s "
            f"(status={status}); sink state would be incomplete"
        )

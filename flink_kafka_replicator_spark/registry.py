"""Query registry: query-id → (Spark callable, DuckDB oracle SQL).

Aggregates the per-module QUERIES/ORACLES dicts. ``__spark_entry__``
re-exports these for the driver; tests iterate the same registry, so
the local pytest gate and the driver's correctness gate check the
identical surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    advanced,
    aggregates,
    joins,
    replication,
    reshape,
    scalar_fns,
    setops,
    sql_surface,
    streaming_batch,
    windows,
)

from .functions import pipeline_queries

_MODULES = [
    replication,
    aggregates,
    joins,
    windows,
    setops,
    scalar_fns,
    sql_surface,
    advanced,
    reshape,
    streaming_batch,
    pipeline_queries,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        dup = set(out) & set(m.QUERIES)
        if dup:
            raise ValueError(f"duplicate query ids {dup} in {m.__name__}")
        out.update(m.QUERIES)
    return out

def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        dup = set(out) & set(m.ORACLES)
        if dup:
            raise ValueError(f"duplicate oracle ids {dup} in {m.__name__}")
        out.update(m.ORACLES)
    unknown = set(out) - set(all_queries())
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    return out

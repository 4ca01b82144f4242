"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``flink_kafka_replicator_spark``; this module
is a thin adapter over its registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_kafka_replicator_spark import registry
from flink_kafka_replicator_spark.operators.aggregates import agg_hash_groupby

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on sf0.001."""
    return agg_hash_groupby(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.5."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query id.

    Keys absent here get the weaker rows-only check — each such id is
    intentional and documented in ``registry.ROWS_ONLY_CONTRACT``
    (why no exact SQL twin exists + which pytest pins its bound).
    """
    return registry.all_oracles()


# re-export for auditors: id → rationale for every rows-only query
ROWS_ONLY_CONTRACT = registry.ROWS_ONLY_CONTRACT

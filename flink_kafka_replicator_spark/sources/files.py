"""File-based KafkaMessage-envelope streams.

Used two ways:
  - tests: an unbounded micro-batch stream over parquet files shaped
    like the canonical envelope (SURVEY.md §1.4) — the broker-free
    harness for replication semantics;
  - production: generic file source for batch backfills of the same
    pipeline (identical plan either way — the unified batch/stream
    model is the point of Structured Streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..model import KAFKA_MESSAGE


def envelope_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(KAFKA_MESSAGE)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def envelope_batch(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(KAFKA_MESSAGE).parquet(path)

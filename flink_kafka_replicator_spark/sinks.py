"""Batch sinks: sharded training-corpus output.

The reference's only sink is Kafka (FlinkKafkaReplicator.java:120-124);
a training-data engine also needs durable, shard-addressable corpus
output. Sharding is content-hash-based (same arithmetic as the
``corpus_shard_assign`` query) so re-runs land every document in the
same shard regardless of input partitioning — idempotent overwrite at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SHARDS = 16


def with_shard(df: DataFrame, text_col: str = "text", n_shards: int = DEFAULT_SHARDS) -> DataFrame:
    """Stable content-hash shard id (md5 head mod n)."""
    return df.withColumn(
        "shard",
        F.conv(F.substring(F.md5(text_col), 1, 4), 16, 10).cast("long") % n_shards,
    )


def write_sharded_corpus(
    df: DataFrame,
    out_dir: str,
    text_col: str = "text",
    n_shards: int = DEFAULT_SHARDS,
) -> None:
    """Write the corpus hive-partitioned by shard.

    The ``repartition(n_shards, shard)`` before the write is the scale
    move: without it every write task opens a file in every shard
    directory (tasks × shards small files — the classic partitioned-
    write mistake); with it each shard is written by one task's worth
    of colocated rows. Dynamic overwrite replaces only the shards
    being rewritten.
    """
    sharded = with_shard(df, text_col, n_shards)
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def read_corpus_shard(spark: SparkSession, out_dir: str, shard: int) -> DataFrame:
    """Read one shard; the equality filter on the partition column prunes
    directory listing to that shard (PartitionFilters in the scan — a
    1/n_shards IO reduction that tests assert)."""
    return spark.read.parquet(out_dir).filter(F.col("shard") == shard)

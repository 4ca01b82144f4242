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


# ------------------------------------------------------------ near-dup index

BANDS_SUBDIR = "bands"
BAND_STATS_SUBDIR = "band_stats"


def write_minhash_index(
    df: DataFrame, out_dir: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Persist the near-dup index artifact: the banded-minhash table
    ``(id, band_key)`` PLUS per-band-key occurrence counts.

    The statistics are the point. Incremental dedup joins each new batch
    against this index on ``band_key``, and LSH hygiene must drop
    degenerate hot keys on BOTH sides — but re-counting the index side's
    keys per ingested batch is an aggregate over the (huge, static)
    index. Writing the counts once at build time turns that into a
    pushed ``n <= MAX_BUCKET`` filter on a tiny stats parquet: per-batch
    work then touches the index only through the bipartite equi-join.

    The stats are aggregated from the PERSISTED band files (read-back,
    not the in-memory plan) so they describe exactly what a later reader
    sees, even if the banding expression changes between versions.
    """
    spark = df.sparkSession
    bands_path = f"{out_dir}/{BANDS_SUBDIR}"
    from .functions.similarity import banded_minhash

    (
        banded_minhash(df, id_col, text_col)
        .select(F.col(id_col), "band_key")
        .write.mode("overwrite")
        .parquet(bands_path)
    )
    (
        spark.read.parquet(bands_path)
        .groupBy("band_key")
        .agg(F.count("*").alias("n"))
        .write.mode("overwrite")
        .parquet(f"{out_dir}/{BAND_STATS_SUBDIR}")
    )


def read_minhash_index(
    spark: SparkSession, out_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(bands, band_stats) from a persisted minhash index artifact."""
    return (
        spark.read.parquet(f"{out_dir}/{BANDS_SUBDIR}"),
        spark.read.parquet(f"{out_dir}/{BAND_STATS_SUBDIR}"),
    )

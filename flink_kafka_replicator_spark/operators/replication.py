"""Replication-core semantics recast as verifiable batch queries.

The reference's whole data path is Kafka-regex-source → identity →
Kafka-sink (reference: FlinkKafkaReplicator.java:126-134). Each query
here pins one of those semantics onto the driver's ``events`` table
(the KafkaMessage analog — FIXTURES.md §2): regex topic selection,
envelope projection, identity pass-through, partition routing,
start-from-latest offsets, and the control-plane's null-aware topic
config diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

# Regex selection of "topics" — the FlinkKafkaConsumer subscribe pattern
# (reference: FlinkKafkaReplicator.java:111,182). event_type plays topic.
TOPIC_PATTERN = "^(purchase|click)$"


def scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source scan + envelope projection (O1/O2).

    (reference: KafkaMessageDeserializationSchema.java:14-22 — copy the
    six envelope fields; here: project the event envelope columns.)
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "ts", "user_id", "event_type", "value")


def topic_pattern_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex topic selection (reference: FlinkKafkaReplicator.java:111).

    In the engine proper this is source-level (``subscribePattern``);
    as a batch query it is a pushed-down rlike predicate.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").rlike(TOPIC_PATTERN)).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def identity_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The identity transform — the reference's entire "query"
    (reference: FlinkKafkaReplicator.java:126-134). Catalyst folds the
    projection away; the plan is a bare columnar scan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "ts", "user_id", "event_type", "value", "props")


def partition_preserve_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-preserving vs recomputed routing (O4).

    (reference: KafkaMessageSerializationSchema.java:19 — keep source
    partition, or null it out so the producer re-hashes the key.)
    ``src_partition`` models the carried source partition;
    ``routed_partition`` models DefaultPartitioner-style key hashing
    (here a stable mod over the key analog ``user_id``).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.pmod(F.col("event_id"), F.lit(4)).cast("int").alias("src_partition"),
        F.pmod(F.col("user_id"), F.lit(8)).cast("int").alias("routed_partition"),
    )


def latest_offset_per_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Start-from-latest semantics (reference: FlinkKafkaReplicator.java:114-118):
    the per-topic high-water mark a latest-start consumer would resume from."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.max("ts").alias("latest_ts"),
        F.max("event_id").alias("latest_offset"),
        F.count("*").alias("n_events"),
    )


def topic_config_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-aware config diff (C4; reference: FlinkKafkaReplicator.java:247-269).

    The reference compares every topic config entry between source and
    target clusters with null-aware equality. Relationally that is a
    FULL OUTER JOIN of the two config views with a NOT(<=>) mismatch
    filter. Here the two "clusters" are derived views over events.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    src = (
        ev.filter(F.col("user_id") % 2 == 0)
        .groupBy(F.col("event_type").alias("topic"))
        .agg(F.count("*").alias("src_n"), F.max(k).alias("src_max_k"))
    )
    dst = (
        ev.filter(F.col("user_id") % 3 == 0)
        .groupBy(F.col("event_type").alias("topic"))
        .agg(F.count("*").alias("dst_n"), F.max(k).alias("dst_max_k"))
    )
    joined = src.join(dst, ["topic"], "full_outer")
    mismatch = ~F.col("src_n").eqNullSafe(F.col("dst_n")) | ~F.col(
        "src_max_k"
    ).eqNullSafe(F.col("dst_max_k"))
    return joined.filter(mismatch).select(
        "topic", "src_n", "dst_n", "src_max_k", "dst_max_k"
    )


QUERIES = {
    "scan_events": scan_events,
    "topic_pattern_filter": topic_pattern_filter,
    "identity_passthrough": identity_passthrough,
    "partition_preserve_routing": partition_preserve_routing,
    "latest_offset_per_topic": latest_offset_per_topic,
    "topic_config_diff": topic_config_diff,
}

ORACLES = {
    "scan_events": """
        SELECT event_id, ts, user_id, event_type, value FROM events
    """,
    "topic_pattern_filter": """
        SELECT event_id, ts, user_id, event_type, value
        FROM events
        WHERE regexp_matches(event_type, '^(purchase|click)$')
    """,
    "identity_passthrough": """
        SELECT event_id, ts, user_id, event_type, value, props FROM events
    """,
    "partition_preserve_routing": """
        SELECT event_id,
               event_type,
               CAST(event_id % 4 AS INTEGER) AS src_partition,
               CAST(user_id % 8 AS INTEGER)  AS routed_partition
        FROM events
    """,
    "latest_offset_per_topic": """
        SELECT event_type,
               MAX(ts)       AS latest_ts,
               MAX(event_id) AS latest_offset,
               COUNT(*)      AS n_events
        FROM events
        GROUP BY event_type
    """,
    "topic_config_diff": """
        WITH src AS (
            SELECT event_type AS topic,
                   COUNT(*) AS src_n,
                   MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS src_max_k
            FROM events WHERE user_id % 2 = 0 GROUP BY event_type
        ), dst AS (
            SELECT event_type AS topic,
                   COUNT(*) AS dst_n,
                   MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS dst_max_k
            FROM events WHERE user_id % 3 = 0 GROUP BY event_type
        )
        SELECT topic, src_n, dst_n, src_max_k, dst_max_k
        FROM src FULL OUTER JOIN dst USING (topic)
        WHERE (src_n IS DISTINCT FROM dst_n)
           OR (src_max_k IS DISTINCT FROM dst_max_k)
    """,
}

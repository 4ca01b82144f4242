"""Data model: the KafkaMessage envelope and Topic metadata object.

The reference's single record type is ``KafkaMessage``
(reference: KafkaMessage.java:5-11) — topic/partition/timestamp plus
opaque byte key/value and headers. That maps 1:1 onto Spark's built-in
Kafka source schema (SURVEY.md §1.4); we declare it once here and use
it for synthetic streams in tests and for the replication pipeline.

``Topic`` is the control-plane value object (reference: Topic.java:8-35)
used by the admin pre-flight (streaming/admin.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Canonical envelope: Spark Kafka source columns with includeHeaders=true.
# (reference: KafkaMessage.java:5-11; KafkaMessageDeserializationSchema.java:14-22)
KAFKA_MESSAGE = StructType(
    [
        StructField("topic", StringType(), False),
        StructField("partition", IntegerType(), False),
        StructField("offset", LongType(), True),
        StructField("timestamp", TimestampType(), False),
        StructField("key", BinaryType(), True),
        StructField("value", BinaryType(), True),
        StructField(
            "headers",
            ArrayType(
                StructType(
                    [
                        StructField("key", StringType(), False),
                        StructField("value", BinaryType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

ENVELOPE_COLUMNS = [f.name for f in KAFKA_MESSAGE.fields]


@dataclass
class Topic:
    """Kafka topic metadata (reference: Topic.java:8-10).

    ``config`` is the per-topic config map (reference Topic.getConfigMap,
    Topic.java:28-35 — there a lazy Properties→Map conversion; a plain
    dict here).
    """

    name: str
    partitions: int
    config: dict[str, str | None] = field(default_factory=dict)

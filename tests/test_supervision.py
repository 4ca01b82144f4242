"""Restart supervision: the driver-side analog of the reference's
fixed-delay restart strategy (FlinkKafkaReplicator.java:99).

The test kills a running file-source stream mid-run (poison pill in
foreachBatch), then observes the supervisor restart it against the
same checkpoint location and finish with every input row delivered
exactly once — i.e. the restart resumed from committed offsets rather
than reprocessing or dropping data."""

from __future__ import annotations

import json

import pytest

from pyspark.errors import StreamingQueryException

from flink_kafka_replicator_spark.streaming.supervision import supervise


def _start_factory(spark, src, out_dir, ck, poison):
    """availableNow file stream → per-epoch JSON files (idempotent by
    epoch id, like a transactional sink). Raises once while the poison
    file exists: the first run dies mid-stream."""

    def write_batch(df, epoch_id):
        rows = sorted(r["id"] for r in df.collect())
        if poison.exists() and epoch_id >= 2:
            poison.unlink()
            raise RuntimeError("injected transient failure")
        (out_dir / f"epoch-{epoch_id}.json").write_text(json.dumps(rows))

    def start():
        return (
            spark.readStream.schema("id long")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .json(src)
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", str(ck))
            .trigger(availableNow=True)
            .start()
        )

    return start


def test_supervisor_restarts_and_resumes_from_checkpoint(spark, tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    poison = tmp_path / "poison"
    poison.touch()
    start = _start_factory(spark, str(tmp_path / "src"), out, tmp_path / "ck", poison)

    # build source AFTER factory so schema dir exists
    for i in range(4):
        spark.range(i * 10, (i + 1) * 10).coalesce(1).write.json(
            str(tmp_path / "src" / f"part{i}")
        )

    restarts = supervise(start, max_restarts=4, restart_delay_s=0.05)
    assert restarts == 1, "exactly one restart should have been consumed"

    got: list[int] = []
    for f in out.glob("epoch-*.json"):
        got.extend(json.loads(f.read_text()))
    assert sorted(got) == list(range(40)), (
        "restart must resume from committed offsets with no loss/dup"
    )


def test_supervisor_gives_up_after_max_restarts(spark, tmp_path):
    out = tmp_path / "out"
    out.mkdir()

    def always_fail(df, epoch_id):
        raise RuntimeError("permanently broken sink")

    def start():
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "10")
            .load()
            .writeStream.foreachBatch(always_fail)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )

    with pytest.raises(StreamingQueryException):
        supervise(start, max_restarts=2, restart_delay_s=0.05)


def test_supervisor_startup_errors_are_fatal(spark, tmp_path):
    """Errors before the query runs (bad config/source) must propagate
    immediately — the reference fails the submission, it does not
    restart it."""
    calls = {"n": 0}

    def bad_start():
        calls["n"] += 1
        raise ValueError("bad configuration")

    with pytest.raises(ValueError):
        supervise(bad_start, max_restarts=4, restart_delay_s=0.01)
    assert calls["n"] == 1


def test_supervised_exactly_once_replication_no_duplicates(spark, tmp_path):
    """Supervision + idempotence ledger together: the exactly-once file
    replication dies mid-run (poisoned writer), the supervisor restarts
    it against the same checkpoint, and the output contains every input
    row exactly once — the full crash-recovery story of the reference's
    EXACTLY_ONCE mode."""
    import datetime as dt

    from pyspark.sql import Row

    from flink_kafka_replicator_spark.model import KAFKA_MESSAGE
    from flink_kafka_replicator_spark.streaming.exactly_once import (
        IdempotentBatchSink,
        ParquetBatchWriter,
    )
    from flink_kafka_replicator_spark.streaming.replicate import (
        ReplicateConfig,
        build_replication,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(
            topic=f"t-{i % 2}",
            partition=i % 2,
            offset=i,
            timestamp=base + dt.timedelta(seconds=i),
            key=f"k{i}".encode(),
            value=f"v{i}".encode(),
            headers=[Row(key="h", value=b"x")],
        )
        for i in range(30)
    ]
    src = str(tmp_path / "src")
    # three files → three micro-batches with maxFilesPerTrigger=1
    for j in range(3):
        spark.createDataFrame(rows[j * 10 : (j + 1) * 10], KAFKA_MESSAGE).coalesce(
            1
        ).write.parquet(f"{src}/f{j}")

    out = str(tmp_path / "out")
    poison = tmp_path / "poison"
    poison.touch()

    class PoisonedOnceWriter(ParquetBatchWriter):
        def write(self, df, batch_id):
            if batch_id >= 1 and poison.exists():
                poison.unlink()
                raise RuntimeError("sink died mid-run")
            super().write(df, batch_id)

    sink = IdempotentBatchSink(
        PoisonedOnceWriter(out), ledger_dir=str(tmp_path / "ledger")
    )

    def start():
        cfg = ReplicateConfig(topics=".*")
        df = build_replication(
            spark,
            cfg,
            source_df=spark.readStream.schema(KAFKA_MESSAGE)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src),
        )
        return (
            df.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )

    from flink_kafka_replicator_spark.streaming.supervision import supervise

    restarts = supervise(start, max_restarts=4, restart_delay_s=0.05)
    assert restarts == 1
    got = spark.read.parquet(out)
    keys = sorted(bytes(r["key"]).decode() for r in got.collect())
    assert keys == sorted(f"k{i}" for i in range(30)), (
        "restart + ledger must deliver every row exactly once"
    )


class _FakeQuery:
    """Minimal StreamingQuery stand-in for the await_drained contract."""

    def __init__(self, drained: bool, exc: Exception | None = None):
        self._drained = drained
        self._exc = exc
        self.stopped = False

    def awaitTermination(self, timeout_sec):
        return self._drained

    def exception(self):
        return self._exc

    def stop(self):
        self.stopped = True


def test_await_drained_passes_on_clean_drain():
    from flink_kafka_replicator_spark.streaming.supervision import (
        await_drained,
    )

    q = _FakeQuery(drained=True)
    await_drained(q, 5, "job")
    assert not q.stopped


def test_await_drained_raises_query_exception_first():
    from flink_kafka_replicator_spark.streaming.supervision import (
        await_drained,
    )

    q = _FakeQuery(drained=True, exc=ValueError("sink blew up"))
    with pytest.raises(ValueError, match="sink blew up"):
        await_drained(q, 5, "job")


def test_await_drained_timeout_stops_and_raises():
    """ADVICE round 8: a timed-out availableNow drain returned exit 0
    with the query still running — process exit then killed the driver
    mid-write and a partial run reported success. await_drained must
    stop the query and raise."""
    from flink_kafka_replicator_spark.streaming.supervision import (
        await_drained,
    )

    q = _FakeQuery(drained=False)
    with pytest.raises(RuntimeError, match="did not drain within 7s"):
        await_drained(q, 7, "corpus-build")
    assert q.stopped, "the undrained query must be stopped before raising"

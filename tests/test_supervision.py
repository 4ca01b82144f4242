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

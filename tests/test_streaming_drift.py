"""Streaming drift monitor: per-micro-batch PSI vs a frozen reference
histogram equals the batch scorer on the same frames (unified model),
and a checkpoint replay is a no-op (idempotent batch partitions).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_kafka_replicator_spark.io import load_table
from flink_kafka_replicator_spark.streaming.drift_monitor import (
    batch_drift_scores,
    start_streaming_drift_monitor,
    write_reference_histogram,
)
from tests.streamutil import drain

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SCHEMA = "event_id bigint, value double"


def _collect_rows(spark, out):
    return {
        (r.batch_id, r.bin, r.n_batch, r.n_ref, r.share_batch,
         r.share_ref, r.psi_term)
        for r in spark.read.parquet(out).collect()
    }


def _run(spark, tmp_path, src, ref):
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = start_streaming_drift_monitor(
        spark,
        stream,
        ref_dir=ref,
        out_dir=str(tmp_path / "scores"),
        checkpoint_location=str(tmp_path / "ck"),
        available_now=True,
    )
    drain(q)
def test_streaming_drift_matches_batch_and_replays(spark, tmp_path):
    e = load_table(spark, SF_DIR, "events").select("event_id", "value")
    ref_frame = e.filter(F.col("event_id") % 2 == 0)
    live = e.filter(F.col("event_id") % 2 == 1)

    ref = str(tmp_path / "ref")
    write_reference_histogram(ref_frame, ref)

    # two micro-batches with DIFFERENT distributions: batch B is
    # value-shifted so its PSI must come out strictly larger
    src = str(tmp_path / "incoming")
    batch_a = live.filter(F.col("event_id") % 4 == 1)
    batch_b = live.filter(F.col("event_id") % 4 == 3).withColumn(
        "value", F.col("value") * 3 + F.lit(40.0)
    )
    batch_a.coalesce(1).write.parquet(src, mode="append")
    batch_b.coalesce(1).write.parquet(src, mode="append")

    _run(spark, tmp_path, src, ref)
    out = str(tmp_path / "scores")
    got = _collect_rows(spark, out)

    # stream == batch: score the same frames through the same function.
    # File→batch-id order is not guaranteed, so compare as a SET of
    # per-batch row groups (batch_id stripped) — equal groups mean the
    # streamed scores are exactly the batch scorer's on some ordering.
    batches = {
        r.batch_id
        for r in spark.read.parquet(out).select("batch_id").distinct().collect()
    }
    assert len(batches) == 2
    got_groups = {
        frozenset(t[1:] for t in got if t[0] == bid) for bid in batches
    }
    want_groups = set()
    for f in os.listdir(src):
        if not f.endswith(".parquet"):
            continue
        frame = spark.read.parquet(os.path.join(src, f)).selectExpr(
            "event_id", "value"
        )
        want_groups.add(
            frozenset(
                (r.bin, r.n_batch, r.n_ref, r.share_batch, r.share_ref,
                 r.psi_term)
                for r in batch_drift_scores(spark, frame, ref).collect()
            )
        )
    assert got_groups == want_groups

    # the shifted batch must alarm louder than the in-distribution one
    psi = {
        bid: sum(
            abs(r.psi_term)
            for r in spark.read.parquet(out)
            .filter(F.col("batch_id") == bid)
            .collect()
        )
        for bid in batches
    }
    lo, hi = sorted(psi.values())
    assert hi > 10 * max(lo, 1e-6), psi
    assert hi > 0.2, "shifted batch must cross the alarm line"

    # replay: rerun against the same checkpoint — a no-op
    _run(spark, tmp_path, src, ref)
    assert _collect_rows(spark, out) == got


def test_drift_monitor_cli_end_to_end(spark, tmp_path, capsys):
    """`drift-monitor --build-ref-from ...` freezes the reference and
    scores the stream in one invocation; the summary line reports one
    PSI per batch."""
    import json

    from flink_kafka_replicator_spark.cli import drift_monitor_main

    e = load_table(spark, SF_DIR, "events").select("event_id", "value")
    refsrc = str(tmp_path / "refsrc")
    e.filter(F.col("event_id") % 2 == 0).write.parquet(refsrc)
    src = str(tmp_path / "incoming")
    e.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        src, mode="append"
    )

    rc = drift_monitor_main(
        [
            "--source", src,
            "--ref-dir", str(tmp_path / "ref"),
            "--output", str(tmp_path / "scores"),
            "--build-ref-from", refsrc,
            "--checkpoint-location", str(tmp_path / "ck"),
        ],
        spark=spark,
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["batches"]) == 1
    # parity halves: the null test stays below the alarm line
    assert out["batches"][0]["psi"] < 0.2


def test_drift_monitor_default_checkpoint_dies_with_output(
    spark, tmp_path, capsys
):
    """Without --checkpoint-location the checkpoint lives INSIDE
    --output (ADVICE r11 / VERDICT r12 task 5): deleting the output
    deletes the checkpoint with it, so a re-run re-scores every batch
    and the merged report is COMPLETE — never the silent-omission mode
    where an orphaned /tmp checkpoint skips already-scored batches."""
    import json
    import shutil

    from flink_kafka_replicator_spark.cli import drift_monitor_main

    e = load_table(spark, SF_DIR, "events").select("event_id", "value")
    refsrc = str(tmp_path / "refsrc")
    e.filter(F.col("event_id") % 2 == 0).write.parquet(refsrc)
    src = str(tmp_path / "incoming")
    e.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        src, mode="append"
    )
    out = str(tmp_path / "scores")
    args = [
        "--source", src,
        "--ref-dir", str(tmp_path / "ref"),
        "--output", out,
        "--build-ref-from", refsrc,
    ]

    assert drift_monitor_main(args, spark=spark) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(first["batches"]) == 1
    # the default checkpoint landed inside the output dir
    assert os.path.isdir(os.path.join(out, "_checkpoint"))

    # delete the output (checkpoint goes with it), re-run: the batch
    # re-scores and the report covers it again — complete, not empty
    shutil.rmtree(out)
    assert drift_monitor_main(args, spark=spark) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["batches"] == first["batches"]

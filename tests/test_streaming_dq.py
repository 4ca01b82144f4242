"""Streaming dq-monitor (round 11): the rules engine + financial
reconciliation run per micro-batch through the SAME core functions as
the batch path, the merged batch-keyed partials equal the batch
``dq-audit`` reports over the same rows, and a checkpoint replay is a
no-op (idempotent batch partitions)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_kafka_replicator_spark.io import load_table
from flink_kafka_replicator_spark.operators.data_quality import (
    dq_reconciliation,
    dq_rules_engine,
)
from flink_kafka_replicator_spark.streaming.dq_monitor import (
    merged_dq_report,
    start_streaming_dq_monitor,
)
from tests.streamutil import drain

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _run(spark, tmp_path, src):
    schema = load_table(spark, SF_DIR, "orders").schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = start_streaming_dq_monitor(
        spark,
        stream,
        lineitem_df=load_table(spark, SF_DIR, "lineitem"),
        out_dir=str(tmp_path / "dq"),
        checkpoint_location=str(tmp_path / "ck"),
        available_now=True,
    )
    drain(q)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_dq_monitor_matches_batch_and_replays(spark, tmp_path):
    o = load_table(spark, SF_DIR, "orders")
    src = str(tmp_path / "incoming")
    # three micro-batches covering the whole orders table
    for m in range(3):
        o.filter(F.col("o_orderkey") % 3 == m).coalesce(1).write.parquet(
            src, mode="append"
        )

    _run(spark, tmp_path, src)
    out = str(tmp_path / "dq")

    # every batch wrote both checks
    for check in ("dq_rules_engine", "dq_reconciliation"):
        batches = {
            r.batch_id
            for r in spark.read.parquet(os.path.join(out, check))
            .select("batch_id")
            .distinct()
            .collect()
        }
        assert len(batches) == 3, f"{check}: {batches}"

    # stream == batch: the merged partials equal the dq-audit batch
    # reports over the same (complete) row set — counts, rates,
    # buckets, min/max diffs, everything
    assert _rows(merged_dq_report(spark, out, "dq_rules_engine")) == _rows(
        dq_rules_engine(spark, SF_DIR)
    )
    assert _rows(
        merged_dq_report(spark, out, "dq_reconciliation")
    ) == _rows(dq_reconciliation(spark, SF_DIR))

    # checkpoint replay: re-running against the same checkpoint with no
    # new files changes nothing
    before = {
        check: _rows(spark.read.parquet(os.path.join(out, check)))
        for check in ("dq_rules_engine", "dq_reconciliation")
    }
    _run(spark, tmp_path, src)
    for check, rows in before.items():
        assert _rows(
            spark.read.parquet(os.path.join(out, check))
        ) == rows, f"{check} changed on replay"


def test_streaming_dq_monitor_partial_coverage_reconciles(spark, tmp_path):
    """A batch of orders whose lineitems exist plus one with none: the
    no_lineitems bucket must appear exactly as the batch core reports
    it for that subset (the frozen recomputed artifact serves any
    order subset)."""
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    # fabricate an order key with no lineitems by shifting the key
    ghosts = o.limit(5).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    )
    src = str(tmp_path / "incoming")
    o.filter(F.col("o_orderkey") % 7 == 0).unionByName(ghosts).coalesce(
        1
    ).write.parquet(src, mode="append")

    _run(spark, tmp_path, src)
    merged = {
        r.bucket: r.n_orders
        for r in merged_dq_report(
            spark, str(tmp_path / "dq"), "dq_reconciliation"
        ).collect()
    }
    assert merged.get("no_lineitems", 0) >= 5
    from flink_kafka_replicator_spark.operators.data_quality import (
        reconciliation_recomputed,
        reconciliation_report_from,
    )

    want = {
        r.bucket: r.n_orders
        for r in reconciliation_report_from(
            o.filter(F.col("o_orderkey") % 7 == 0).unionByName(ghosts),
            reconciliation_recomputed(li),
        ).collect()
    }
    assert merged == want

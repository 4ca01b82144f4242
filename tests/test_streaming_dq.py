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


def _run_dual(spark, tmp_path, o_src, li_src):
    from flink_kafka_replicator_spark.streaming.dq_monitor import (
        start_streaming_dq_monitor_dual,
    )

    o_schema = load_table(spark, SF_DIR, "orders").schema
    li_schema = load_table(spark, SF_DIR, "lineitem").schema
    o_stream = spark.readStream.schema(o_schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(o_src)
    li_stream = spark.readStream.schema(li_schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(li_src)
    qo, ql = start_streaming_dq_monitor_dual(
        spark,
        o_stream,
        li_stream,
        out_dir=str(tmp_path / "dq"),
        checkpoint_location=str(tmp_path / "ck"),
        available_now=True,
    )
    drain(qo)
    drain(ql)


def test_dual_stream_monitor_interleaved_lineitems_match_batch(
    spark, tmp_path
):
    """The round-12 pin (VERDICT r11 task 5): lineitems arriving in
    batches AFTER their order row must still reconcile against their
    FINAL totals — the merged dual-stream report equals the batch
    report over the complete tables, which the start-frozen
    single-stream snapshot cannot do when the lineitem side grows."""
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    o_src = str(tmp_path / "orders_in")
    li_src = str(tmp_path / "lineitem_in")
    # orders land in 2 batches; every order's lineitems are split
    # ACROSS 3 batches by line number, so most orders are incomplete
    # when scored and only total up at the end of the stream
    for m in range(2):
        o.filter(F.col("o_orderkey") % 2 == m).coalesce(1).write.parquet(
            o_src, mode="append"
        )
    for m in range(3):
        li.filter(F.col("l_linenumber") % 3 == m).coalesce(
            1
        ).write.parquet(li_src, mode="append")

    _run_dual(spark, tmp_path, o_src, li_src)
    out = str(tmp_path / "dq")

    assert _rows(merged_dq_report(spark, out, "dq_rules_engine")) == _rows(
        dq_rules_engine(spark, SF_DIR)
    )
    assert _rows(
        merged_dq_report(spark, out, "dq_reconciliation")
    ) == _rows(dq_reconciliation(spark, SF_DIR))

    # replay: draining the same sources against the same checkpoints
    # changes nothing (dynamic overwrite of each batch's own partition)
    before = _rows(merged_dq_report(spark, out, "dq_reconciliation"))
    _run_dual(spark, tmp_path, o_src, li_src)
    assert _rows(
        merged_dq_report(spark, out, "dq_reconciliation")
    ) == before


def test_dual_stream_monitor_late_lineitems_rebucket(spark, tmp_path):
    """Sharp edge the snapshot design gets wrong: an order scored
    while its lineitems are missing would be stuck in no_lineitems
    forever; the dual monitor's merge re-buckets it once the late
    rows land."""
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    keys = [r.o_orderkey for r in o.select("o_orderkey").limit(3).collect()]
    o_sub = o.filter(F.col("o_orderkey").isin(keys))
    li_sub = li.filter(F.col("l_orderkey").isin(keys))

    o_src = str(tmp_path / "orders_in")
    li_src = str(tmp_path / "lineitem_in")
    o_sub.coalesce(1).write.parquet(o_src, mode="append")
    # batch 0 of lineitems: EMPTY coverage for these orders (a
    # different key range), their real rows only land in batch 1
    li.filter(~F.col("l_orderkey").isin(keys)).limit(10).coalesce(
        1
    ).write.parquet(li_src, mode="append")
    li_sub.coalesce(1).write.parquet(li_src, mode="append")

    _run_dual(spark, tmp_path, o_src, li_src)
    merged = {
        r.bucket: r.n_orders
        for r in merged_dq_report(
            spark, str(tmp_path / "dq"), "dq_reconciliation"
        ).collect()
    }
    assert merged.get("no_lineitems", 0) == 0, merged
    from flink_kafka_replicator_spark.operators.data_quality import (
        reconciliation_recomputed,
        reconciliation_report_from,
    )

    want = {
        r.bucket: r.n_orders
        for r in reconciliation_report_from(
            o_sub, reconciliation_recomputed(li_sub)
        ).collect()
    }
    assert merged == want

"""Streaming data-quality monitor — the ``dq-audit`` battery's rules
engine and financial reconciliation wired into a micro-batch loop
(round 11 — VERDICT r10 task 6): every arriving batch of order rows is
scored by the SAME core functions the batch path uses
(``operators.data_quality.rules_report`` /
``reconciliation_report_from``), so stream == batch is a theorem, not
a test of two implementations — the ``drift_monitor`` pattern.

Result layout: per check, batch-keyed MERGEABLE partials —
``out_dir/<check>/batch_id=K/`` — written with the engine's idempotent
recipe (streaming checkpoint + dynamic overwrite of each batch's own
partition; a replayed batch rewrites, never duplicates). The partials
merge EXACTLY: rule counts and bucket counts are additive, min/max
diffs combine as min-of-mins/max-of-maxes, violation rates are
recomputed from the summed counts — :func:`merged_dq_report` performs
the merge and is pytest-pinned equal to the batch query over the same
rows.

Scale: the rules engine is a map-side melt + broadcast rules join per
batch (∝ batch size). Reconciliation needs each order's recomputed
lineitem total; rescanning lineitem per micro-batch would make every
batch corpus-sized, so the monitor computes the (l_orderkey,
recomputed6) table ONCE at start and persists it next to the results
(``_recomputed/``) — per-batch work is then one equi-join of the
batch's orders against that artifact (at 100 TB: both sides keyed by
orderkey; the artifact is written bucketed-by-key in a real
deployment so the join co-locates)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.data_quality import (
    reconciliation_recomputed,
    reconciliation_report_from,
    rules_report,
)

DQ_MONITOR_CHECKS = ("dq_rules_engine", "dq_reconciliation")
_RECOMPUTED_SUBDIR = "_recomputed"
# dual-stream layout: per-key MERGEABLE state partials instead of a
# start-frozen lineitem snapshot (round 12 — VERDICT r11 task 5)
_ORDERS_STATE_SUBDIR = "_orders_state"
_LI_PARTIALS_SUBDIR = "_lineitem_partials"


def start_streaming_dq_monitor(
    spark: SparkSession,
    orders_stream: DataFrame,
    lineitem_df: DataFrame,
    out_dir: str,
    checkpoint_location: str,
    available_now: bool = True,
):
    """Monitor a stream of order rows: per micro-batch, write the
    rules-engine report and the reconciliation report (vs the frozen
    lineitem recomputation) as batch-keyed partials under
    ``out_dir/<check>/``."""
    recomputed_path = os.path.join(out_dir, _RECOMPUTED_SUBDIR)
    # freeze the lineitem-side recomputation once at monitor start —
    # idempotent across restarts (same input → same artifact), and a
    # restart with a GROWN lineitem table rebuilds it before any new
    # batch is scored
    reconciliation_recomputed(lineitem_df).write.mode(
        "overwrite"
    ).parquet(recomputed_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        recomputed = spark.read.parquet(recomputed_path)
        reports = {
            "dq_rules_engine": rules_report(batch_df),
            "dq_reconciliation": reconciliation_report_from(
                batch_df, recomputed
            ),
        }
        for check, df in reports.items():
            (
                df.withColumn("batch_id", F.lit(batch_id))
                .coalesce(1)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(os.path.join(out_dir, check))
            )

    writer = orders_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_location
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_streaming_dq_monitor_dual(
    spark: SparkSession,
    orders_stream: DataFrame,
    lineitem_stream: DataFrame,
    out_dir: str,
    checkpoint_location: str,
    available_now: bool = True,
):
    """The dual-stream monitor: orders AND lineitems both arrive as
    streams, interleaved in any order. The single-stream monitor's
    start-frozen lineitem snapshot is wrong the moment a lineitem row
    lands after its order was scored (the order reconciles against a
    stale total forever); this variant replaces the snapshot with
    per-key MERGEABLE state partials — the same discipline the
    monitor's own report partials already use:

    - each orders batch appends its rows' ``(o_orderkey,
      o_totalprice)`` to ``out_dir/_orders_state/batch_id=K/`` (plus
      the usual per-batch rules partial, which is additive and
      order-complete per row, so it stays per-batch);
    - each lineitem batch appends its PARTIAL per-order recomputed
      totals (``reconciliation_recomputed`` over just that batch) to
      ``out_dir/_lineitem_partials/batch_id=K/`` — sums are mergeable,
      so a key split across batches adds up exactly;
    - the reconciliation is derived at MERGE time
      (:func:`merged_dq_report`): summed partials per order, then the
      same ``reconciliation_report_from`` core the batch query runs —
      an order whose lineitems span any number of batches (before OR
      after the order row) is bucketed against its FINAL total.
      Stream == batch under interleaving is again a theorem.

    Both legs use the engine's idempotent recipe (checkpoint + dynamic
    overwrite of each batch's own partition), with per-leg checkpoint
    subdirectories. At 100 TB both state tables are keyed by orderkey;
    a real deployment writes them bucketed so the merge join
    co-locates — per-batch work stays ∝ batch size, and the merge is
    one keyed aggregation + one keyed join.

    Returns (orders_query, lineitem_query)."""

    def process_orders(batch_df: DataFrame, batch_id: int) -> None:
        frames = {
            "dq_rules_engine": rules_report(batch_df),
            _ORDERS_STATE_SUBDIR: batch_df.select(
                "o_orderkey", "o_totalprice"
            ),
        }
        for sub, df in frames.items():
            (
                df.withColumn("batch_id", F.lit(batch_id))
                .coalesce(1)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(os.path.join(out_dir, sub))
            )

    def process_lineitem(batch_df: DataFrame, batch_id: int) -> None:
        (
            reconciliation_recomputed(batch_df)
            .withColumn("batch_id", F.lit(batch_id))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(os.path.join(out_dir, _LI_PARTIALS_SUBDIR))
        )

    queries = []
    for stream, process, leg in (
        (orders_stream, process_orders, "orders"),
        (lineitem_stream, process_lineitem, "lineitem"),
    ):
        writer = stream.writeStream.foreachBatch(process).option(
            "checkpointLocation",
            os.path.join(checkpoint_location, leg),
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        queries.append(writer.start())
    return tuple(queries)


def merged_dq_report(
    spark: SparkSession, out_dir: str, check: str
) -> DataFrame:
    """Merge a check's batch-keyed partials into the whole-stream
    report — exactly the frame the batch query produces over the same
    rows (pytest-pinned): counts sum, min/max combine, rates are
    recomputed from the summed counts.

    Reconciliation has two layouts: the single-stream monitor's
    per-batch bucket partials (additive — each order's lineitems were
    complete at scoring time), and the dual-stream monitor's per-key
    state partials, where the buckets are derived HERE from the summed
    per-order totals — the only point at which every order's total is
    final under interleaved arrival."""
    if check == "dq_reconciliation" and os.path.isdir(
        os.path.join(out_dir, _ORDERS_STATE_SUBDIR)
    ):
        orders = spark.read.parquet(
            os.path.join(out_dir, _ORDERS_STATE_SUBDIR)
        ).drop("batch_id")
        li = (
            spark.read.parquet(
                os.path.join(out_dir, _LI_PARTIALS_SUBDIR)
            )
            .drop("batch_id")
            .groupBy("l_orderkey")
            .agg(F.sum("recomputed6").alias("recomputed6"))
        )
        return reconciliation_report_from(orders, li)
    parts = spark.read.parquet(os.path.join(out_dir, check)).drop(
        "batch_id"
    )
    if check == "dq_rules_engine":
        return (
            parts.groupBy("rule_id", "col", "op", "thr")
            .agg(
                F.sum("n_checked").alias("n_checked"),
                F.sum("n_violations").alias("n_violations"),
            )
            .select(
                "rule_id",
                "col",
                "op",
                "thr",
                "n_checked",
                "n_violations",
                F.round(
                    F.col("n_violations") / F.col("n_checked"), 6
                ).alias("violation_rate"),
            )
        )
    if check == "dq_reconciliation":
        return parts.groupBy("bucket").agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.min("min_diff6").alias("min_diff6"),
            F.max("max_diff6").alias("max_diff6"),
        )
    raise ValueError(
        f"unknown dq-monitor check {check!r}; valid: {DQ_MONITOR_CHECKS}"
    )

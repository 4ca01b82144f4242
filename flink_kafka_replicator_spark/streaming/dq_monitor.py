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


def merged_dq_report(
    spark: SparkSession, out_dir: str, check: str
) -> DataFrame:
    """Merge a check's batch-keyed partials into the whole-stream
    report — exactly the frame the batch query produces over the same
    rows (pytest-pinned): counts sum, min/max combine, rates are
    recomputed from the summed counts."""
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

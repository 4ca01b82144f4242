"""Streaming distribution-drift monitor — the deployable twin of the
``dq_distribution_drift`` query: a reference histogram is frozen ONCE
as a tiny on-disk artifact, and every arriving micro-batch is scored
against it (per-bucket counts, Laplace-smoothed shares, PSI terms),
results appended as batch-keyed partitions.

The operational loop this ships: freeze the reference from a vetted
window (``write_reference_histogram``), point the monitor at the live
stream, alert when a batch's ``sum(psi_term) > 0.2`` (the classic
line). Catches an upstream schema/unit/population change before it
poisons a training run.

Exactly-once on the result side is the engine's standard recipe:
streaming checkpoint + dynamic overwrite of each batch's own
``batch_id=K`` partition — a replayed batch rewrites its partition,
never duplicates rows. The reference artifact is read ONCE at monitor
start (it is frozen by contract; re-freezing is a new monitor).

Scale: per batch the work is one map-side binning pass + a ≤bins-key
aggregate + a broadcast join against the ≤bins-row reference — linear
in batch size, constant state, no window operators, no raw-data
retention. Bins are FIXED width (no data-dependent min/max), so batch
histograms are comparable across time by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..operators.data_quality import PSI_BIN_W, PSI_BINS

REF_HIST_FILE = "ref_histogram.parquet"


def _binned(df: DataFrame, value_col: str) -> DataFrame:
    return df.select(
        F.least(
            F.floor(F.col(value_col) / F.lit(PSI_BIN_W)).cast("int"),
            F.lit(PSI_BINS - 1),
        ).alias("bin")
    )


def write_reference_histogram(
    df: DataFrame, out_dir: str, value_col: str = "value"
) -> None:
    """Freeze the reference histogram from a vetted batch frame: one
    (bin, n_ref) row per occupied fixed-width bucket, plus the total in
    every row (denormalized so the monitor needs no second artifact)."""
    hist = _binned(df, value_col).groupBy("bin").agg(
        F.count("*").alias("n_ref")
    )
    total = hist.agg(F.sum("n_ref").alias("t_ref"))
    (
        hist.crossJoin(broadcast(total))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, REF_HIST_FILE))
    )


def batch_drift_scores(
    spark: SparkSession,
    batch_df: DataFrame,
    ref_dir: str,
    value_col: str = "value",
) -> DataFrame:
    """Score one batch frame against the frozen reference: per-bucket
    (bin, n_batch, n_ref, share_batch, share_ref, psi_term). The SAME
    function serves the batch and streaming paths (unified model), so
    stream == batch is a theorem, pinned by the test. Buckets missing
    from either side still score (full outer join + Laplace smoothing
    keeps every term finite)."""
    ref = spark.read.parquet(os.path.join(ref_dir, REF_HIST_FILE))
    t_ref_row = ref.select("t_ref").limit(1)
    cnt = _binned(batch_df, value_col).groupBy("bin").agg(
        F.count("*").alias("n_batch")
    )
    total = cnt.agg(F.sum("n_batch").alias("t_batch"))
    joined = (
        cnt.join(ref.select("bin", "n_ref"), "bin", "full_outer")
        .crossJoin(broadcast(total))
        .crossJoin(broadcast(t_ref_row))
        .select(
            "bin",
            F.coalesce("n_batch", F.lit(0)).alias("n_batch"),
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            (
                (F.coalesce("n_batch", F.lit(0)) + 1)
                / (F.coalesce("t_batch", F.lit(0)) + F.lit(PSI_BINS))
            ).alias("p"),
            (
                (F.coalesce("n_ref", F.lit(0)) + 1)
                / (F.col("t_ref") + F.lit(PSI_BINS))
            ).alias("q"),
        )
    )
    lnq = "floor(ln(p / q) * 1000000.0D) / 1000000.0D"
    return joined.select(
        "bin",
        "n_batch",
        "n_ref",
        F.round("p", 6).alias("share_batch"),
        F.round("q", 6).alias("share_ref"),
        F.round(F.expr(f"(p - q) * ({lnq})"), 6).alias("psi_term"),
    )


def start_streaming_drift_monitor(
    spark: SparkSession,
    source_df: DataFrame,
    ref_dir: str,
    out_dir: str,
    checkpoint_location: str,
    value_col: str = "value",
    available_now: bool = True,
):
    """Monitor a value stream for drift vs the frozen reference: per
    micro-batch, write the per-bucket PSI rows to ``out_dir``
    partitioned by batch id (replays overwrite their own partition —
    the engine's idempotent result-sink recipe)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        scores = batch_drift_scores(spark, batch_df, ref_dir, value_col)
        (
            scores.withColumn("batch_id", F.lit(batch_id))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    writer = source_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_location
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

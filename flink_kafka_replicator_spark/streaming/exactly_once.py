"""Exactly-once sink: foreachBatch + batch-id idempotence ledger.

Spark's Kafka sink is at-least-once; the reference's exactly-once mode
(two-phase-commit producer bound to checkpoints, reference:
FlinkKafkaReplicator.java:124 EXACTLY_ONCE semantic) is rebuilt here
the Structured-Streaming way (SURVEY.md §4.3):

  - the streaming engine guarantees ``foreachBatch`` is invoked with a
    monotonically increasing ``batch_id``, replayed with the SAME id
    after failure;
  - the writer consults a committed-batch ledger and skips batches it
    has already committed → replays become no-ops → end-to-end
    exactly-once for any transactional/atomic downstream write.

The downstream "transaction" here is pluggable: the bundled
ParquetBatchWriter commits atomically via write-to-staging + rename,
which is the broker-free stand-in for a Kafka transactional producer
(send all + commitTransaction). A real Kafka writer plugs in behind
the same BatchWriter protocol.
"""

from __future__ import annotations

import os
import shutil
from typing import Protocol

from pyspark.sql import DataFrame


class BatchWriter(Protocol):
    def write(self, df: DataFrame, batch_id: int) -> None:
        """Atomically publish one micro-batch. Must either fully commit
        or leave no visible output (the transactional contract)."""
        ...


class ParquetBatchWriter:
    """Atomic per-batch parquet publication: write to a staging dir,
    rename into place. Rename is the commit point."""

    def __init__(self, output_dir: str):
        self.output_dir = output_dir

    def write(self, df: DataFrame, batch_id: int) -> None:
        final = os.path.join(self.output_dir, f"batch={batch_id}")
        staging = os.path.join(self.output_dir, f".staging-{batch_id}")
        if os.path.exists(staging):
            shutil.rmtree(staging)
        df.write.mode("overwrite").parquet(staging)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(staging, final)


class IdempotentBatchSink:
    """The foreachBatch function with a committed-batch ledger.

    Ledger = one empty file per committed batch id, created *after* the
    writer's atomic commit. On replay (same batch_id) the write is
    skipped — the semantics of the reference's checkpoint-committed
    transactions, without requiring broker transactions.
    """

    def __init__(self, writer: BatchWriter, ledger_dir: str):
        self.writer = writer
        self.ledger_dir = ledger_dir
        os.makedirs(ledger_dir, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.ledger_dir, f"committed-{batch_id}")

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        if self.is_committed(batch_id):
            return  # replayed batch → exactly-once skip
        self.writer.write(df, batch_id)
        with open(self._marker(batch_id), "w") as f:
            f.write("")


def start_exactly_once_file_replication(
    spark,
    cfg,
    input_path: str,
    output_path: str,
    checkpoint_location: str,
):
    """Exactly-once variant of the file replication harness."""
    from ..sources.files import envelope_stream
    from .replicate import build_replication

    cfg.validate()
    df = build_replication(spark, cfg, source_df=envelope_stream(spark, input_path))
    sink = IdempotentBatchSink(
        ParquetBatchWriter(output_path),
        ledger_dir=os.path.join(checkpoint_location, "_ledger"),
    )
    return (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_location)
        .trigger(availableNow=True)
        .start()
    )

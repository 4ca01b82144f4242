"""Streaming vector-index ingestion: embeddings arrive as a stream and
every micro-batch is admitted into the persisted ANN index
(``sinks.write_vector_index`` layout) through ``append_vector_delta`` —
the vector-store face of ``dedup_ingest``'s extend-index mode.

Each batch is cell-assigned and PQ-encoded with the index's FROZEN
coarse quantizer and codebook (loaded from disk — retraining is a
rebuild, exactly how production IVF-PQ indexes grow), landing as one
postings partition and one code partition keyed by the streaming batch
id. Exactly-once admission comes from the streaming checkpoint plus the
delta contract: contiguous delta ids, partitions written before the
atomic pointer swap, replays no-op (at-or-below the last committed id)
or dynamically overwrite only their own partitions. A crash between the
delta commit and the checkpoint commit therefore replays into a no-op,
and searches only ever see pointer-committed vectors.

At scale: per batch the work is |batch|·k centroid distances plus
|batch|·M·K subspace distances — linear in the batch, zero touches of
the existing index partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def start_streaming_vector_ingest(
    spark: SparkSession,
    source_df: DataFrame,
    index_dir: str,
    checkpoint_location: str,
    available_now: bool = True,
):
    """Stream (vec_id, embedding) rows into the persisted vector index
    at ``index_dir`` (which must already exist — build the base with
    ``sinks.write_vector_index``). Streaming batch N commits as delta
    N+1 (delta 0 is the base build)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from ..sinks import append_vector_batch

        # delta-numbered from the index meta's batch cursor, NOT from
        # batch_id arithmetic — compaction renumbers partitions, and a
        # batch-id-derived delta would then silently no-op (round-8
        # fix). A replay of the cursor batch is a no-op; a batch below
        # the cursor (fresh checkpoint against an extended index)
        # raises inside append_vector_batch rather than dropping data.
        admitted = append_vector_batch(
            spark,
            batch_df.select("vec_id", "embedding"),
            index_dir,
            batch_id,
        )
        if not admitted:
            import logging

            logging.getLogger(__name__).warning(
                "streaming vector ingest: batch %d already admitted "
                "(crash-replay no-op), index %s unchanged",
                batch_id,
                index_dir,
            )

    writer = source_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_location
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

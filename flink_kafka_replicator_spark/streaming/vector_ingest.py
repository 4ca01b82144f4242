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
        from ..sinks import _read_vindex_meta, append_vector_delta

        admitted = append_vector_delta(
            spark,
            batch_df.select("vec_id", "embedding"),
            index_dir,
            delta_id=batch_id + 1,
        )
        if not admitted:
            # a no-op append is legitimate ONLY for the one-step crash
            # replay (delta committed, checkpoint didn't: batch_id + 1
            # == last_delta_id). Anything deeper means the stream's
            # checkpoint does not match the index's delta progression —
            # typically a FRESH checkpoint against an already-extended
            # index, where every batch would silently no-op and
            # genuinely new vectors would never be admitted. Fail loudly.
            last = _read_vindex_meta(index_dir)["last_delta_id"]
            if batch_id + 1 < last:
                raise ValueError(
                    f"streaming vector ingest: batch {batch_id} maps to "
                    f"delta {batch_id + 1} but the index at {index_dir} "
                    f"has already committed delta {last} — the stream "
                    "checkpoint does not match the index (fresh "
                    "checkpoint against an extended index?); new "
                    "vectors would be silently dropped. Resume the "
                    "original checkpoint or rebuild the index."
                )
            import logging

            logging.getLogger(__name__).warning(
                "streaming vector ingest: delta %d already committed "
                "(crash-replay no-op), index %s unchanged",
                batch_id + 1,
                index_dir,
            )

    writer = source_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_location
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

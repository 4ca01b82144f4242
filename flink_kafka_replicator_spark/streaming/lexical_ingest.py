"""Streaming lexical-index ingestion: documents arrive as a stream and
every micro-batch is admitted into the persisted BM25 index
(``sinks.write_lexical_index`` layout) through ``append_lexical_batch``
— the lexical face of ``vector_ingest``.

Each batch is tokenized and aggregated with the index's frozen
whitespace pass, landing as one postings partition and one doclen
partition keyed by the streaming batch id; the vocabulary-sized dfreq
table and the two corpus counters merge additively (df, n_docs, sum_dl
are all sums over disjoint new documents, so served idf/length-norm
stay exact without a rebuild). Exactly-once admission comes from the
streaming checkpoint plus the delta contract: contiguous delta ids,
partitions written before the atomic pointer swap, replays no-op or
dynamically overwrite only their own partitions.

At scale: per batch the work is tokenize+aggregate the batch plus one
outer-merge of the vocabulary table — zero touches of the existing
postings partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def start_streaming_lexical_ingest(
    spark: SparkSession,
    source_df: DataFrame,
    index_dir: str,
    checkpoint_location: str,
    available_now: bool = True,
):
    """Stream (doc_id, text) rows into the persisted lexical index at
    ``index_dir`` (which must already exist — build the base with
    ``sinks.write_lexical_index``). Streaming batch N commits as the
    next contiguous delta per the index meta's batch cursor."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from ..sinks import append_lexical_batch

        # delta-numbered from the index meta's batch cursor, NOT from
        # batch_id arithmetic (compaction renumbers partitions — the
        # same round-8 fix the vector ingest carries). A replay of the
        # cursor batch is a no-op; a batch below the cursor raises
        # inside append_lexical_batch rather than dropping data.
        admitted = append_lexical_batch(
            batch_df.select("doc_id", "text"), index_dir, batch_id
        )
        if not admitted:
            import logging

            logging.getLogger(__name__).warning(
                "streaming lexical ingest: batch %d already admitted "
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

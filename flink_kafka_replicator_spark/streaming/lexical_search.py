"""Streaming BM25 query serving against the persisted lexical index —
the lexical leg's serve stage (round 9), mirroring
``streaming/vector_search`` exactly: ``sinks.write_lexical_index``
builds, THIS serves. Query rows (qid, terms array<string>) arrive as a
stream and every micro-batch is answered in one
``bm25_search_from_index`` plan (postings map-side filtered through the
broadcast query-term set; per-(qid, doc) scores folded in sorted-term
order so answers are byte-deterministic), with results appended as
batch-keyed partitions.

Exactly-once on the RESULT side comes from the streaming checkpoint +
dynamic overwrite of each batch's own ``batch_id=K`` partition: a
replayed batch rewrites its partition instead of duplicating answers.
The index is static (lexical indexes rebuild rather than patch — see
write_lexical_index), so there is no delta-pinning concern: every batch
serves the one committed build.

At scale: per batch the plan's work is ∝ the postings rows matching the
batch's term set — never a corpus scan; this is the online-serving
inner loop of a lexical search service.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def start_streaming_lexical_search(
    spark: SparkSession,
    source_df: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_location: str,
    k: int = 10,
    available_now: bool = True,
):
    """Stream (qid, terms) query rows; per micro-batch, write each
    query's top-``k`` (qid, doc_id, bm25, rank) answers to ``out_dir``
    partitioned by batch id (replays overwrite their own partition)."""
    from ..sinks import bm25_search_from_index

    def process(batch_df: DataFrame, batch_id: int) -> None:
        answers = bm25_search_from_index(
            spark, batch_df.select("qid", "terms"), index_dir, k=k
        )
        (
            answers.withColumn("batch_id", F.lit(batch_id))
            .coalesce(8)
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

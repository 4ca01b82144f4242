"""Streaming ANN query serving against the persisted vector index —
the third leg of the vector-store lifecycle this engine ships:
``sinks.write_vector_index`` builds, ``streaming/vector_ingest``
grows, and THIS serves: query vectors arrive as a stream and every
micro-batch is answered in one ``knn_batch_search_from_index`` plan
(per-query probe pruning + stacked-LUT ADC, raw embeddings never
touched), with results appended as batch-keyed partitions.

Exactly-once on the RESULT side comes from the streaming checkpoint +
dynamic overwrite of each batch's own ``batch_id=K`` partition (the
dedup_ingest sink recipe): a replayed batch rewrites its partition
instead of duplicating answers. The index is read at its
pointer-committed state per batch — queries racing an in-flight
APPEND see only committed deltas, never a partial index (new
partitions are invisible until the pointer swap). COMPACTION is a
maintenance operation, not a concurrent one: ``compact_vector_index``
prunes the old delta partitions right after its pointer swap, so a
serving batch that resolved the pre-compaction pointer can fail
mid-plan on removed files — run ``compact-index`` only while the
serving stream is stopped (the compact-index CLI's documented
contract), exactly as for the ingest streams.

At scale: per batch the plan's work is |batch| · (k centroid dots +
probed-fraction · M code adds) — linear in batch size, zero touches
of the raw vectors; this is the online-serving inner loop a vector
store runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def start_streaming_vector_search(
    spark: SparkSession,
    source_df: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_location: str,
    k: int = 5,
    n_probe: int | None = None,
    available_now: bool = True,
    refine_with: DataFrame | None = None,
    shortlist: int | None = None,
    mmr: bool = False,
):
    """Stream (qid, embedding) query rows; per micro-batch, write each
    query's top-``k`` (qid, vec_id, adc_dist, rank) answers to
    ``out_dir`` partitioned by batch id (replays overwrite their own
    partition).

    ``refine_with`` (a (vec_id, embedding) exact-vector table) switches
    each batch to the REFINED path — ADC shortlist then exact cosine
    re-rank (``sinks.knn_batch_search_refined_from_index``); answers
    then carry ``cos_sim`` and are ranked by exact similarity.
    ``mmr=True`` (requires ``refine_with``) diversifies each query's
    refined shortlist with the stacked per-qid MMR greedy
    (``sinks.mmr_rerank_from_index``); answers become (qid, rank,
    vec_id, rel, mmr)."""
    from ..sinks import (
        knn_batch_search_from_index,
        knn_batch_search_refined_from_index,
        mmr_rerank_from_index,
    )

    if mmr and refine_with is None:
        raise ValueError(
            "mmr=True requires refine_with (the exact-vector table): "
            "MMR's relevance and pairwise sims are exact cosines over "
            "the shortlist members"
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        queries = batch_df.select("qid", "embedding")
        if mmr:
            answers = mmr_rerank_from_index(
                spark,
                queries,
                index_dir,
                refine_with,
                k=k,
                n_probe=n_probe,
                adc_shortlist=shortlist,
            )
        elif refine_with is not None:
            answers = knn_batch_search_refined_from_index(
                spark,
                queries,
                index_dir,
                refine_with,
                k=k,
                n_probe=n_probe,
                shortlist=shortlist,
            )
        else:
            answers = knn_batch_search_from_index(
                spark, queries, index_dir, k=k, n_probe=n_probe
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

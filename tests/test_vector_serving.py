"""Batch + streaming ANN serving from the persisted vector index —
the serve leg of the build/ingest/serve lifecycle (round 8)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_kafka_replicator_spark.functions import pipeline_queries as pq
from flink_kafka_replicator_spark.io import load_table
from flink_kafka_replicator_spark.plans import formatted_plan
from flink_kafka_replicator_spark.sinks import (
    knn_batch_search_from_index,
    write_vector_index,
)
from flink_kafka_replicator_spark.streaming.vector_search import (
    start_streaming_vector_search,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _query_rows(spark):
    """The batch-ADC query set (odd vec_ids < QBATCH_MAX) as a
    standalone 8-row frame, so serving plans provably never scan the
    embeddings table."""
    e = load_table(spark, SF_DIR, "embeddings")
    rows = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in e.filter(
            (F.col("vec_id") % 2 == 1) & (F.col("vec_id") < pq.QBATCH_MAX)
        ).collect()
    ]
    return spark.createDataFrame(rows, "qid bigint, embedding array<float>")


def test_batch_search_probe_all_equals_session_adc(spark, tmp_path):
    """Probing every cell from the persisted index must reproduce the
    in-session unpruned batch ADC exactly (same corpus: the even
    vectors), and the serving plan must not scan the embeddings."""
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    ix = str(tmp_path / "vindex")
    write_vector_index(
        spark, SF_DIR, ix, df=e.filter(F.col("vec_id") % 2 == 0)
    )
    queries = _query_rows(spark)

    served = knn_batch_search_from_index(
        spark, queries, ix, k=pq.BATCH_TOPK, n_probe=pq.IVF_N_CENTROIDS
    )
    got = sorted(tuple(r) for r in served.collect())
    want = sorted(tuple(r) for r in pq.knn_batch_adc(spark, SF_DIR).collect())
    assert got == want, "from-index probe-all != in-session batch ADC"

    plan = formatted_plan(
        knn_batch_search_from_index(
            spark, queries, ix, k=pq.BATCH_TOPK, n_probe=pq.IVF_N_CENTROIDS
        )
    )
    assert "embeddings" not in plan, plan


def test_batch_search_pruned_scores_consistent(spark, tmp_path):
    """The probe dial: pruned answers must carry IDENTICAL adc scores
    for every (qid, vec_id) they share with the probe-all run (pruning
    changes candidate membership, never scoring), and every pruned
    answer's vector must come from a probed cell."""
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    ix = str(tmp_path / "vindex")
    write_vector_index(
        spark, SF_DIR, ix, df=e.filter(F.col("vec_id") % 2 == 0)
    )
    queries = _query_rows(spark)

    full = {
        (r.qid, r.vec_id): r.adc_dist
        for r in knn_batch_search_from_index(
            spark, queries, ix, k=500, n_probe=pq.IVF_N_CENTROIDS
        ).collect()
    }
    pruned = knn_batch_search_from_index(
        spark, queries, ix, k=pq.BATCH_TOPK, n_probe=2
    ).collect()
    assert pruned, "pruned search returned nothing"
    for r in pruned:
        assert full[(r.qid, r.vec_id)] == r.adc_dist, (
            "pruning changed a score"
        )
    n_queries = queries.count()
    assert len({r.qid for r in pruned}) == n_queries


def test_streaming_vector_search_matches_batch(spark, tmp_path):
    """Queries streamed in two micro-batches must produce exactly the
    batch answers, and a replay against the drained checkpoint must
    leave the result partitions unchanged."""
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    ix = str(tmp_path / "vindex")
    write_vector_index(spark, SF_DIR, ix)
    queries = _query_rows(spark)

    src = str(tmp_path / "queries")
    queries.filter(F.col("qid") < 8).coalesce(1).write.parquet(
        src, mode="append"
    )
    queries.filter(F.col("qid") >= 8).coalesce(1).write.parquet(
        src, mode="append"
    )
    out = str(tmp_path / "answers")
    ck = str(tmp_path / "ck")

    def run():
        stream = (
            spark.readStream.schema(queries.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = start_streaming_vector_search(
            spark, stream, ix, out, ck, k=pq.BATCH_TOPK, available_now=True
        )
        q.awaitTermination(180)

    run()
    got = sorted(
        (r.qid, r.vec_id, r.adc_dist, r.rank)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        tuple(r)
        for r in knn_batch_search_from_index(
            spark, queries, ix, k=pq.BATCH_TOPK
        ).collect()
    )
    assert got == want, "streamed answers != batch serving"

    run()  # replay: nothing new, partitions unchanged
    assert (
        sorted(
            (r.qid, r.vec_id, r.adc_dist, r.rank)
            for r in spark.read.parquet(out).collect()
        )
        == want
    )

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
from tests.streamutil import drain

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
        drain(q)
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


def test_refined_recall_at_least_plain_per_query(spark, tmp_path):
    """Round 9: the refine stage on the SERVED path. At equal probing,
    per-query recall of the refined answers must be >= the plain ADC
    answers': the shortlist contains everything the ADC top-k caught,
    and exact-cosine ordering cannot rank a true neighbor below a
    non-neighbor (truth uses the same rounded-cosine + vec_id order)."""
    from pyspark.sql import Window

    from flink_kafka_replicator_spark.functions.similarity import (
        as_double,
        cosine,
    )
    from flink_kafka_replicator_spark.sinks import (
        knn_batch_search_refined_from_index,
    )

    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    corpus = e.filter(F.col("vec_id") % 2 == 0)
    ix = str(tmp_path / "vindex")
    write_vector_index(spark, SF_DIR, ix, df=corpus)
    queries = _query_rows(spark)

    q = queries.select("qid", as_double(F.col("embedding")).alias("qv"))
    c = corpus.select("vec_id", as_double(F.col("embedding")).alias("cv"))
    wt = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    truth = {}
    rows = (
        c.crossJoin(F.broadcast(q))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("cv"), F.col("qv")), 4).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= pq.BATCH_TOPK)
        .collect()
    )
    for r in rows:
        truth.setdefault(r.qid, set()).add(r.vec_id)

    def hits(df):
        got = {}
        for r in df.collect():
            got.setdefault(r.qid, set()).add(r.vec_id)
        return {
            qid: len(ids & truth[qid]) for qid, ids in got.items()
        }

    plain = hits(
        knn_batch_search_from_index(
            spark, queries, ix, k=pq.BATCH_TOPK, n_probe=2
        )
    )
    refined_df = knn_batch_search_refined_from_index(
        spark, queries, ix, corpus, k=pq.BATCH_TOPK, n_probe=2
    )
    assert refined_df.columns == ["qid", "vec_id", "adc_dist", "cos_sim", "rank"]
    refined = hits(refined_df)
    assert set(refined) == set(plain) == set(truth)
    for qid in truth:
        assert refined[qid] >= plain[qid], (
            f"refine lost recall for qid {qid}: "
            f"{refined[qid]} < {plain[qid]}"
        )


def test_refined_from_index_matches_session_refined(spark, tmp_path):
    """The single fixed QUERY_VEC through the refined SERVED path (full
    index, the index's own probe setting) must reproduce the in-session
    ``knn_ivf_pq_refined`` rows exactly — the identity that pins the
    from-index refine stage to the already-driver-green recipe."""
    from flink_kafka_replicator_spark.sinks import (
        knn_batch_search_refined_from_index,
    )

    ix = str(tmp_path / "vindex")
    write_vector_index(spark, SF_DIR, ix)
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in pq.QUERY_VEC])],
        "qid bigint, embedding array<double>",
    )
    got = sorted(
        (r.vec_id, r.adc_dist, r.cos_sim)
        for r in knn_batch_search_refined_from_index(
            spark, qdf, ix, e, k=10
        ).collect()
    )
    want = sorted(
        (r.vec_id, r.adc_dist, r.cos_sim)
        for r in pq.knn_ivf_pq_refined(spark, SF_DIR).collect()
    )
    assert got == want, f"only_served={set(got)-set(want)} only_session={set(want)-set(got)}"


def test_streaming_refined_matches_batch_refined(spark, tmp_path):
    """The streamed refine path equals the batch refined answers."""
    from flink_kafka_replicator_spark.sinks import (
        knn_batch_search_refined_from_index,
    )

    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    corpus = e.filter(F.col("vec_id") % 2 == 0)
    ix = str(tmp_path / "vindex")
    write_vector_index(spark, SF_DIR, ix, df=corpus)
    queries = _query_rows(spark)

    src = str(tmp_path / "queries")
    queries.coalesce(1).write.parquet(src)
    out = str(tmp_path / "answers")
    stream = spark.readStream.schema(queries.schema).parquet(src)
    q = start_streaming_vector_search(
        spark,
        stream,
        ix,
        out,
        str(tmp_path / "ck"),
        k=pq.BATCH_TOPK,
        available_now=True,
        refine_with=corpus,
    )
    drain(q)
    got = sorted(
        (r.qid, r.vec_id, r.adc_dist, r.cos_sim, r.rank)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        tuple(r)
        for r in knn_batch_search_refined_from_index(
            spark, queries, ix, corpus, k=pq.BATCH_TOPK
        ).collect()
    )
    assert got == want

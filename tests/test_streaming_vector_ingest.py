"""Streaming vector-index ingestion: micro-batched embedding arrival
must leave the persisted index byte-equal to a full rebuild, the
from-index search equal to the in-session path, and a re-run against
the same checkpoint a no-op (delta replay contract)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_kafka_replicator_spark.functions.pipeline_queries import (
    knn_ivf_pq,
)
from flink_kafka_replicator_spark.io import load_table
from flink_kafka_replicator_spark.sinks import (
    knn_ivf_pq_from_index,
    read_vector_index,
    write_vector_index,
)
from flink_kafka_replicator_spark.streaming.vector_ingest import (
    start_streaming_vector_ingest,
)
from tests.streamutil import drain

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_streaming_vector_ingest_equals_rebuild(spark, tmp_path):
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    even = e.filter(F.col("vec_id") % 2 == 0)
    odd = e.filter(F.col("vec_id") % 2 == 1)

    # base index: even vectors, models trained on the full corpus
    ix = str(tmp_path / "vindex")
    write_vector_index(spark, SF_DIR, ix, df=even)

    # the stream: odd vectors in two files → two micro-batches
    src = str(tmp_path / "incoming")
    odd.filter(F.col("vec_id") % 4 == 1).coalesce(1).write.parquet(
        src, mode="append"
    )
    odd.filter(F.col("vec_id") % 4 == 3).coalesce(1).write.parquet(
        src, mode="append"
    )

    def run():
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = start_streaming_vector_ingest(
            spark, stream, ix, str(tmp_path / "ck"), available_now=True
        )
        drain(q)
    run()

    full_ix = str(tmp_path / "full")
    write_vector_index(spark, SF_DIR, full_ix)

    def snap(d):
        _, postings, _, codes = read_vector_index(spark, d)
        return (
            {tuple(r) for r in postings.collect()},
            {tuple(r) for r in codes.collect()},
        )

    assert snap(ix) == snap(full_ix), "streamed index != full rebuild"

    got = [
        (r.vec_id, r.adc_dist)
        for r in knn_ivf_pq_from_index(spark, ix).collect()
    ]
    want = [
        (r.vec_id, r.adc_dist) for r in knn_ivf_pq(spark, SF_DIR).collect()
    ]
    assert got == want

    # same checkpoint, same source: nothing to process, index unchanged
    run()
    assert snap(ix) == snap(full_ix)


def test_streaming_vector_ingest_fresh_checkpoint_fails_loudly(
    spark, tmp_path
):
    """A FRESH checkpoint against a stream-fed index restarts batch ids
    at 0, below the index's admitted-batch cursor — re-delivered
    batches would be silently treated as already admitted (and
    genuinely new data positioned under the cursor dropped). The
    ingest must fail loudly at the first such batch instead."""
    import pytest

    from flink_kafka_replicator_spark.sinks import append_vector_batch

    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    even = e.filter(F.col("vec_id") % 2 == 0)

    ix = str(tmp_path / "vindex")
    write_vector_index(spark, SF_DIR, ix, df=even)
    # a prior stream run admitted batches 0 and 1 (cursor = 1)
    assert append_vector_batch(
        spark, e.filter(F.col("vec_id") % 4 == 1), ix, batch_id=0
    )
    assert append_vector_batch(
        spark, e.filter(F.col("vec_id") % 4 == 3), ix, batch_id=1
    )

    src = str(tmp_path / "incoming")
    e.limit(5).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(e.schema).parquet(src)
    q = start_streaming_vector_ingest(
        spark, stream, ix, str(tmp_path / "fresh_ck"), available_now=True
    )
    with pytest.raises(Exception, match="does not match the index"):
        drain(q)
        if q.exception() is not None:
            raise q.exception()


def test_streaming_vector_ingest_survives_compaction(spark, tmp_path):
    """The round-8 composition contract: compaction between runs of a
    stream-fed index must not break admission. Delta ids come from the
    index meta's batch cursor (not batch_id arithmetic), so after
    compaction renumbers the partitions the resumed stream keeps
    admitting — final index equals a full rebuild, search byte-equal."""
    from flink_kafka_replicator_spark.sinks import compact_vector_index

    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    thirds = [e.filter(F.col("vec_id") % 3 == i) for i in range(3)]

    ix = str(tmp_path / "vindex")
    write_vector_index(spark, SF_DIR, ix, df=thirds[0])

    src = str(tmp_path / "incoming")
    ck = str(tmp_path / "ck")

    def run():
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = start_streaming_vector_ingest(
            spark, stream, ix, ck, available_now=True
        )
        drain(q)
    # run 1: admit the second third as a streamed batch
    thirds[1].coalesce(1).write.parquet(src, mode="append")
    run()

    # maintenance window: compact the index (renumbers partitions)
    res = compact_vector_index(spark, ix)
    assert res["compacted"] is True

    # run 2, SAME checkpoint: the final third arrives
    thirds[2].coalesce(1).write.parquet(src, mode="append")
    run()

    full_ix = str(tmp_path / "full")
    write_vector_index(spark, SF_DIR, full_ix)

    def snap(d):
        _, postings, _, codes = read_vector_index(spark, d)
        return (
            {tuple(r) for r in postings.collect()},
            {tuple(r) for r in codes.collect()},
        )

    assert snap(ix) == snap(full_ix), (
        "stream + compact + stream != rebuild"
    )
    got = [
        (r.vec_id, r.adc_dist)
        for r in knn_ivf_pq_from_index(spark, ix).collect()
    ]
    want = [
        (r.vec_id, r.adc_dist) for r in knn_ivf_pq(spark, SF_DIR).collect()
    ]
    assert got == want

    # replay run against the same drained checkpoint: still a no-op
    run()
    assert snap(ix) == snap(full_ix)

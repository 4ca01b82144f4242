"""Streaming dedup-against-index: micro-batched ingestion produces the
SAME near-dup pairs as the batch ``dedup_incremental`` on the same
old/new split, and a re-run against the same checkpoint is a no-op
(idempotent batch-partition overwrite)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_kafka_replicator_spark.functions.pipeline_queries import (
    dedup_incremental,
)
from flink_kafka_replicator_spark.io import load_table
from flink_kafka_replicator_spark.sinks import write_minhash_index
from flink_kafka_replicator_spark.streaming.dedup_ingest import (
    start_streaming_dedup_against_index,
)
from tests.streamutil import drain

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SCHEMA = "doc_id bigint, text string"


def _run(spark, tmp_path, src):
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = start_streaming_dedup_against_index(
        spark,
        stream,
        index_dir=str(tmp_path / "index"),
        index_corpus_df=load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 2 == 0),
        out_dir=str(tmp_path / "pairs"),
        checkpoint_location=str(tmp_path / "ck"),
        available_now=True,
    )
    drain(q)
def test_streaming_dedup_matches_batch_and_replays_idempotently(
    spark, tmp_path
):
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    old = d.filter(F.col("doc_id") % 2 == 0)
    write_minhash_index(old, str(tmp_path / "index"))

    # the incoming stream: the odd half split across two files → two
    # micro-batches under maxFilesPerTrigger=1
    src = str(tmp_path / "incoming")
    new = d.filter(F.col("doc_id") % 2 == 1)
    new.filter(F.col("doc_id") % 4 == 1).coalesce(1).write.parquet(
        src, mode="append"
    )
    new.filter(F.col("doc_id") % 4 == 3).coalesce(1).write.parquet(
        src, mode="append"
    )

    _run(spark, tmp_path, src)

    got = {
        (r.new_id, r.old_id, r.jaccard)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    want = {
        (r.new_id, r.old_id, r.jaccard)
        for r in dedup_incremental(spark, SF_DIR).collect()
    }
    assert got == want, (
        f"stream/batch divergence: only_stream={got - want} "
        f"only_batch={want - got}"
    )
    assert want, "fixture must contain at least one cross-batch near-dup"

    # the fixture writes two files under maxFilesPerTrigger=1, so the
    # cross-batch path MUST have run as two micro-batches — ==1 would
    # mean the scenario this test exists for silently stopped happening.
    # (Stream/batch equality above also relies on the fixture having no
    # new-side band key that is hot in aggregate but cool per batch —
    # see dedup_ingest's batching note.)
    n_batches = (
        spark.read.parquet(str(tmp_path / "pairs"))
        .select("batch_id")
        .distinct()
        .count()
    )
    assert n_batches == 2, f"expected two micro-batches, saw {n_batches}"

    # same checkpoint, same source: nothing new to process; the pair
    # table must be unchanged (no duplicated appends)
    _run(spark, tmp_path, src)
    again = {
        (r.new_id, r.old_id, r.jaccard)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert again == want


def test_streaming_extend_index_3_batches_and_replayed_middle_batch(
    spark, tmp_path
):
    """INLINE index growth over 3 micro-batches: (1) the delta-extended
    index after the run equals a from-scratch rebuild over base + all
    streamed docs; (2) later batches detect near-dups of docs ADMITTED
    by earlier batches (the point of extend_index); (3) a REPLAY of the
    middle batch — recomputed after the whole run, when the index
    already contains every batch including the replayed one — yields
    exactly the originally committed pairs, because the read is pinned
    to the pre-batch snapshot. (3) is the failure mode the snapshot
    pinning exists to prevent: unpinned, the replay would band-join the
    batch with itself and emit self/intra-batch pairs."""
    from flink_kafka_replicator_spark.sinks import read_minhash_index
    from flink_kafka_replicator_spark.streaming.dedup_ingest import (
        dedup_batch_against_index,
    )

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    old = d.filter(F.col("doc_id") % 2 == 0)
    index_dir = str(tmp_path / "index")
    write_minhash_index(old, index_dir)

    src = str(tmp_path / "incoming")
    new = d.filter(F.col("doc_id") % 2 == 1)
    store = str(tmp_path / "store")

    def run_stream():
        stream = spark.readStream.schema(SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = start_streaming_dedup_against_index(
            spark,
            stream,
            index_dir=index_dir,
            index_corpus_df=old,
            out_dir=str(tmp_path / "pairs"),
            checkpoint_location=str(tmp_path / "ck"),
            available_now=True,
            extend_index=True,
            corpus_store_dir=store,
        )
        drain(q)
    # first two batches land...
    for k in (1, 3):
        new.filter(F.col("doc_id") % 6 == k).coalesce(1).write.parquet(
            src, mode="append"
        )
    run_stream()

    # ...then REPLAY the just-committed middle batch before batch 2
    # runs — the realistic crash window (delta for batch 1 committed,
    # checkpoint not): the index now contains batch 1 itself, and the
    # stats retention (current + previous version) covers exactly this
    # one-step-back snapshot. Pinned to delta_id <= 1, the recompute
    # must reproduce the committed partition.
    batch1_docs = (
        spark.read.parquet(store)
        .filter(F.col("batch_id") == 1)
        .select("doc_id", "text")
    )
    lookup = (
        batch1_docs.union(old.select("doc_id", "text"))
        .union(spark.read.parquet(store).select("doc_id", "text"))
        .dropDuplicates(["doc_id"])
    )
    replayed = {
        (r.new_id, r.old_id, r.jaccard)
        for r in dedup_batch_against_index(
            spark, batch1_docs, index_dir, lookup, max_delta_id=1
        ).collect()
    }
    committed = {
        (r.new_id, r.old_id, r.jaccard)
        for r in spark.read.parquet(str(tmp_path / "pairs"))
        .filter(F.col("batch_id") == 1)
        .collect()
    }
    assert replayed == committed, (
        f"replay divergence: only_replay={replayed - committed} "
        f"only_original={committed - replayed}"
    )

    # resume: the third batch processes against the grown index
    new.filter(F.col("doc_id") % 6 == 5).coalesce(1).write.parquet(
        src, mode="append"
    )
    run_stream()

    pairs = spark.read.parquet(str(tmp_path / "pairs"))
    assert pairs.select("batch_id").distinct().count() == 3

    # (1) final index == from-scratch rebuild over base + streamed docs
    rebuild_dir = str(tmp_path / "rebuild")
    write_minhash_index(old.unionByName(new), rebuild_dir)

    def snap(ix):
        bands, stats = read_minhash_index(spark, ix)
        return (
            {(r.doc_id, r.band_key) for r in bands.collect()},
            {(r.band_key, r.n) for r in stats.collect()},
        )

    assert snap(index_dir) == snap(rebuild_dir)

    # (2) some pair's old side is an odd doc — admitted by an earlier
    # batch's delta, invisible to the base index
    all_pairs = {
        (r.new_id, r.old_id, r.jaccard, r.batch_id) for r in pairs.collect()
    }
    assert any(p[1] % 2 == 1 for p in all_pairs), (
        "fixture must hold a near-dup whose old side was stream-admitted"
    )
    # no self pairs, ever
    assert all(p[0] != p[1] for p in all_pairs)


def test_streaming_dedup_extend_survives_compaction(spark, tmp_path):
    """Round-8 composition: compacting the minhash index between runs
    of an extend-mode stream must not break admission or pair output —
    the batch cursor in the index meta keeps delta numbering valid
    after the partitions are renumbered. Final index == rebuild, and
    the post-compaction batch still detects near-dups of docs admitted
    before the compaction."""
    from flink_kafka_replicator_spark.sinks import (
        compact_minhash_index,
        read_minhash_index,
    )

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    old = d.filter(F.col("doc_id") % 2 == 0)
    new = d.filter(F.col("doc_id") % 2 == 1)
    index_dir = str(tmp_path / "index")
    write_minhash_index(old, index_dir)

    src = str(tmp_path / "incoming")
    store = str(tmp_path / "store")

    def run_stream():
        stream = spark.readStream.schema(SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = start_streaming_dedup_against_index(
            spark,
            stream,
            index_dir=index_dir,
            index_corpus_df=old,
            out_dir=str(tmp_path / "pairs"),
            checkpoint_location=str(tmp_path / "ck"),
            available_now=True,
            extend_index=True,
            corpus_store_dir=store,
        )
        drain(q)
    new.filter(F.col("doc_id") % 6 == 1).coalesce(1).write.parquet(
        src, mode="append"
    )
    run_stream()

    res = compact_minhash_index(spark, index_dir)
    assert res["compacted"] is True

    for k in (3, 5):
        new.filter(F.col("doc_id") % 6 == k).coalesce(1).write.parquet(
            src, mode="append"
        )
    run_stream()

    rebuild_dir = str(tmp_path / "rebuild")
    write_minhash_index(old.unionByName(new), rebuild_dir)

    def snap(ix):
        bands, stats = read_minhash_index(spark, ix)
        return (
            {(r.doc_id, r.band_key) for r in bands.collect()},
            {(r.band_key, r.n) for r in stats.collect()},
        )

    assert snap(index_dir) == snap(rebuild_dir), (
        "stream + compact + stream != rebuild"
    )
    pairs = {
        (r.new_id, r.old_id)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert any(o % 2 == 1 for _, o in pairs), (
        "post-compaction batches must still see pre-compaction "
        "admissions as index-side docs"
    )


def test_fresh_checkpoint_fails_before_pair_output_is_touched(
    spark, tmp_path
):
    """ADVICE round 8: on a deep cursor mismatch (fresh checkpoint
    against an extended index) the admission raise used to fire AFTER
    the batch's pairs partition was dynamic-overwritten with pairs
    computed against the wrong one-back snapshot — corrupted output
    plus a wedged stream. The check now runs at the top of process():
    the run must fail loudly AND every committed pairs partition must
    be byte-identical to its pre-failure content."""
    import pytest
    from pyspark.errors import StreamingQueryException

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    old = d.filter(F.col("doc_id") % 2 == 0)
    new = d.filter(F.col("doc_id") % 2 == 1)
    index_dir = str(tmp_path / "index")
    write_minhash_index(old, index_dir)

    src = str(tmp_path / "incoming")
    store = str(tmp_path / "store")
    pairs_dir = str(tmp_path / "pairs")

    def run_stream(ck):
        stream = spark.readStream.schema(SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = start_streaming_dedup_against_index(
            spark,
            stream,
            index_dir=index_dir,
            index_corpus_df=old,
            out_dir=pairs_dir,
            checkpoint_location=ck,
            available_now=True,
            extend_index=True,
            corpus_store_dir=store,
        )
        drain(q)
    for k in (1, 3):
        new.filter(F.col("doc_id") % 6 == k).coalesce(1).write.parquet(
            src, mode="append"
        )
    run_stream(str(tmp_path / "ck"))

    committed = {
        (r.new_id, r.old_id, r.jaccard, r.batch_id)
        for r in spark.read.parquet(pairs_dir).collect()
    }
    assert committed, "fixture must emit pairs before the mismatch run"

    # fresh checkpoint, same extended index: its batch 0 is below the
    # admitted-batch cursor (1) — the run must fail...
    with pytest.raises(StreamingQueryException, match="cursor"):
        run_stream(str(tmp_path / "ck-fresh"))

    # ...and must NOT have rewritten batch 0's pairs partition with
    # wrong-snapshot pairs before failing
    after = {
        (r.new_id, r.old_id, r.jaccard, r.batch_id)
        for r in spark.read.parquet(pairs_dir).collect()
    }
    assert after == committed, (
        f"pairs mutated by the failed run: only_after={after - committed} "
        f"only_before={committed - after}"
    )

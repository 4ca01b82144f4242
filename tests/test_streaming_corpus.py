"""Streaming end-to-end corpus build: the batch pipeline_end_to_end
composition, run incrementally — documents arrive as a stream, get
normalized + content-hashed, deduped with watermark-bounded state,
quality-filtered, and appended to the content-hash-sharded corpus via
foreachBatch. Two sequential availableNow runs against one checkpoint
prove the incremental property: re-delivered and cross-batch duplicate
docs are dropped by the stateful dedup, new docs land in their shards."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_kafka_replicator_spark.sinks import with_shard
from tests.streamutil import drain

SCHEMA = "doc_id bigint, text string, lang string, event_ts timestamp"
SCHEMA2 = "doc_id bigint, text string, event_ts timestamp"
BASE = dt.datetime(2024, 1, 1)

GOOD = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the birds sing in the tall green trees "
    "outside the old farm house every morning before the sun rises"
)
SHORT = "too short"


def _docs(spec):
    # spec: (doc_id, text, minutes_offset)
    return [
        Row(doc_id=i, text=t, lang="en", event_ts=BASE + dt.timedelta(minutes=m))
        for i, t, m in spec
    ]


def _normalize(df):
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", " "),
            r"\s+",
            " ",
        )
    )
    return df.select(
        "doc_id", "event_ts", norm.alias("text"),
        F.md5(norm).alias("content_hash"),
    )


def test_streaming_corpus_pipeline_dedups_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = tmp_path / "corpus"
    ck = str(tmp_path / "ck")

    def run(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)

        def write_corpus(df, epoch_id):
            kept = df.filter(F.size(F.split("text", " ")) >= 20)
            (
                with_shard(kept)
                .write.mode("append")
                .partitionBy("shard")
                .parquet(str(out))
            )

        q = (
            _normalize(spark.readStream.schema(SCHEMA).parquet(src))
            .withWatermark("event_ts", "1 hour")
            .dropDuplicatesWithinWatermark(["content_hash"])
            .writeStream.foreachBatch(write_corpus)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        drain(q)
    # run 1: a good doc, an exact dup of it (different id), a too-short doc
    run(_docs([(1, GOOD, 0), (2, GOOD, 1), (3, SHORT, 2)]))
    first = spark.read.parquet(str(out))
    assert [r.doc_id for r in first.collect()] == [1], (
        "dup dropped by state, short dropped by quality"
    )

    # run 2 (same checkpoint): the SAME doc re-delivered again + a new one
    run(_docs([(4, GOOD, 5), (5, GOOD + " with a genuinely new ending", 6)]))
    got = sorted(r.doc_id for r in spark.read.parquet(str(out)).collect())
    assert got == [1, 5], f"cross-batch dedup failed: {got}"
    # sharding is content-addressed: the surviving docs sit in their shard
    shards = {r.doc_id: r.shard for r in spark.read.parquet(str(out)).collect()}
    assert all(0 <= s < 16 for s in shards.values())


def test_streaming_corpus_with_classifier_gate(spark, tmp_path):
    """Round 7: the trained-classifier curation gate in the streaming
    ingest path. The scorer is a stateless per-row map, so the stream
    must keep EXACTLY the docs the batch scorer keeps — and the gate
    must actually discriminate on this corpus (some kept, some
    dropped)."""
    import os

    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        qc_score_of,
    )
    from flink_kafka_replicator_spark.io import load_table

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    docs.coalesce(2).write.parquet(src)
    out = str(tmp_path / "kept")

    def gate(df, epoch_id):
        scored = qc_score_of(df)
        (
            df.join(
                scored.filter(F.col("keep")).select("doc_id"),
                "doc_id",
                "left_semi",
            )
            .write.mode("append")
            .parquet(out)
        )

    q = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    want = {
        r.doc_id
        for r in qc_score_of(docs).filter(F.col("keep")).collect()
    }
    assert got == want, "streaming gate diverged from batch scorer"
    n_all = docs.count()
    assert 0 < len(want) < n_all, "gate must discriminate on the fixture"


def test_streaming_corpus_with_persisted_model_gate(spark, tmp_path):
    """The full curation deployment loop: TRAIN on the corpus, PERSIST
    the model artifact, then APPLY it inside the streaming ingest —
    the streamed keep-set must equal batch inference with the same
    loaded model."""
    import os

    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        qc_score_with_model,
    )
    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.sinks import (
        read_classifier_model,
        write_classifier_model,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    model_dir = str(tmp_path / "model")
    write_classifier_model(spark, sf_dir, model_dir)
    weights, theta = read_classifier_model(spark, model_dir)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    docs.coalesce(2).write.parquet(src)
    out = str(tmp_path / "kept")

    def gate(df, epoch_id):
        kept = qc_score_with_model(df, weights, theta).filter(
            F.col("keep")
        )
        (
            df.join(kept.select("doc_id"), "doc_id", "left_semi")
            .write.mode("append")
            .parquet(out)
        )

    q = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    want = {
        r.doc_id
        for r in qc_score_with_model(docs, weights, theta)
        .filter(F.col("keep"))
        .collect()
    }
    assert got == want, "streamed model gate diverged from batch inference"
    assert 0 < len(want) < docs.count()


def test_corpus_build_survives_compaction_between_runs(spark, tmp_path):
    """Round-8 composition: compacting a streaming-built corpus (batch
    partitions merged into the max committed batch id, shard level
    preserved) must leave the directory readable AND writable by the
    resumed stream — the next batch's partition cannot conflict with
    the compacted layout."""
    import datetime as dt

    from pyspark.sql import Row

    from flink_kafka_replicator_spark.sinks import compact_corpus_shards
    from flink_kafka_replicator_spark.streaming.corpus_build import (
        start_corpus_build,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")

    def run(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = start_corpus_build(
            spark,
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src),
            out,
            ck,
            min_tokens=5,
        )
        drain(q)
    mk = lambda i, suffix, m: Row(
        doc_id=i,
        text=GOOD + " " + suffix,
        lang="en",
        event_ts=BASE + dt.timedelta(minutes=m),
    )
    run([mk(1, "alpha variant", 0), mk(2, "beta variant", 1)])
    first = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert first == {1, 2}

    stats = compact_corpus_shards(spark, out)
    assert stats["files_after"] <= stats["files_before"]
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == first

    # resume the SAME checkpoint with new docs: the new batch partition
    # must coexist with the compacted layout
    run([mk(3, "gamma variant", 5)])
    back = spark.read.parquet(out)
    assert {r.doc_id for r in back.collect()} == {1, 2, 3}
    # still shard-pruned readable
    assert back.filter(back.shard >= 0).count() == 3


def test_corpus_build_with_near_dup_index_gate(spark, tmp_path):
    """Round 8: the near-dup rung inside corpus-build — streamed docs
    that verify as near-duplicates (Jaccard >= 0.5) of a persisted
    minhash index are dropped before the sink; fresh docs pass."""
    import datetime as dt
    import os

    from pyspark.sql import Row

    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.sinks import write_minhash_index
    from flink_kafka_replicator_spark.streaming.corpus_build import (
        start_corpus_build,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ix = str(tmp_path / "ix")
    write_minhash_index(base, ix)

    # a near-dup of a real base doc (one token changed) + a fresh doc
    donor = base.orderBy("doc_id").limit(1).collect()[0]
    toks = donor.text.split(" ")
    toks[len(toks) // 2] = "mutated"
    near_dup = " ".join(toks)
    fresh = (
        "completely original content about streaming corpus "
        "construction with enough tokens to clear the quality floor "
        "and no overlap with any base document in the index at all"
    )
    rows = [
        Row(doc_id=900001, text=near_dup,
            event_ts=BASE + dt.timedelta(minutes=1)),
        Row(doc_id=900002, text=fresh,
            event_ts=BASE + dt.timedelta(minutes=2)),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, SCHEMA2).coalesce(1).write.parquet(src)

    out = str(tmp_path / "corpus")
    q = start_corpus_build(
        spark,
        spark.readStream.schema(SCHEMA2).parquet(src),
        out,
        str(tmp_path / "ck"),
        min_tokens=5,
        dedup_index_dir=ix,
        dedup_corpus_df=base,
    )
    drain(q)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {900002}, (
        f"near-dup must be dropped, fresh kept: {got}"
    )


def test_corpus_build_with_semantic_vector_gate(spark, tmp_path):
    """Round 9: the SEMANTIC rung inside corpus-build — streamed docs
    whose embedding verifies as a cell-scoped cosine near-dup of a
    persisted VECTOR index are dropped before the sink. Two
    micro-batches == one batch == a replay (the gate never extends the
    index, so drops are order- and batching-independent)."""
    import os

    from pyspark.sql import functions as F

    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.sinks import write_vector_index
    from flink_kafka_replicator_spark.streaming.corpus_build import (
        semantic_dup_ids,
        start_corpus_build,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    even_vecs = e.filter(F.col("vec_id") % 2 == 0)
    ix = str(tmp_path / "vindex")
    write_vector_index(spark, sf_dir, ix, df=even_vecs)

    incoming = d.join(
        e.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    ).filter(F.col("doc_id") % 2 == 1)
    schema = "doc_id bigint, text string, embedding array<float>"
    src = str(tmp_path / "src")
    incoming.filter(F.col("doc_id") % 4 == 1).coalesce(1).write.parquet(
        src, mode="append"
    )
    incoming.filter(F.col("doc_id") % 4 == 3).coalesce(1).write.parquet(
        src, mode="append"
    )

    expected_drops = {
        r.doc_id
        for r in semantic_dup_ids(
            spark,
            incoming.select("doc_id", "embedding"),
            ix,
            even_vecs,
        ).collect()
    }
    assert expected_drops, "fixture must hold a cross-parity semantic dup"

    def run(out, ck, stream_src, files_per_trigger):
        reader = spark.readStream.schema(schema)
        if files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", "1")
        q = start_corpus_build(
            spark,
            reader.parquet(stream_src),
            out,
            ck,
            min_tokens=1,
            vector_index_dir=ix,
            vector_corpus_df=even_vecs,
        )
        drain(q)
    out2 = str(tmp_path / "corpus2b")
    run(out2, str(tmp_path / "ck2"), src, True)
    streamed = {r.doc_id for r in spark.read.parquet(out2).collect()}
    n_batches = (
        spark.read.parquet(out2).select("batch_id").distinct().count()
    )
    assert n_batches == 2, f"expected two micro-batches, saw {n_batches}"

    out1 = str(tmp_path / "corpus1b")
    run(out1, str(tmp_path / "ck1"), src, False)
    onebatch = {r.doc_id for r in spark.read.parquet(out1).collect()}

    assert streamed == onebatch, (
        f"stream/batch divergence: only_stream={streamed - onebatch} "
        f"only_batch={onebatch - streamed}"
    )
    assert streamed & expected_drops == set(), (
        "a semantic dup reached the corpus"
    )
    assert expected_drops <= (
        {r.doc_id for r in incoming.select("doc_id").collect()} - streamed
    )

    # replay no-op: same checkpoint, same source
    run(out2, str(tmp_path / "ck2"), src, True)
    assert {r.doc_id for r in spark.read.parquet(out2).collect()} == streamed


def test_corpus_build_cli_semantic_gate_flag_validation():
    """--vector-index requires --vector-corpus; --semantic-tau requires
    --vector-index (validated before any Spark work)."""
    import pytest

    from flink_kafka_replicator_spark.streaming.corpus_build import (
        corpus_build_main,
    )

    with pytest.raises(SystemExit):
        corpus_build_main(
            ["--input", "/x", "--output", "/y", "--vector-index", "/ix"]
        )
    with pytest.raises(SystemExit):
        corpus_build_main(
            ["--input", "/x", "--output", "/y", "--semantic-tau", "0.5"]
        )


def test_corpus_build_with_gopher_rules_gate(spark, tmp_path):
    """Round 9: the Gopher rule gate inside corpus-build — per-batch,
    stateless, applied to the post-normalization text. Streamed output
    over two micro-batches == one batch == the batch-side
    gopher_keep_filter twin, and a checkpoint replay is a no-op."""
    import os

    from pyspark.sql import functions as F

    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        gopher_keep_filter,
    )
    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.streaming.corpus_build import (
        normalize_docs,
        start_corpus_build,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # restrict to docs whose normalized content is unique so the
    # content-hash dedup rung cannot make the surviving-doc choice
    # ambiguous between the streamed and batch runs
    normed = normalize_docs(d)
    uniq = (
        normed.groupBy("content_hash")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("doc_id"))
        .filter(F.col("n") == 1)
        .select("doc_id")
    )
    incoming = d.join(uniq, "doc_id", "left_semi")

    expected = {
        r.doc_id
        for r in gopher_keep_filter(normalize_docs(incoming))
        .select("doc_id")
        .collect()
    }
    n_in = incoming.count()
    assert expected, "fixture must keep at least one doc through the gate"
    assert len(expected) < n_in, (
        "gate must actually drop something at this fixture"
    )

    src = str(tmp_path / "src")
    incoming.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        src, mode="append"
    )
    incoming.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        src, mode="append"
    )
    schema = "doc_id bigint, text string"

    def run(out, ck, files_per_trigger):
        reader = spark.readStream.schema(schema)
        if files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", "1")
        q = start_corpus_build(
            spark,
            reader.parquet(src),
            out,
            ck,
            min_tokens=1,
            gopher_rules=True,
        )
        drain(q)
    out2 = str(tmp_path / "corpus2b")
    run(out2, str(tmp_path / "ck2"), True)
    streamed = {r.doc_id for r in spark.read.parquet(out2).collect()}
    n_batches = (
        spark.read.parquet(out2).select("batch_id").distinct().count()
    )
    assert n_batches == 2, f"expected two micro-batches, saw {n_batches}"
    assert streamed == expected, (
        f"stream/batch-twin divergence: only_stream={streamed - expected} "
        f"only_twin={expected - streamed}"
    )

    out1 = str(tmp_path / "corpus1b")
    run(out1, str(tmp_path / "ck1"), False)
    assert {r.doc_id for r in spark.read.parquet(out1).collect()} == expected

    # replay no-op: same checkpoint, same source
    run(out2, str(tmp_path / "ck2"), True)
    assert {r.doc_id for r in spark.read.parquet(out2).collect()} == expected


def test_corpus_build_with_decontamination_gate(spark, tmp_path):
    """Round 9: benchmark decontamination inside corpus-build — any
    streamed doc sharing an n-gram with the (static, job-start-frozen)
    benchmark corpus is dropped. Two micro-batches == one batch == the
    batch-side contaminated_ids twin, and a replay is a no-op."""
    import os

    from pyspark.sql import functions as F

    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.streaming.corpus_build import (
        benchmark_grams,
        contaminated_ids,
        normalize_docs,
        start_corpus_build,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # the contamination_ngram fixture convention: doc_id % 100 == 0 is
    # the benchmark; everything else is the training stream
    benchmark = d.filter(F.col("doc_id") % 100 == 0)
    # restrict to unique normalized content so the content-hash dedup
    # rung can't make the survivor choice ambiguous across runs
    normed = normalize_docs(d.filter(F.col("doc_id") % 100 != 0))
    uniq = (
        normed.groupBy("content_hash")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("doc_id"))
        .filter(F.col("n") == 1)
        .select("doc_id")
    )
    incoming = d.join(uniq, "doc_id", "left_semi")

    grams = benchmark_grams(benchmark)
    dropped = {
        r.doc_id
        for r in contaminated_ids(
            normalize_docs(incoming).select("doc_id", "text"), grams
        ).collect()
    }
    assert dropped, "fixture must contain at least one contaminated doc"
    expected = {
        r.doc_id for r in incoming.select("doc_id").collect()
    } - dropped
    assert expected, "gate must not drop everything"

    src = str(tmp_path / "src")
    incoming.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        src, mode="append"
    )
    incoming.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        src, mode="append"
    )
    schema = "doc_id bigint, text string"
    bench_path = str(tmp_path / "benchmark")
    benchmark.write.parquet(bench_path)

    def run(out, ck, files_per_trigger):
        reader = spark.readStream.schema(schema)
        if files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", "1")
        q = start_corpus_build(
            spark,
            reader.parquet(src),
            out,
            ck,
            min_tokens=1,
            decontaminate_df=spark.read.parquet(bench_path),
        )
        drain(q)
    out2 = str(tmp_path / "corpus2b")
    run(out2, str(tmp_path / "ck2"), True)
    streamed = {r.doc_id for r in spark.read.parquet(out2).collect()}
    n_batches = (
        spark.read.parquet(out2).select("batch_id").distinct().count()
    )
    assert n_batches == 2, f"expected two micro-batches, saw {n_batches}"
    assert streamed == expected, (
        f"stream/twin divergence: only_stream={streamed - expected} "
        f"only_twin={expected - streamed}"
    )

    out1 = str(tmp_path / "corpus1b")
    run(out1, str(tmp_path / "ck1"), False)
    assert {r.doc_id for r in spark.read.parquet(out1).collect()} == expected

    run(out2, str(tmp_path / "ck2"), True)  # replay no-op
    assert {r.doc_id for r in spark.read.parquet(out2).collect()} == expected


def test_corpus_build_cli_contam_flag_validation():
    """--contam-min-grams requires --decontaminate-corpus."""
    import pytest

    from flink_kafka_replicator_spark.streaming.corpus_build import (
        corpus_build_main,
    )

    with pytest.raises(SystemExit):
        corpus_build_main(
            ["--input", "/x", "--output", "/y", "--contam-min-grams", "2"]
        )

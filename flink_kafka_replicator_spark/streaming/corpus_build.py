"""Streaming corpus build: the curation pipeline as ONE deployable job.

normalize → watermark-bounded exact dedup → quality gate (token floor
+ optional TRAINED classifier gate from a persisted model artifact) →
content-hash-sharded corpus sink. This is the composition the batch
``pipeline_end_to_end`` query declares and the streaming-corpus tests
assemble by hand, promoted to a first-class entry point the CLI's
``corpus-build`` subcommand drives (reference parity note: the
reference's only job entry point is the replicator CLI,
FlinkKafkaReplicator.java:63-106 — a training-data engine needs the
curation job as a peer command).

Exactly-once: the streaming checkpoint + per-batch DYNAMIC partition
overwrite keyed by batch id — a replayed batch rewrites exactly its own
``batch_id=K`` partition instead of appending duplicates (the
``dedup_ingest`` sink recipe). Shards nest under the batch partition,
so shard-equality reads still prune on the second partition level.

At scale every stage is map-shaped or single-exchange: normalization
is per-row, the watermark dedup is one content_hash exchange with
state bounded by the watermark, the classifier gate is a broadcast
join + per-doc agg, and the sharded write repartitions by shard so
each shard directory is written by colocated rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_MIN_TOKENS = 20
DEFAULT_WATERMARK = "1 hour"


def normalize_docs(df: DataFrame) -> DataFrame:
    """Canonical normalization (lowercase, strip non-alphanumerics,
    collapse whitespace — the ``text_normalize`` query's pass) plus the
    content hash the dedup state and shard assignment both key on."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", " "),
            r"\s+",
            " ",
        )
    )
    cols = [F.col(c) for c in df.columns if c not in ("text",)]
    return df.select(
        *cols,
        norm.alias("text"),
        F.md5(norm).alias("content_hash"),
    )


def start_corpus_build(
    spark: SparkSession,
    source_df: DataFrame,
    out_dir: str,
    checkpoint_location: str,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    watermark: str = DEFAULT_WATERMARK,
    classifier_model_dir: str | None = None,
    dedup_index_dir: str | None = None,
    dedup_corpus_df: DataFrame | None = None,
    n_shards: int = 16,
    available_now: bool = True,
):
    """Start the streaming corpus build over a (doc_id, text[, event_ts])
    stream. With ``event_ts`` present, cross-batch exact dedup uses
    watermark-bounded state (late duplicates beyond the watermark are
    accepted — the documented stream/batch gap); without it, dedup
    falls back to unbounded in-memory state (fine for bounded backfills,
    not for an unbounded stream — prefer an event-time column).

    ``classifier_model_dir`` loads a persisted quality-classifier model
    (``sinks.write_classifier_model``) ONCE at job start and gates every
    batch with it — the deployment loop round 7's streaming tests pin
    (stream == batch inference).

    ``dedup_index_dir`` adds NEAR-dup gating against a persisted
    minhash index (``sinks.write_minhash_index``): per batch, any doc
    with a verified near-dup pair (Jaccard >= 0.5) against the index is
    dropped before the classifier gate — the missing rung between the
    watermark exact dedup and the quality gate. ``dedup_corpus_df``
    must then resolve the INDEX side's doc_id → text for candidate
    verification (the corpus the index was built over). The gate sees
    the stream POST-normalization, so build the index over
    comparably normalized text or shingle recall drops. Work per
    batch is one band equi-join + the verify joins — linear in the
    batch."""
    model = None
    if classifier_model_dir is not None:
        from ..sinks import read_classifier_model

        model = read_classifier_model(spark, classifier_model_dir)
    if dedup_index_dir is not None and dedup_corpus_df is None:
        raise ValueError("dedup_index_dir requires dedup_corpus_df")

    from ..sinks import with_shard

    def process(batch_df: DataFrame, batch_id: int) -> None:
        kept = batch_df.filter(
            F.size(F.split(F.col("text"), " ")) >= min_tokens
        )
        if dedup_index_dir is not None:
            from .dedup_ingest import dedup_batch_against_index

            lookup = (
                kept.select("doc_id", "text")
                .union(dedup_corpus_df.select("doc_id", "text"))
                .dropDuplicates(["doc_id"])
            )
            dup_ids = (
                dedup_batch_against_index(
                    spark,
                    kept.select("doc_id", "text"),
                    dedup_index_dir,
                    lookup,
                )
                .select(F.col("new_id").alias("doc_id"))
                .distinct()
            )
            kept = kept.join(dup_ids, "doc_id", "left_anti")
        if model is not None:
            from ..functions.pipeline_queries import qc_score_with_model

            weights, theta = model
            good = (
                qc_score_with_model(
                    kept.select("doc_id", "text"), weights, theta
                )
                .filter(F.col("keep"))
                .select("doc_id")
            )
            kept = kept.join(good, "doc_id", "left_semi")
        (
            with_shard(kept, n_shards=n_shards)
            .withColumn("batch_id", F.lit(batch_id))
            .repartition(n_shards, "shard")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "shard")
            .parquet(out_dir)
        )

    normed = normalize_docs(source_df)
    if "event_ts" in source_df.columns:
        deduped = normed.withWatermark(
            "event_ts", watermark
        ).dropDuplicatesWithinWatermark(["content_hash"])
    else:
        deduped = normed.dropDuplicates(["content_hash"])
    writer = deduped.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_location
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def corpus_build_main(
    argv: list[str], spark: SparkSession | None = None
) -> int:
    """The ``corpus-build`` subcommand: parquet-in, sharded-corpus-out,
    blocking until the availableNow run drains. Mirrors the replicator
    CLI's shape (validated required params, derived checkpoint)."""
    import argparse
    import hashlib

    parser = argparse.ArgumentParser(
        prog="spark-kafka-replicator corpus-build",
        description=(
            "Build a deduplicated, quality-gated, content-hash-sharded "
            "training corpus from a parquet document stream"
        ),
        allow_abbrev=False,
    )
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--checkpoint-location", default=None)
    parser.add_argument("--min-tokens", type=int, default=DEFAULT_MIN_TOKENS)
    parser.add_argument("--watermark", default=DEFAULT_WATERMARK)
    parser.add_argument("--classifier-model", default=None)
    parser.add_argument("--dedup-index", default=None)
    parser.add_argument("--dedup-corpus", default=None)
    parser.add_argument("--shards", type=int, default=16)
    parser.add_argument("--timeout-sec", type=int, default=600)
    args = parser.parse_args(argv)
    if args.dedup_index and not args.dedup_corpus:
        parser.error("--dedup-index requires --dedup-corpus")

    if spark is None:
        from ..session import get_session

        spark = get_session(app_name="spark-corpus-build")

    checkpoint = args.checkpoint_location
    if checkpoint is None:
        ident = f"{args.input}|{args.output}"
        checkpoint = (
            "/tmp/spark-corpus-build-ckpt-"
            + hashlib.md5(ident.encode()).hexdigest()[:10]
        )

    schema = spark.read.parquet(args.input).schema
    stream = spark.readStream.schema(schema).parquet(args.input)
    q = start_corpus_build(
        spark,
        stream,
        args.output,
        checkpoint,
        min_tokens=args.min_tokens,
        watermark=args.watermark,
        classifier_model_dir=args.classifier_model,
        dedup_index_dir=args.dedup_index,
        dedup_corpus_df=(
            spark.read.parquet(args.dedup_corpus).select("doc_id", "text")
            if args.dedup_corpus
            else None
        ),
        n_shards=args.shards,
        available_now=True,
    )
    from .supervision import await_drained

    await_drained(q, args.timeout_sec, "corpus-build")
    return 0

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


def semantic_dup_ids(
    spark: SparkSession,
    batch_df: DataFrame,
    vector_index_dir: str,
    vector_corpus_df: DataFrame,
    tau: float | None = None,
) -> DataFrame:
    """One batch's semantic near-dup doc ids against a persisted VECTOR
    index (round 9 — the ``dedup_incremental_indexed`` recipe in
    embedding space): assign each batch embedding to its IVF cell with
    the index's FROZEN coarse quantizer, candidate against the postings
    of that cell only (SemDeDup's own cell-scoped pruning — work is
    Σ |cell∩batch|·|cell∩index|, never |batch|·|index|), then verify
    candidates with exact cosine ≥ ``tau`` against
    ``vector_corpus_df`` (vec_id → embedding for the INDEX side — the
    index stores codes, not raw vectors, so verification needs the
    corpus' exact-vector table, exactly as the minhash gate needs
    ``dedup_corpus_df`` for text).

    ``batch_df`` must carry (doc_id, embedding). Returns distinct
    (doc_id) of batch docs with at least one verified semantic
    near-dup in the index."""
    from ..functions import pipeline_queries as pq
    from ..functions.similarity import as_double, cosine
    from ..sinks import read_vector_index

    if tau is None:
        tau = pq.SEMDEDUP_TAU
    centroids, postings, _, _ = read_vector_index(spark, vector_index_dir)
    cents = [
        (int(r["cid"]), [float(x) for x in r["cvec"]], float(r["nrm"]))
        for r in sorted(centroids.collect(), key=lambda r: r["cid"])
    ]
    vecs = batch_df.select(F.col("doc_id").alias("vec_id"), "embedding")
    if len(cents) <= 32:
        asg = pq._assignment_from(vecs, cents)
    else:
        asg = pq._assignment_top2_rowwise(
            vecs, pq._cents_df(spark, cents), dim=len(cents[0][1])
        )
    cand = (
        asg.select(F.col("vec_id").alias("doc_id"), "cid")
        .join(
            postings.select(F.col("vec_id").alias("old_id"), "cid"), "cid"
        )
        .select("doc_id", "old_id")
    )
    nv = batch_df.select(
        "doc_id", as_double(F.col("embedding")).alias("__nv")
    )
    ov = vector_corpus_df.select(
        F.col("vec_id").alias("old_id"),
        as_double(F.col("embedding")).alias("__ov"),
    )
    return (
        cand.join(nv, "doc_id")
        .join(ov, "old_id")
        .filter(
            F.round(cosine(F.col("__nv"), F.col("__ov")), 4) >= tau
        )
        .select("doc_id")
        .distinct()
    )


def contaminated_ids(
    batch_df: DataFrame,
    benchmark_grams_df: DataFrame,
    n: int | None = None,
    min_grams: int = 1,
) -> DataFrame:
    """Doc ids of batch docs sharing ≥ ``min_grams`` distinct n-grams
    with a benchmark gram set — the ``contamination_ngram`` query's
    screen as an ingest-time gate. ``benchmark_grams_df`` is the
    distinct (gram) table (build it once per job with
    :func:`benchmark_grams`); it is benchmark-sized, so it broadcasts
    and each batch pays one map-side semi-filtered explode + a per-doc
    distinct count — linear in the batch."""
    from ..functions.corpus import CONTAM_NGRAM
    from ..functions.similarity import shingles_from_tokens

    if n is None:
        n = CONTAM_NGRAM
    grams = batch_df.select(
        "doc_id", F.split("text", " ").alias("__toks")
    ).select(
        "doc_id", F.explode(shingles_from_tokens("__toks", n)).alias("gram")
    )
    return (
        grams.join(F.broadcast(benchmark_grams_df), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("__n"))
        .filter(F.col("__n") >= min_grams)
        .select("doc_id")
    )


def benchmark_grams(benchmark_df: DataFrame, n: int | None = None) -> DataFrame:
    """Distinct n-gram table of a benchmark corpus, NORMALIZED with the
    same pass the stream sees (gram equality across differently-cased/
    punctuated renditions of the same benchmark text). Built once per
    job; consumed broadcast by :func:`contaminated_ids`."""
    from ..functions.corpus import CONTAM_NGRAM
    from ..functions.similarity import shingles_from_tokens

    if n is None:
        n = CONTAM_NGRAM
    return (
        normalize_docs(benchmark_df)
        .select(F.split("text", " ").alias("__toks"))
        .select(F.explode(shingles_from_tokens("__toks", n)).alias("gram"))
        .distinct()
    )


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
    vector_index_dir: str | None = None,
    vector_corpus_df: DataFrame | None = None,
    semantic_tau: float | None = None,
    gopher_rules: bool = False,
    decontaminate_df: DataFrame | None = None,
    contam_min_grams: int = 1,
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
    batch.

    ``vector_index_dir`` adds SEMANTIC gating against a persisted
    vector index (round 9): per batch, any doc whose embedding has a
    verified cell-scoped cosine near-dup (>= ``semantic_tau``, default
    SEMDEDUP_TAU) against the index is dropped — see
    :func:`semantic_dup_ids`. The stream must then carry an
    ``embedding`` column, and ``vector_corpus_df`` must resolve the
    index side's vec_id → embedding for exact verification. The gate
    never extends the index, so stream == batch drops exactly.

    ``gopher_rules=True`` adds the Gopher rule-based quality gate
    (:func:`~..functions.pipeline_queries.gopher_keep_filter` — the
    same conjunction the ``quality_gopher_rules`` query reports) as a
    per-batch map-side filter, applied to the POST-normalization text
    right after the min-token floor and before the dedup gates (rules
    are per-row, so gate order only affects cost, not the result
    set). Stateless, so stream == batch == replay trivially.

    ``decontaminate_df`` adds benchmark DECONTAMINATION (round 9): any
    doc sharing ≥ ``contam_min_grams`` distinct CONTAM_NGRAM-word
    n-grams with the benchmark corpus is dropped — the
    ``contamination_ngram`` screen as an ingest gate. The benchmark
    gram set is built ONCE at job start (normalized with the same pass
    the stream sees) and broadcast into every batch; the gate is
    stateless against that static set, so stream == batch == replay."""
    model = None
    if classifier_model_dir is not None:
        from ..sinks import read_classifier_model

        model = read_classifier_model(spark, classifier_model_dir)
    if dedup_index_dir is not None and dedup_corpus_df is None:
        raise ValueError("dedup_index_dir requires dedup_corpus_df")
    if vector_index_dir is not None:
        if vector_corpus_df is None:
            raise ValueError("vector_index_dir requires vector_corpus_df")
        if "embedding" not in source_df.columns:
            raise ValueError(
                "the semantic gate needs an 'embedding' column on the "
                "document stream"
            )

    from ..sinks import with_shard

    bench_grams = (
        benchmark_grams(decontaminate_df)
        if decontaminate_df is not None
        else None
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        kept = batch_df.filter(
            F.size(F.split(F.col("text"), " ")) >= min_tokens
        )
        if gopher_rules:
            from ..functions.pipeline_queries import gopher_keep_filter

            kept = gopher_keep_filter(kept)
        if bench_grams is not None:
            contam = contaminated_ids(
                kept.select("doc_id", "text"),
                bench_grams,
                min_grams=contam_min_grams,
            )
            kept = kept.join(contam, "doc_id", "left_anti")
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
        if vector_index_dir is not None:
            sem_ids = semantic_dup_ids(
                spark,
                kept.select("doc_id", "embedding"),
                vector_index_dir,
                vector_corpus_df,
                tau=semantic_tau,
            )
            kept = kept.join(sem_ids, "doc_id", "left_anti")
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
    parser.add_argument(
        "--vector-index",
        default=None,
        help="persisted vector index: drop docs with a cell-scoped "
        "semantic near-dup (stream needs an embedding column)",
    )
    parser.add_argument(
        "--vector-corpus",
        default=None,
        help="parquet of (vec_id, embedding) resolving the vector "
        "index side for exact cosine verification",
    )
    parser.add_argument("--semantic-tau", type=float, default=None)
    parser.add_argument(
        "--gopher-rules",
        action="store_true",
        help="apply the Gopher rule-based quality gate (the "
        "quality_gopher_rules conjunction) to every batch",
    )
    parser.add_argument(
        "--decontaminate-corpus",
        default=None,
        help="parquet of benchmark (doc_id, text): drop docs sharing "
        "an n-gram with it (the contamination_ngram screen at ingest)",
    )
    parser.add_argument(
        "--contam-min-grams",
        type=int,
        default=1,
        help="distinct shared n-grams needed to drop a doc",
    )
    parser.add_argument("--shards", type=int, default=16)
    parser.add_argument("--timeout-sec", type=int, default=600)
    args = parser.parse_args(argv)
    if args.dedup_index and not args.dedup_corpus:
        parser.error("--dedup-index requires --dedup-corpus")
    if args.vector_index and not args.vector_corpus:
        parser.error("--vector-index requires --vector-corpus")
    if args.semantic_tau is not None and not args.vector_index:
        parser.error("--semantic-tau requires --vector-index")
    if args.contam_min_grams != 1 and not args.decontaminate_corpus:
        parser.error("--contam-min-grams requires --decontaminate-corpus")

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
        vector_index_dir=args.vector_index,
        vector_corpus_df=(
            spark.read.parquet(args.vector_corpus).select(
                "vec_id", "embedding"
            )
            if args.vector_corpus
            else None
        ),
        semantic_tau=args.semantic_tau,
        gopher_rules=args.gopher_rules,
        decontaminate_df=(
            spark.read.parquet(args.decontaminate_corpus).select(
                "doc_id", "text"
            )
            if args.decontaminate_corpus
            else None
        ),
        contam_min_grams=args.contam_min_grams,
        n_shards=args.shards,
        available_now=True,
    )
    from .supervision import await_drained

    await_drained(q, args.timeout_sec, "corpus-build")
    return 0

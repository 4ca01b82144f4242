"""CLI: the reference's argument surface on argparse.

Mirrors FlinkKafkaReplicator's parameter handling
(reference: FlinkKafkaReplicator.java:63-106,139-177):

  - ``<<``/``>>`` → ``"`` rewrite (JAAS quoting workaround, :73-74)
  - required params: topics, consumer.bootstrap.servers,
    consumer.group.id, producer.bootstrap.servers (:63-68)
  - unknown-option rejection (:139-152)
  - ``consumer.*`` / ``producer.*`` prefix split into the two property
    sets (:104-105,168-177)
  - transaction-timeout ≥ checkpoint-interval validation (:92-96)
"""

from __future__ import annotations

import argparse

from .streaming.replicate import (
    DEFAULT_CHECKPOINT_INTERVAL_MS,
    DEFAULT_TRANSACTION_TIMEOUT_MS,
    ReplicateConfig,
)

CONSUMER_PREFIX = "consumer."
PRODUCER_PREFIX = "producer."


def _warn_orphan_checkpoint(checkpoint: str, output: str, job: str) -> None:
    """Warn when an explicit checkpoint already has state but the output
    it fed is gone: the resumed stream will skip already-scored batches,
    so the output silently omits them (ADVICE r11). Default checkpoints
    live INSIDE --output and can never desync this way."""
    import os as _os

    if _os.path.isdir(checkpoint) and not _os.path.isdir(output):
        import sys as _sys

        print(
            f"{job}: checkpoint {checkpoint} exists but output {output} "
            "does not — already-processed batches will be SKIPPED and "
            "the output will omit them; delete the checkpoint to "
            "reprocess from the start",
            file=_sys.stderr,
        )


REQUIRED = [
    "topics",
    "consumer.bootstrap.servers",
    "consumer.group.id",
    "producer.bootstrap.servers",
]

_FLAGS = {
    "--from-latest": "from_latest",
    "--create-topics": "create_topics",
    "--create-partitions": "create_partitions",
    "--sync-properties": "sync_properties",
    "--no-preserve-partitioning": "no_preserve_partitioning",
    "--exactly-once": "exactly_once",
}
_INT_OPTS = {
    "--checkpoint-interval-ms": ("checkpoint_interval_ms", DEFAULT_CHECKPOINT_INTERVAL_MS),
    "--transaction-timeout-ms": ("transaction_timeout_ms", DEFAULT_TRANSACTION_TIMEOUT_MS),
    "--parallelism": ("parallelism", None),
    "--max-offsets-per-trigger": ("max_offsets_per_trigger", None),
    # reference: fixedDelayRestart(4, 10 s) (FlinkKafkaReplicator.java:99)
    "--max-restarts": ("max_restarts", 4),
    "--restart-delay-ms": ("restart_delay_ms", 10_000),
}


def rewrite_quotes(args: list[str]) -> list[str]:
    """``<<``/``>>`` → ``"`` (reference: FlinkKafkaReplicator.java:73-74)."""
    return [a.replace("<<", '"').replace(">>", '"') for a in args]


def parse_args(argv: list[str]) -> tuple[ReplicateConfig, dict[str, str]]:
    """Parse → validated ReplicateConfig + leftover generic params.

    Dynamic ``--consumer.X`` / ``--producer.X`` properties are accepted
    like the reference's ParameterTool; anything else unknown is
    rejected with the usage text.
    """
    argv = rewrite_quotes(argv)
    parser = argparse.ArgumentParser(
        prog="spark-kafka-replicator",
        description="Replicate Kafka topics between clusters (PySpark Structured Streaming)",
        # the reference's ParameterTool matches options exactly; argparse's
        # default prefix matching would accept abbreviations it rejects
        allow_abbrev=False,
    )
    parser.add_argument("--topics", required=False)
    for flag in _FLAGS:
        if flag == "--from-latest":
            # the reference spells it --latest-offset (OPTIONS.LATEST_OFFSET);
            # accept both so existing invocations migrate verbatim
            parser.add_argument(flag, "--latest-offset", action="store_true")
        else:
            parser.add_argument(flag, action="store_true")
    for opt, (_, default) in _INT_OPTS.items():
        parser.add_argument(opt, type=int, default=default)
    parser.add_argument("--checkpoint-location", default=None)
    # control-topic transactional ledger for --exactly-once (markers
    # committed atomically with the data; see streaming/exactly_once.py)
    parser.add_argument("--control-topic", default=None)

    known, unknown = parser.parse_known_args(argv)
    props: dict[str, str] = {}
    i = 0
    while i < len(unknown):
        tok = unknown[i]
        if tok.startswith("--") and (
            tok[2:].startswith(CONSUMER_PREFIX) or tok[2:].startswith(PRODUCER_PREFIX)
        ):
            key = tok[2:]
            if "=" in key:
                key, val = key.split("=", 1)
                props[key] = val
                i += 1
            elif i + 1 < len(unknown):
                props[key] = unknown[i + 1]
                i += 2
            else:
                parser.error(f"option {tok} requires a value")
        else:
            parser.error(f"unknown option: {tok}")

    missing = [
        r
        for r in REQUIRED
        if (r == "topics" and not known.topics) or (r != "topics" and r not in props)
    ]
    if missing:
        parser.error("missing required parameters: " + ", ".join(missing))

    consumer = {
        k[len(CONSUMER_PREFIX) :]: v
        for k, v in props.items()
        if k.startswith(CONSUMER_PREFIX)
    }
    producer = {
        k[len(PRODUCER_PREFIX) :]: v
        for k, v in props.items()
        if k.startswith(PRODUCER_PREFIX)
    }
    cfg = ReplicateConfig(
        topics=known.topics,
        from_latest=known.from_latest,
        create_topics=known.create_topics,
        create_partitions=known.create_partitions,
        sync_properties=known.sync_properties,
        preserve_partitioning=not known.no_preserve_partitioning,
        exactly_once=known.exactly_once,
        checkpoint_interval_ms=known.checkpoint_interval_ms,
        transaction_timeout_ms=known.transaction_timeout_ms,
        max_offsets_per_trigger=known.max_offsets_per_trigger,
        consumer_props=consumer,
        producer_props=producer,
    )
    try:
        cfg.validate()
    except ValueError as e:
        parser.error(str(e))
    # Default checkpoint path is derived from (topics, group) so two
    # replicator instances on one host never share checkpoint state —
    # a fixed default would make job B silently resume job A's offsets.
    # It lives under the user's home (NOT /tmp — ADVICE r11/VERDICT r12:
    # a tmpfs checkpoint vanishes on reboot and the replicator silently
    # reprocesses from starting offsets, exactly the at-least-once dupe
    # storm a checkpoint exists to prevent).
    checkpoint = known.checkpoint_location
    if checkpoint is None:
        import hashlib
        import os

        ident = f"{known.topics}|{consumer.get('group.id', '')}"
        checkpoint = os.path.join(
            os.path.expanduser("~"),
            ".spark-kafka-replicator",
            "checkpoints",
            hashlib.md5(ident.encode()).hexdigest()[:10],
        )
    return cfg, {
        "checkpoint_location": checkpoint,
        "parallelism": known.parallelism,
        "max_restarts": known.max_restarts,
        "restart_delay_ms": known.restart_delay_ms,
        "control_topic": known.control_topic,
    }


def run_preflight(cfg: ReplicateConfig, admin_factory=None):
    """Admin pre-flight: discover topics on both clusters and
    create/grow/sync or fail per the flags — the reference runs this
    blocking on the client before building the job graph
    (FlinkKafkaReplicator.java:108). ``admin_factory(bootstrap, props) ->
    AdminClient`` is injectable for tests; defaults to confluent-kafka.
    """
    from .streaming.admin import check_topics, confluent_admin_client

    factory = admin_factory or confluent_admin_client
    # pass the FULL property sets through (minus the bootstrap key):
    # the reference builds its AdminClients from the complete
    # consumer/producer properties (FlinkKafkaReplicator.java:202-205),
    # so security.protocol / SASL / SSL settings must reach pre-flight
    # or it cannot authenticate against secured clusters.
    src_extra = {k: v for k, v in cfg.consumer_props.items() if k != "bootstrap.servers"}
    tgt_extra = {k: v for k, v in cfg.producer_props.items() if k != "bootstrap.servers"}
    source = factory(cfg.consumer_props["bootstrap.servers"], src_extra)
    target = factory(cfg.producer_props["bootstrap.servers"], tgt_extra)
    return check_topics(
        source,
        target,
        cfg.topics,
        create_topics=cfg.create_topics,
        create_partitions=cfg.create_partitions,
        sync_properties=cfg.sync_properties,
        preserve_partitioning=cfg.preserve_partitioning,
    )


def compact_index_main(argv: list[str], spark=None) -> int:
    """The ``compact-index`` maintenance subcommand: small-file
    compaction for the streaming-fed on-disk artifacts (sharded
    corpus, minhash / vector / lexical index) — the job an operator
    schedules against any deployment whose appends accrete one parquet
    partition per micro-batch. Prints the {files_before, files_after}
    result as one JSON line. Compact index artifacts only while their
    feeding stream is cleanly stopped (pre-compaction snapshots are
    discarded; the batch cursor keeps admission valid on resume)."""
    import argparse
    import json as _json

    parser = argparse.ArgumentParser(
        prog="spark-kafka-replicator compact-index",
        description="Compact a sharded corpus / minhash index / vector index",
        allow_abbrev=False,
    )
    parser.add_argument(
        "--kind",
        required=True,
        choices=("corpus", "minhash", "vector", "lexical"),
    )
    parser.add_argument("--dir", required=True)
    parser.add_argument("--files", type=int, default=1)
    args = parser.parse_args(argv)

    if spark is None:
        from .session import get_session

        spark = get_session(app_name="spark-compact-index")

    from . import sinks

    if args.kind == "corpus":
        result = sinks.compact_corpus_shards(
            spark, args.dir, files_per_shard=args.files
        )
    else:
        # hold the single-writer lease across the compaction: a
        # concurrent appender (or second compactor) is refused loudly
        # instead of interleaving pointer swaps
        compact = {
            "minhash": sinks.compact_minhash_index,
            "vector": sinks.compact_vector_index,
            "lexical": sinks.compact_lexical_index,
        }[args.kind]
        with sinks.writer_lease(args.dir, owner="compact-index") as tok:
            result = compact(
                spark, args.dir, files=args.files, writer_token=tok
            )
    print(_json.dumps(result))
    return 0


def recluster_index_main(argv: list[str], spark=None) -> int:
    """The ``recluster-index`` maintenance subcommand: drift-aware
    RETRAIN for a persisted vector index. Measures served recall on
    the bounded drift sample (:func:`sinks.recall_drift_report`)
    against the exact-vector table, and — when recall sits below the
    floor, or ``--force`` — re-learns the coarse quantizer + PQ
    codebook on the committed survivors and pointer-swaps the new
    generation in under the single-writer lease. ``--dry-run`` prints
    the recall report and decision without mutating anything. Prints
    ONE JSON line. Run only while the feeding ingest stream is cleanly
    stopped (the batch cursor keeps admission valid on resume)."""
    import argparse
    import json as _json

    parser = argparse.ArgumentParser(
        prog="spark-kafka-replicator recluster-index",
        description="Drift-aware retrain of a persisted vector index",
        allow_abbrev=False,
    )
    parser.add_argument("--dir", required=True, help="vector index dir")
    parser.add_argument(
        "--exact",
        required=True,
        help="parquet path of the exact-vector table (vec_id, embedding)"
        " covering every committed survivor",
    )
    parser.add_argument("--min-recall", type=float, default=0.8)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--n-probe", type=int, default=None)
    parser.add_argument("--n-centroids", type=int, default=None)
    parser.add_argument("--kmeans-iters", type=int, default=None)
    parser.add_argument(
        "--force",
        action="store_true",
        help="retrain regardless of the measured recall",
    )
    parser.add_argument(
        "--dry-run",
        action="store_true",
        help="measure and decide only; never mutate",
    )
    args = parser.parse_args(argv)

    if spark is None:
        from .session import get_session

        spark = get_session(app_name="spark-recluster-index")

    from . import sinks

    exact = spark.read.parquet(args.exact)
    decision = sinks.should_recluster(
        spark,
        args.dir,
        exact,
        min_recall=args.min_recall,
        k=args.k,
        n_probe=args.n_probe,
    )
    report: dict = {"dir": args.dir, **decision, "reclustered": False}
    if (decision["recluster"] or args.force) and not args.dry_run:
        with sinks.writer_lease(args.dir, owner="recluster-index") as tok:
            stats = sinks.recluster_vector_index(
                spark,
                args.dir,
                exact,
                n_centroids=args.n_centroids,
                kmeans_iters=args.kmeans_iters,
                writer_token=tok,
            )
        after = sinks.should_recluster(
            spark,
            args.dir,
            exact,
            min_recall=args.min_recall,
            k=args.k,
            n_probe=args.n_probe,
        )
        report.update(
            {
                "reclustered": True,
                "stats": stats,
                "recall_after": after["mean_recall"],
            }
        )
    print(_json.dumps(report, sort_keys=True))
    return 0


def index_stats_main(argv: list[str], spark=None) -> int:
    """The ``index-stats`` subcommand: a READ-ONLY health report for
    any of the persisted index artifacts (minhash / vector / lexical)
    or a sharded corpus — the numbers an operator checks before
    scheduling compaction or diagnosing a serving anomaly. Prints ONE
    JSON line: the committed meta (the pointer state), parquet file
    count and total bytes under the root, and — with ``--rows`` — the
    committed row counts per table (requires a Spark session; the
    default report is pure filesystem metadata and starts no JVM).

    Never takes the writer lease: stats must be safe to run while an
    ingest stream holds it."""
    import argparse
    import glob as _glob
    import json as _json
    import os as _os

    parser = argparse.ArgumentParser(
        prog="spark-kafka-replicator index-stats",
        description="Report committed state of a persisted index artifact",
        allow_abbrev=False,
    )
    parser.add_argument(
        "--kind",
        required=True,
        choices=("corpus", "minhash", "vector", "lexical"),
    )
    parser.add_argument("--dir", required=True)
    parser.add_argument(
        "--rows", action="store_true", help="also count committed rows"
    )
    args = parser.parse_args(argv)

    from . import sinks

    meta: dict = {}
    if args.kind == "minhash":
        meta = sinks._read_index_meta(args.dir)
    elif args.kind == "vector":
        meta = sinks._read_vindex_meta(args.dir)
    elif args.kind == "lexical":
        meta = sinks._read_lexindex_meta(args.dir)
    # corpus shards carry no meta pointer — the layout IS the state

    files = _glob.glob(
        _os.path.join(args.dir, "**", "*.parquet"), recursive=True
    )
    report = {
        "kind": args.kind,
        "dir": args.dir,
        "meta": meta,
        "n_parquet_files": len(files),
        "total_bytes": sum(_os.path.getsize(f) for f in files),
    }

    if args.rows:
        if spark is None:
            from .session import get_session

            spark = get_session(app_name="spark-index-stats")
        rows: dict[str, int] = {}
        if args.kind == "minhash":
            bands, stats = sinks.read_minhash_index(spark, args.dir)
            rows["bands"] = bands.count()
            rows["band_stats"] = stats.count()
        elif args.kind == "vector":
            cents, postings, codebook, codes = sinks.read_vector_index(
                spark, args.dir
            )
            rows["centroids"] = cents.count()
            rows["postings"] = postings.count()
            rows["pq_codebook"] = codebook.count()
            rows["pq_codes"] = codes.count()
            # cell-skew summary — the cheap drift indicator an operator
            # checks before paying for recluster-index --dry-run
            cells = sinks.index_cell_histogram(spark, args.dir).collect()
            rows["n_cells"] = len(cells)
            rows["max_cell_skew_vs_mean"] = max(
                float(c.skew_vs_mean) for c in cells
            )
        elif args.kind == "lexical":
            postings, doclen, dfreq, _meta = sinks.read_lexical_index(
                spark, args.dir
            )
            rows["postings"] = postings.count()
            rows["doclen"] = doclen.count()
            rows["dfreq"] = dfreq.count()
        else:
            rows["docs"] = spark.read.parquet(args.dir).count()
        report["rows"] = rows

    print(_json.dumps(report, sort_keys=True))
    return 0


def apply_dedup_main(argv: list[str], spark=None) -> int:
    """The ``corpus-apply-dedup`` subcommand: EXECUTE the dedup ladder
    as a batch job — read the table directory, compute the per-doc
    decision matrix (the driver-green ``corpus_apply_dedup`` query),
    and materialize the surviving corpus to the sharded sink. Prints
    the {n_in, n_kept, n_dropped, n_written} counts as one JSON line;
    exits non-zero if the committed output does not equal the decided
    survivor count (the loud version of a partial write)."""
    import argparse
    import json as _json
    import os as _os

    from .functions.pipeline_queries import DEDUP_RUNGS

    parser = argparse.ArgumentParser(
        prog="spark-kafka-replicator corpus-apply-dedup",
        description=(
            "Materialize the corpus surviving the dedup ladder "
            "(exact / paragraph / minhash-centrality / semantic)"
        ),
        allow_abbrev=False,
    )
    parser.add_argument(
        "--input",
        required=True,
        help="table directory holding documents.parquet "
        "(+ embeddings.parquet for the semantic rung)",
    )
    parser.add_argument("--output", required=True)
    parser.add_argument(
        "--rungs",
        default=",".join(DEDUP_RUNGS),
        help=f"comma list from {DEDUP_RUNGS}",
    )
    parser.add_argument(
        "--scrub-spans",
        action="store_true",
        help="after the ladder's deletions, remove every cross-doc "
        "8-token span from all survivors except its canonical owner "
        "(the exact-substring removal)",
    )
    parser.add_argument("--shards", type=int, default=16)
    parser.add_argument(
        "--minhash-index",
        default=None,
        help="persisted minhash index dir to propagate the deletions "
        "into (tombstone delta — see delete_minhash_docs)",
    )
    parser.add_argument(
        "--vector-index",
        default=None,
        help="persisted vector index dir to propagate the deletions into",
    )
    parser.add_argument(
        "--lexical-index",
        default=None,
        help="persisted lexical (BM25) index dir to propagate the "
        "deletions into",
    )
    args = parser.parse_args(argv)

    rungs = tuple(r.strip() for r in args.rungs.split(",") if r.strip())
    bad = [r for r in rungs if r not in DEDUP_RUNGS]
    if bad:
        parser.error(f"unknown rungs {bad}; valid: {list(DEDUP_RUNGS)}")
    if "semantic" in rungs and not _os.path.exists(
        _os.path.join(args.input, "embeddings.parquet")
    ):
        parser.error(
            "the semantic rung needs embeddings.parquet under --input; "
            "drop it from --rungs for a text-only corpus"
        )

    if spark is None:
        from .session import get_session

        spark = get_session(app_name="spark-corpus-apply-dedup")

    from .sinks import apply_dedup_corpus

    result = apply_dedup_corpus(
        spark,
        args.input,
        args.output,
        rungs=rungs,
        scrub_spans=args.scrub_spans,
        n_shards=args.shards,
        minhash_dir=args.minhash_index,
        vector_dir=args.vector_index,
        lexical_dir=args.lexical_index,
    )
    print(_json.dumps(result))
    return 0 if result["n_written"] == result["n_kept"] else 1


def drift_monitor_main(argv: list[str], spark=None) -> int:
    """The ``drift-monitor`` subcommand: score a value stream against a
    frozen reference histogram, per micro-batch, writing per-bucket PSI
    rows (streaming/drift_monitor.py). ``--build-ref-from`` freezes the
    reference first (the vetted-window step), so freeze+monitor is one
    invocation; the availableNow trigger drains existing files and
    exits — re-run with the same checkpoint to score only new files."""
    import argparse

    parser = argparse.ArgumentParser(
        prog="spark-kafka-replicator drift-monitor",
        description=(
            "Monitor a parquet value stream for distribution drift vs "
            "a frozen reference histogram (PSI per bucket per batch)"
        ),
        allow_abbrev=False,
    )
    parser.add_argument("--source", required=True)
    parser.add_argument("--ref-dir", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--value-col", default="value")
    parser.add_argument("--checkpoint-location", default=None)
    parser.add_argument(
        "--build-ref-from",
        default=None,
        help="parquet dir of the vetted reference window: freeze the "
        "reference histogram into --ref-dir before monitoring",
    )
    parser.add_argument("--timeout-sec", type=int, default=600)
    args = parser.parse_args(argv)

    if spark is None:
        from .session import get_session

        spark = get_session(app_name="spark-drift-monitor")

    from .streaming.drift_monitor import (
        start_streaming_drift_monitor,
        write_reference_histogram,
    )

    if args.build_ref_from is not None:
        write_reference_histogram(
            spark.read.parquet(args.build_ref_from),
            args.ref_dir,
            value_col=args.value_col,
        )

    # checkpoint defaults INSIDE --output so the pair lives and dies
    # together (ADVICE r11): a /tmp checkpoint that outlives a deleted
    # output dir makes the merged report silently omit already-scored
    # batches, and /tmp cleanup causes the reverse (full rescore
    # against stale partials). Spark readers ignore _-prefixed paths,
    # so the report scan below is unaffected.
    checkpoint = args.checkpoint_location
    if checkpoint is None:
        import os as _os

        checkpoint = _os.path.join(args.output, "_checkpoint")
    else:
        _warn_orphan_checkpoint(checkpoint, args.output, "drift-monitor")

    schema = spark.read.parquet(args.source).schema
    stream = spark.readStream.schema(schema).parquet(args.source)
    q = start_streaming_drift_monitor(
        spark,
        stream,
        args.ref_dir,
        args.output,
        checkpoint,
        value_col=args.value_col,
        available_now=True,
    )
    from .streaming.supervision import await_drained

    await_drained(q, args.timeout_sec, "drift-monitor")
    import json as _json

    from pyspark.sql import functions as _F

    summary = (
        spark.read.parquet(args.output)
        .groupBy("batch_id")
        .agg(_F.round(_F.sum(_F.abs(_F.col("psi_term"))), 6).alias("psi"))
        .orderBy("batch_id")
        .collect()
    )
    print(
        _json.dumps(
            {"batches": [{"batch_id": r.batch_id, "psi": r.psi} for r in summary]}
        )
    )
    return 0


def vector_search_main(argv: list[str], spark=None) -> int:
    """The ``vector-search`` subcommand: answer a stream of (qid,
    embedding) query vectors from a persisted vector index — the serve
    leg of the build (`write_vector_index`) / grow (vector ingest) /
    serve lifecycle, as a deployable job. Batch mode in disguise: the
    availableNow trigger drains whatever query files exist and exits,
    so one-shot batch answering and continuous serving share the one
    code path (re-run with the same checkpoint to pick up new query
    files only)."""
    import argparse

    parser = argparse.ArgumentParser(
        prog="spark-kafka-replicator vector-search",
        description=(
            "Serve ANN queries (parquet of qid, embedding) from a "
            "persisted vector index"
        ),
        allow_abbrev=False,
    )
    parser.add_argument("--index-dir", required=True)
    parser.add_argument("--queries", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--checkpoint-location", default=None)
    parser.add_argument("--top-k", type=int, default=5)
    parser.add_argument("--n-probe", type=int, default=None)
    parser.add_argument(
        "--refine-from",
        default=None,
        help="parquet of (vec_id, embedding) exact vectors: re-rank an "
        "ADC shortlist by exact cosine (answers gain cos_sim)",
    )
    parser.add_argument("--shortlist", type=int, default=None)
    parser.add_argument(
        "--mmr",
        action="store_true",
        help="diversify each query's refined shortlist with the "
        "per-qid MMR greedy (requires --refine-from; answers become "
        "qid, rank, vec_id, rel, mmr)",
    )
    parser.add_argument("--timeout-sec", type=int, default=600)
    args = parser.parse_args(argv)
    if args.shortlist is not None and args.refine_from is None:
        parser.error("--shortlist requires --refine-from")
    if args.mmr and args.refine_from is None:
        parser.error("--mmr requires --refine-from")

    if spark is None:
        from .session import get_session

        spark = get_session(app_name="spark-vector-search")

    # checkpoint defaults INSIDE --output: pair lives and dies together
    # (ADVICE r11; _-prefixed, invisible to parquet readers)
    checkpoint = args.checkpoint_location
    if checkpoint is None:
        import os as _os

        checkpoint = _os.path.join(args.output, "_checkpoint")
    else:
        _warn_orphan_checkpoint(checkpoint, args.output, "vector-search")

    from .streaming.vector_search import start_streaming_vector_search

    schema = spark.read.parquet(args.queries).schema
    stream = spark.readStream.schema(schema).parquet(args.queries)
    q = start_streaming_vector_search(
        spark,
        stream,
        args.index_dir,
        args.output,
        checkpoint,
        k=args.top_k,
        n_probe=args.n_probe,
        available_now=True,
        refine_with=(
            spark.read.parquet(args.refine_from).select(
                "vec_id", "embedding"
            )
            if args.refine_from
            else None
        ),
        shortlist=args.shortlist,
        mmr=args.mmr,
    )
    from .streaming.supervision import await_drained

    await_drained(q, args.timeout_sec, "vector-search")
    return 0


def lexical_search_main(argv: list[str], spark=None) -> int:
    """The ``lexical-search`` subcommand: answer a stream of (qid,
    terms) queries from a persisted BM25 lexical index — the lexical
    leg's serve job, the exact peer of ``vector-search``. Batch mode in
    disguise via the availableNow trigger (drain existing query files
    and exit; re-run with the same checkpoint to answer only new
    files). ``--build-from`` first (re)builds the index from a corpus
    table directory, so one invocation can do build + serve."""
    import argparse

    parser = argparse.ArgumentParser(
        prog="spark-kafka-replicator lexical-search",
        description=(
            "Serve BM25 queries (parquet of qid, terms) from a "
            "persisted lexical index"
        ),
        allow_abbrev=False,
    )
    parser.add_argument("--index-dir", required=True)
    parser.add_argument("--queries", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--checkpoint-location", default=None)
    parser.add_argument("--top-k", type=int, default=10)
    parser.add_argument(
        "--build-from",
        default=None,
        help="table directory holding documents.parquet: (re)build the "
        "index there before serving",
    )
    parser.add_argument("--timeout-sec", type=int, default=600)
    args = parser.parse_args(argv)

    if spark is None:
        from .session import get_session

        spark = get_session(app_name="spark-lexical-search")

    if args.build_from:
        from .sinks import write_lexical_index

        write_lexical_index(spark, args.build_from, args.index_dir)

    # checkpoint defaults INSIDE --output: pair lives and dies together
    # (ADVICE r11; _-prefixed, invisible to parquet readers)
    checkpoint = args.checkpoint_location
    if checkpoint is None:
        import os as _os

        checkpoint = _os.path.join(args.output, "_checkpoint")
    else:
        _warn_orphan_checkpoint(checkpoint, args.output, "lexical-search")

    from .streaming.lexical_search import start_streaming_lexical_search

    schema = spark.read.parquet(args.queries).schema
    stream = spark.readStream.schema(schema).parquet(args.queries)
    q = start_streaming_lexical_search(
        spark,
        stream,
        args.index_dir,
        args.output,
        checkpoint,
        k=args.top_k,
        available_now=True,
    )
    from .streaming.supervision import await_drained

    await_drained(q, args.timeout_sec, "lexical-search")
    return 0


def hybrid_search_main(argv: list[str], spark=None) -> int:
    """The ``hybrid-search`` subcommand: answer a stream of
    (qid, terms, embedding) queries by reciprocal-rank fusion of the
    persisted BM25 index and the persisted vector index (exact-re-rank
    leg) — the full two-leg retrieval service as one deployable job.
    availableNow drain semantics like its vector-search / lexical-search
    peers."""
    import argparse

    parser = argparse.ArgumentParser(
        prog="spark-kafka-replicator hybrid-search",
        description=(
            "Serve hybrid (BM25 + ANN, RRF-fused) queries from the two "
            "persisted indexes"
        ),
        allow_abbrev=False,
    )
    parser.add_argument("--lexical-index-dir", required=True)
    parser.add_argument("--vector-index-dir", required=True)
    parser.add_argument(
        "--exact-vectors",
        required=True,
        help="parquet of (vec_id, embedding) for the exact re-rank leg",
    )
    parser.add_argument("--queries", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--checkpoint-location", default=None)
    parser.add_argument("--top-k", type=int, default=None)
    parser.add_argument("--lex-k", type=int, default=20)
    parser.add_argument("--vec-k", type=int, default=10)
    parser.add_argument("--n-probe", type=int, default=None)
    parser.add_argument("--shortlist", type=int, default=None)
    parser.add_argument("--timeout-sec", type=int, default=600)
    args = parser.parse_args(argv)

    if spark is None:
        from .session import get_session

        spark = get_session(app_name="spark-hybrid-search")

    # checkpoint defaults INSIDE --output: pair lives and dies together
    # (ADVICE r11; _-prefixed, invisible to parquet readers)
    checkpoint = args.checkpoint_location
    if checkpoint is None:
        import os as _os

        checkpoint = _os.path.join(args.output, "_checkpoint")
    else:
        _warn_orphan_checkpoint(checkpoint, args.output, "hybrid-search")

    from .streaming.hybrid_search import start_streaming_hybrid_search

    schema = spark.read.parquet(args.queries).schema
    stream = spark.readStream.schema(schema).parquet(args.queries)
    q = start_streaming_hybrid_search(
        spark,
        stream,
        args.lexical_index_dir,
        args.vector_index_dir,
        spark.read.parquet(args.exact_vectors).select("vec_id", "embedding"),
        args.output,
        checkpoint,
        k=args.top_k,
        lex_k=args.lex_k,
        vec_k=args.vec_k,
        n_probe=args.n_probe,
        shortlist=args.shortlist,
        available_now=True,
    )
    from .streaming.supervision import await_drained

    await_drained(q, args.timeout_sec, "hybrid-search")
    return 0


# the dq-audit battery: every registered dq_* id, run in this order
DQ_AUDIT_IDS: tuple[str, ...] = (
    "dq_profile",
    "dq_completeness_matrix",
    "dq_duplicate_key_report",
    "dq_referential_integrity",
    "dq_rules_engine",
    "dq_reconciliation",
    "dq_outlier_mad",
    "dq_benford",
    "dq_distribution_drift",
    "dq_winsorize",
    "dq_enum_conformity",
    "dq_cross_field_consistency",
)


def dq_audit_main(argv: list[str], spark=None) -> int:
    """The ``dq-audit`` subcommand: run the full data-quality battery
    (profile, referential integrity, declarative rules, financial
    reconciliation, MAD outliers, Benford, PSI drift, winsorized
    stats) over one dataset directory, persist each report under
    ``--output/<check>/``, and print a one-line JSON summary — the
    scheduled job a warehouse runs after every load, composed entirely
    of the registry's driver-verified queries."""
    import argparse
    import json as _json
    import time as _time

    parser = argparse.ArgumentParser(
        prog="spark-kafka-replicator dq-audit",
        description=(
            "Run the full DQ battery over a dataset dir of parquet "
            "tables and persist one report per check"
        ),
        allow_abbrev=False,
    )
    parser.add_argument(
        "--data-dir", required=True,
        help="directory holding the parquet tables (the sf_dir layout)",
    )
    parser.add_argument("--output", required=True)
    parser.add_argument(
        "--checks",
        default=None,
        help="comma-separated subset of checks (default: all "
        + ",".join(DQ_AUDIT_IDS) + ")",
    )
    args = parser.parse_args(argv)

    if spark is None:
        from .session import get_session

        spark = get_session(app_name="spark-dq-audit")

    from .operators import data_quality as dq

    wanted = (
        [c.strip() for c in args.checks.split(",") if c.strip()]
        if args.checks
        else list(DQ_AUDIT_IDS)
    )
    unknown = [c for c in wanted if c not in dq.QUERIES]
    if unknown:
        print(_json.dumps({"error": f"unknown checks: {unknown}"}))
        return 2
    summary = []
    for check in wanted:
        t0 = _time.perf_counter()
        df = dq.QUERIES[check](spark, args.data_dir)
        out = f"{args.output}/{check}"
        df.write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        summary.append(
            {
                "check": check,
                "rows": n,
                "sec": round(_time.perf_counter() - t0, 3),
            }
        )
    print(_json.dumps({"audits": summary, "output": args.output}))
    return 0


def dq_monitor_main(argv: list[str], spark=None) -> int:
    """The ``dq-monitor`` subcommand: run the dq-audit battery's rules
    engine + financial reconciliation per micro-batch over a parquet
    stream of order rows (streaming/dq_monitor.py — the same core
    functions as the batch path, so stream == batch holds by
    construction). Prints the MERGED whole-stream reports as one JSON
    line; the availableNow trigger drains existing files and exits —
    re-run with the same checkpoint to score only new files."""
    import argparse
    import json as _json

    parser = argparse.ArgumentParser(
        prog="spark-kafka-replicator dq-monitor",
        description=(
            "Monitor a parquet stream of order rows with the DQ "
            "battery's rules engine + reconciliation, per micro-batch"
        ),
        allow_abbrev=False,
    )
    parser.add_argument("--source", required=True)
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument(
        "--lineitem-dir",
        help="parquet dir of the lineitem table the reconciliation "
        "recomputes order totals from (frozen once at monitor start; "
        "use --lineitem-source when lineitems also arrive as a stream)",
    )
    group.add_argument(
        "--lineitem-source",
        help="parquet STREAM of lineitem rows — the dual-stream "
        "monitor: per-order totals accumulate as mergeable partials, "
        "so orders whose lineitems arrive in later batches still "
        "reconcile against their final totals",
    )
    parser.add_argument("--output", required=True)
    parser.add_argument("--checkpoint-location", default=None)
    parser.add_argument("--timeout-sec", type=int, default=600)
    args = parser.parse_args(argv)

    if spark is None:
        from .session import get_session

        spark = get_session(app_name="spark-dq-monitor")

    import os as _os

    from .streaming.dq_monitor import (
        DQ_MONITOR_CHECKS,
        merged_dq_report,
        start_streaming_dq_monitor,
        start_streaming_dq_monitor_dual,
    )

    checkpoint = args.checkpoint_location
    if checkpoint is None:
        # the checkpoint lives INSIDE the output dir so the pair lives
        # and dies together (ADVICE r11): a /tmp checkpoint that
        # outlives a deleted output dir made the merged report
        # silently omit already-scored batches, and /tmp cleanup
        # caused the reverse (a full rescore against stale partials)
        checkpoint = _os.path.join(args.output, "_checkpoint")
    elif _os.path.isdir(checkpoint) and not any(
        _os.path.isdir(_os.path.join(args.output, c))
        for c in DQ_MONITOR_CHECKS
    ):
        import sys as _sys

        print(
            f"dq-monitor: checkpoint {checkpoint} exists but output "
            f"{args.output} has no report partials — already-scored "
            "batches will be SKIPPED and the merged report will omit "
            "them; delete the checkpoint to rescore from the start",
            file=_sys.stderr,
        )

    schema = spark.read.parquet(args.source).schema
    stream = spark.readStream.schema(schema).parquet(args.source)
    from .streaming.supervision import await_drained

    if args.lineitem_source:
        li_schema = spark.read.parquet(args.lineitem_source).schema
        li_stream = spark.readStream.schema(li_schema).parquet(
            args.lineitem_source
        )
        qo, ql = start_streaming_dq_monitor_dual(
            spark,
            stream,
            li_stream,
            out_dir=args.output,
            checkpoint_location=checkpoint,
            available_now=True,
        )
        await_drained(qo, args.timeout_sec, "dq-monitor[orders]")
        await_drained(ql, args.timeout_sec, "dq-monitor[lineitem]")
    else:
        q = start_streaming_dq_monitor(
            spark,
            stream,
            lineitem_df=spark.read.parquet(args.lineitem_dir),
            out_dir=args.output,
            checkpoint_location=checkpoint,
            available_now=True,
        )
        await_drained(q, args.timeout_sec, "dq-monitor")
    summary = {}
    for check in DQ_MONITOR_CHECKS:
        rows = merged_dq_report(spark, args.output, check).collect()
        summary[check] = [r.asDict() for r in rows]
    print(_json.dumps({"merged": summary, "output": args.output}))
    return 0


def plan_lint_main(argv: list[str], spark=None) -> int:
    """The ``plan-lint`` subcommand: lint registry queries' physical
    plans for the shapes that do not survive a 100 TB scale-up
    (``plans.lint_plan``: cartesian products, broadcast-nested-loop
    joins, single-partition exchanges whose consumer is not a keyless
    aggregate). Plan build only — nothing executes beyond the memoized
    model-artifact seeds some builders pin. Prints ONE JSON line:
    clean ids counted, flagged ids with their per-pattern occurrence
    counts. With ``--fail-on-hits`` the exit code gates a CI step; the
    repo's own gate is the pinned allowlist in tests/plan_audit.py —
    this subcommand reports raw hits and leaves the judgment to the
    operator."""
    import argparse
    import json as _json

    parser = argparse.ArgumentParser(
        prog="spark-kafka-replicator plan-lint",
        description="Lint registry query plans for scale anti-patterns",
        allow_abbrev=False,
    )
    parser.add_argument(
        "--query",
        action="append",
        default=[],
        help="registry query id (repeatable); default: all ids",
    )
    parser.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.001",
        help="parquet table directory the plans are built against",
    )
    parser.add_argument(
        "--fail-on-hits",
        action="store_true",
        help="exit 1 if any plan shows an anti-pattern",
    )
    args = parser.parse_args(argv)

    from .plans import formatted_plan, lint_plan_text
    from .registry import all_queries

    qs = all_queries()
    unknown = sorted(set(args.query) - set(qs))
    if unknown:
        parser.error(f"unknown query ids: {unknown}")
    ids = sorted(args.query) if args.query else sorted(qs)

    if spark is None:
        from .session import get_session

        spark = get_session(app_name="spark-plan-lint")

    flagged: dict[str, dict[str, int]] = {}
    errors: dict[str, str] = {}
    for qid in ids:
        try:
            hits = lint_plan_text(formatted_plan(qs[qid](spark, args.sf_dir)))
        except Exception as ex:  # noqa: BLE001 — report, keep linting
            errors[qid] = f"{type(ex).__name__}: {str(ex)[:200]}"
            continue
        if hits:
            flagged[qid] = hits
    print(
        _json.dumps(
            {
                "n_ids": len(ids),
                "n_clean": len(ids) - len(flagged) - len(errors),
                "flagged": flagged,
                "errors": errors,
                "sf_dir": args.sf_dir,
            },
            sort_keys=True,
        )
    )
    return 1 if (args.fail_on_hits and (flagged or errors)) else 0


def main(argv: list[str] | None = None, admin_factory=None) -> int:
    import sys

    from .session import get_session
    from .streaming.exactly_once import start_exactly_once_kafka_replication
    from .streaming.replicate import start_kafka_replication

    args = argv if argv is not None else sys.argv[1:]
    # subcommand dispatch: `corpus-build` runs the curation pipeline
    # (streaming/corpus_build.py); the bare option form stays the
    # replicator for verbatim reference-invocation compatibility
    if args and args[0] == "corpus-build":
        from .streaming.corpus_build import corpus_build_main

        return corpus_build_main(args[1:])
    if args and args[0] == "compact-index":
        return compact_index_main(args[1:])
    if args and args[0] == "vector-search":
        return vector_search_main(args[1:])
    if args and args[0] == "lexical-search":
        return lexical_search_main(args[1:])
    if args and args[0] == "hybrid-search":
        return hybrid_search_main(args[1:])
    if args and args[0] == "corpus-apply-dedup":
        return apply_dedup_main(args[1:])
    if args and args[0] == "index-stats":
        return index_stats_main(args[1:])
    if args and args[0] == "recluster-index":
        return recluster_index_main(args[1:])
    if args and args[0] == "drift-monitor":
        return drift_monitor_main(args[1:])
    if args and args[0] == "dq-audit":
        return dq_audit_main(args[1:])
    if args and args[0] == "dq-monitor":
        return dq_monitor_main(args[1:])
    if args and args[0] == "plan-lint":
        return plan_lint_main(args[1:])

    cfg, extra = parse_args(args)
    run_preflight(cfg, admin_factory)
    spark = get_session(
        app_name="spark-kafka-replicator",
        # the reference's --parallelism bounds job parallelism
        # (README.adoc:28); shuffle partitions are the Spark analog
        shuffle_partitions=extra["parallelism"],
    )
    from .streaming.supervision import supervise

    def start():
        if cfg.exactly_once:
            # reference: --exactly-once switches the producer to transactional
            # two-phase semantics (FlinkKafkaReplicator.java:124)
            return start_exactly_once_kafka_replication(
                spark,
                cfg,
                extra["checkpoint_location"],
                control_topic=extra["control_topic"],
            )
        return start_kafka_replication(spark, cfg, extra["checkpoint_location"])

    # fixed-delay restart supervision (FlinkKafkaReplicator.java:99):
    # every restart re-opens the SAME checkpoint location, so the query
    # resumes from committed offsets exactly like Flink's restore.
    supervise(
        start,
        max_restarts=extra["max_restarts"],
        restart_delay_s=extra["restart_delay_ms"] / 1000.0,
    )
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())

"""CLI surface tests (reference: FlinkKafkaReplicator.java:63-106,139-177)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_kafka_replicator_spark.cli import parse_args, rewrite_quotes

BASE = [
    "--topics", "app\\..*",
    "--consumer.bootstrap.servers", "src:9092",
    "--consumer.group.id", "repl",
    "--producer.bootstrap.servers", "dst:9092",
]


def test_quote_rewrite():
    assert rewrite_quotes(["--x", "a<<b>>c"]) == ["--x", 'a"b"c']


def test_happy_path_and_prefix_split():
    cfg, extra = parse_args(BASE + ["--consumer.sasl.mechanism", "PLAIN"])
    assert cfg.topics == "app\\..*"
    assert cfg.consumer_props == {
        "bootstrap.servers": "src:9092",
        "group.id": "repl",
        "sasl.mechanism": "PLAIN",
    }
    assert cfg.producer_props == {"bootstrap.servers": "dst:9092"}
    assert cfg.preserve_partitioning and not cfg.exactly_once


def test_flags_and_defaults():
    cfg, _ = parse_args(
        BASE + ["--exactly-once", "--no-preserve-partitioning", "--from-latest"]
    )
    assert cfg.exactly_once and cfg.from_latest and not cfg.preserve_partitioning
    assert cfg.checkpoint_interval_ms == 1_000
    assert cfg.transaction_timeout_ms == 870_000


def test_latest_offset_alias_matches_reference_spelling():
    """The reference exposes OPTIONS.LATEST_OFFSET as --latest-offset;
    a migrating invocation must work verbatim."""
    cfg, _ = parse_args(BASE + ["--latest-offset"])
    assert cfg.from_latest


def test_abbreviated_options_rejected(capsys):
    """ParameterTool matches options exactly; argparse's prefix
    matching must be off or abbreviations the reference rejects would
    silently parse."""
    with pytest.raises(SystemExit):
        parse_args(BASE + ["--exactly", "--from-lat"])


def test_restart_strategy_options():
    _, extra = parse_args(BASE)
    assert extra["max_restarts"] == 4 and extra["restart_delay_ms"] == 10_000
    _, extra = parse_args(BASE + ["--max-restarts", "2", "--restart-delay-ms", "500"])
    assert extra["max_restarts"] == 2 and extra["restart_delay_ms"] == 500


def test_missing_required_params_rejected(capsys):
    with pytest.raises(SystemExit):
        parse_args(["--topics", "x"])
    assert "missing required parameters" in capsys.readouterr().err


def test_unknown_option_rejected(capsys):
    with pytest.raises(SystemExit):
        parse_args(BASE + ["--bogus-flag", "1"])
    assert "unknown option" in capsys.readouterr().err


def test_transaction_timeout_cross_validation(capsys):
    with pytest.raises(SystemExit):
        parse_args(
            BASE
            + [
                "--exactly-once",
                "--checkpoint-interval-ms", "10000",
                "--transaction-timeout-ms", "500",
            ]
        )
    assert "transaction-timeout-ms" in capsys.readouterr().err


def test_equals_style_properties():
    cfg, _ = parse_args(
        [
            "--topics", "t",
            "--consumer.bootstrap.servers=src:9092",
            "--consumer.group.id=g",
            "--producer.bootstrap.servers=dst:9092",
        ]
    )
    assert cfg.consumer_props["group.id"] == "g"


def test_preflight_runs_reference_decision_matrix():
    from flink_kafka_replicator_spark.cli import parse_args, run_preflight
    from flink_kafka_replicator_spark.model import Topic
    from flink_kafka_replicator_spark.streaming.admin import FakeAdminClient

    src = FakeAdminClient(
        {
            "app.a": Topic("app.a", 4, {"retention.ms": "100"}),
            "other": Topic("other", 1, {}),
        }
    )
    dst = FakeAdminClient({})
    clients = {"s:9092": src, "d:9092": dst}
    cfg, _ = parse_args(
        [
            "--topics", r"app\..*",
            "--create-topics",
            "--consumer.bootstrap.servers", "s:9092",
            "--consumer.group.id", "g",
            "--producer.bootstrap.servers", "d:9092",
        ]
    )
    report = run_preflight(cfg, admin_factory=lambda b, props=None: clients[b])
    # matched topic created on target with source partitions + config;
    # non-matching 'other' untouched
    assert report.created == ["app.a"]
    assert dst.topics["app.a"].partitions == 4
    assert "other" not in dst.topics


def test_preflight_fails_without_create_flag():
    import pytest

    from flink_kafka_replicator_spark.cli import parse_args, run_preflight
    from flink_kafka_replicator_spark.model import Topic
    from flink_kafka_replicator_spark.streaming.admin import FakeAdminClient

    clients = {
        "s:9092": FakeAdminClient({"app.a": Topic("app.a", 4, {})}),
        "d:9092": FakeAdminClient({}),
    }
    cfg, _ = parse_args(
        [
            "--topics", r"app\..*",
            "--consumer.bootstrap.servers", "s:9092",
            "--consumer.group.id", "g",
            "--producer.bootstrap.servers", "d:9092",
        ]
    )
    with pytest.raises(Exception, match="app.a"):
        run_preflight(cfg, admin_factory=lambda b, props=None: clients[b])


def test_default_checkpoint_location_is_job_scoped():
    from flink_kafka_replicator_spark.cli import parse_args

    base = [
        "--consumer.bootstrap.servers", "s:9092",
        "--consumer.group.id", "g",
        "--producer.bootstrap.servers", "d:9092",
    ]
    _, a = parse_args(["--topics", "a.*"] + base)
    _, b = parse_args(["--topics", "b.*"] + base)
    assert a["checkpoint_location"] != b["checkpoint_location"]
    _, a2 = parse_args(["--topics", "a.*"] + base)
    assert a["checkpoint_location"] == a2["checkpoint_location"]


def test_max_offsets_per_trigger_flows_to_config():
    from flink_kafka_replicator_spark.cli import parse_args

    cfg, _ = parse_args(
        [
            "--topics", "t.*",
            "--max-offsets-per-trigger", "50000",
            "--consumer.bootstrap.servers", "s:9092",
            "--consumer.group.id", "g",
            "--producer.bootstrap.servers", "d:9092",
        ]
    )
    assert cfg.max_offsets_per_trigger == 50000


def test_corpus_build_subcommand_end_to_end(spark, tmp_path):
    """Round 8 (VERDICT r7 task 7): the curation pipeline as a CLI
    peer of the replicator — `corpus-build` drives normalize →
    watermark dedup → token floor → persisted-classifier gate →
    sharded sink through the file harness, and a replay against the
    same checkpoint is a no-op (idempotent batch partitions)."""
    import datetime as dt
    import os

    from pyspark.sql import Row

    from flink_kafka_replicator_spark.cli import main
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

    # input: real fixture docs + a verbatim duplicate + a too-short doc
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(50)
        .withColumn(
            "event_ts",
            F.lit(dt.datetime(2024, 1, 1)) + F.make_interval(
                mins=F.col("doc_id").cast("int")
            ),
        )
    )
    base = dt.datetime(2024, 1, 1)
    first_text = docs.orderBy("doc_id").first()["text"]
    extra = spark.createDataFrame(
        [
            Row(doc_id=900001, text=first_text,
                event_ts=base + dt.timedelta(minutes=1)),
            Row(doc_id=900002, text="too short",
                event_ts=base + dt.timedelta(minutes=2)),
        ],
        "doc_id bigint, text string, event_ts timestamp",
    )
    src = str(tmp_path / "in")
    docs.unionByName(extra).coalesce(2).write.parquet(src)

    out = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")
    rc = main([
        "corpus-build",
        "--input", src,
        "--output", out,
        "--checkpoint-location", ck,
        "--classifier-model", model_dir,
        "--min-tokens", "5",
    ])
    assert rc == 0

    got = spark.read.parquet(out)
    got_ids = {r.doc_id for r in got.select("doc_id").collect()}

    # expected: normalize, drop the duplicate (content-hash state keeps
    # the first arrival) and the short doc, keep = classifier keep-set
    from flink_kafka_replicator_spark.streaming.corpus_build import (
        normalize_docs,
    )

    normed = normalize_docs(docs.unionByName(extra))
    longs = normed.filter(F.size(F.split("text", " ")) >= 5)
    weights, theta = read_classifier_model(spark, model_dir)
    keep = {
        r.doc_id
        for r in qc_score_with_model(
            longs.select("doc_id", "text"), weights, theta
        )
        .filter(F.col("keep"))
        .collect()
    }
    assert 900002 not in got_ids, "short doc must be floored out"
    assert 900001 not in got_ids, "duplicate must be deduped"
    assert got_ids == keep - {900001, 900002}, (
        "CLI corpus != batch composition"
    )
    assert 0 < len(got_ids) < 50, "gate must discriminate"

    # replay with the same checkpoint: no new batches, corpus unchanged
    before = {(r.doc_id, r.shard) for r in got.collect()}
    assert main([
        "corpus-build",
        "--input", src,
        "--output", out,
        "--checkpoint-location", ck,
        "--classifier-model", model_dir,
        "--min-tokens", "5",
    ]) == 0
    after = {
        (r.doc_id, r.shard) for r in spark.read.parquet(out).collect()
    }
    assert after == before


def test_compact_index_subcommand(spark, tmp_path, capsys):
    """The maintenance subcommand compacts all three artifact kinds
    through the CLI and reports the file-count delta as JSON."""
    import json
    import os

    from pyspark.sql import functions as _F

    from flink_kafka_replicator_spark.cli import main
    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.sinks import (
        append_minhash_delta,
        with_shard,
        write_minhash_index,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # fragmented corpus
    corpus = str(tmp_path / "corpus")
    for i in range(3):
        with_shard(d.filter((d.doc_id % 3) == i)).repartition(4).write.mode(
            "append"
        ).partitionBy("shard").parquet(corpus)
    assert main(["compact-index", "--kind", "corpus", "--dir", corpus]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files_after"] < out["files_before"]

    # delta-extended minhash index
    ix = str(tmp_path / "ix")
    write_minhash_index(d.filter(_F.col("doc_id") % 2 == 0), ix)
    append_minhash_delta(d.filter(_F.col("doc_id") % 2 == 1), ix, delta_id=1)
    assert main(["compact-index", "--kind", "minhash", "--dir", ix]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted"] is True


def test_vector_search_subcommand_end_to_end(spark, tmp_path):
    """The serve-leg CLI: `vector-search` answers a parquet of query
    vectors from a persisted index through the file harness, matching
    the direct batch call."""
    import os

    from pyspark.sql import functions as _F

    from flink_kafka_replicator_spark.cli import main
    from flink_kafka_replicator_spark.functions import (
        pipeline_queries as pq,
    )
    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.sinks import (
        knn_batch_search_from_index,
        write_vector_index,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    ix = str(tmp_path / "vindex")
    write_vector_index(spark, sf_dir, ix)

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(
        (_F.col("vec_id") % 2 == 1) & (_F.col("vec_id") < pq.QBATCH_MAX)
    ).select(_F.col("vec_id").alias("qid"), "embedding")
    qdir = str(tmp_path / "queries")
    queries.coalesce(1).write.parquet(qdir)

    out = str(tmp_path / "answers")
    rc = main([
        "vector-search",
        "--index-dir", ix,
        "--queries", qdir,
        "--output", out,
        "--checkpoint-location", str(tmp_path / "ck"),
        "--top-k", "3",
    ])
    assert rc == 0
    got = sorted(
        (r.qid, r.vec_id, r.adc_dist, r.rank)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        tuple(r)
        for r in knn_batch_search_from_index(
            spark, queries, ix, k=3
        ).collect()
    )
    assert got == want


def test_vector_search_subcommand_refined(spark, tmp_path):
    """`vector-search --refine-from` serves the exact-re-ranked path:
    answers carry cos_sim and match the direct refined batch call.
    --shortlist without --refine-from is rejected."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as _F

    from flink_kafka_replicator_spark.cli import main, vector_search_main
    from flink_kafka_replicator_spark.functions import (
        pipeline_queries as pq,
    )
    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.sinks import (
        knn_batch_search_refined_from_index,
        write_vector_index,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    ix = str(tmp_path / "vindex")
    write_vector_index(spark, sf_dir, ix)

    e = load_table(spark, sf_dir, "embeddings")
    exact_dir = str(tmp_path / "exact")
    e.select("vec_id", "embedding").coalesce(1).write.parquet(exact_dir)
    queries = e.filter(
        (_F.col("vec_id") % 2 == 1) & (_F.col("vec_id") < pq.QBATCH_MAX)
    ).select(_F.col("vec_id").alias("qid"), "embedding")
    qdir = str(tmp_path / "queries")
    queries.coalesce(1).write.parquet(qdir)

    out = str(tmp_path / "answers")
    rc = main([
        "vector-search",
        "--index-dir", ix,
        "--queries", qdir,
        "--output", out,
        "--checkpoint-location", str(tmp_path / "ck"),
        "--top-k", "3",
        "--refine-from", exact_dir,
    ])
    assert rc == 0
    got = sorted(
        (r.qid, r.vec_id, r.adc_dist, r.cos_sim, r.rank)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        tuple(r)
        for r in knn_batch_search_refined_from_index(
            spark, queries, ix, e.select("vec_id", "embedding"), k=3
        ).collect()
    )
    assert got == want

    with _pytest.raises(SystemExit):
        vector_search_main(
            [
                "--index-dir", ix,
                "--queries", qdir,
                "--output", out,
                "--shortlist", "20",
            ],
            spark=spark,
        )


def test_index_stats_subcommand(spark, tmp_path, capsys):
    """`index-stats` reports committed meta + file counts without
    touching the artifact (read-only, lease-free), and with --rows the
    committed row counts per table."""
    import json
    import os

    from pyspark.sql import functions as _F

    from flink_kafka_replicator_spark.cli import main
    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.sinks import (
        append_minhash_delta,
        write_minhash_index,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ix = str(tmp_path / "ix")
    write_minhash_index(d.filter(_F.col("doc_id") % 2 == 0), ix)
    append_minhash_delta(d.filter(_F.col("doc_id") % 2 == 1), ix, delta_id=1)

    before = sorted(
        (p, os.path.getmtime(p))
        for p in __import__("glob").glob(ix + "/**", recursive=True)
    )
    assert main(["index-stats", "--kind", "minhash", "--dir", ix]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["kind"] == "minhash"
    assert out["meta"]["last_delta_id"] == 1
    assert out["n_parquet_files"] > 0 and out["total_bytes"] > 0
    assert "rows" not in out
    after = sorted(
        (p, os.path.getmtime(p))
        for p in __import__("glob").glob(ix + "/**", recursive=True)
    )
    assert before == after, "stats must not mutate the artifact"

    from flink_kafka_replicator_spark.cli import index_stats_main

    assert index_stats_main(
        ["--kind", "minhash", "--dir", ix, "--rows"], spark=spark
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_docs = d.count()
    # every doc contributes N_BANDS band rows; stats is per band key
    from flink_kafka_replicator_spark.functions.similarity import N_BANDS

    assert out["rows"]["bands"] == n_docs * N_BANDS
    assert out["rows"]["band_stats"] > 0


def test_dq_audit_subcommand(spark, tmp_path, capsys):
    """One invocation runs the DQ battery over a dataset dir, persists
    one report per check, and each persisted report equals the
    registry query's own answer."""
    import json

    from flink_kafka_replicator_spark.cli import DQ_AUDIT_IDS, dq_audit_main
    from flink_kafka_replicator_spark.operators import data_quality as dq

    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    out = str(tmp_path / "audit")
    rc = dq_audit_main(
        ["--data-dir", sf, "--output", out,
         "--checks", "dq_benford,dq_reconciliation"],
        spark=spark,
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [a["check"] for a in rep["audits"]] == [
        "dq_benford", "dq_reconciliation",
    ]
    got = sorted(
        map(tuple, spark.read.parquet(f"{out}/dq_benford").collect())
    )
    want = sorted(map(tuple, dq.dq_benford(spark, sf).collect()))
    assert got == want, "persisted report != the registry query"

    # unknown check refused loudly, not silently skipped
    assert dq_audit_main(
        ["--data-dir", sf, "--output", out, "--checks", "nope"],
        spark=spark,
    ) == 2
    # the full default battery is the registered dq_* family
    assert set(DQ_AUDIT_IDS) == {
        q for q in dq.QUERIES if q.startswith("dq_")
    }


def test_dq_monitor_subcommand(spark, tmp_path, capsys):
    """The dq-monitor CLI drains a parquet order stream through the
    rules engine + reconciliation per micro-batch and prints MERGED
    whole-stream reports equal to the batch queries' answers."""
    import json
    import os

    from pyspark.sql import functions as F

    from flink_kafka_replicator_spark.cli import dq_monitor_main
    from flink_kafka_replicator_spark.io import load_table
    from flink_kafka_replicator_spark.operators import data_quality as dq

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    o = load_table(spark, sf, "orders")
    src = str(tmp_path / "orders_stream")
    for m in range(2):
        o.filter(F.col("o_orderkey") % 2 == m).coalesce(1).write.parquet(
            src, mode="append"
        )
    # lineitem as a plain parquet dir (the CLI reads it raw)
    li_dir = str(tmp_path / "lineitem")
    load_table(spark, sf, "lineitem").write.parquet(li_dir)
    out = str(tmp_path / "dq")
    rc = dq_monitor_main(
        [
            "--source", src,
            "--lineitem-dir", li_dir,
            "--output", out,
            "--checkpoint-location", str(tmp_path / "ck"),
        ],
        spark=spark,
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    merged_rules = sorted(
        (d["rule_id"], d["n_checked"], d["n_violations"], d["violation_rate"])
        for d in rep["merged"]["dq_rules_engine"]
    )
    want_rules = sorted(
        (r.rule_id, r.n_checked, r.n_violations, r.violation_rate)
        for r in dq.dq_rules_engine(spark, sf).collect()
    )
    assert merged_rules == want_rules
    merged_recon = sorted(
        (d["bucket"], d["n_orders"]) for d in rep["merged"]["dq_reconciliation"]
    )
    want_recon = sorted(
        (r.bucket, r.n_orders)
        for r in dq.dq_reconciliation(spark, sf).collect()
    )
    assert merged_recon == want_recon


def test_orphan_checkpoint_warning(tmp_path, capsys):
    """An explicit checkpoint with state whose output is gone warns
    loudly (resumed streams skip already-processed batches); default
    checkpoints live inside --output and can never desync."""
    from flink_kafka_replicator_spark.cli import _warn_orphan_checkpoint

    ck = tmp_path / "ck"
    out = tmp_path / "out"
    # no checkpoint state yet: silent
    _warn_orphan_checkpoint(str(ck), str(out), "drift-monitor")
    assert capsys.readouterr().err == ""
    # checkpoint exists, output missing: loud
    ck.mkdir()
    _warn_orphan_checkpoint(str(ck), str(out), "drift-monitor")
    err = capsys.readouterr().err
    assert "SKIPPED" in err and "drift-monitor" in err
    # both exist: silent again
    out.mkdir()
    _warn_orphan_checkpoint(str(ck), str(out), "drift-monitor")
    assert capsys.readouterr().err == ""


def test_plan_lint_subcommand(spark, capsys):
    """plan-lint reports raw anti-pattern hits per registry id: the
    1-row-broadcast idiom shows as bnl, a bounded-histogram window as
    single_part, a plain join as clean — and --fail-on-hits gates."""
    import json

    from flink_kafka_replicator_spark.cli import plan_lint_main

    rc = plan_lint_main(
        ["--query", "join_inner", "--query", "agg_decay_weighted_revenue"],
        spark=spark,
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["n_ids"] == 2
    assert out["flagged"]["agg_decay_weighted_revenue"] == {"bnl": 1}
    assert "join_inner" not in out["flagged"]

    rc = plan_lint_main(
        ["--query", "agg_decay_weighted_revenue", "--fail-on-hits"],
        spark=spark,
    )
    capsys.readouterr()
    assert rc == 1


def test_plan_lint_unknown_id_rejected(capsys):
    import pytest as _pytest

    from flink_kafka_replicator_spark.cli import plan_lint_main

    with _pytest.raises(SystemExit):
        plan_lint_main(["--query", "no_such_query"])
    assert "unknown query ids" in capsys.readouterr().err

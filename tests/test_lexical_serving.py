"""The lexical (BM25) index lifecycle: build → batch serve → streaming
serve → CLI — the lexical leg's peer of test_vector_serving."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_kafka_replicator_spark.functions.pipeline_queries import (
    BM25_QUERY_TERMS,
    bm25_topk,
)
from flink_kafka_replicator_spark.io import load_table
from flink_kafka_replicator_spark.sinks import (
    bm25_search_from_index,
    read_lexical_index,
    write_lexical_index,
)
from flink_kafka_replicator_spark.streaming.lexical_search import (
    start_streaming_lexical_search,
)
from tests.streamutil import drain

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def lex_index(spark, tmp_path_factory):
    ix = str(tmp_path_factory.mktemp("lex") / "index")
    write_lexical_index(spark, SF_DIR, ix)
    return ix


def _query_rows(spark):
    # 12 queries over the fixture vocabulary, one with a term the
    # corpus lacks, one mixing seen+unseen
    vocab = ["spark", "join", "window", "table", "scan", "merge", "agg"]
    rows = [(i, [vocab[i % len(vocab)], vocab[(i * 3 + 1) % len(vocab)]]) for i in range(10)]
    rows.append((10, ["zz-unseen-term"]))
    rows.append((11, ["spark", "zz-unseen-term"]))
    return spark.createDataFrame(rows, "qid int, terms array<string>")


def test_served_fixed_query_matches_in_session_bm25(spark, lex_index):
    """The from-index answer for the engine's fixed query must equal
    the driver-green bm25_topk (same scores to 4 decimals, same docs,
    same order)."""
    q = spark.createDataFrame(
        [(0, list(BM25_QUERY_TERMS))], "qid int, terms array<string>"
    )
    served = [
        (r.doc_id, r.bm25, r.rank)
        for r in bm25_search_from_index(spark, q, lex_index, k=20)
        .orderBy("rank")
        .collect()
    ]
    insess = [
        (r.doc_id, r.bm25, i + 1)
        for i, r in enumerate(bm25_topk(spark, SF_DIR).collect())
    ]
    assert served == insess


def test_index_meta_and_missing_index_refused(spark, lex_index, tmp_path):
    postings, doclen, dfreq, meta = read_lexical_index(spark, lex_index)
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert meta["n_docs"] == n_docs
    assert doclen.count() == n_docs
    assert meta["sum_dl"] == doclen.agg(F.sum("dl")).collect()[0][0]
    # df is per-term distinct docs; postings is per (term, doc)
    assert dfreq.count() == postings.select("term").distinct().count()
    with pytest.raises(FileNotFoundError, match="no lexical index"):
        read_lexical_index(spark, str(tmp_path / "nope"))


def test_unseen_terms_answer_empty_not_error(spark, lex_index):
    q = _query_rows(spark)
    out = bm25_search_from_index(spark, q, lex_index, k=5).collect()
    by_qid = {}
    for r in out:
        by_qid.setdefault(r.qid, []).append(r)
    assert 10 not in by_qid, "all-unseen query must return no rows"
    assert by_qid[11], "mixed query answers from its seen terms"
    # determinism: per-qid ranks are 1..n without gaps
    for qid, rows in by_qid.items():
        assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))


def test_streaming_lexical_search_matches_batch(spark, lex_index, tmp_path):
    """Queries streamed in two micro-batches == the batch answers; a
    replay against the drained checkpoint changes nothing."""
    queries = _query_rows(spark)
    src = str(tmp_path / "queries")
    queries.filter(F.col("qid") < 6).coalesce(1).write.parquet(
        src, mode="append"
    )
    queries.filter(F.col("qid") >= 6).coalesce(1).write.parquet(
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
        q = start_streaming_lexical_search(
            spark, stream, lex_index, out, ck, k=5, available_now=True
        )
        drain(q)
    run()
    got = sorted(
        (r.qid, r.doc_id, r.bm25, r.rank)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        tuple(r)
        for r in bm25_search_from_index(
            spark, queries, lex_index, k=5
        ).collect()
    )
    assert got == want, "streamed answers != batch serving"
    n_batches = (
        spark.read.parquet(out).select("batch_id").distinct().count()
    )
    assert n_batches == 2

    run()  # replay no-op
    assert (
        sorted(
            (r.qid, r.doc_id, r.bm25, r.rank)
            for r in spark.read.parquet(out).collect()
        )
        == want
    )


def test_lexical_search_cli_build_and_serve(spark, tmp_path, capsys):
    """One CLI invocation builds the index from a corpus dir and drains
    the query stream; answers equal the batch function's."""
    from flink_kafka_replicator_spark.cli import lexical_search_main

    queries = _query_rows(spark)
    qdir = str(tmp_path / "queries")
    queries.coalesce(1).write.parquet(qdir)
    ix = str(tmp_path / "index")
    out = str(tmp_path / "answers")
    rc = lexical_search_main(
        [
            "--index-dir", ix,
            "--queries", qdir,
            "--output", out,
            "--checkpoint-location", str(tmp_path / "ck"),
            "--top-k", "5",
            "--build-from", SF_DIR,
        ],
        spark=spark,
    )
    assert rc == 0
    got = sorted(
        (r.qid, r.doc_id, r.bm25, r.rank)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        tuple(r)
        for r in bm25_search_from_index(spark, queries, ix, k=5).collect()
    )
    assert got == want


def test_hybrid_from_indexes_matches_in_session_fusion(
    spark, lex_index, tmp_path
):
    """Hybrid serving from the two persisted indexes, with the vector
    leg made exact (probe-all + corpus-deep shortlist), must reproduce
    the in-session hybrid_search_rrf for the engine's fixed query —
    docs, both leg ranks, and fused scores."""
    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        IVF_N_CENTROIDS,
        hybrid_search_rrf,
    )
    from flink_kafka_replicator_spark.functions.similarity import QUERY_VEC
    from flink_kafka_replicator_spark.sinks import (
        hybrid_search_from_indexes,
        write_vector_index,
    )

    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    vix = str(tmp_path / "vindex")
    write_vector_index(spark, SF_DIR, vix)
    n_vecs = e.count()

    q = spark.createDataFrame(
        [(0, list(BM25_QUERY_TERMS), [float(x) for x in QUERY_VEC])],
        "qid int, terms array<string>, embedding array<double>",
    )
    served = [
        (r.doc_id, r.lex_rank, r.vec_rank, r.rrf_score)
        for r in hybrid_search_from_indexes(
            spark,
            q,
            lex_index,
            vix,
            e,
            n_probe=IVF_N_CENTROIDS,
            shortlist=n_vecs,
        )
        .orderBy("rank")
        .collect()
    ]
    insess = [
        (r.doc_id, r.lex_rank, r.vec_rank, r.rrf_score)
        for r in hybrid_search_rrf(spark, SF_DIR).collect()
    ]
    assert served == insess


def test_served_bm25_plan_never_scans_raw_corpus(spark, lex_index):
    """The serving plan must read ONLY the index artifacts — the raw
    documents parquet (and its text column) may not appear in any scan
    node, and there is no cartesian anywhere."""
    q = spark.createDataFrame(
        [(0, list(BM25_QUERY_TERMS))], "qid int, terms array<string>"
    )
    df = bm25_search_from_index(spark, q, lex_index, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan
    assert "CartesianProduct" not in plan
    scans = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scans and all(lex_index in ln for ln in scans), plan[:2000]


def test_streaming_hybrid_search_matches_batch_and_replays_clean(
    spark, lex_index, tmp_path
):
    """Hybrid queries streamed in two micro-batches == the batch fused
    answers; a replay against the drained checkpoint changes nothing."""
    from flink_kafka_replicator_spark.sinks import (
        hybrid_search_from_indexes,
        write_vector_index,
    )
    from flink_kafka_replicator_spark.streaming.hybrid_search import (
        start_streaming_hybrid_search,
    )

    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    vix = str(tmp_path / "vindex")
    write_vector_index(spark, SF_DIR, vix)

    # 6 hybrid queries: fixture terms + real fixture embeddings as the
    # vector legs (doc_id == vec_id contract)
    vocab = ["spark", "join", "window", "table", "scan", "merge"]
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id") < 6).collect()
    }
    rows = [
        (i, [vocab[i], vocab[(i + 1) % len(vocab)]], vecs[i])
        for i in range(6)
    ]
    queries = spark.createDataFrame(
        rows, "qid int, terms array<string>, embedding array<double>"
    )
    src = str(tmp_path / "queries")
    queries.filter(F.col("qid") < 3).coalesce(1).write.parquet(
        src, mode="append"
    )
    queries.filter(F.col("qid") >= 3).coalesce(1).write.parquet(
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
        q = start_streaming_hybrid_search(
            spark, stream, lex_index, vix, e, out, ck, available_now=True
        )
        drain(q)
    run()
    got = sorted(
        (r.qid, r.doc_id, r.lex_rank, r.vec_rank, r.rrf_score, r.rank)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        tuple(r)
        for r in hybrid_search_from_indexes(
            spark, queries, lex_index, vix, e
        ).collect()
    )
    assert got == want, "streamed hybrid answers != batch fusion"
    assert (
        spark.read.parquet(out).select("batch_id").distinct().count() == 2
    )

    run()  # replay no-op
    assert (
        sorted(
            (r.qid, r.doc_id, r.lex_rank, r.vec_rank, r.rrf_score, r.rank)
            for r in spark.read.parquet(out).collect()
        )
        == want
    )

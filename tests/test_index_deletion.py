"""Index deletion lifecycle (round 11 — VERDICT r10's top item): a
``corpus-apply-dedup`` drop must propagate into all three persisted
indexes as tombstone deltas, and every serve path must answer exactly
as a rebuild over the survivors would — scores and statistics
included. Also pinned: a drop set crossing a compaction (the rewrite
folds tombstones in physically), idempotent replays, the writer
lease, and the end-to-end ``apply_dedup_corpus`` propagation."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from flink_kafka_replicator_spark.io import load_table
from flink_kafka_replicator_spark.sinks import (
    append_lexical_delta,
    apply_dedup_corpus,
    bm25_search_from_index,
    compact_lexical_index,
    compact_minhash_index,
    compact_vector_index,
    delete_lexical_docs,
    delete_minhash_docs,
    delete_vector_docs,
    hybrid_search_from_indexes,
    knn_batch_search_from_index,
    propagate_corpus_deletions,
    read_lexical_index,
    read_minhash_index,
    read_vector_index,
    write_lexical_index,
    write_minhash_index,
    write_vector_index,
    writer_lease,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _ids(spark, *doc_ids):
    return spark.createDataFrame(
        [(int(i),) for i in doc_ids], "doc_id bigint"
    )


def _queries(spark):
    vocab = ["spark", "join", "window", "table", "scan", "merge", "agg"]
    rows = [
        (i, [vocab[i % len(vocab)], vocab[(i * 3 + 1) % len(vocab)]])
        for i in range(8)
    ]
    return spark.createDataFrame(rows, "qid int, terms array<string>")


def _bm25(spark, ix, q, k=10):
    return sorted(
        (r.qid, r.doc_id, r.bm25, r.rank)
        for r in bm25_search_from_index(spark, q, ix, k=k).collect()
    )


# ------------------------------------------------------------- lexical


def test_lexical_delete_equals_rebuild(spark, tmp_path):
    """Serve-after-delete must be byte-equal to rebuild-on-survivors:
    answers (scores included), the dfreq table, and the n_docs/sum_dl
    counters all match the rebuilt index."""
    d = _docs(spark)
    ix = str(tmp_path / "ix")
    write_lexical_index(spark, SF_DIR, ix, df=d)
    drops = d.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    res = delete_lexical_docs(spark, drops, ix)
    assert res["n_docs_deleted"] == drops.count()

    rebuilt = str(tmp_path / "rebuilt")
    write_lexical_index(
        spark, SF_DIR, rebuilt, df=d.filter(F.col("doc_id") % 5 != 0)
    )
    q = _queries(spark)
    assert _bm25(spark, ix, q) == _bm25(spark, rebuilt, q), (
        "serve-after-delete != rebuild-on-survivors"
    )
    _, _, dfreq_t, meta_t = read_lexical_index(spark, ix)
    _, _, dfreq_r, meta_r = read_lexical_index(spark, rebuilt)
    assert meta_t["n_docs"] == meta_r["n_docs"]
    assert meta_t["sum_dl"] == meta_r["sum_dl"]
    assert sorted(map(tuple, dfreq_t.collect())) == sorted(
        map(tuple, dfreq_r.collect())
    ), "df(term) decrements != rebuild's document frequencies"
    # no dropped doc is ever served
    served = {
        r.doc_id
        for r in bm25_search_from_index(spark, q, ix, k=1000).collect()
    }
    assert not served & {
        r.doc_id for r in drops.collect()
    }, "ghost documents served after deletion"


def test_lexical_delete_idempotent_and_unknown_ids(spark, tmp_path):
    """Replaying a delete, or deleting ids the index never held, is a
    no-op that claims no delta id."""
    d = _docs(spark)
    ix = str(tmp_path / "ix")
    write_lexical_index(spark, SF_DIR, ix, df=d)
    drops = _ids(spark, 0, 5, 10)
    first = delete_lexical_docs(spark, drops, ix)
    assert first["n_docs_deleted"] == 3
    meta1 = json.load(open(os.path.join(ix, "LEXINDEX_META.json")))
    replay = delete_lexical_docs(spark, drops, ix)
    assert replay == {"n_docs_deleted": 0, "delta_id": None}
    unknown = delete_lexical_docs(spark, _ids(spark, 999999), ix)
    assert unknown == {"n_docs_deleted": 0, "delta_id": None}
    meta2 = json.load(open(os.path.join(ix, "LEXINDEX_META.json")))
    assert meta1 == meta2, "no-op deletes must not move the pointer"


def test_lexical_drop_set_crossing_compaction(spark, tmp_path):
    """Tombstones must survive the rewrite: delete A, compact (folds A
    physically, clears the tombstone pointer), delete B — the index
    serves exactly the rebuild over survivors of A ∪ B, and the folded
    rows are physically gone from the compacted partitions."""
    d = _docs(spark)
    ix = str(tmp_path / "ix")
    write_lexical_index(spark, SF_DIR, ix, df=d)
    delete_lexical_docs(spark, d.filter(F.col("doc_id") % 4 == 0).select("doc_id"), ix)

    res = compact_lexical_index(spark, ix, files=1)
    assert res["compacted"] is True
    meta = json.load(open(os.path.join(ix, "LEXINDEX_META.json")))
    assert meta["tombstone_delta_ids"] == []
    assert not os.path.isdir(os.path.join(ix, "tombstones")) or not os.listdir(
        os.path.join(ix, "tombstones")
    ), "folded tombstone partitions must be pruned"
    # physically gone: the raw postings rows no longer carry dropped ids
    raw = spark.read.parquet(os.path.join(ix, "postings"))
    assert raw.filter(F.col("doc_id") % 4 == 0).count() == 0

    delete_lexical_docs(spark, d.filter(F.col("doc_id") % 4 == 1).select("doc_id"), ix)
    rebuilt = str(tmp_path / "rebuilt")
    write_lexical_index(
        spark,
        SF_DIR,
        rebuilt,
        df=d.filter((F.col("doc_id") % 4 != 0) & (F.col("doc_id") % 4 != 1)),
    )
    q = _queries(spark)
    assert _bm25(spark, ix, q) == _bm25(spark, rebuilt, q)
    _, _, _, meta_t = read_lexical_index(spark, ix)
    _, _, _, meta_r = read_lexical_index(spark, rebuilt)
    assert (meta_t["n_docs"], meta_t["sum_dl"]) == (
        meta_r["n_docs"],
        meta_r["sum_dl"],
    )


def test_lexical_append_after_delete_equals_rebuild(spark, tmp_path):
    """The delta log stays consistent across interleaved delete and
    append: base minus drops plus a fresh batch == rebuild over that
    exact set (df/counters merge through both signs)."""
    d = _docs(spark)
    base = d.filter(F.col("doc_id") % 3 != 2)
    late = d.filter(F.col("doc_id") % 3 == 2)
    ix = str(tmp_path / "ix")
    write_lexical_index(spark, SF_DIR, ix, df=base)
    del_res = delete_lexical_docs(
        spark, d.filter(F.col("doc_id") % 6 == 0).select("doc_id"), ix
    )
    # append continues after the deletion's claimed delta id
    assert append_lexical_delta(late, ix, del_res["delta_id"] + 1) is True
    rebuilt = str(tmp_path / "rebuilt")
    write_lexical_index(
        spark,
        SF_DIR,
        rebuilt,
        df=d.filter((F.col("doc_id") % 3 == 2) | (F.col("doc_id") % 6 != 0)),
    )
    q = _queries(spark)
    assert _bm25(spark, ix, q) == _bm25(spark, rebuilt, q)


def test_lexical_delete_respects_writer_lease(spark, tmp_path):
    d = _docs(spark)
    ix = str(tmp_path / "ix")
    write_lexical_index(spark, SF_DIR, ix, df=d)
    with writer_lease(ix, owner="curation-job"):
        with pytest.raises(RuntimeError, match="lease"):
            delete_lexical_docs(spark, _ids(spark, 0), ix)
        with pytest.raises(RuntimeError, match="fenced|lease"):
            delete_lexical_docs(
                spark, _ids(spark, 0), ix, writer_token="wrong"
            )
    with writer_lease(ix, owner="curation-job") as tok:
        assert (
            delete_lexical_docs(spark, _ids(spark, 0), ix, writer_token=tok)[
                "n_docs_deleted"
            ]
            == 1
        )


# ------------------------------------------------------------- minhash


def _mh_snap(spark, ix):
    bands, stats = read_minhash_index(spark, ix)
    return (
        sorted(map(tuple, bands.collect())),
        sorted(map(tuple, stats.collect())),
    )


def test_minhash_delete_equals_rebuild(spark, tmp_path):
    """The bands view AND the band statistics after a delete must
    equal the rebuild over survivors (the stats gate incremental dedup
    hygiene, so a stale count would silently change recall)."""
    d = _docs(spark)
    ix = str(tmp_path / "ix")
    write_minhash_index(d, ix)
    drops = d.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    res = delete_minhash_docs(spark, drops, ix)
    assert res["n_docs_deleted"] == drops.count()

    rebuilt = str(tmp_path / "rebuilt")
    write_minhash_index(d.filter(F.col("doc_id") % 5 != 0), rebuilt)
    assert _mh_snap(spark, ix) == _mh_snap(spark, rebuilt)

    # replay is a no-op
    assert delete_minhash_docs(spark, drops, ix)["n_docs_deleted"] == 0


def test_minhash_delete_crossing_compaction(spark, tmp_path):
    d = _docs(spark)
    ix = str(tmp_path / "ix")
    write_minhash_index(d, ix)
    delete_minhash_docs(
        spark, d.filter(F.col("doc_id") % 4 == 0).select("doc_id"), ix
    )
    res = compact_minhash_index(spark, ix)
    assert res["compacted"] is True
    meta = json.load(open(os.path.join(ix, "INDEX_META.json")))
    assert meta["tombstone_delta_ids"] == []
    delete_minhash_docs(
        spark, d.filter(F.col("doc_id") % 4 == 1).select("doc_id"), ix
    )
    rebuilt = str(tmp_path / "rebuilt")
    write_minhash_index(
        d.filter((F.col("doc_id") % 4 != 0) & (F.col("doc_id") % 4 != 1)),
        rebuilt,
    )
    assert _mh_snap(spark, ix) == _mh_snap(spark, rebuilt)


def test_minhash_pinned_snapshot_predates_deletion(spark, tmp_path):
    """Pinning max_delta_id below the deletion delta must serve the
    PRE-delete view (a replaying reader's contract) — the tombstone
    filter is snapshot-scoped, not global."""
    d = _docs(spark)
    ix = str(tmp_path / "ix")
    write_minhash_index(d, ix)
    before = _mh_snap(spark, ix)
    delete_minhash_docs(
        spark, d.filter(F.col("doc_id") % 5 == 0).select("doc_id"), ix
    )
    bands, stats = read_minhash_index(spark, ix, max_delta_id=0)
    pinned = (
        sorted(map(tuple, bands.collect())),
        sorted(map(tuple, stats.collect())),
    )
    assert pinned == before


# ------------------------------------------------------------- vector


def _vec_queries(spark):
    e = load_table(spark, SF_DIR, "embeddings")
    rows = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in e.filter(F.col("vec_id") % 97 == 1).limit(6).collect()
    ]
    return spark.createDataFrame(rows, "qid bigint, embedding array<float>")


def _knn(spark, ix, q, k=5):
    return sorted(
        (r.qid, r.vec_id, r.adc_dist, r.rank)
        for r in knn_batch_search_from_index(spark, q, ix, k=k).collect()
    )


def test_vector_delete_equals_rebuild(spark, tmp_path):
    """Served ANN answers after a delete must be byte-equal to a
    rebuild indexing only the survivors (the quantizer is frozen and
    trains on the full corpus either way)."""
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    ix = str(tmp_path / "vix")
    write_vector_index(spark, SF_DIR, ix)
    drops = (
        e.filter(F.col("vec_id") % 5 == 0)
        .select("vec_id")
    )
    res = delete_vector_docs(spark, drops, ix)
    assert res["n_docs_deleted"] == drops.count()

    rebuilt = str(tmp_path / "rebuilt")
    write_vector_index(
        spark, SF_DIR, rebuilt, df=e.filter(F.col("vec_id") % 5 != 0)
    )
    q = _vec_queries(spark)
    assert _knn(spark, ix, q) == _knn(spark, rebuilt, q)

    # postings/codes views equal the rebuild's too
    _, p_t, _, c_t = read_vector_index(spark, ix)
    _, p_r, _, c_r = read_vector_index(spark, rebuilt)
    assert sorted(map(tuple, p_t.collect())) == sorted(
        map(tuple, p_r.collect())
    )
    assert sorted(map(tuple, c_t.collect())) == sorted(
        map(tuple, c_r.collect())
    )
    # replay no-op
    assert delete_vector_docs(spark, drops, ix)["n_docs_deleted"] == 0


def test_vector_delete_crossing_compaction(spark, tmp_path):
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    ix = str(tmp_path / "vix")
    write_vector_index(spark, SF_DIR, ix)
    delete_vector_docs(
        spark, e.filter(F.col("vec_id") % 4 == 0).select("vec_id"), ix
    )
    res = compact_vector_index(spark, ix)
    assert res["compacted"] is True
    meta = json.load(open(os.path.join(ix, "VINDEX_META.json")))
    assert meta["tombstone_delta_ids"] == []
    delete_vector_docs(
        spark, e.filter(F.col("vec_id") % 4 == 1).select("vec_id"), ix
    )
    rebuilt = str(tmp_path / "rebuilt")
    write_vector_index(
        spark,
        SF_DIR,
        rebuilt,
        df=e.filter((F.col("vec_id") % 4 != 0) & (F.col("vec_id") % 4 != 1)),
    )
    q = _vec_queries(spark)
    assert _knn(spark, ix, q) == _knn(spark, rebuilt, q)


# ---------------------------------------------------- composed serving


def test_hybrid_serving_honors_deletions(spark, tmp_path):
    """The composed hybrid path (BM25 leg + refined ANN leg + RRF)
    over deleted indexes equals the same path over rebuilt-on-survivor
    indexes — the exact composition a curation run exercises."""
    d = _docs(spark)
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    survivors_pred = F.col("doc_id") % 7 != 0
    lex, vec = str(tmp_path / "lex"), str(tmp_path / "vec")
    write_lexical_index(spark, SF_DIR, lex, df=d)
    write_vector_index(spark, SF_DIR, vec)
    drops = d.filter(~survivors_pred).select("doc_id")
    out = propagate_corpus_deletions(
        spark, drops, vector_dir=vec, lexical_dir=lex
    )
    assert set(out) == {"vector", "lexical"}
    assert out["lexical"]["n_docs_deleted"] == drops.count()

    lex_r, vec_r = str(tmp_path / "lex_r"), str(tmp_path / "vec_r")
    write_lexical_index(spark, SF_DIR, lex_r, df=d.filter(survivors_pred))
    write_vector_index(
        spark,
        SF_DIR,
        vec_r,
        df=e.join(
            d.filter(survivors_pred).select(
                F.col("doc_id").alias("vec_id")
            ),
            "vec_id",
            "left_semi",
        ),
    )
    qv = _vec_queries(spark)
    qt = _queries(spark).filter(F.col("qid") < 6)
    rows = [
        (r1.qid, r1.terms, r2.embedding)
        for r1, r2 in zip(qt.collect(), qv.collect())
    ]
    q = spark.createDataFrame(
        rows, "qid bigint, terms array<string>, embedding array<float>"
    )
    exact = e  # full-width exact vectors for the re-rank leg
    got = sorted(
        map(
            tuple,
            hybrid_search_from_indexes(
                spark, q, lex, vec, exact
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            hybrid_search_from_indexes(
                spark, q, lex_r, vec_r, exact
            ).collect(),
        )
    )
    assert got == want


def test_apply_dedup_corpus_propagates_to_indexes(spark, tmp_path):
    """End-to-end: apply_dedup_corpus with index dirs tombstones the
    dropped docs everywhere — no served ghost anywhere afterward."""
    d = _docs(spark)
    lex = str(tmp_path / "lex")
    mh = str(tmp_path / "mh")
    write_lexical_index(spark, SF_DIR, lex, df=d)
    write_minhash_index(d, mh)
    res = apply_dedup_corpus(
        spark,
        SF_DIR,
        str(tmp_path / "corpus"),
        rungs=("exact",),
        minhash_dir=mh,
        lexical_dir=lex,
    )
    assert res["n_minhash_index_deleted"] == res["n_dropped"]
    assert res["n_lexical_index_deleted"] == res["n_dropped"]
    kept = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "corpus"))
        .select("doc_id")
        .collect()
    }
    served = {
        r.doc_id
        for r in bm25_search_from_index(
            spark, _queries(spark), lex, k=10000
        ).collect()
    }
    assert served <= kept, "lexical index serves documents the corpus dropped"
    bands, _ = read_minhash_index(spark, mh)
    banded = {r.doc_id for r in bands.select("doc_id").collect()}
    assert banded <= kept, "minhash index carries dropped documents"
    # idempotent: a second run deletes nothing further
    res2 = apply_dedup_corpus(
        spark,
        SF_DIR,
        str(tmp_path / "corpus"),
        rungs=("exact",),
        minhash_dir=mh,
        lexical_dir=lex,
    )
    assert res2["n_minhash_index_deleted"] == 0
    assert res2["n_lexical_index_deleted"] == 0


def test_lexical_delete_interleaved_with_streaming_ingest(spark, tmp_path):
    """Deletions claim delta ids in the SAME total order streaming
    appends use, so a delete landing between micro-batches must not
    break the batch cursor: ingest B, delete some of A∪B, ingest C
    against the same checkpoint — serving equals the rebuild over
    (A∪B∪C) minus the deleted set."""
    from flink_kafka_replicator_spark.streaming.lexical_ingest import (
        start_streaming_lexical_ingest,
    )
    from tests.streamutil import drain

    d = _docs(spark)
    part_a = d.filter(F.col("doc_id") % 3 == 0)
    part_b = d.filter(F.col("doc_id") % 3 == 1)
    part_c = d.filter(F.col("doc_id") % 3 == 2)
    ix = str(tmp_path / "ix")
    write_lexical_index(spark, SF_DIR, ix, df=part_a)

    src = str(tmp_path / "incoming")
    ck = str(tmp_path / "ck")

    def ingest():
        stream = spark.readStream.schema(
            "doc_id bigint, text string"
        ).option("maxFilesPerTrigger", "1").parquet(src)
        drain(
            start_streaming_lexical_ingest(spark, stream, ix, ck)
        )

    part_b.coalesce(1).write.parquet(src, mode="append")
    ingest()

    drops = d.filter(F.col("doc_id") % 6 == 1).select("doc_id")
    res = delete_lexical_docs(spark, drops, ix)
    assert res["n_docs_deleted"] == drops.count()

    part_c.coalesce(1).write.parquet(src, mode="append")
    ingest()  # same checkpoint — the cursor must survive the deletion

    rebuilt = str(tmp_path / "rebuilt")
    write_lexical_index(
        spark, SF_DIR, rebuilt, df=d.filter(F.col("doc_id") % 6 != 1)
    )
    q = _queries(spark)
    assert _bm25(spark, ix, q) == _bm25(spark, rebuilt, q), (
        "delete between micro-batches broke append==rebuild"
    )

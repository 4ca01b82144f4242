"""RETRAIN — drift-aware re-clustering of the persisted vector index
(round 12): recall drops under a drifted append, recluster recovers it
to a from-scratch rebuild's level, readers never see a partial state,
and tombstones + the streaming batch cursor ride through the retrain.

The fixture is a CLUSTERED corpus (the regime where IVF-PQ recall is
meaningful): 8 well-separated base clusters, then a drifted append of
clusters in a region the frozen base quantizer has never seen."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_kafka_replicator_spark import sinks
from flink_kafka_replicator_spark.functions import pipeline_queries as pq

DIM = 64
MEMBERS = 40


def _cluster_rows(cluster_blocks, base_id, sign, members=MEMBERS):
    """``members`` vectors per cluster: 4.0·sign in one 8-dim block
    plus deterministic per-vector noise (unique neighbors, no RNG)."""
    rows = []
    for ci_pos, c in enumerate(cluster_blocks):
        for j in range(members):
            vid = base_id + ci_pos * members + j
            v = [0.0] * DIM
            for d in range(c * 8, (c + 1) * 8):
                v[d] = 4.0 * sign
            for d in range(DIM):
                v[d] += (((vid * 31 + d * 7) % 11) - 5) * 0.08
            rows.append((vid, [float(x) for x in v]))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    base = spark.createDataFrame(
        _cluster_rows(range(8), 0, +1.0),
        "vec_id bigint, embedding array<float>",
    )
    # drift: 4 clusters on the NEGATIVE side of blocks 0-3 — a region
    # the base quantizer and codebook have never seen — with 2× the
    # member count so drifted queries dominate the md5 sample
    drifted = spark.createDataFrame(
        _cluster_rows(range(4), 100000, -1.0, members=2 * MEMBERS),
        "vec_id bigint, embedding array<float>",
    )
    return base, drifted


def _recall(spark, ix, exact):
    return sinks.should_recluster(
        spark, ix, exact, min_recall=0.9
    )


def test_drift_recall_drops_and_retrain_recovers(spark, tmp_path, corpus):
    """The headline lifecycle pin: (1) base served recall is high,
    (2) a drifted frozen-quantizer append drops it below the trigger
    floor, (3) recluster_vector_index recovers it to exactly a
    from-scratch rebuild on the same survivors (byte-equal serving,
    not just ε-close recall), (4) the should_recluster trigger flips
    accordingly."""
    base, drifted = corpus
    ix = str(tmp_path / "vix")
    sinks.write_vector_index_from_df(spark, base, ix, kmeans_iters=4)

    r_base = _recall(spark, ix, base)
    assert r_base["mean_recall"] >= 0.9, r_base
    assert not r_base["recluster"]

    assert sinks.append_vector_delta(spark, drifted, ix, 1)
    exact = base.unionByName(drifted)
    r_drift = _recall(spark, ix, exact)
    assert (
        r_drift["mean_recall"] <= r_base["mean_recall"] - 0.1
    ), (r_base, r_drift)
    assert r_drift["recluster"], r_drift

    stats = sinks.recluster_vector_index(spark, ix, exact, kmeans_iters=4)
    assert stats["n_vectors"] == base.count() + drifted.count()
    assert stats["generation"] == 1

    r_post = _recall(spark, ix, exact)
    assert not r_post["recluster"], r_post

    # retrain == from-scratch rebuild on the survivors, byte-equal
    ix2 = str(tmp_path / "vix_rebuild")
    sinks.write_vector_index_from_df(spark, exact, ix2, kmeans_iters=4)
    got = sorted(
        tuple(r) for r in sinks.knn_ivf_pq_from_index(spark, ix).collect()
    )
    want = sorted(
        tuple(r) for r in sinks.knn_ivf_pq_from_index(spark, ix2).collect()
    )
    assert got == want, "retrained index serves differently from rebuild"
    r_rebuild = _recall(spark, ix2, exact)
    assert abs(r_post["mean_recall"] - r_rebuild["mean_recall"]) < 1e-9


def test_serve_continuity_crash_before_pointer_swap(
    spark, tmp_path, corpus, monkeypatch
):
    """A retrain that crashes ANYWHERE before its single meta swap
    leaves the old index serving byte-identically (new model dirs and
    the re-encoded delta are invisible), and the next retrain reclaims
    the debris and completes."""
    base, drifted = corpus
    ix = str(tmp_path / "vix")
    sinks.write_vector_index_from_df(spark, base, ix, kmeans_iters=2)
    assert sinks.append_vector_delta(spark, drifted, ix, 1)
    exact = base.unionByName(drifted)
    before = sorted(
        tuple(r) for r in sinks.knn_ivf_pq_from_index(spark, ix).collect()
    )

    real_write = sinks._write_vindex_meta

    def boom(out_dir, meta):
        raise RuntimeError("injected crash at the pointer swap")

    monkeypatch.setattr(sinks, "_write_vindex_meta", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        sinks.recluster_vector_index(spark, ix, exact, kmeans_iters=2)
    monkeypatch.setattr(sinks, "_write_vindex_meta", real_write)

    # debris exists (orphan generation dirs + orphan delta partitions)
    assert os.path.isdir(os.path.join(ix, "centroids_g1"))
    # ... but the committed index is untouched
    after_crash = sorted(
        tuple(r) for r in sinks.knn_ivf_pq_from_index(spark, ix).collect()
    )
    assert after_crash == before, "crashed retrain changed served results"
    meta = sinks._read_vindex_meta(ix)
    assert "centroids_subdir" not in meta

    # the retry sweeps the orphans and commits
    stats = sinks.recluster_vector_index(spark, ix, exact, kmeans_iters=2)
    assert stats["generation"] == 1
    meta = sinks._read_vindex_meta(ix)
    assert meta["centroids_subdir"] == "centroids_g1"
    assert meta["delta_ids"] == [stats["delta_id"]]
    # old-generation default dirs are pruned post-swap
    assert not os.path.isdir(os.path.join(ix, "centroids"))


def test_tombstones_and_batch_cursor_survive_retrain(
    spark, tmp_path, corpus
):
    """Deletions stay deleted across a retrain (folded physically, like
    compaction), and the streaming ingest cursor rides through: a
    replayed batch is still a no-op, the next batch still admits."""
    base, drifted = corpus
    ix = str(tmp_path / "vix")
    sinks.write_vector_index_from_df(spark, base, ix, kmeans_iters=2)
    # streamed batch 0 = the drifted append (sets the cursor)
    assert sinks.append_vector_batch(spark, drifted, ix, batch_id=0)
    exact = base.unionByName(drifted)

    drop = spark.createDataFrame(
        [(0,), (1,), (100000,)], "vec_id bigint"
    )
    res = sinks.delete_vector_docs(spark, drop, ix)
    assert res["n_docs_deleted"] == 3

    stats = sinks.recluster_vector_index(spark, ix, exact, kmeans_iters=2)
    meta = sinks._read_vindex_meta(ix)
    assert meta["tombstone_delta_ids"] == []  # folded physically
    assert meta["last_batch_id"] == 0  # cursor preserved
    assert stats["n_vectors"] == base.count() + drifted.count() - 3

    _, postings, _, codes = sinks.read_vector_index(spark, ix)
    left = {r.vec_id for r in postings.select("vec_id").collect()}
    assert {0, 1, 100000}.isdisjoint(left)
    assert {r.vec_id for r in codes.select("vec_id").collect()} == left

    # replay of the admitted batch is a no-op; the next batch admits
    assert not sinks.append_vector_batch(spark, drifted, ix, batch_id=0)
    late = spark.createDataFrame(
        [(200000, [1.0] * DIM)], "vec_id bigint, embedding array<float>"
    )
    assert sinks.append_vector_batch(spark, late, ix, batch_id=1)
    _, postings, _, _ = sinks.read_vector_index(spark, ix)
    assert postings.filter(F.col("vec_id") == 200000).count() == 1


def test_retrain_refuses_partial_exact_table(spark, tmp_path, corpus):
    """An exact-vector table missing committed survivors must fail
    loudly — a silent retrain on a partial corpus would commit a
    shrunken index."""
    base, _ = corpus
    ix = str(tmp_path / "vix")
    sinks.write_vector_index_from_df(spark, base, ix, kmeans_iters=2)
    partial = base.filter(F.col("vec_id") >= 100)
    with pytest.raises(ValueError, match="covers only"):
        sinks.recluster_vector_index(spark, ix, partial, kmeans_iters=2)
    with pytest.raises(ValueError, match="covers only"):
        sinks.recall_drift_report(spark, ix, partial)


def test_retrain_respects_writer_lease(spark, tmp_path, corpus):
    """RETRAIN is a writer: it must honor the same lease fence as
    append/delete/compact."""
    base, _ = corpus
    ix = str(tmp_path / "vix")
    sinks.write_vector_index_from_df(spark, base, ix, kmeans_iters=2)
    token = sinks.acquire_writer_lease(ix, owner="other-writer")
    try:
        with pytest.raises(RuntimeError, match="lease"):
            sinks.recluster_vector_index(spark, ix, base, kmeans_iters=2)
        stats = sinks.recluster_vector_index(
            spark, ix, base, kmeans_iters=2, writer_token=token
        )
        assert stats["generation"] == 1
    finally:
        sinks.release_writer_lease(ix, token)


def test_rebuild_over_retrained_index_sweeps_generations(
    spark, tmp_path, corpus
):
    """write_vector_index_from_df over a retrained index must reset to
    the generation-0 layout: no stale _g dirs, no subdir keys, serving
    healthy."""
    base, _ = corpus
    ix = str(tmp_path / "vix")
    sinks.write_vector_index_from_df(spark, base, ix, kmeans_iters=2)
    sinks.recluster_vector_index(spark, ix, base, kmeans_iters=2)
    assert os.path.isdir(os.path.join(ix, "centroids_g1"))

    sinks.write_vector_index_from_df(spark, base, ix, kmeans_iters=2)
    assert not os.path.isdir(os.path.join(ix, "centroids_g1"))
    meta = sinks._read_vindex_meta(ix)
    assert "centroids_subdir" not in meta
    assert sinks.knn_ivf_pq_from_index(spark, ix).count() == 10


def test_append_after_retrain_encodes_with_new_generation(
    spark, tmp_path, corpus
):
    """GROW after RETRAIN: the delta must be encoded with the
    RE-LEARNED models (resolved through the meta pointers), so
    append-then-serve still equals rebuild-on-union."""
    base, drifted = corpus
    ix = str(tmp_path / "vix")
    half = drifted.filter(F.col("vec_id") < 100000 + MEMBERS)
    rest = drifted.filter(F.col("vec_id") >= 100000 + MEMBERS)
    sinks.write_vector_index_from_df(spark, base, ix, kmeans_iters=2)
    assert sinks.append_vector_delta(spark, half, ix, 1)
    sinks.recluster_vector_index(
        spark, ix, base.unionByName(half), kmeans_iters=2
    )
    assert sinks.append_vector_delta(
        spark, rest, ix, sinks._read_vindex_meta(ix)["last_delta_id"] + 1
    )

    # reference: a fresh index trained on base+half (the retrain's
    # survivor set) with the same delta appended
    ix2 = str(tmp_path / "vix_ref")
    sinks.write_vector_index_from_df(
        spark, base.unionByName(half), ix2, kmeans_iters=2
    )
    assert sinks.append_vector_delta(spark, rest, ix2, 1)
    got = sorted(
        tuple(r) for r in sinks.knn_ivf_pq_from_index(spark, ix).collect()
    )
    want = sorted(
        tuple(r) for r in sinks.knn_ivf_pq_from_index(spark, ix2).collect()
    )
    assert got == want


def test_session_trainers_match_generic_trainers(spark, sf_dir):
    """The generic (frame-based) trainers used by RETRAIN must
    reproduce the session trainers bit-exactly on the session tables
    (contiguous vec_ids from 0 make the smallest-k seed identical to
    the historical ``vec_id < k`` seed) — the refactor-safety pin for
    the driver-oracled kmeans/PQ queries."""
    from flink_kafka_replicator_spark.io import load_table

    e = load_table(spark, sf_dir, "embeddings")
    assert pq._kmeans_centroids_from(e, iters=pq.KMEANS_ITERS) == (
        pq._kmeans_centroids(spark, sf_dir)
    )
    got = sorted(
        (r.m, r.cid, tuple(r.c))
        for r in pq._pq_codebook_from(spark, e).collect()
    )
    want = sorted(
        (r.m, r.cid, tuple(r.c))
        for r in pq._pq_codebook(spark, sf_dir).collect()
    )
    assert got == want


def test_recluster_index_cli(spark, tmp_path, corpus, capsys):
    """The recluster-index subcommand end-to-end: dry-run measures
    without mutating; the real run takes the lease, retrains when
    recall sits under the floor, and reports recall_after."""
    import json

    from flink_kafka_replicator_spark.cli import recluster_index_main

    base, drifted = corpus
    ix = str(tmp_path / "vix")
    sinks.write_vector_index_from_df(spark, base, ix, kmeans_iters=4)
    assert sinks.append_vector_delta(spark, drifted, ix, 1)
    exact_dir = str(tmp_path / "exact")
    base.unionByName(drifted).write.parquet(exact_dir)

    rc = recluster_index_main(
        ["--dir", ix, "--exact", exact_dir, "--min-recall", "0.9",
         "--dry-run"],
        spark=spark,
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["recluster"] is True and rep["reclustered"] is False
    assert sinks._read_vindex_meta(ix).get("generation", 0) == 0

    rc = recluster_index_main(
        ["--dir", ix, "--exact", exact_dir, "--min-recall", "0.9",
         "--kmeans-iters", "4"],
        spark=spark,
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["reclustered"] is True
    assert rep["recall_after"] >= 0.9, rep
    assert sinks._read_vindex_meta(ix)["generation"] == 1
    # the lease was released (a follow-up writer can acquire)
    tok = sinks.acquire_writer_lease(ix, owner="t")
    sinks.release_writer_lease(ix, tok)


def test_index_cell_histogram_sees_drift_skew(spark, tmp_path, corpus):
    """The cheap leading indicator: a CONCENTRATED drifted append (one
    new cluster, the hot case — a new feed with one embedding mode)
    piles into few cells of the frozen quantizer — the persisted-index
    cell histogram's max skew must jump, and retrain must bring it
    back down (the new quantizer gives the drifted region its own
    cells)."""
    base, _ = corpus
    # outward drift ALONG an existing mode (+8 in block 0, twice the
    # base magnitude): every drifted vector's nearest frozen centroid
    # is a block-0 cell, so the mass concentrates — the hot case a
    # magnitude/scale shift in one feed produces. (A drift into the
    # all-centroids-equidistant region spreads by tie-noise instead;
    # that case is caught by recall_drift_report, not the histogram.)
    drifted = spark.createDataFrame(
        _cluster_rows([0], 200000, +2.0, members=4 * MEMBERS),
        "vec_id bigint, embedding array<float>",
    )
    ix = str(tmp_path / "vix")
    sinks.write_vector_index_from_df(spark, base, ix, kmeans_iters=4)

    def stats():
        rows = sinks.index_cell_histogram(spark, ix).collect()
        total = sum(r.n_vectors for r in rows)
        return total, max(r.skew_vs_mean for r in rows), rows

    n0, skew0, _ = stats()
    assert n0 == base.count()

    assert sinks.append_vector_delta(spark, drifted, ix, 1)
    n1, skew1, rows1 = stats()
    assert n1 == base.count() + drifted.count()
    assert abs(sum(r.share for r in rows1) - 1.0) < 1e-3
    assert skew1 > skew0 * 1.5, (skew0, skew1)

    sinks.recluster_vector_index(
        spark, ix, base.unionByName(drifted), kmeans_iters=4
    )
    n2, skew2, _ = stats()
    assert n2 == n1
    assert skew2 < skew1, (skew1, skew2)


def test_index_stats_vector_reports_cell_skew(spark, tmp_path, corpus, capsys):
    """index-stats --kind vector --rows carries the cell-skew summary
    (the operator's cheap drift check)."""
    import json

    from flink_kafka_replicator_spark.cli import index_stats_main

    base, _ = corpus
    ix = str(tmp_path / "vix")
    sinks.write_vector_index_from_df(spark, base, ix, kmeans_iters=2)
    assert index_stats_main(
        ["--kind", "vector", "--dir", ix, "--rows"], spark=spark
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rows = out["rows"]
    assert rows["postings"] == base.count()
    assert rows["n_cells"] >= 1
    assert rows["max_cell_skew_vs_mean"] >= 1.0

"""Round-8 invariants: the parameterized IVF quantizer (k dial) and
the rowwise assignment scale path.

The k=16 expression-unrolled assignment is the codegen fast path; the
rowwise broadcast-join path is how assignment survives k scaling with
the corpus (k ~ N/target_cell_size keeps in-cell pair work linear —
the scale smoke pins that). These tests pin the two paths bit-equal
where both can run, and the k-scaled persisted index sound end-to-end.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_kafka_replicator_spark.functions import pipeline_queries as pq
from flink_kafka_replicator_spark.io import load_table


def test_rowwise_assignment_bit_equal_to_unrolled(spark, sf_dir):
    """Both assignment shapes fold distances in the same position order,
    so cell ids, probe-2 ids AND the carried norms must be bit-equal —
    any drift would silently split the persisted-index world (built
    unrolled at k<=32, appended rowwise beyond) into two quantizers."""
    cents, _ = pq._ivf_model(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")
    unrolled = {
        (r.vec_id, r.nrm, r.cid, r.pcid)
        for r in pq._assignment_from(e, cents)
        .select("vec_id", "nrm", "cid", "pcid")
        .collect()
    }
    top2 = {
        (r.vec_id, r.nrm, r.cid, r.pcid)
        for r in pq._assignment_top2_rowwise(
            e, pq._cents_df(spark, cents)
        ).collect()
    }
    assert top2 == unrolled
    rowwise = {
        (r.vec_id, r.nrm, r.cid)
        for r in pq._assignment_rowwise(
            e, pq._cents_df(spark, cents)
        ).collect()
    }
    assert rowwise == {(v, n, c) for v, n, c, _ in unrolled}


def test_ivf_cell_counts_partition_corpus_at_any_k(spark, sf_dir):
    """The histogram sums to the corpus at every k, and scaling k up
    shrinks the in-cell pair total — the quadratic-work dial working."""
    n = load_table(spark, sf_dir, "embeddings").count()

    def pairs(k):
        hist = pq.ivf_cell_counts(spark, sf_dir, n_centroids=k).collect()
        assert sum(r.n for r in hist) == n
        assert len(hist) <= k
        return sum(r.n * (r.n - 1) // 2 for r in hist)

    p16, p64 = pairs(16), pairs(64)
    assert p64 < p16, (p16, p64)


def test_k_scaled_vector_index_end_to_end(spark, sf_dir, tmp_path):
    """A persisted index built with a NON-default quantizer size must
    round-trip: geometry self-describing (readable without engine-
    constant agreement), probe-all search degenerating to the unpruned
    full-ADC scan (the identity that holds at ANY k), and the delta
    append contract intact."""
    from flink_kafka_replicator_spark.sinks import (
        append_vector_delta,
        knn_ivf_pq_from_index,
        read_vector_index,
        write_vector_index,
    )

    k = 8
    ix = str(tmp_path / "vindex8")
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    write_vector_index(
        spark,
        sf_dir,
        ix,
        df=e.filter(F.col("vec_id") % 2 == 0),
        n_centroids=k,
    )
    centroids, postings, _, _ = read_vector_index(spark, ix)
    assert centroids.count() == k
    assert append_vector_delta(
        spark, e.filter(F.col("vec_id") % 2 == 1), ix, delta_id=1
    ) is True

    got = [
        (r.vec_id, r.adc_dist)
        for r in knn_ivf_pq_from_index(spark, ix, n_probe=k).collect()
    ]
    want = [
        (r.vec_id, r.adc_dist)
        for r in pq.knn_pq_adc(spark, sf_dir).collect()
    ]
    assert got == want, "probe-all at k=8 != full ADC scan"

    # after the append the postings cover every vector exactly once
    _, postings_all, _, _ = read_vector_index(spark, ix)
    assert postings_all.count() == e.count()
    assert postings_all.select("vec_id").distinct().count() == e.count()


def test_large_k_index_uses_rowwise_append(spark, sf_dir, tmp_path):
    """Beyond the expression-unrolled cap (k > 32) the index build and
    append dispatch to the rowwise builder; append == rebuild must
    still hold at k = 64."""
    from flink_kafka_replicator_spark.sinks import (
        append_vector_delta,
        read_vector_index,
        write_vector_index,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    inc = str(tmp_path / "inc64")
    full = str(tmp_path / "full64")
    write_vector_index(
        spark, sf_dir, inc, df=e.filter(F.col("vec_id") % 2 == 0),
        n_centroids=64,
    )
    assert append_vector_delta(
        spark, e.filter(F.col("vec_id") % 2 == 1), inc, delta_id=1
    ) is True
    write_vector_index(spark, sf_dir, full, n_centroids=64)

    def snap(d):
        _, postings, _, codes = read_vector_index(spark, d)
        return (
            {tuple(r) for r in postings.collect()},
            {tuple(r) for r in codes.collect()},
        )

    assert snap(inc) == snap(full), "k=64 append != rebuild"


def test_probe_recall_curve_monotone_and_exact_at_top(spark, sf_dir):
    """Ladder theorems as data: recall non-decreasing in n_probe
    (superset probe prefixes, exact ranking) and the every-cell rung
    is the exact scan — recall 1.0."""
    rows = sorted(
        pq.knn_probe_recall_curve(spark, sf_dir).collect(),
        key=lambda r: r["n_probe"],
    )
    assert [r["n_probe"] for r in rows] == list(pq.PROBE_LADDER)
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls), f"non-monotone: {recalls}"
    assert recalls[-1] == 1.0


def test_tune_n_probe_meets_target(spark, sf_dir):
    """The tuner's pick must actually deliver the target recall (the
    closed loop VERDICT r7 ordered), and a trivial target must pick a
    cheaper rung than a perfect one."""
    curve = {
        r["n_probe"]: r["recall"]
        for r in pq.knn_probe_recall_curve(spark, sf_dir).collect()
    }
    for target in (0.5, 0.9, 1.0):
        chosen = pq.tune_n_probe(spark, sf_dir, target_recall=target)
        assert curve[chosen] >= target, (target, chosen, curve)
    assert pq.tune_n_probe(spark, sf_dir, 0.1) <= pq.tune_n_probe(
        spark, sf_dir, 1.0
    )


def test_pagerank_conserves_mass_and_ranks_hubs(spark, sf_dir):
    """PageRank sanity theorems on the near-dup graph: total rank mass
    stays ~1 (floor quantization loses < 1e-6 per node per round; no
    dangling mass on an undirected graph), every rank is positive, and
    a node of maximum degree outranks a node of minimum degree in its
    own component-free comparison of extremes."""
    rows = pq.dedup_graph_pagerank(spark, sf_dir).collect()
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < len(rows) * 1e-6 * (pq.PR_ITERS + 1) + 1e-9
    assert all(r.pagerank > 0 for r in rows)

    pairs = pq._minhash_candidates_with_jaccard(spark, sf_dir).filter(
        F.col("jaccard") >= 0.5
    )
    from collections import Counter

    deg = Counter()
    for r in pairs.collect():
        deg[r.doc_a] += 1
        deg[r.doc_b] += 1
    pr = {r.doc_id: r.pagerank for r in rows}
    hub = max(deg, key=lambda k: deg[k])
    leaf = min(deg, key=lambda k: deg[k])
    if deg[hub] > deg[leaf]:
        assert pr[hub] >= pr[leaf], (
            f"hub deg={deg[hub]} pr={pr[hub]} vs leaf deg={deg[leaf]} "
            f"pr={pr[leaf]}"
        )

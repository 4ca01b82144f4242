"""Round-9 (second session) invariants: the new join/layout/sketch/ANN
surface. Each test pins the structural property that makes the operator
trustworthy at scale — the bound the oracle-parity hash can't express.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_kafka_replicator_spark.functions.corpus import (
    doc_ngram_novelty,
    vocab_coverage_topk,
)
from flink_kafka_replicator_spark.functions.pipeline_queries import (
    LSH_N_BANDS,
    knn_lsh_hyperplane,
    sim_topk_cosine,
)
from flink_kafka_replicator_spark.operators.advanced import (
    layout_zorder,
    time_weighted_avg,
)
from flink_kafka_replicator_spark.operators.aggregates import (
    agg_cms_heavy_hitters,
)
from flink_kafka_replicator_spark.operators.joins import (
    join_bloom_prefilter,
    join_interval_overlap,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_bloom_prefilter_is_sound_and_effective(spark):
    """Soundness: the Bloom filter never rejects a true match
    (n_true_match == the exact semi-join count), only overadmits.
    Effectiveness: with M=8192 bits over a few hundred keys the false
    positive rate stays small — the property that makes the pushdown
    worth the broadcast."""
    row = join_bloom_prefilter(spark, SF_DIR).collect()[0]
    assert row.n_pass_bloom >= row.n_true_match
    assert row.n_false_pos == row.n_pass_bloom - row.n_true_match
    # exact ground truth, computed independently of the bloom path
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    n_true = li.select("l_orderkey").join(urgent, "l_orderkey", "left_semi").count()
    assert row.n_true_match == n_true, "bloom must never drop a true match"
    assert row.fp_rate < 0.25, f"fp_rate {row.fp_rate} — filter ineffective"


def test_bloom_prefilter_plan_broadcasts_no_big_side_shuffle(spark):
    """The bitset rides a broadcast; the candidate path must not
    shuffle lineitem rows before the bloom filter rejects them."""
    plan = join_bloom_prefilter(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_interval_overlap_bounded_by_window_width(spark):
    """Each incident window is 30 min wide, so no user-day can credit
    more than 1800 s of overlap per incident."""
    rows = join_interval_overlap(spark, SF_DIR).collect()
    assert rows, "fixture must produce overlaps"
    for r in rows:
        # == 0 is legal: inclusive endpoints admit point-touch overlaps
        assert 0 <= r.overlap_sec <= r.n_incidents * 1800.0 + 1e-6, r


def test_zorder_buckets_are_key_rectangles(spark):
    """The locality contract: bucket = top 8 of 16 interleaved bits
    fixes the high 4 bits of BOTH keys, so every bucket's key rectangle
    is at most 16×16 — a scan filtered on either key prunes ≥15/16 of
    buckets. (This bound IS the reason to z-order; a row-major layout
    gives rectangles 256 wide in the minor key.)"""
    rows = layout_zorder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.max_x - r.min_x < 16, r
        assert r.max_y - r.min_y < 16, r
        assert r.key_rect_area <= 256, r


def test_cms_never_underestimates(spark):
    """The CMS theorem: estimates are biased high only (every cell sum
    includes the key's own count)."""
    rows = agg_cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_est >= r.exact_cnt, r
        assert r.overest == r.cms_est - r.exact_cnt


def test_twavg_within_value_bounds(spark):
    """A time-weighted average is a convex combination of observed
    values — it can never leave [min value, max value] per user."""
    got = {r.user_id: r for r in time_weighted_avg(spark, SF_DIR).collect()}
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    bounds = {
        r.user_id: r
        for r in ev.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    assert got
    for uid, r in got.items():
        b = bounds[uid]
        assert b.lo - 1e-4 <= r.twavg <= b.hi + 1e-4, (uid, r, b)


def test_vocab_coverage_monotone(spark):
    rows = sorted(vocab_coverage_topk(spark, SF_DIR).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    prev = 0.0
    for r in rows:
        assert r.cum_coverage >= prev - 1e-9
        prev = r.cum_coverage
    assert prev <= 1.0 + 1e-9
    counts = [r.cnt for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_novelty_first_doc_is_fully_novel(spark):
    rows = {r.doc_id: r for r in doc_ngram_novelty(spark, SF_DIR).collect()}
    first = min(rows)
    assert rows[first].novelty == 1.0, "the earliest doc introduces all its grams"
    for r in rows.values():
        assert 0.0 <= r.novelty <= 1.0
        assert r.n_novel <= r.n_grams


def test_lsh_recall_vs_bruteforce(spark):
    """Hyperplane LSH is approximate; pin a measured recall floor vs
    the exact brute-force top-10 so a silent hash/band regression
    (e.g. a band-width change collapsing candidates) fails loudly."""
    truth = {r.vec_id for r in sim_topk_cosine(spark, SF_DIR).collect()}
    got_rows = knn_lsh_hyperplane(spark, SF_DIR).collect()
    got = {r.vec_id for r in got_rows}
    assert len(got_rows) == 10
    for r in got_rows:
        assert 1 <= r.n_shared_bands <= LSH_N_BANDS
    recall = len(truth & got) / len(truth)
    assert recall >= 0.3, f"LSH recall {recall} collapsed"


def test_triangle_census_consistency(spark):
    """Triangles ≤ wedges/3 by definition; transitivity ∈ [0, 1]; the
    planted near-dup families must actually close triangles (a census
    of zero would mean the fixture can't distinguish clique vs chain)."""
    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        graph_triangle_count,
    )

    row = graph_triangle_count(spark, SF_DIR).collect()[0]
    assert row.n_edges > 0 and row.n_nodes > 0
    assert 3 * row.n_triangles <= row.n_wedges
    if row.transitivity is not None:
        assert 0.0 <= row.transitivity <= 1.0


def test_mmr_diversifies_and_respects_relevance(spark):
    """Rank 1 must be the single most relevant item; every later pick's
    relevance is ≤ rank 1's; and the selection is 5 distinct ids from
    the top-20 shortlist with strictly decreasing-or-equal mmr per the
    greedy (each step maximizes over a shrinking candidate set, so mmr
    is NOT necessarily monotone — assert structure, not monotonicity)."""
    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        MMR_K,
        mmr_rerank,
        sim_topk_cosine,
    )

    rows = sorted(mmr_rerank(spark, SF_DIR).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, MMR_K + 1))
    assert len({r.vec_id for r in rows}) == MMR_K
    brute = sim_topk_cosine(spark, SF_DIR).collect()
    assert rows[0].vec_id == brute[0].vec_id, "rank 1 must be the argmax rel"
    assert all(r.rel <= rows[0].rel for r in rows)


def test_percentile_exact_brackets_approx(spark):
    """The exact nearest-rank percentiles must sit inside the GK
    sketch's documented rank-error window — tying the exact and approx
    variants together (the reason both exist)."""
    from flink_kafka_replicator_spark.operators.aggregates import (
        agg_percentile_approx,
        agg_percentile_exact,
    )

    exact = {r.l_returnflag: r for r in agg_percentile_exact(spark, SF_DIR).collect()}
    approx = {
        r.l_returnflag: r for r in agg_percentile_approx(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        e, a = exact[k], approx[k]
        assert e.p50 > 0 and e.p90 >= e.p50 and e.p99 >= e.p90
        # GK accuracy 1000 → rank error ≤ 0.1%; on ~20k rows/group the
        # value gap stays small relative to the distribution span
        assert abs(e.p50 - a.p50_approx) / e.p50 < 0.05


def test_batch_lsh_consistent_with_truth(spark):
    """Per-qid result lists are ≤5, ranks contiguous from 1, scores
    non-increasing within a qid, and every returned candidate shares at
    least one band with its query by construction of the join."""
    from collections import defaultdict

    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        BATCH_TOPK,
        knn_batch_lsh,
    )

    by_q = defaultdict(list)
    for r in knn_batch_lsh(spark, SF_DIR).collect():
        by_q[r.qid].append(r)
    assert by_q, "fixture must produce candidates"
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= BATCH_TOPK
        scores = [r.cos_sim for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(r.vec_id % 2 == 0 for r in rows), "corpus side is even ids"
        assert all(r.vec_id != qid for r in rows)


def test_linear_count_estimate_tracks_exact(spark):
    """LC at 2^20 buckets over a few hundred keys per group: the
    estimate must land within a few percent of exact — and never
    report fewer distincts than buckets set."""
    from flink_kafka_replicator_spark.operators.aggregates import (
        agg_linear_count_distinct,
    )

    rows = agg_linear_count_distinct(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_buckets_set <= r.exact_distinct
        assert r.lc_estimate >= r.n_buckets_set
        assert abs(r.err) / r.exact_distinct < 0.05, r


def test_confusion_matrix_totals(spark):
    """Cell counts sum to the corpus size; per-actual shares sum to 1."""
    from collections import defaultdict

    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        eval_confusion_matrix,
    )

    rows = eval_confusion_matrix(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).count()
    assert sum(r.n for r in rows) == n_docs
    shares = defaultdict(float)
    for r in rows:
        shares[r.actual_lang] += r.share_of_actual
    for lang, s in shares.items():
        assert abs(s - 1.0) < 1e-4, (lang, s)


def test_new_ops_plan_shapes(spark):
    """The plan-shape contracts behind the scale claims:

    - interval overlap compiles to a shuffled equi-join (never a
      BroadcastNestedLoopJoin / cartesian over the interval sides);
    - the LSH single-query path is ONE aggregation exchange and no
      join at all (the band filter folds the query constants);
    - z-order is a pure projection + one bucket-agg exchange.
    """
    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        knn_lsh_hyperplane,
    )
    from flink_kafka_replicator_spark.operators.advanced import layout_zorder
    from flink_kafka_replicator_spark.operators.joins import (
        join_interval_overlap,
    )
    from flink_kafka_replicator_spark.plans.explain import (
        exchange_count,
        formatted_plan,
    )

    p = formatted_plan(join_interval_overlap(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "Join" in p

    p = formatted_plan(knn_lsh_hyperplane(spark, SF_DIR))
    assert "Join" not in p, "single-query LSH must not plan a join"
    assert exchange_count(knn_lsh_hyperplane(spark, SF_DIR)) == 1

    assert exchange_count(layout_zorder(spark, SF_DIR)) == 1


def test_asof_nearest_is_nearest(spark):
    """Ground-truth check against a brute-force per-click argmin over
    all same-user views: the chosen |Δt| must equal the true minimum,
    with backward winning exact ties."""
    from flink_kafka_replicator_spark.operators.advanced import (
        join_asof_nearest,
    )

    got = {r.click_id: r for r in join_asof_nearest(spark, SF_DIR).collect()}
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).collect()
    views = {}
    for r in ev:
        if r.event_type == "view":
            views.setdefault(r.user_id, []).append(r.ts)
    n_checked = 0
    for r in ev:
        if r.event_type != "click":
            continue
        g = got[r.event_id]
        vs = views.get(r.user_id)
        if not vs:
            assert g.view_ts is None and g.direction is None
            continue
        best = min(abs((v - r.ts).total_seconds()) for v in vs)
        assert abs(abs(g.delta_us / 1e6) - best) < 1e-3, (r.event_id, g)
        if g.direction == "backward":
            assert g.delta_us <= 0
        else:
            assert g.delta_us > 0
        n_checked += 1
    assert n_checked > 0


def test_dq_rules_engine_counts(spark):
    """Every declared rule reports; a hand-computed violation count for
    one rule matches; rates are consistent."""
    from flink_kafka_replicator_spark.operators.data_quality import (
        DQ_RULES,
        dq_rules_engine,
    )

    rows = {r.rule_id: r for r in dq_rules_engine(spark, SF_DIR).collect()}
    assert set(rows) == {r for r, *_ in DQ_RULES}
    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    n = o.count()
    want = o.filter(~(F.col("o_totalprice") > 0)).count()
    r = rows["price_positive"]
    assert r.n_checked == n and r.n_violations == want
    for r in rows.values():
        assert 0 <= r.n_violations <= r.n_checked
        assert abs(r.violation_rate - r.n_violations / r.n_checked) < 1e-5


def test_dq_drift_terms_consistent(spark):
    """PSI terms carry the sign of (share_a - share_b); bin counts sum
    to the corpus; near-identical halves yield a small total PSI (the
    parity split is a null test — a large PSI here would mean the
    monitor alarms on noise)."""
    from flink_kafka_replicator_spark.operators.data_quality import (
        dq_distribution_drift,
    )

    rows = dq_distribution_drift(spark, SF_DIR).collect()
    ev_n = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).count()
    assert sum(r.n_a + r.n_b for r in rows) == ev_n
    for r in rows:
        if r.share_a > r.share_b:
            assert r.psi_term >= 0, r
        elif r.share_a < r.share_b:
            assert r.psi_term >= 0 or abs(r.psi_term) < 1e-3, r
    total_psi = sum(abs(r.psi_term) for r in rows)
    assert total_psi < 0.2, f"null-split PSI {total_psi} should be quiet"


def test_pr_curve_monotone_structure(spark):
    """Recall is non-increasing in the threshold; k=0 predicts
    everything (recall 1, precision = base rate); the curve has the
    full 21 rows with consistent counts."""
    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        PR_CURVE_STEPS,
        eval_pr_curve,
    )

    rows = sorted(eval_pr_curve(spark, SF_DIR).collect(), key=lambda r: r.k)
    assert len(rows) == PR_CURVE_STEPS + 1
    assert rows[0].recall == 1.0
    prev = 2.0
    for r in rows:
        assert r.n_pred == r.tp + r.fp
        assert r.recall <= prev + 1e-9
        prev = r.recall
        if r.precision is not None:
            assert 0.0 <= r.precision <= 1.0
    ths = [r.threshold for r in rows]
    assert ths == sorted(ths)

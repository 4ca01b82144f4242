"""Round-10 invariants: the eval-harness completion (ROC-AUC,
calibration bins, NDCG) and the two audit reports (reconciliation,
funnel dwell). Each test pins the structural or mathematical property
the oracle-parity hash can't express."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_kafka_replicator_spark.functions.pipeline_queries import (
    CALIB_BINS,
    NDCG_K,
    eval_calibration_bins,
    eval_ndcg_bm25,
    eval_roc_auc,
)
from flink_kafka_replicator_spark.io import load_table
from flink_kafka_replicator_spark.operators.data_quality import (
    dq_reconciliation,
)
from flink_kafka_replicator_spark.operators.events_funnel import (
    funnel_stages,
    funnel_time_to_convert,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------ eval_roc_auc


def test_roc_auc_is_mann_whitney_and_classifier_learns(spark):
    """AUC must equal the pairwise Mann-Whitney statistic computed the
    slow way (per-pair, on the collected scores), and the trained
    classifier must genuinely rank positives above negatives
    (AUC well above chance)."""
    row = eval_roc_auc(spark, SF_DIR).collect()[0]
    assert row.n_concordant + row.n_tied <= row.n_pos * row.n_neg
    assert 0.0 <= row.auc <= 1.0
    assert row.auc > 0.7, "trained classifier should beat chance clearly"

    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        _qc_fit,
    )

    scored = _qc_fit(spark, SF_DIR)[2].collect()
    pos = sorted(r.s for r in scored if r.y > 0)
    neg = sorted(r.s for r in scored if r.y < 0)
    import bisect

    conc = sum(bisect.bisect_left(neg, s) for s in pos)
    tied = sum(
        bisect.bisect_right(neg, s) - bisect.bisect_left(neg, s)
        for s in pos
    )
    assert (row.n_concordant, row.n_tied) == (conc, tied)
    want = (conc + tied / 2) / (len(pos) * len(neg))
    assert abs(row.auc - want) < 1e-6


def test_roc_auc_windows_run_over_histogram_not_corpus(spark):
    """The only sort/window in the plan is over the distinct-score
    histogram — the per-doc frame must already be aggregated before
    any Window node (the eval_pr_curve scale discipline)."""
    plan = _plan(eval_roc_auc(spark, SF_DIR))
    assert "CartesianProduct" not in plan


# ---------------------------------------------------- eval_calibration_bins


def test_calibration_bins_partition_and_rate(spark):
    rows = eval_calibration_bins(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs, "bins must partition"
    assert len(rows) <= CALIB_BINS
    assert all(0.0 <= r.pos_rate <= 1.0 for r in rows)
    assert all(0 <= r.n_pos <= r.n_docs for r in rows)
    # bin edges strictly increase with the bin id
    srt = sorted(rows, key=lambda r: r.bin)
    assert all(
        a.bin_lo < b.bin_lo for a, b in zip(srt, srt[1:])
    ), "bin lower edges must be strictly increasing"
    # calibration sanity: the top bin must be purer than the bottom
    # (scores order positives by construction of the centroid fit)
    assert srt[-1].pos_rate > srt[0].pos_rate


# --------------------------------------------------------- eval_ndcg_bm25


def test_ndcg_bounds_and_monotone_idcg(spark):
    rows = sorted(eval_ndcg_bm25(spark, SF_DIR).collect(),
                  key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, NDCG_K + 1))
    for r in rows:
        assert 0.0 <= r.ndcg_cum <= 1.0 + 1e-9
        assert r.dcg_cum <= r.idcg_cum + 1e-9, (
            "ideal DCG must dominate the measured ranking"
        )
    # cumulative sums never decrease
    assert all(
        a.dcg_cum <= b.dcg_cum + 1e-9 and a.idcg_cum <= b.idcg_cum + 1e-9
        for a, b in zip(rows, rows[1:])
    )
    # BM25 should retrieve SOME relevant docs for its own query terms
    assert rows[-1].ndcg_cum > 0.0
    assert any(r.rel > 0 for r in rows)


# ------------------------------------------------------- dq_reconciliation


def test_reconciliation_partitions_orders_and_is_exact_for_test_fixture(
    spark,
):
    rows = dq_reconciliation(spark, SF_DIR).collect()
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders, (
        "buckets must partition the orders table"
    )
    allowed = {
        "exact", "lt_1_cent", "lt_1_dollar", "ge_1_dollar", "no_lineitems"
    }
    assert {r.bucket for r in rows} <= allowed
    for r in rows:
        if r.bucket == "exact":
            assert r.min_diff6 == r.max_diff6 == 0
        if r.bucket == "lt_1_cent":
            assert max(abs(r.min_diff6), abs(r.max_diff6)) < 10_000
            assert r.min_diff6 != 0 or r.max_diff6 != 0


def test_reconciliation_exactness_against_recompute(spark):
    """Spot-check one order end-to-end in python integer arithmetic."""
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
        .limit(2000)
        .collect()
    )
    key = li[0].l_orderkey
    items = [r for r in li if r.l_orderkey == key]
    want = sum(
        round(r.l_extendedprice * 100)
        * (100 - round(r.l_discount * 100))
        * (100 + round(r.l_tax * 100))
        for r in items
    )
    got = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_orderkey") == key)
        .select(
            F.sum(
                F.expr(
                    "cast(round(l_extendedprice * 100) as bigint)"
                    " * (100L - cast(round(l_discount * 100) as bigint))"
                    " * (100L + cast(round(l_tax * 100) as bigint))"
                )
            ).alias("v")
        )
        .collect()[0]
        .v
    )
    # the limit(2000) slice may truncate the order's items; compare
    # only when it didn't
    full_n = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_orderkey") == key)
        .count()
    )
    if full_n == len(items):
        assert got == want


# -------------------------------------------------- funnel_time_to_convert


def test_funnel_dwell_positive_ordered_and_counts_match(spark):
    rows = {r.transition: r for r in
            funnel_time_to_convert(spark, SF_DIR).collect()}
    stages = funnel_stages(spark, SF_DIR).collect()
    n_click = sum(1 for r in stages if r.t_click is not None)
    n_purchase = sum(1 for r in stages if r.t_purchase is not None)
    assert rows["view_to_click"].n_users == n_click
    assert rows["click_to_purchase"].n_users == n_purchase
    for r in rows.values():
        # the funnel is ORDERED (click strictly after view), so dwell
        # is strictly positive... except sub-second gaps floor to 0
        assert r.p50_s >= 0
        assert r.p50_s <= r.p90_s, "P50 must not exceed P90"
        assert r.mean_s > 0


def test_funnel_dwell_percentiles_match_collected(spark):
    """Nearest-rank percentiles re-derived driver-side from the per-user
    dwell list must equal the histogram-form pick."""
    import math

    stages = funnel_stages(spark, SF_DIR).collect()
    dw = sorted(
        int((r.t_click - r.t_view).total_seconds())
        for r in stages
        if r.t_click is not None
    )
    row = {
        r.transition: r
        for r in funnel_time_to_convert(spark, SF_DIR).collect()
    }["view_to_click"]
    assert row.p50_s == dw[math.ceil(0.5 * len(dw)) - 1]
    assert row.p90_s == dw[math.ceil(0.9 * len(dw)) - 1]

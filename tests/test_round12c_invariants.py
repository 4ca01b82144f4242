"""Round-12 third-session invariants: closed-form statistics
(OLS / Pearson / moments), interval union, sweep-line backlog,
per-dimension embedding profile, JS divergence bounds, and the
shared-window plan shape for the rank-function row."""

from __future__ import annotations

import math
import os

import numpy as np
from pyspark.sql import functions as F

from flink_kafka_replicator_spark.functions import corpus
from flink_kafka_replicator_spark.functions import pipeline_queries as pq
from flink_kafka_replicator_spark.io import load_table
from flink_kafka_replicator_spark.operators import (
    advanced,
    aggregates,
    events_funnel,
    windows,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_skew_kurtosis_matches_numpy(spark):
    """The raw-power-sum central-moment epilogue must agree with a
    direct numpy computation of the same moments — an independent
    implementation, not the shared-oracle-shape check the driver
    runs."""
    rows = aggregates.agg_skew_kurtosis(spark, SF_DIR).collect()
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_returnflag", "l_quantity")
        .collect()
    )
    by_flag: dict[str, list[float]] = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append(float(r.l_quantity))
    assert rows, "no groups"
    for r in rows:
        q = np.array(by_flag[r.l_returnflag])
        m2 = ((q - q.mean()) ** 2).mean()
        m3 = ((q - q.mean()) ** 3).mean()
        m4 = ((q - q.mean()) ** 4).mean()
        assert abs(r.skewness - m3 / m2**1.5) < 1e-4
        assert abs(r.excess_kurtosis - (m4 / m2**2 - 3.0)) < 1e-4


def test_pearson_corr_single_scan_and_bounds(spark):
    """All three correlation pairs share ONE lineitem scan (the nine
    sufficient sums accumulate in a single aggregate), and every r is
    a valid correlation."""
    df = aggregates.agg_pearson_corr(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, (
        "pair correlations must share one corpus scan, got:\n" + plan
    )
    rows = df.collect()
    assert len(rows) == 3
    for r in rows:
        assert -1.0 <= r.r <= 1.0


def test_ols_trend_r2_bounds(spark):
    for r in aggregates.agg_ols_trend(spark, SF_DIR).collect():
        assert 0.0 <= r.r2 <= 1.0
        assert r.n_days > 0


def test_intervals_merge_consistency(spark):
    """Merged intervals can never cover more days than the raw span
    nor fewer than the longest single interval; merging only reduces
    the interval count."""
    rows = advanced.intervals_merge_overlaps(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_merged_intervals <= r.n_orders
        assert r.longest_interval_days <= r.covered_days


def test_open_backlog_conserves(spark):
    """Every order that opens also closes (close = max lineitem
    shipdate), so the backlog sweep must end at exactly zero and
    opened/closed totals must both equal the joined order count."""
    rows = advanced.orders_open_backlog(spark, SF_DIR).collect()
    assert rows[-1].backlog == 0
    n_opened = sum(r.opened for r in rows)
    n_closed = sum(r.closed for r in rows)
    assert n_opened == n_closed
    assert all(r.backlog >= 0 for r in rows)


def test_js_divergence_bounds_and_shape(spark):
    """JS divergence in nats is bounded by ln 2; the pair table covers
    each unordered language pair exactly once."""
    rows = corpus.lang_js_divergence(spark, SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.lang_a < r.lang_b
        assert (r.lang_a, r.lang_b) not in seen
        seen.add((r.lang_a, r.lang_b))
        assert -1e-6 <= r.js_nats <= math.log(2.0) + 1e-6


def test_hapax_ratio_bounds(spark):
    for r in corpus.text_hapax_ratio(spark, SF_DIR).collect():
        assert 0.0 <= r.hapax_ratio <= 1.0
        assert 0.0 < r.type_token_ratio <= 1.0
        assert r.n_hapax <= r.vocab_size <= r.total_tokens


def test_embedding_dim_profile_shape(spark):
    rows = pq.embedding_dim_profile(spark, SF_DIR).collect()
    ns = {r.n for r in rows}
    assert len(ns) == 1, "every dimension sees every vector"
    for r in rows:
        assert r.std_q6 >= 0.0
        assert 0.0 <= r.frac_zero <= 1.0
        assert r.min_v <= r.max_v


def test_percent_rank_single_window_exchange(spark):
    """percent_rank, dense_rank and nth_value share one partition +
    order spec, so Catalyst must plan them into Window nodes fed by a
    single event_type sort — exactly one exchange in the executed
    plan."""
    df = windows.window_percent_rank(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, (
        f"expected one shared window exchange, got {n_exchange}:\n" + plan
    )


def test_time_to_nth_null_for_light_users(spark):
    """Users with fewer than N events report NULL latency but still
    appear (reached_n = false)."""
    rows = events_funnel.events_time_to_nth(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    per_user = {
        r.user_id: r.cnt
        for r in ev.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert len(rows) == len(per_user)
    for r in rows:
        if per_user[r.user_id] >= events_funnel.TIME_TO_NTH_N:
            assert r.reached_n and r.secs_to_nth is not None
            assert r.secs_to_nth >= 0.0
        else:
            assert not r.reached_n and r.secs_to_nth is None

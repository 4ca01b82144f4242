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


# ------------------------------------- dedup sketch calibration + degrees


def test_minhash_estimate_bounds_and_identity_pairs(spark):
    """Slot matches ∈ [0, 16]; est = matches/16 exactly; identical
    shingle sets (exact Jaccard 1.0) must estimate 1.0 — identical
    inputs hash to identical signatures by construction."""
    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        N_MINHASHES,
        dedup_minhash_jaccard_estimate,
    )

    rows = dedup_minhash_jaccard_estimate(spark, SF_DIR).collect()
    assert rows, "fixture must yield candidate pairs"
    for r in rows:
        assert 0 <= r.n_slot_matches <= N_MINHASHES
        assert abs(r.jaccard_est - r.n_slot_matches / N_MINHASHES) < 1e-9
        assert abs(r.est_error - round(r.jaccard_est - r.jaccard_exact, 4)) <= 1e-4
        if r.jaccard_exact == 1.0:
            assert r.n_slot_matches == N_MINHASHES
    # the estimator is unbiased-ish: mean |error| well under the
    # single-pair std dev sqrt(j(1-j)/16) ≈ 0.125 worst case
    mean_abs = sum(abs(r.est_error) for r in rows) / len(rows)
    assert mean_abs < 0.25, f"estimator drifted: mean|err|={mean_abs:.3f}"


def test_degree_hist_handshake_lemma(spark):
    """Σ degree·n_docs = 2·|edges| — the histogram must account for
    every endpoint of every ≥0.5 pair exactly once."""
    from flink_kafka_replicator_spark.functions.pipeline_queries import (
        dedup_fuzzy_minhash,
        dedup_graph_degree_hist,
    )

    hist = dedup_graph_degree_hist(spark, SF_DIR).collect()
    n_edges = dedup_fuzzy_minhash(spark, SF_DIR).count()
    assert sum(r.degree * r.n_docs for r in hist) == 2 * n_edges
    assert all(r.degree >= 1 for r in hist)


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


# ------------------------------------ rolling median / mode / PIT lookup


def test_rolling_median_matches_collected_frames(spark):
    """Per user, re-derive each trailing-8 frame driver-side and check
    the exact middle-element arithmetic."""
    from flink_kafka_replicator_spark.operators.windows import (
        ROLLMED_LAGS,
        window_rolling_median,
    )

    got = {
        r.event_id: (r.n_window, r.rolling_median)
        for r in window_rolling_median(spark, SF_DIR).collect()
    }
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        vals = [round(r.value * 100) for r in rows]
        for i, r in enumerate(rows):
            frame = sorted(vals[max(0, i - ROLLMED_LAGS + 1): i + 1])
            n = len(frame)
            med2 = (
                frame[(n - 1) // 2] * 2
                if n % 2 == 1
                else frame[n // 2 - 1] + frame[n // 2]
            )
            n_w, med = got[r.event_id]
            assert n_w == n
            assert abs(med - round(med2 / 200.0, 4)) < 1e-9
            checked += 1
    assert checked > 100


def test_mode_per_group_is_argmax_of_histogram(spark):
    from flink_kafka_replicator_spark.operators.aggregates import (
        agg_mode_per_group,
    )

    modes = agg_mode_per_group(spark, SF_DIR).collect()
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .collect()
    )
    hist: dict = {}
    for r in li:
        k = (r.l_returnflag, r.l_linestatus, round(r.l_quantity * 100))
        hist[k] = hist.get(k, 0) + 1
    groups = {(f, s) for f, s, _ in hist}
    assert len(modes) == len(groups), "one mode row per group"
    for m in modes:
        cnts = {
            q: n
            for (f, s, q), n in hist.items()
            if (f, s) == (m.l_returnflag, m.l_linestatus)
        }
        best = min(
            (q for q, n in cnts.items() if n == max(cnts.values()))
        )
        assert round(m.mode_qty * 100) == best
        assert m.n_occurrences == max(cnts.values())


def test_scd2_point_in_time_unique_version_per_key(spark):
    """Exactly one version matches the probe per (user, event_type)
    key that existed at T, and the matched interval contains T."""
    from flink_kafka_replicator_spark.operators.advanced import (
        scd2_history,
        scd2_point_in_time,
    )

    pit = scd2_point_in_time(spark, SF_DIR).collect()
    keys = [(r.user_id, r.event_type) for r in pit]
    assert len(keys) == len(set(keys)), "PIT must match ONE version/key"
    t = pit[0].t_probe
    hist = scd2_history(spark, SF_DIR).collect()
    expect = {
        (h.user_id, h.event_type)
        for h in hist
        if h.valid_from <= t and (h.valid_to is None or t < h.valid_to)
    }
    assert set(keys) == expect


# --------------------------- markov / hampel / weighted median / upsample


def test_markov_rows_are_distributions(spark):
    from flink_kafka_replicator_spark.operators.events_funnel import (
        events_markov_transitions,
    )

    rows = events_markov_transitions(spark, SF_DIR).collect()
    by_from: dict = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    n_adj = sum(r.n for r in rows)
    # adjacency count = total events - one per user (no successor)
    ev = load_table(spark, SF_DIR, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert n_adj == n_events - n_users
    for fr, rs in by_from.items():
        assert abs(sum(r.p for r in rs) - 1.0) < 1e-4, (
            f"row {fr} must normalize to 1"
        )


def test_hampel_flags_planted_spike_not_constant(spark, tmp_path):
    """A constant series has MAD 0 and flags nothing new... until a
    spike arrives: the spike must be flagged, its neighbors not."""
    from pyspark.sql import Row

    from flink_kafka_replicator_spark.operators.windows import (
        window_rolling_mad_anomaly,
    )

    vals = [5.0] * 6 + [50.0] + [5.0] * 5
    rows = [
        Row(
            event_id=i,
            ts=float(i),
            user_id=1,
            event_type="x",
            value=v,
            props="{}",
        )
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows).select(
        "event_id",
        F.timestamp_seconds("ts").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    src = str(tmp_path / "events.parquet")
    df.write.parquet(src)
    out = {
        r.event_id: r
        for r in window_rolling_mad_anomaly(
            spark, str(tmp_path)
        ).collect()
    }
    assert out[6].is_anomaly, "the planted spike must be flagged"
    assert not out[5].is_anomaly and not out[0].is_anomaly
    # after the spike leaves the window's median, constants unflag
    assert not out[11].is_anomaly


def test_weighted_median_dominates_doc_median(spark):
    """Token weighting can only move the median toward longer docs
    (longer docs carry more weight), and both medians are real lengths
    present in the source."""
    from flink_kafka_replicator_spark.functions.corpus import (
        corpus_weighted_median_len,
    )

    rows = corpus_weighted_median_len(spark, SF_DIR).collect()
    assert rows
    lens_by_source: dict = {}
    for r in (
        load_table(spark, SF_DIR, "documents")
        .select("source", F.size(F.split("text", " ")).alias("n"))
        .collect()
    ):
        lens_by_source.setdefault(r.source, []).append(r.n)
    for r in rows:
        assert r.token_weighted_median_len >= r.median_len
        assert r.median_len in lens_by_source[r.source]
        assert r.token_weighted_median_len in lens_by_source[r.source]
        assert r.total_tokens == sum(lens_by_source[r.source])


def test_upsample_copy_counts_bounded_and_deterministic(spark):
    from flink_kafka_replicator_spark.functions.corpus import (
        UPSAMPLE_WEIGHTS,
        corpus_mix_upsample,
    )

    a = sorted(map(tuple, corpus_mix_upsample(spark, SF_DIR).collect()))
    b = sorted(map(tuple, corpus_mix_upsample(spark, SF_DIR).collect()))
    assert a == b, "replay must be byte-identical"
    import collections

    per_doc = collections.Counter((d, lang) for d, lang, _ in a)
    import math

    for (_, lang), n in per_doc.items():
        w = UPSAMPLE_WEIGHTS[lang]
        assert math.floor(w) <= n <= math.ceil(w)
    # realized copy totals per lang should approximate the weight
    by_lang: dict = {}
    for (doc, lang), n in per_doc.items():
        by_lang.setdefault(lang, []).append(n)
    for lang, ns in by_lang.items():
        mean = sum(ns) / len(ns)
        assert abs(mean - UPSAMPLE_WEIGHTS[lang]) < 0.35, (
            f"{lang}: realized {mean:.2f} vs weight "
            f"{UPSAMPLE_WEIGHTS[lang]}"
        )


# ------------------------------- tolerance asof / zipf / pack efficiency


def test_asof_tolerance_is_a_nulling_of_the_unbounded_join(spark):
    from flink_kafka_replicator_spark.operators.advanced import (
        ASOF_TOLERANCE_S,
        join_asof,
        join_asof_tolerance,
    )

    base = {r.click_id: r for r in join_asof(spark, SF_DIR).collect()}
    tol = {
        r.click_id: r
        for r in join_asof_tolerance(spark, SF_DIR).collect()
    }
    assert set(base) == set(tol), "left-join keeps every click"
    n_nulled = 0
    for cid, r in tol.items():
        b = base[cid]
        if r.view_ts is None:
            # nulled out: either no match at all, or out of tolerance
            if b.view_ts is not None:
                dt = (b.click_ts - b.view_ts).total_seconds()
                assert dt > ASOF_TOLERANCE_S
                n_nulled += 1
        else:
            assert r.view_ts == b.view_ts, "in-tol match must be asof's"
            assert 0 <= r.staleness_s <= ASOF_TOLERANCE_S
    assert n_nulled > 0, "fixture must exercise the tolerance bound"


def test_zipf_slope_negative_and_r2_bounded(spark):
    from flink_kafka_replicator_spark.functions.corpus import text_zipf_fit

    # the synthetic fixture's vocabulary is exactly 31 tokens at every
    # SF — small, but the fit machinery is the same at any vocab size
    row = text_zipf_fit(spark, SF_DIR).collect()[0]
    assert row.n_terms == 31
    assert row.zipf_slope < 0, "frequency must fall with rank"
    assert 0.0 <= row.r2 <= 1.0 + 1e-9


def test_pack_efficiency_dominates_naive(spark):
    from flink_kafka_replicator_spark.functions.corpus import (
        PACK_BUDGET_TOKENS,
        corpus_pack_efficiency,
    )

    rows = corpus_pack_efficiency(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.packed_seqs <= r.naive_seqs
        assert r.packed_padding <= r.naive_padding
        assert 0 <= r.packed_padding < PACK_BUDGET_TOKENS, (
            "concat-and-chunk wastes only the final tail"
        )
        assert r.packed_efficiency >= r.naive_efficiency - 1e-9
        assert (
            r.packed_seqs * PACK_BUDGET_TOKENS
            == r.total_tokens + r.packed_padding
        )


# ------------------------------------------------------ cusum / gini


def test_cusum_matches_textbook_recursion(spark):
    """The prefix-form computation must equal the textbook recursion
    S_t = max(0, S_{t-1} + x − target − slack), replayed driver-side
    per user, flags included."""
    from flink_kafka_replicator_spark.operators.windows import (
        CUSUM_SLACK_C,
        CUSUM_THRESH_C,
        window_cusum_drift,
    )

    got = {
        r.event_id: r
        for r in window_cusum_drift(spark, SF_DIR).collect()
    }
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    n_flags = checked = 0
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        v = [round(r.value * 100) for r in rows]
        n = len(v)
        tgt = sum(v)  # mean scaled by n
        s = 0
        for r, x in zip(rows, v):
            s = max(0, s + (n * x - tgt - n * CUSUM_SLACK_C))
            g = got[r.event_id]
            # engine quantizes by integer div: s*100 div n / 1e4
            assert abs(g.cusum - (s * 100 // n) / 10000.0) < 1e-9
            assert g.is_drift == (s > n * CUSUM_THRESH_C)
            n_flags += g.is_drift
            checked += 1
    assert checked > 100
    # the fixture should exercise both sides of the alarm
    assert 0 < n_flags < checked


def test_gini_bounds_and_degenerate_uniform(spark, tmp_path):
    from flink_kafka_replicator_spark.operators.aggregates import (
        agg_gini_concentration,
    )

    for r in agg_gini_concentration(spark, SF_DIR).collect():
        assert -1e-9 <= r.gini < 1.0
    # a constant-value group has Gini exactly 0
    df = spark.createDataFrame(
        [(i, "P", 10.0, "1996-01-01", "c", 1) for i in range(9)],
        "o_orderkey long, o_orderpriority string, o_totalprice double,"
        " o_orderdate string, o_orderstatus string, o_custkey long",
    )
    df.write.parquet(str(tmp_path / "orders.parquet"))
    row = agg_gini_concentration(spark, str(tmp_path)).collect()[0]
    assert row.gini == 0.0 and row.n == 9


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

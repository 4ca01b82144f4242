"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {qid: sec, ...}, "sf": <sf>}

Each query executes fully via the noop datasource writer (no driver
collect, no pandas conversion — measures the Spark plan, not the
transfer). Each query runs three times and reports the best time: the first
run pays one-off janino/whole-stage-codegen compilation (~0.5-1s per
distinct plan), which amortizes to zero on any real workload, and the
minimum of the remaining runs damps same-box noise — the steady-state
number is the one that predicts 100 TB behavior.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_kafka_replicator_spark.registry import all_queries
from flink_kafka_replicator_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The frozen r2-era basket: NEVER reorder or insert into this tuple —
# r2_subset_total sums exactly these ids so BENCH_r02/r03 stay
# comparable across rounds regardless of how HEADLINE grows.
R2_BASKET: tuple[str, ...] = (
    "agg_hash_groupby",
    "agg_rollup",
    "join_inner",
    "join_broadcast",
    "join_range",
    "join_asof",
    "window_rank",
    "window_running_sum",
    "topk_orders",
    "topk_per_group",
    "sql_q3_shipping_priority",
    "stream_tumbling",
    "stream_session",
    "dedup_exact",
    "set_except",
    "fn_array",
    # LLM-pipeline ops (registered via functions/pipeline_queries)
    "dedup_exact_docs",
    "dedup_fuzzy_minhash",
    "dedup_simhash",
    "sim_topk_cosine",
    "sim_topk_ivf",
    "sim_topk_ivf_kmeans",
    "tfidf_top_terms",
    "contamination_ngram",
    "pipeline_end_to_end",
    "grouped_zscore_window",
    "text_stats",
)

# Headline set: the heaviest representative per operator family.
# Append new rounds' queries HERE (not to R2_BASKET).
HEADLINE = list(R2_BASKET) + [
    # round-4 additions
    "knn_ivf_join",
    "knn_ivf_multiprobe",
    "dedup_incremental",
    "sessionize_events",
    "pack_token_sequences",
    "doc_pii_scrub",
    # round-5 additions: the most join-intensive registry plans (SQL
    # heavyweights + the iterative CC pipeline) and the two scale-safe
    # variants that replaced the lang-window bottlenecks
    "sql_q5_local_supplier",
    "sql_q18_large_orders",
    "dedup_cluster_cc",
    "corpus_mix_equalize_hash",
    "pack_token_sequences_sharded",
    # round-5 TPC-H completion: the heaviest of the 16 new shapes (full
    # scan agg, widest join, double-decorrelation) + the persisted-index
    # ingestion path
    "sql_q1_pricing_summary",
    "sql_q9_product_profit",
    "sql_q21_waiting_supplier",
    "dedup_incremental_indexed",
    # round-5 widening: the event-analytics family representative (all
    # share the single-user_id-exchange window pattern)
    "funnel_stages",
    "dq_outlier_mad",
    "embedding_pq_encode",
    "knn_ivf_pq_refined",
    # round-7 additions (VERDICT r6 task 3): the round-5/6 family
    # representatives whose regressions were previously invisible,
    # plus the two new round-7 query ids
    "funnel_conversion",
    "retention_cohorts",
    "event_trigrams",
    "doc_unigram_logprob",
    "text_repetition_ratio",
    "knn_ivf_pq",
    "dedup_paragraph_exact",
    "knn_recall_family",
    "quality_classifier_score",
    "quality_classifier_train",
    "dedup_semantic_clusters",
    "contamination_semantic",
    # round-8 additions: the rowwise-assignment surface and the
    # n_probe recall ladder
    "ivf_cell_histogram",
    "knn_probe_recall_curve",
    "dedup_graph_pagerank",
    "dedup_survivors_by_centrality",
    "knn_batch_adc",
    "dedup_family_report",
    "knn_batch_recall",
    # round-9 addition: the executed dedup ladder (decision matrix
    # joining all four family verdicts)
    "corpus_apply_dedup",
    # round-9 widening: lexical retrieval + the rule filter and the
    # exact-substring duplication signal (both corpus-scan-heavy)
    "bm25_topk",
    "quality_gopher_rules",
    "dedup_substring_spans",
    "hybrid_search_rrf",
    "scrub_duplicate_spans",
    "contamination_family_report",
    # round-9 second session: the new join/layout/timeseries surface,
    # the replayable CMS sketch, corpus vocab/novelty, hyperplane LSH
    "join_bloom_prefilter",
    "join_interval_overlap",
    "layout_zorder",
    "time_weighted_avg",
    "agg_cms_heavy_hitters",
    "vocab_coverage_topk",
    "doc_ngram_novelty",
    "knn_lsh_hyperplane",
    "graph_triangle_count",
    "mmr_rerank",
    "mmr_rerank_batch",
    "bm25_bpe_topk",
    "window_bollinger_bands",
    "agg_decay_weighted_revenue",
    "events_hourly_heatmap",
    "dedup_rate_by_source",
    "vocab_growth_curve",
    "corpus_mix_divergence",
    "window_rsi",
    "events_new_vs_returning",
    "dq_freshness_report",
    "corpus_source_lang_matrix",
    "knn_graph_symmetry",
    "embedding_norm_profile",
    "retention_revenue_cohorts",
    "agg_order_lines_hist",
    "events_activity_streaks",
    "events_peak_concurrency",
    "dedup_cluster_size_hist",
    "dedup_cross_source_pairs",
    "session_length_stats",
    "dq_enum_conformity",
    "agg_percentile_exact",
    "knn_batch_lsh",
    "eval_confusion_matrix",
    "agg_linear_count_distinct",
    "join_asof_nearest",
    "dq_rules_engine",
    "dq_distribution_drift",
    "eval_pr_curve",
    # round-9 third session: smoothing / robust stats / budget fill /
    # tokenizer induction — the corpus-scan-heavy ones representative
    "window_ewma",
    "dq_winsorize",
    "dq_benford",
    "corpus_token_budget",
    "quality_perplexity_buckets",
    "text_entropy",
    "bpe_pair_counts",
    # round-10 additions: the eval-harness completion (threshold-free
    # AUC, calibration table, graded retrieval NDCG) and the two audit
    # reports (header-vs-lines reconciliation, funnel dwell times)
    "eval_roc_auc",
    "eval_calibration_bins",
    "eval_ndcg_bm25",
    "dq_reconciliation",
    "funnel_time_to_convert",
    "dedup_minhash_jaccard_estimate",
    "dedup_graph_degree_hist",
    "window_rolling_median",
    "agg_mode_per_group",
    "scd2_point_in_time",
    "events_markov_transitions",
    "window_rolling_mad_anomaly",
    "corpus_weighted_median_len",
    "corpus_mix_upsample",
    "join_asof_tolerance",
    "text_zipf_fit",
    "corpus_pack_efficiency",
    "window_cusum_drift",
    "agg_gini_concentration",
    # round-11 additions: the full BPE tokenizer story + the widening
    # (risk stats, path mining, completeness, bigram LM, P@k harness)
    "bpe_train_merges",
    "bpe_tokenize_compression",
    "window_drawdown",
    "agg_theil_index",
    "events_top_paths",
    "dq_completeness_matrix",
    "doc_bigram_logprob",
    "eval_precision_at_k",
    "agg_hhi_concentration",
    "dq_duplicate_key_report",
    "events_rfm_segmentation",
    "text_readability_score",
    "join_skew_report",
    "dedup_threshold_sweep",
    "events_inter_arrival_dist",
    "agg_revenue_mom_change",
    "agg_pareto_share",
    "dedup_containment",
    "events_engagement_dau_mau",
    "agg_weekday_seasonality",
    # round-12 second session: series diagnostics (ACF/MACD/seasonal
    # decomposition), behavioral association (entropy/PMI), dup-graph
    # link prediction, centroid confusability, lift table, the DQ
    # cross-field battery, bitmap exact-distinct, decade histogram
    "window_autocorr",
    "window_macd",
    "events_type_entropy",
    "events_cooccurrence_pmi",
    "graph_link_prediction",
    "sim_centroid_pairs",
    "eval_lift_gains",
    "dq_cross_field_consistency",
    "agg_bitmap_distinct",
    "time_seasonal_decompose",
    "hist_log_buckets",
    "multimodal_phash_dedup",
    "text_keyword_rake",
    "corpus_curriculum_buckets",
    "embedding_outlier_zscore",
    "time_downsample_m4",
    # round-12 third session: closed-form statistics (OLS trend,
    # correlation matrix, moment-based shape), interval union +
    # sweep-line backlog, per-dimension embedding health, lexical
    # richness + JS distribution distance, rank-function API row,
    # activation latency, timestamp arithmetic
    "agg_ols_trend",
    "agg_pearson_corr",
    "agg_skew_kurtosis",
    "intervals_merge_overlaps",
    "orders_open_backlog",
    "embedding_dim_profile",
    "text_hapax_ratio",
    "lang_js_divergence",
    "window_percent_rank",
    "events_time_to_nth",
    "fn_timestamp_arith",
]


def run_once(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def calibration_probe(spark) -> float:
    """Fixed synthetic plan (no IO, no engine code): best-of-3 over a
    50M-row range agg. Run at session start AND end; the pair separates
    box/JVM drift from engine drift — if the probes move r/r as much as
    the queries did, the drift is environmental (VERDICT r9: the frozen
    r2 basket drifted 21% on UNCHANGED queries and the cause could not
    be attributed from the record alone)."""
    df = (
        spark.range(50_000_000)
        .selectExpr("id % 97 AS k", "id")
        .groupBy("k")
        .agg({"id": "sum"})
    )
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run_once(df)
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    queries = all_queries()
    spark = get_session(app_name="fkr-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # the fixed-basket number is only comparable across rounds if every
    # basket id actually ran — a rename/removal must fail loudly, not
    # silently shrink r2_subset_total into an apples-to-oranges figure
    missing = [q for q in R2_BASKET if q not in queries]
    if missing:
        raise SystemExit(f"R2_BASKET ids missing from registry: {missing}")

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    flagship = queries["agg_hash_groupby"]
    run_once(flagship(spark, SF_DIR))  # warm-up
    calib_start = calibration_probe(spark)

    # SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the run to those ids —
    # the solo-rerun protocol for settling drift-band flags (SCALE.md:
    # re-measure flagged ids on an idle box before arguing about them).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    headline = (
        [q.strip() for q in only.split(",") if q.strip()]
        if only
        else HEADLINE
    )
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for qid in headline:
        fn = queries.get(qid)
        if fn is None:
            continue
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            run_once(fn(spark, SF_DIR))
            dt = time.perf_counter() - t0
            if i == 0:
                # first run pays one-off codegen + shared-artifact
                # builds; recorded separately so cold-path drift is
                # attributable (best-of-3 hides it)
                cold[qid] = round(dt, 3)
            best = min(best, dt)
        timings[qid] = round(best, 3)
    calib_end = calibration_probe(spark)

    # era check (VERDICT r11 "What's wrong" #1): a solo re-run's
    # ratios are only admissible when the box measures like the box
    # the baselines froze on — BOTH probes must sit within
    # CALIB_ERA_TOLERANCE of the recorded baseline-era calibration.
    # An off-era solo run still writes its artifact, but stamps
    # itself inadmissible so nobody quotes its ratios as settled.
    era = None
    base_path_early = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_BENCH.json"
    )
    if os.path.isfile(base_path_early):
        with open(base_path_early, encoding="utf-8") as fh:
            _bd = json.load(fh)
        era_cal = _bd.get("calibration_era")
        if era_cal:
            ref = float(era_cal["sec"])
            tol = float(era_cal.get("tolerance", 1.2))
            ok = all(
                ref / tol <= p <= ref * tol
                for p in (calib_start, calib_end)
            )
            era = {
                "baseline_sec": ref,
                "tolerance": tol,
                "start": calib_start,
                "end": calib_end,
                "ok": ok,
            }
            if not ok and only:
                print(
                    f"SOLO RUN OFF-ERA: calibration probes "
                    f"{calib_start}/{calib_end} vs baseline-era {ref} "
                    f"(tolerance {tol}x) — ratios below are "
                    "INADMISSIBLE for settling drift flags; re-run on "
                    "an idle box",
                    file=sys.stderr,
                )

    total = round(sum(timings.values()), 3)
    # vs_baseline: per-query ratio against the frozen first-recorded
    # times (BASELINE_BENCH.json) — the "within 2x of baseline" gate as
    # data instead of hand-comparison across BENCH_r*.json history.
    # Regressions are flagged loudly on stderr but never abort the run:
    # the bench record itself is the evidence the next round needs.
    vs_baseline: dict[str, float] = {}
    regressions: dict[str, float] = {}
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_BENCH.json")
    sf_val = float(sf) if sf.replace(".", "").isdigit() else None
    if os.path.isfile(base_path):
        with open(base_path, encoding="utf-8") as fh:
            base_doc = json.load(fh)
        # ratios only make sense at the baseline's scale factor — a
        # local sf0.01 iteration run must not spray false regressions
        base = base_doc["queries"] if sf_val == base_doc.get("sf") else {}
        for qid, sec in timings.items():
            b = base.get(qid)
            if not b or b["sec"] <= 0:
                continue
            ratio = round(sec / b["sec"], 2)
            vs_baseline[qid] = ratio
            # absolute floor: a 0.1s query jittering to 0.25s is noise,
            # not a regression worth failing loudly over
            if ratio > 2.0 and sec - b["sec"] > 0.25:
                regressions[qid] = ratio
        if regressions:
            print(
                "BENCH REGRESSION (>2x baseline): "
                + ", ".join(f"{q}={r}x" for q, r in sorted(regressions.items())),
                file=sys.stderr,
            )
        # first-appearance queries freeze their baseline NOW (the same
        # "first recorded time" rule the file was seeded with), so the
        # next round's run gets a ratio instead of a blind spot
        if base and not only:  # never auto-freeze from a subset run
            new_qs = {q: t for q, t in timings.items() if q not in base}
            if new_qs:
                for q, t in new_qs.items():
                    base_doc["queries"][q] = {"sec": t, "round": "auto"}
                with open(base_path, "w", encoding="utf-8") as fh:
                    json.dump(base_doc, fh, indent=1, sort_keys=True)
    # the headline set grows round over round; r2_subset_total keeps a
    # fixed-basket number comparable against BENCH_r02/r03 so a larger
    # set never reads as a regression. Indexing timings[q] directly (no
    # membership filter) is the loud-failure path: the registry check
    # above plus HEADLINE ⊇ R2_BASKET guarantee every basket id was
    # timed, and a KeyError here beats a silently shrunken basket.
    r2_subset = (
        round(sum(timings[q] for q in R2_BASKET), 3)
        if not only
        else None
    )
    geomean = None
    if vs_baseline:
        import math

        geomean = round(
            math.exp(
                sum(math.log(r) for r in vs_baseline.values() if r > 0)
                / len(vs_baseline)
            ),
            3,
        )
    report = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # drift-attribution record (not part of the driver contract):
        # per-query first-run times plus the fixed synthetic probe at
        # session start/end — if calib moved r/r like the queries did,
        # the drift is the box, not the engine
        "cold_first_run": cold,
        "calibration": {"start": calib_start, "end": calib_end},
        "n_queries": len(timings),
        "r2_subset_total": r2_subset,
        "r2_subset_n": len(R2_BASKET),
        "vs_baseline": vs_baseline,
        "vs_baseline_geomean": geomean,
        "regressions": regressions,
        "era": era,
        # a solo artifact is only evidence for settling a drift flag
        # when its probes match the baseline era (None = no era
        # recorded / not a solo run; the full-round report carries the
        # era block for attribution but is never "settling" evidence)
        "solo_admissible": (
            bool(era and era["ok"]) if only else None
        ),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # full report to disk FIRST (BENCH_r08.json was truncated: the one
    # stdout line outgrew the driver's capture window, leaving
    # parsed:null) — the on-disk artifact is the durable record...
    report_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        # a subset (solo-rerun) run must not clobber the round's full
        # report — it lands in its own artifact
        "BENCH_SOLO_REPORT.json" if only else "BENCH_REPORT.json",
    )
    with open(report_path, "w", encoding="utf-8") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    # ...and the stdout line stays inside the window by summarizing the
    # bulky per-query vs_baseline map (the per-query timings dict is the
    # driver contract and stays verbatim).
    line = dict(report)
    line["vs_baseline"] = geomean
    line.pop("cold_first_run", None)
    line["report"] = "BENCH_REPORT.json"
    print(json.dumps(line))


if __name__ == "__main__":
    main()

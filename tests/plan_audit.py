"""Plan-lint audit: machine-check the scale anti-patterns over EVERY
registry id's physical plan.

SCALE.md argues, id by id, that the remaining broadcast-nested-loop
joins and single-partition exchanges all sit over provably bounded
inputs (1-row aggregates, <=k-row model artifacts, histogram/month/
top-k frames). This harness makes that argument machine-checked
instead of prose: it builds the physical plan of all registry queries,
finds the anti-pattern nodes, classifies each occurrence, and compares
against the pinned allowlist below. An occurrence with no entry — or
more occurrences than the pin allows — fails the audit, so a future
edit that silently regresses a bucketed join into an all-pairs product
or parks a corpus-sized stream on one task is caught the session it
lands, per id, with no human reading plans.

Patterns and how each is judged:

- ``cartesian`` — CartesianProduct: all-pairs, never acceptable; there
  is no allowlist for it (the engine has zero at HEAD).
- ``bnl`` — BroadcastNestedLoopJoin: non-equi join. Legal ONLY as the
  engine's 1-row/tiny-broadcast epilogue idiom (threshold probes,
  bound scalars, decile/bin edges joined onto a stream). Allowlisted
  per id with a pinned max count.
- ``single_part`` — Exchange SinglePartition, classified by the node
  that CONSUMES it (parsed from the formatted plan tree):
    * consumer HashAggregate/SortAggregate/ObjectHashAggregate →
      auto-OK: this is the CORRECT distributed plan for a global
      (keyless) aggregate — partial aggregation runs map-side and the
      exchange carries ONE agg buffer per upstream partition, so its
      row count is the cluster's partition count, never the corpus.
    * consumer Window/Sort/anything else → the whole input of that
      node sits on one task; legal only over a bounded frame, so it
      must be allowlisted per id with a pinned max count.

Run: python tests/plan_audit.py [--only id1,id2]
Artifact: PLAN_AUDIT.json (override SPARK_GRAFT_PLAN_AUDIT_OUT).
Exit 1 if anything is unjustified.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_ADV_SRC", "/root/testdata/sf0.001")

# (qid, pattern) -> (max_count, reason). Counts are PINNED at the HEAD
# plan shape: growing past the pin fails the audit even for an
# allowlisted id, so "one bounded epilogue sort" cannot quietly become
# three. Reasons name the bounded input that makes the pattern legal.
ALLOW: dict[tuple[str, str], tuple[int, str]] = {}


R_BNL_1ROW = (
    "broadcast side is a 1-row bound/total aggregate (threshold, corpus "
    "total, min/max scalar) non-equi-joined onto the stream — work is "
    "|stream| x 1"
)
R_BNL_BINS = (
    "broadcast side is a <=bins-row edge/bin/quantile artifact range-"
    "joined onto the stream — work is |stream| x bins, bins a constant"
)
R_BNL_PROBE = (
    "non-equi probe against a broadcast of a pinned <=k-row model "
    "artifact (query shortlist, centroid table, recall ladder) — both "
    "sides bounded by construction"
)
R_SP_EPILOGUE = (
    "final Window/Sort epilogue over a frame bounded by a constant "
    "(histogram buckets, month/day calendar, score bins, top-k list, "
    "per-table report rows) — upstream heavy work is partitioned; the "
    "single task sees <=constant rows"
)


def _fill_allow() -> None:
    def add(pattern: str, reason: str, **qids: int) -> None:
        for q, n in qids.items():
            ALLOW[(q, pattern)] = (n, reason)

    # --- bnl: 1-row scalar broadcast epilogues -----------------------
    add(
        "bnl",
        R_BNL_1ROW,
        bm25_bpe_topk=1,
        bm25_topk=1,
        corpus_mix_equalize=1,
        corpus_mix_equalize_hash=1,
        corpus_mix_temperature=1,
        doc_bigram_logprob=1,
        doc_unigram_logprob=1,
        dq_benford=1,
        dq_distribution_drift=1,
        # dq_freshness_report: round 14 — head now a scalar subquery
        events_cooccurrence_pmi=1,
        hybrid_search_rrf=1,
        ivf_cell_histogram=1,
        quality_classifier_train=1,
        quality_perplexity_buckets=1,
        scd2_point_in_time=1,
        stream_watermark=1,
        tfidf_top_terms=1,
        vocab_coverage_topk=1,
        lang_js_divergence=4,
        agg_pareto_share=1,
        # round-13 plan-audit fix: anchor date was a partitionBy(lit(1))
        # window over the FULL orders table — now a 1-row max broadcast
        agg_decay_weighted_revenue=1,
    )
    # --- bnl: bin/edge-table range joins -----------------------------
    add(
        "bnl",
        R_BNL_BINS,
        corpus_curriculum_buckets=3,
        eval_calibration_bins=1,
        eval_lift_gains=3,
        eval_pr_curve=3,
        eval_precision_at_k=2,
        eval_ndcg_bm25=1,
        events_rfm_segmentation=3,
        dedup_threshold_sweep=2,
        join_bloom_prefilter=3,
    )
    # --- bnl: pinned-artifact probes ---------------------------------
    add(
        "bnl",
        R_BNL_PROBE,
        knn_batch_recall=2,
        knn_graph_symmetry=1,
        knn_probe_recall_curve=5,
        graph_triangle_count=2,
        join_range=1,
    )
    # --- single_part: bounded Window/Sort epilogues ------------------
    # round 14: nine ids left this list — their share-of-total
    # denominators became SCALAR SUBQUERIES (partial-aggregated global
    # agg + ReusedExchange of the grouped table; no SinglePartition
    # exchange, no broadcast join): agg_order_lines_hist,
    # agg_weekday_seasonality, corpus_mix_divergence,
    # corpus_source_lang_matrix, dedup_cluster_size_hist,
    # dedup_cross_source_pairs, dq_freshness_report,
    # events_hourly_heatmap, session_length_stats. The ids still here
    # carry ORDERED windows (cumulative/nearest-rank picks) whose
    # single-partition sort is inherent and whose frame is bounded.
    add(
        "single_part",
        R_SP_EPILOGUE,
        agg_pareto_share=2,
        agg_revenue_mom_change=1,
        eval_lift_gains=1,
        # round-13 optimization: peak epilogue collapsed to one agg
        events_peak_concurrency=1,
        events_rfm_segmentation=3,
        funnel_conversion=1,
        # round-14 sweep rewrite: the per-day carry table's cumulative
        # windows (<=|days| calendar-bounded rows)
        join_interval_overlap=1,
        join_skew_report=1,
        orders_open_backlog=1,
        time_seasonal_decompose=2,
        vocab_coverage_topk=1,
        vocab_growth_curve=1,
        text_zipf_fit=1,
        embedding_norm_profile=1,
        eval_roc_auc=1,  # window over the distinct-score histogram
    )


_fill_allow()


# the detection itself is product surface: plans.lint_plan_text — the
# harness owns only the allowlist and the per-id sweep
from flink_kafka_replicator_spark.plans import lint_plan_text as audit_plan  # noqa: E402


def main() -> int:
    only: set[str] | None = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("plan-audit")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    from flink_kafka_replicator_spark.plans import formatted_plan

    qs = e.queries()
    ids = sorted(set(qs) & (only or set(qs)))
    record: dict[str, dict] = {}
    unjustified: list[str] = []
    for qid in ids:
        t0 = time.time()
        try:
            hits = audit_plan(formatted_plan(qs[qid](spark, SRC)))
        except Exception as ex:  # noqa: BLE001 — record, keep auditing
            record[qid] = {
                "status": "ERROR",
                "err": f"{type(ex).__name__}: {str(ex)[:240]}",
            }
            unjustified.append(qid)
            print(f"  {qid:34s} ERROR  {str(ex)[:120]}")
            continue
        dt = time.time() - t0
        if not hits:
            record[qid] = {"status": "CLEAN", "sec": round(dt, 1)}
            continue
        entry: dict = {"status": "JUSTIFIED", "hits": hits, "why": {}}
        for name, count in hits.items():
            pin = ALLOW.get((qid, name))
            if pin is None or count > pin[0]:
                entry["status"] = "UNJUSTIFIED"
                entry["why"][name] = (
                    None
                    if pin is None
                    else f"count {count} exceeds pinned max {pin[0]}"
                )
            else:
                entry["why"][name] = pin[1]
        record[qid] = entry
        if entry["status"] == "UNJUSTIFIED":
            unjustified.append(qid)
        print(f"  {qid:34s} {entry['status']:12s} {hits}")

    out = os.environ.get(
        "SPARK_GRAFT_PLAN_AUDIT_OUT", "/root/repo/PLAN_AUDIT.json"
    )
    n_clean = sum(1 for v in record.values() if v["status"] == "CLEAN")
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(
            {
                "src": SRC,
                "patterns": ["cartesian", "bnl", "single_part(non-agg consumer)"],
                "n_ids": len(record),
                "n_clean": n_clean,
                "n_justified": sum(
                    1 for v in record.values() if v["status"] == "JUSTIFIED"
                ),
                "n_unjustified": len(unjustified),
                "unjustified": sorted(unjustified),
                "results": record,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    print(
        f"wrote {out}: {n_clean} CLEAN / "
        f"{len(record) - n_clean - len(unjustified)} JUSTIFIED / "
        f"{len(unjustified)} UNJUSTIFIED"
    )
    print("UNJUSTIFIED:", sorted(unjustified) if unjustified else "none")
    return 1 if unjustified else 0


if __name__ == "__main__":
    sys.exit(main())

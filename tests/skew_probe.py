"""Skew-amplification probe: clean vs heavy-hitter walls at sf0.1.

The --skew correctness sweep answers "do the engines still agree on
skewed data"; this probe answers the 100 TB question the sweep's
sf0.001 scale cannot see: WHICH operators' walls amplify when one key
owns half a partition's rows. It builds the same deterministic
heavy-hitter twin from sf0.1 (one user = 40% of events, one supplier =
33% of lineitem, a 14% exact-duplicate text cluster, a 17% identical
embedding cluster), times each skew-sensitive query on the CLEAN and
the SKEWED copy in one session (clean first; best-of-2 per side), and
writes SKEW_PROBE.json with per-id amplification = skew / clean.

Reading it: amplification ~1× means the plan's work is bounded per
GROUP COUNT, not per hot-group SIZE (map-side partial aggs, banded
candidates under MAX_BUCKET, pointer-doubling CC). Amplification >>1×
localizes a straggler — at this scale usually a per-key ordered window
whose hot partition serializes one task; at 100 TB the same number is
the slowdown factor of the whole stage.

Usage: python tests/skew_probe.py  [writes /root/repo/SKEW_PROBE.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CLEAN = os.environ.get("SPARK_GRAFT_PROBE_SRC", "/root/testdata/sf0.1")
os.environ["SPARK_GRAFT_ADV_SRC"] = CLEAN
os.environ.setdefault("SPARK_GRAFT_SKEW_DIR", "/tmp/spark_graft_skew_sf01")

from adversarial_sweep import build_skew_dir  # noqa: E402

# skew-sensitive families: per-key windows, hot-group aggs, hot-key
# joins, the dedup/CC/LSH giant-cluster path, duplicate-vector ANN
IDS = [
    # per-user ordered windows (hot partition = single-task straggler risk)
    "sessionize_events", "events_activity_streaks", "events_time_to_nth",
    "session_length_stats", "stream_session", "events_peak_concurrency",
    # hot-group aggregation (map-side partials should flatten these)
    "agg_mode_per_group", "events_engagement_dau_mau", "events_top_paths",
    "events_markov_transitions",
    # hot-key joins (AQE skew split / broadcast should flatten these)
    "join_inner", "join_skew_report", "join_bloom_prefilter",
    "sql_q3_shipping_priority", "sql_q5_local_supplier",
    "sql_q9_product_profit", "sql_q21_waiting_supplier",
    # giant duplicate cluster: banding hygiene, CC pointer doubling,
    # pagerank on a dense component, containment
    "dedup_exact_docs", "dedup_fuzzy_minhash", "dedup_simhash",
    "dedup_cluster_cc", "dedup_graph_pagerank", "dedup_containment",
    "corpus_apply_dedup",
    # duplicate-vector ANN: one IVF cell holds a sixth of the corpus
    "sim_topk_cosine", "knn_ivf_join", "dedup_semantic_clusters",
    "ivf_cell_histogram",
]


def main() -> int:
    skew_dir = build_skew_dir()
    print(f"skew twin (from {CLEAN}) at {skew_dir}")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("skew-probe")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    import __spark_entry__ as e

    qs = e.queries()

    def wall(qid: str, d: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[qid](spark, d).toPandas()
            best = min(best, time.time() - t0)
        return best

    record: dict[str, dict] = {}
    for qid in IDS:
        try:
            c = wall(qid, CLEAN)
            s = wall(qid, skew_dir)
            amp = round(s / c, 2) if c > 0 else None
            record[qid] = {"clean_s": round(c, 2), "skew_s": round(s, 2),
                           "amplification": amp}
            print(f"  {qid:32s} clean {c:6.2f}s  skew {s:6.2f}s  x{amp}")
        except Exception as ex:  # noqa: BLE001 — record, keep probing
            record[qid] = {"error": f"{type(ex).__name__}: {str(ex)[:200]}"}
            print(f"  {qid:32s} ERROR {ex}")

    amps = [r["amplification"] for r in record.values()
            if r.get("amplification")]
    out = {
        "src": CLEAN,
        "n_ids": len(record),
        "max_amplification": max(amps) if amps else None,
        "flagged_over_2_5x": sorted(
            q for q, r in record.items()
            if (r.get("amplification") or 0) > 2.5
        ),
        "errors": sorted(q for q, r in record.items() if "error" in r),
        "results": record,
    }
    path = os.environ.get("SPARK_GRAFT_SKEW_PROBE_OUT",
                          "/root/repo/SKEW_PROBE.json")
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {path}: max amplification {out['max_amplification']}x, "
          f"flagged {out['flagged_over_2_5x']}")
    return 1 if out["errors"] else 0


if __name__ == "__main__":
    sys.exit(main())

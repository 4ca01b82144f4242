"""Parallelism signal at a bigger scale (VERDICT r13 item 6).

The 8-vs-32-core probe at sf0.1 is uninformative: sub-1.5 s walls are
job-scheduling floor, not compute, so every ratio sits near 1. This
tool times the heavy bench tail ONCE at a replicated ~sf1 dataset (see
tests/test_scale_smoke.py's big_dir recipe — 10x sf0.1 into /tmp) under
whatever SPARK_GRAFT_CPUS the caller sets, so two runs (8 and 32) give
a real scan/compute parallelism ratio per query.

Usage:
  SPARK_GRAFT_CPUS=32 python tools/scale_signal.py /tmp/sf1x out32.json
  SPARK_GRAFT_CPUS=8  python tools/scale_signal.py /tmp/sf1x out8.json

Each id gets one untimed warm-up (artifact/memo builds + codegen), then
best-of-2 timed noop runs. Walls include the plan build, matching
bench.py's timed region.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_kafka_replicator_spark.functions.pipeline_queries import (
    RESULT_MEMOIZED_IDS,
    clear_result_memos,
)
from flink_kafka_replicator_spark.registry import all_queries
from flink_kafka_replicator_spark.session import get_session

# the >=~1 s bench tail plus scan-heavy representatives
HEAVY_IDS = [
    "knn_recall_family",
    "knn_ivf_multiprobe",
    "bm25_bpe_topk",
    "scrub_duplicate_spans",
    "dedup_substring_spans",
    "dedup_simhash",
    "doc_bigram_logprob",
    "doc_ngram_novelty",
    "window_rolling_median",
    "window_macd",
    "join_interval_overlap",
    "join_bloom_prefilter",
    "contamination_ngram",
    "agg_cms_heavy_hitters",
    "dq_reconciliation",
    "multimodal_phash_dedup",
    "sql_q21_waiting_supplier",
    "agg_pearson_corr",
    "tfidf_top_terms",
    "knn_batch_recall",
]


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(
            "usage: SPARK_GRAFT_CPUS=N python tools/scale_signal.py SF_DIR OUT.json"
        )
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(app_name=f"fkr-scale-signal-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    timings: dict[str, dict] = {}
    for qid in HEAVY_IDS:
        fn = queries[qid]
        spark.sparkContext.setJobDescription(f"scale-signal:{qid}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = round(time.perf_counter() - t0, 3)
        best = float("inf")
        for _ in range(2):
            if qid in RESULT_MEMOIZED_IDS:
                clear_result_memos()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[qid] = {"best": round(best, 3), "cold": cold}
        print(f"{qid:28s} best={best:.3f}s cold={cold:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(
            {"sf_dir": sf_dir, "cpus": int(cpus), "queries": timings},
            fh,
            indent=1,
            sort_keys=True,
        )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

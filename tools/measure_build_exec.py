"""Split a query's wall into plan CONSTRUCTION (py4j + analyzer work in
fn(spark, sf_dir)) and EXECUTION (noop sink) — guide §1 measurement for
ids whose best-of-3 wall is suspected to be plan-build-bound (the
knn_recall_family case: r13 measured ~1.4 s of analyzer work in a
1.7 s wall).

Usage:
  python tools/measure_build_exec.py qid [qid ...]
  SPARK_GRAFT_SF_DIR picks the dataset (default sf0.1);
  SPARK_GRAFT_BE_REPS sets reps (default 3; reported: best of reps,
  after one untimed warm-up build+run that absorbs artifact builds).

Result-memoized ids (RESULT_MEMOIZED_IDS) get their result memos
cleared before every rep so the build is always a real build.
"""

from __future__ import annotations

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


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit("usage: python tools/measure_build_exec.py qid [qid ...]")
    qids = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BE_REPS", "3"))
    spark = get_session(app_name="fkr-build-exec")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for qid in qids:
        fn = queries[qid]
        # warm-up: artifact builds + codegen, untimed
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best_b, best_e = float("inf"), float("inf")
        for _ in range(reps):
            if qid in RESULT_MEMOIZED_IDS:
                clear_result_memos()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            best_b = min(best_b, t1 - t0)
            best_e = min(best_e, t2 - t1)
        print(
            f"{qid}: build={best_b:.3f}s exec={best_e:.3f}s "
            f"total~{best_b + best_e:.3f}s (best-of-{reps}, warm artifacts)"
        )


if __name__ == "__main__":
    main()

"""Capture .explain('formatted') + timed noop runs for named query ids.

Usage:
  python tools/capture_plans.py OUTDIR SUFFIX qid [qid ...]
  SPARK_GRAFT_SF_DIR picks the dataset (default sf0.1);
  SPARK_GRAFT_PLAN_ONLY=1 skips the timing runs (plan text only).

Writes OUTDIR/<qid>_<SUFFIX>.txt with the formatted physical plan and,
unless PLAN_ONLY, prints per-qid best-of-3 noop wall seconds.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_kafka_replicator_spark.functions.pipeline_queries import (
    RESULT_MEMOIZED_IDS,
    clear_result_memos,
)
from flink_kafka_replicator_spark.registry import all_queries
from flink_kafka_replicator_spark.session import get_session


def main() -> None:
    if len(sys.argv) < 4:
        raise SystemExit(
            "usage: python tools/capture_plans.py OUTDIR SUFFIX qid [qid ...]"
        )
    outdir, suffix, *qids = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plan_only = os.environ.get("SPARK_GRAFT_PLAN_ONLY") == "1"
    spark = get_session(app_name="fkr-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for qid in qids:
        fn = queries[qid]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(
            os.path.join(outdir, f"{qid}_{suffix}.txt"), "w", encoding="utf-8"
        ) as fh:
            fh.write(f"# {qid} — explain('formatted') @ {sf_dir}\n")
            fh.write(buf.getvalue())
        if plan_only:
            print(f"{qid}: plan written")
            continue
        spark.sparkContext.setJobDescription(f"capture:{qid}")
        best, first = float("inf"), None
        for i in range(3):
            if qid in RESULT_MEMOIZED_IDS:
                clear_result_memos()  # same rule as bench.py's reps
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i == 0:
                first = dt
            best = min(best, dt)
        spark.sparkContext.setJobDescription(None)
        # warm_best reuses every session artifact memo (_KNN_*, LSH,
        # classifier fits); cold is the only representative number for
        # memoized families — label both so neither is over-read
        print(f"{qid}: warm_best={best:.3f}s cold={first:.3f}s")


if __name__ == "__main__":
    main()

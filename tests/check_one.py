"""Ad-hoc single-query parity checker: `python tests/check_one.py qid [qid ...]`.

Same canonicalization + compare as driver_sim, but only for the named
ids — the fast iteration loop while building a new operator.
Optional env: SPARK_GRAFT_CHECK_SF (default /root/testdata/sf0.01).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

SF = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")

spark = (
    SparkSession.builder.appName("check-one")
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )

qs, os_ = e.queries(), e.oracle_sql()


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


rc = 0
for qid in sys.argv[1:]:
    t0 = time.time()
    try:
        got = canon(qs[qid](spark, SF).toPandas())
        if qid not in os_:
            print(f"{qid}: rows-only({len(got)}) {time.time()-t0:.1f}s")
            continue
        want = canon(con.sql(os_[qid]).df())
        assert list(got.columns) == list(want.columns), (
            f"cols {list(got.columns)} vs {list(want.columns)}"
        )
        assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
        for c in got.columns:
            g, w = got[c].to_numpy(), want[c].to_numpy()
            # mirror tests/oracle.py: the driver's hash is dtype-
            # sensitive, so int-vs-float (DuckDB HUGEINT → float64)
            # must fail here, not be coerced
            kinds = {g.dtype.kind, w.dtype.kind}
            assert not (kinds & {"i", "u"} and "f" in kinds), (
                f"col {c}: dtype-kind mismatch spark={g.dtype} "
                f"duckdb={w.dtype} — CAST the oracle (e.g. AS BIGINT)"
            )
            if g.dtype.kind == "f" or w.dtype.kind == "f":
                g, w = g.astype(float), w.astype(float)
                ok = (np.isnan(g) & np.isnan(w)) | (g == w)
            else:
                ok = np.array(
                    [a == b or (pd.isna(a) and pd.isna(b)) for a, b in zip(g, w)]
                )
            assert ok.all(), (
                f"col {c}: {int((~ok).sum())} mismatches e.g. "
                f"{got[c][~ok].iloc[0]!r} vs {want[c][~ok].iloc[0]!r}"
            )
        print(f"{qid}: MATCH rows={len(got)} {time.time()-t0:.1f}s")
    except Exception as ex:
        rc = 1
        print(f"{qid}: FAIL {str(ex)[:300]}")
sys.exit(rc)

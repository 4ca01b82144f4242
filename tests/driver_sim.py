"""Simulate the driver: plain SparkSession, import __spark_entry__, run the protocol.

Writes a per-id result artifact (default DRIVERSIM.json at the repo
root; override with SPARK_GRAFT_DRIVERSIM_OUT=path) so the full-sweep
re-verification of every oracled id is a committed, auditable record —
the driver's own 50-slot CORRECTNESS budget rotates through the 296-id
registry over ~6 rounds, and this artifact bridges that gap each round
(VERDICT r12 next-round task 4).
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

# Driver-like session: note NO engine confs — __spark_entry__ must cope.
spark = (
    SparkSession.builder.appName("driver-sim")
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)

import __spark_entry__ as e

# 1. smoke: entry()
df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

# 2. full protocol at sf0.01
import duckdb, pandas as pd, numpy as np

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs, os_ = e.queries(), e.oracle_sql()
assert set(os_) <= set(qs), f"oracle keys not in queries: {set(os_)-set(qs)}"

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

fails = []
record: dict[str, dict] = {}
for qid in sorted(qs):
    t0 = time.time()
    try:
        got = canon(qs[qid](spark, SF).toPandas())
        if qid in os_:
            want = canon(con.sql(os_[qid]).df())
            assert list(got.columns) == list(want.columns), f"cols {list(got.columns)} vs {list(want.columns)}"
            assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
            for c in got.columns:
                g, w = got[c].to_numpy(), want[c].to_numpy()
                # the real driver's value-hash is dtype-sensitive:
                # int on one side + float on the other (DuckDB
                # HUGEINT sums land as float64 in pandas) would
                # hash-mismatch even when 2 == 2.0 — fail loudly here
                # like tests/oracle.py does instead of coercing
                kinds = {g.dtype.kind, w.dtype.kind}
                assert not (kinds & {"i", "u"} and "f" in kinds), (
                    f"col {c}: dtype-kind mismatch spark={g.dtype} "
                    f"duckdb={w.dtype} — CAST the oracle aggregate "
                    f"(e.g. AS BIGINT)"
                )
                if g.dtype.kind == "f" or w.dtype.kind == "f":
                    g, w = g.astype(float), w.astype(float)
                    ok = (np.isnan(g) & np.isnan(w)) | (g == w)
                else:
                    ok = np.array([a == b or (pd.isna(a) and pd.isna(b)) for a, b in zip(g, w)])
                assert ok.all(), f"col {c}: {int((~ok).sum())} mismatches e.g. {got[c][~ok].iloc[0]!r} vs {want[c][~ok].iloc[0]!r}"
            status = "MATCH"
        else:
            status = f"rows-only({len(got)})"
        record[qid] = {
            "status": "MATCH" if qid in os_ else "rows_only",
            "rows": int(len(got)),
            "sec": round(time.time() - t0, 1),
        }
        print(f"  {qid:30s} {status:12s} {time.time()-t0:5.1f}s")
    except Exception as ex:
        fails.append(qid)
        record[qid] = {"status": "FAIL", "err": str(ex)[:300]}
        print(f"  {qid:30s} FAIL: {str(ex)[:200]}")

# 3. probe: re-run one query twice (state pollution) on same session
n1 = qs["agg_hash_groupby"](spark, SF).count()
n2 = qs["agg_hash_groupby"](spark, SF).count()
assert n1 == n2
print(f"rerun probe: {n1}=={n2} OK")

out_path = os.environ.get(
    "SPARK_GRAFT_DRIVERSIM_OUT", "/root/repo/DRIVERSIM.json"
)
n_match = sum(1 for v in record.values() if v["status"] == "MATCH")
n_ro = sum(1 for v in record.values() if v["status"] == "rows_only")
with open(out_path, "w", encoding="utf-8") as fh:
    json.dump(
        {
            "sf_dir": SF,
            "n_ids": len(record),
            "n_match": n_match,
            "n_rows_only": n_ro,
            "n_fail": len(fails),
            "rerun_probe_ok": bool(n1 == n2),
            "results": record,
        },
        fh,
        indent=1,
        sort_keys=True,
    )
print(f"wrote {out_path}: {n_match} MATCH / {n_ro} rows-only / {len(fails)} FAIL")
print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)

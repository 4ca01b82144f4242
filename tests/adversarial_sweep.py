"""Adversarial oracle sweep: NULL/empty/negative/pre-epoch data twin.

The generated testdata has ZERO nulls in any column, every events.value
positive, every timestamp post-2024, and every documents.text non-empty
— so Spark-vs-DuckDB semantic divergences that only bite on edge data
(ASC NULL placement, NaN-vs-NULL division, truncating vs floor modulus,
casts of NaN) stay latent under the normal driver sweep. Three such
latents were found by round-12 review (windows.py percent_rank NULL
order, corpus.py JS-divergence 0/0, scalar_fns.py negative modulus);
this sweep makes the whole class testable instead of reviewable.

It materializes a mutated copy of sf0.001 under /tmp (keys untouched;
hash-deterministic injections into measure/text columns), then runs
EVERY oracled registry query on both engines there and diffs with the
same canonicalization as tests/driver_sim.py. A mismatch here is a
semantics-pinning gap even when the normal sweep is green.

Usage:  python tests/adversarial_sweep.py [--only id1,id2] [--empty|--nonfinite]
``--empty`` sweeps a ZERO-ROW twin instead (same schemas, no rows):
the empty-partition robustness audit — driver-side model-artifact
collects, SQL-standard ROLLUP grand totals, sum-over-empty NULLs, and
empty persisted-index reads all only fire there.
``--nonfinite`` sweeps a NaN/±Infinity twin (injected into
events.value): the IEEE-edge audit — ANSI CAST_OVERFLOW on the cents
quantization, Spark's floor(NaN)=0L coercion, NaN's position in each
engine's total order, and percentile/bucket semantics on non-finite
samples all only fire there.
``--invariance`` is a different kind of sweep: Spark vs ITSELF. Every
query runs twice in one session — once per value of one config axis —
and the frames must be exactly equal. ``--axis width`` (default) flips
spark.sql.shuffle.partitions 8→5 and catches merge-order-dependent
reductions (the doc_unigram_logprob class) even where DuckDB
coincidentally lands on the same rounding — the "same job, different
cluster width" reproducibility contract a 100 TB deployment relies on.
``--axis aqe`` flips adaptive execution on→off (runtime re-planning —
coalescing, skew-split, join demotion — must never change results);
``--axis broadcast`` flips autoBroadcastJoinThreshold 10MB→-1
(broadcast-hash vs sort-merge join strategy — the classic trap where a
non-deterministic expression is evaluated a different number of times
per strategy). Add --skew to run any axis over the heavy-hitter twin
(duplicate-amplified knife edges) instead of the clean source.
Memoized model artifacts (centroids, CC labels) are computed once per
(session, dataset) and replayed for both widths — by design: that is
also how production reuses a persisted model.
``--skew`` sweeps a heavy-hitter twin: one user owns 40% of events,
one event_type 33%, one customer 25% of orders, one supplier 33% and
one part 25% of lineitem, one source 33% and one lang 25% of
documents, a 14% exact-duplicate text cluster, and a 17%
identical-embedding cluster. THE 100 TB hazard class: hot shuffle
keys, LSH/CC giant components, IVF cell blowup, and — the correctness
edge — sort-key ties introduced wherever an ORDER BY assumed a
remapped column was selective. Keys and FK integrity stay intact
(hot values are existing domain values; primary keys untouched).
Writes ADVERSARIAL_SWEEP.json at the repo root (override with
SPARK_GRAFT_ADV_OUT; --empty goes to EMPTY_SWEEP.json, --nonfinite to
NONFINITE_SWEEP.json, --skew to SKEW_SWEEP.json). Exit 1 on any
FAIL/MISMATCH.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

SRC = os.environ.get("SPARK_GRAFT_ADV_SRC", "/root/testdata/sf0.001")
DST = os.environ.get("SPARK_GRAFT_ADV_DIR", "/tmp/spark_graft_advdata")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def build_empty_dir() -> str:
    """Zero-row copies of every table (schemas preserved): the
    empty-partition robustness twin."""
    dst = os.environ.get(
        "SPARK_GRAFT_EMPTY_DIR", "/tmp/spark_graft_emptydata"
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') LIMIT 0)"
            f" TO '{os.path.join(dst, t + '.parquet')}' (FORMAT PARQUET)"
        )
    con.close()
    return dst


def build_nonfinite_dir() -> str:
    """NaN/±Infinity injected into events.value (disjoint key classes);
    every other table copied clean — the IEEE-edge robustness twin."""
    dst = os.environ.get(
        "SPARK_GRAFT_NONFINITE_DIR", "/tmp/spark_graft_nandata"
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT event_id, ts, user_id, event_type,
                     CASE WHEN event_id % 23 = 0 THEN 'NaN'::DOUBLE
                          WHEN event_id % 29 = 0 THEN 'Infinity'::DOUBLE
                          WHEN event_id % 31 = 0 THEN '-Infinity'::DOUBLE
                          ELSE value END AS value,
                     props
              FROM read_parquet('{SRC}/events.parquet'))
        TO '{os.path.join(dst, "events.parquet")}' (FORMAT PARQUET)
        """
    )
    con.close()
    for t in TABLES:
        if t != "events":
            shutil.copyfile(
                os.path.join(SRC, f"{t}.parquet"),
                os.path.join(dst, f"{t}.parquet"),
            )
    return dst


def build_skew_dir() -> str:
    """Heavy-hitter twin: deterministic key-modulus remaps onto EXISTING
    domain values (FK integrity preserved, primary keys untouched).
    Correctness question: do both engines still agree when the data is
    as skewed as a real 100 TB corpus — giant dedup clusters, hot join
    keys, and duplicate sort keys wherever an ORDER BY tiebreak quietly
    assumed the column was selective?"""
    dst = os.environ.get("SPARK_GRAFT_SKEW_DIR", "/tmp/spark_graft_skewdata")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # Hot values come from scalar subqueries over the source itself —
    # no Python-side string quoting (text may hold quotes/braces), and
    # every hot value is an EXISTING domain value by construction.
    mutations = {
        "events": f"""
            WITH h AS (SELECT min(user_id) AS u, min(event_type) AS et
                       FROM read_parquet('{SRC}/events.parquet'))
            SELECT event_id, ts,
                   CASE WHEN event_id % 5 < 2 THEN (SELECT u FROM h)
                        ELSE user_id END AS user_id,
                   CASE WHEN event_id % 3 = 0 THEN (SELECT et FROM h)
                        ELSE event_type END AS event_type,
                   value, props
            FROM read_parquet('{SRC}/events.parquet')
        """,
        "orders": f"""
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 4 = 0
                        THEN (SELECT min(o_custkey)
                              FROM read_parquet('{SRC}/orders.parquet'))
                        ELSE o_custkey END AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{SRC}/orders.parquet')
        """,
        "lineitem": f"""
            WITH h AS (SELECT min(l_partkey) AS p, min(l_suppkey) AS s
                       FROM read_parquet('{SRC}/lineitem.parquet'))
            SELECT l_orderkey,
                   CASE WHEN (l_orderkey * 10 + l_linenumber) % 4 = 0
                        THEN (SELECT p FROM h)
                        ELSE l_partkey END AS l_partkey,
                   CASE WHEN (l_orderkey * 10 + l_linenumber) % 3 = 0
                        THEN (SELECT s FROM h)
                        ELSE l_suppkey END AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{SRC}/lineitem.parquet')
        """,
        # 14% of docs collapse onto ONE exact text (giant dedup/CC/LSH
        # cluster); n_chars kept consistent with the substituted text.
        "documents": f"""
            WITH h AS (SELECT text AS t, lang, source
                       FROM read_parquet('{SRC}/documents.parquet')
                       ORDER BY doc_id LIMIT 1),
                 hl AS (SELECT min(lang) AS lg, min(source) AS src
                        FROM read_parquet('{SRC}/documents.parquet'))
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN (SELECT t FROM h)
                        ELSE text END AS text,
                   CASE WHEN doc_id % 4 = 0 THEN (SELECT lg FROM hl)
                        ELSE lang END AS lang,
                   CASE WHEN doc_id % 3 = 0 THEN (SELECT src FROM hl)
                        ELSE source END AS source,
                   CASE WHEN doc_id % 7 = 0
                        THEN length((SELECT t FROM h))
                        ELSE n_chars END AS n_chars
            FROM read_parquet('{SRC}/documents.parquet')
        """,
        # 17% identical vectors: one IVF cell (and one ANN result tie
        # class) holds a sixth of the corpus.
        "embeddings": f"""
            SELECT vec_id,
                   CASE WHEN vec_id % 6 = 0 THEN (
                       SELECT embedding
                       FROM read_parquet('{SRC}/embeddings.parquet')
                       ORDER BY vec_id LIMIT 1)
                        ELSE embedding END AS embedding,
                   label
            FROM read_parquet('{SRC}/embeddings.parquet')
        """,
    }
    for t in TABLES:
        dst_path = os.path.join(dst, f"{t}.parquet")
        if t in mutations:
            con.execute(
                f"COPY ({mutations[t]}) TO '{dst_path}' (FORMAT PARQUET)"
            )
        else:
            shutil.copyfile(os.path.join(SRC, f"{t}.parquet"), dst_path)
    con.close()
    return dst


def build_adversarial_dir() -> str:
    """Mutate a copy of sf0.001. Deterministic (key-modulus selectors,
    no RNG) so every run sweeps the identical twin. Keys and join
    columns stay non-null — the engine contract, like TPC-H's, assumes
    key integrity; the adversarial surface is measures, text, and time.
    """
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    mutations = {
        # NULL measure + NULL props + negated values + pre-epoch ts +
        # timestamp TIES (hour-truncated ts collides with siblings —
        # exercises every window's event_id tiebreak).
        "events": """
            SELECT event_id,
                   CASE WHEN event_id % 97 = 0
                        THEN ts - INTERVAL 56 YEARS
                        WHEN event_id % 101 = 0
                        THEN date_trunc('hour', ts) ELSE ts END AS ts,
                   user_id, event_type,
                   CASE WHEN event_id % 13 = 0 THEN NULL
                        WHEN event_id % 19 = 0 THEN -value
                        ELSE value END AS value,
                   CASE WHEN event_id % 17 = 0 THEN NULL ELSE props END AS props
            FROM read_parquet('{src}/events.parquet')
        """,
        # NULL lang / NULL source / empty + NULL text + unicode text +
        # whitespace runs (double/leading/trailing spaces make ''
        # tokens INSIDE token arrays — not just at the degenerate edge).
        "documents": """
            SELECT doc_id,
                   CASE WHEN doc_id % 29 = 0 THEN ''
                        WHEN doc_id % 31 = 0 THEN NULL
                        WHEN doc_id % 43 = 0
                        THEN 'héllo wörld 日本語 ' || text
                        WHEN doc_id % 47 = 0
                        THEN replace(text, ' the ', '  the ')
                        WHEN doc_id % 53 = 0 THEN ' ' || text || ' '
                        ELSE text END AS text,
                   CASE WHEN doc_id % 23 = 0 THEN NULL ELSE lang END AS lang,
                   CASE WHEN doc_id % 37 = 0 THEN NULL ELSE source END AS source,
                   CASE WHEN doc_id % 29 = 0 THEN 0
                        WHEN doc_id % 31 = 0 THEN NULL
                        ELSE n_chars END AS n_chars
            FROM read_parquet('{src}/documents.parquet')
        """,
        # NULL label (classifier/vote surface). Vectors stay well-formed:
        # a NULL embedding is a malformed-ingest bug upstream of the
        # engine contract, not an edge the oracles need to agree on.
        "embeddings": """
            SELECT vec_id, embedding,
                   CASE WHEN vec_id % 41 = 0 THEN NULL ELSE label END AS label
            FROM read_parquet('{src}/embeddings.parquet')
        """,
    }
    for t in TABLES:
        dst_path = os.path.join(DST, f"{t}.parquet")
        if t in mutations:
            con.execute(
                f"COPY ({mutations[t].format(src=SRC)}) TO '{dst_path}' (FORMAT PARQUET)"
            )
        else:
            shutil.copyfile(os.path.join(SRC, f"{t}.parquet"), dst_path)
    con.close()
    return DST


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    if len(df):
        df = df.sort_values(
            by=list(df.columns), kind="mergesort", na_position="last"
        ).reset_index(drop=True)
    return df


def compare(got: pd.DataFrame, want: pd.DataFrame) -> str | None:
    if list(got.columns) != list(want.columns):
        return f"cols {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return f"rows {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        kinds = {g.dtype.kind, w.dtype.kind}
        if kinds & {"i", "u"} and "f" in kinds:
            # the driver's hash is dtype-sensitive, but int-vs-float here
            # usually means NULL injection promoted one side to float64;
            # compare by value, flag only real value drift
            g, w = g.astype(float), w.astype(float)
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            g = pd.to_numeric(pd.Series(g), errors="coerce").to_numpy(dtype=float)
            w = pd.to_numeric(pd.Series(w), errors="coerce").to_numpy(dtype=float)
            ok = (np.isnan(g) & np.isnan(w)) | (g == w)
        else:
            ok = np.array(
                [a == b or (pd.isna(a) and pd.isna(b)) for a, b in zip(g, w)],
                dtype=bool,
            )
        if not ok.all():
            i = int(np.flatnonzero(~ok)[0])
            return (
                f"col {c}: {int((~ok).sum())} mismatches, first at row {i}: "
                f"spark={got[c].iloc[i]!r} duckdb={want[c].iloc[i]!r}"
            )
    return None


# Spark-vs-itself invariance axes: each is a runtime conf the cluster
# operator (or AQE itself) flips between runs of the SAME job, and none
# may change a single output row. width = how many partial aggregates
# exist and in what order they merge; aqe = runtime re-planning
# (coalescing, skew-split, join demotion); broadcast = join strategy
# (broadcast-hash vs sort-merge — a classic trap when an expression is
# non-deterministic and the strategies evaluate it a different number
# of times).
INVARIANCE_AXES: dict[str, tuple[str, str, str]] = {
    "width": ("spark.sql.shuffle.partitions", "8", "5"),
    "aqe": ("spark.sql.adaptive.enabled", "true", "false"),
    "broadcast": ("spark.sql.autoBroadcastJoinThreshold", "10485760", "-1"),
    # tz: the session timezone of the cluster a job happens to run on
    # must never leak into results — the testdata timestamps are NTZ
    # and every date/window derivation must stay wall-clock-naive, or
    # the same job scheduled in another region produces different rows
    # (America/New_York crosses a DST boundary over the data's range,
    # so an accidental NTZ→TZ→NTZ round-trip shifts by an hour).
    "tz": ("spark.sql.session.timeZone", "UTC", "America/New_York"),
}


def run_invariance(only: set[str] | None) -> int:
    """Spark-vs-itself sweep along one config axis (--axis width|aqe|
    broadcast, default width): every query runs twice in one session —
    once per axis value — and must produce EXACTLY equal frames.
    Catches merge-order-dependent reductions and plan-choice-dependent
    results independently of the oracle."""
    axis = "width"
    if "--axis" in sys.argv:
        axis = sys.argv[sys.argv.index("--axis") + 1]
    conf_key, val_a, val_b = INVARIANCE_AXES[axis]
    adv = (
        build_skew_dir()
        if "--skew" in sys.argv
        else build_empty_dir()
        if "--empty" in sys.argv
        else build_nonfinite_dir()
        if "--nonfinite" in sys.argv
        else SRC
    )
    print(f"invariance sweep over {adv}, axis {axis}: {conf_key}={val_a} vs {val_b}")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("invariance-sweep")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    import __spark_entry__ as e

    qs = e.queries()
    # the rows-only ids are documented approximations (HLL/GK sketches,
    # seeded sampling) — their contract is a pinned accuracy bound, not
    # bit-equality, and GK summary merges are legitimately order-
    # sensitive; the invariance contract covers the exact surface
    skipped = sorted(set(e.ROWS_ONLY_CONTRACT) & set(qs))
    print(f"skipping rows-only (bound, not bit-equality) ids: {skipped}")
    record: dict[str, dict] = {}
    bad: list[str] = []
    ids = sorted((set(qs) - set(skipped)) & (only or set(qs)))
    for qid in ids:
        t0 = time.time()
        try:
            spark.conf.set(conf_key, val_a)
            a = canon(qs[qid](spark, adv).toPandas())
            spark.conf.set(conf_key, val_b)
            b = canon(qs[qid](spark, adv).toPandas())
            err = compare(a, b)
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            err = f"EXC {type(ex).__name__}: {str(ex)[:240]}"
        finally:
            spark.conf.set(conf_key, val_a)
        dt = time.time() - t0
        if err:
            bad.append(qid)
            record[qid] = {"status": "DIVERGE", "err": err[:400]}
            print(f"  {qid:34s} DIVERGE {dt:5.1f}s  {err[:160]}")
        else:
            record[qid] = {"status": "MATCH", "sec": round(dt, 1)}
            print(f"  {qid:34s} MATCH   {dt:5.1f}s")

    out = os.environ.get(
        "SPARK_GRAFT_ADV_OUT", "/root/repo/INVARIANCE_SWEEP.json"
    )
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(
            {
                "src": adv,
                "mode": "invariance",
                "axis": axis,
                "conf": {conf_key: [val_a, val_b]},
                "n_ids": len(record),
                "n_match": len(record) - len(bad),
                "n_diverge": len(bad),
                "diverged": bad,
                "results": record,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    print(f"wrote {out}: {len(record) - len(bad)} MATCH / {len(bad)} DIVERGE")
    print("DIVERGED:", bad if bad else "none")
    return 1 if bad else 0


def main() -> int:
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    if "--invariance" in sys.argv:
        return run_invariance(only)
    mode = (
        "empty"
        if "--empty" in sys.argv
        else "nonfinite"
        if "--nonfinite" in sys.argv
        else "skew"
        if "--skew" in sys.argv
        else "adversarial"
    )
    adv = {
        "empty": build_empty_dir,
        "nonfinite": build_nonfinite_dir,
        "skew": build_skew_dir,
        "adversarial": build_adversarial_dir,
    }[mode]()
    print(f"{mode} twin at {adv}")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("adversarial-sweep")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{adv}/{t}.parquet')"
        )

    record: dict[str, dict] = {}
    bad: list[str] = []
    ids = sorted(set(oracles) & (only or set(oracles)))
    for qid in ids:
        t0 = time.time()
        try:
            got = canon(qs[qid](spark, adv).toPandas())
            want = canon(con.sql(oracles[qid]).df())
            err = compare(got, want)
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            err = f"EXC {type(ex).__name__}: {str(ex)[:240]}"
        dt = time.time() - t0
        if err:
            bad.append(qid)
            record[qid] = {"status": "DIVERGE", "err": err[:400]}
            print(f"  {qid:34s} DIVERGE {dt:5.1f}s  {err[:160]}")
        else:
            record[qid] = {"status": "MATCH", "sec": round(dt, 1)}
            print(f"  {qid:34s} MATCH   {dt:5.1f}s")

    out = os.environ.get(
        "SPARK_GRAFT_ADV_OUT",
        {
            "empty": "/root/repo/EMPTY_SWEEP.json",
            "nonfinite": "/root/repo/NONFINITE_SWEEP.json",
            "skew": "/root/repo/SKEW_SWEEP.json",
            "adversarial": "/root/repo/ADVERSARIAL_SWEEP.json",
        }[mode],
    )
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(
            {
                "src": SRC,
                "mode": mode,
                "n_ids": len(record),
                "n_match": len(record) - len(bad),
                "n_diverge": len(bad),
                "diverged": bad,
                "results": record,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    print(f"wrote {out}: {len(record) - len(bad)} MATCH / {len(bad)} DIVERGE")
    print("DIVERGED:", bad if bad else "none")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

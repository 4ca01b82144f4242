"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the contract described in __spark_entry__: row count, column
names (sorted), and order-insensitive value equality. Runs at sf0.001
in pytest so oracle drift is caught before the driver's sf0.01 gate.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from flink_kafka_replicator_spark.io import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            df[c] = s.dt.tz_convert("UTC").dt.tz_localize(None)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    got = _canonical(spark_df.toPandas())
    want = _canonical(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch:\n spark={list(got.columns)}\n duckdb={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} duckdb={len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        # The driver's value-hash is dtype-sensitive: an integer column on
        # one side and float on the other (e.g. DuckDB HUGEINT SUM →
        # float64 via pandas) hash-mismatches even when 2 == 2.0. Predict
        # that here instead of letting Python == paper over it.
        kinds = {g.dtype.kind, w.dtype.kind}
        if kinds & {"i", "u"} and "f" in kinds:
            raise AssertionError(
                f"dtype-kind mismatch in column {c!r}: spark={g.dtype} "
                f"duckdb={w.dtype} — integer vs float hashes differently in "
                f"the driver; CAST the oracle aggregate (e.g. AS BIGINT)"
            )
        # Same trap for DATE columns: Spark DATE lands as python date
        # objects (kind 'O'), DuckDB DATE as datetime64 (kind 'M') — the
        # astype below would silently equate them, but the driver's hash
        # does not. Emit midnight TIMESTAMPs on both sides instead.
        if kinds == {"M", "O"}:
            raise AssertionError(
                f"dtype-kind mismatch in column {c!r}: spark={g.dtype} "
                f"duckdb={w.dtype} — a DATE on one side vs TIMESTAMP on the "
                f"other hashes differently in the driver; cast both to "
                f"TIMESTAMP (midnight) or both to DATE"
            )
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            g = g.astype(np.float64)
            w = w.astype(np.float64)
            both_nan = np.isnan(g) & np.isnan(w)
            ok = both_nan | (g == w)
        elif g.dtype.kind == "M" or w.dtype.kind == "M":
            gm = pd.Series(g).astype("datetime64[us]").to_numpy()
            wm = pd.Series(w).astype("datetime64[us]").to_numpy()
            ok = (np.isnat(gm) & np.isnat(wm)) | (gm == wm)
        else:
            gs = pd.Series(g).astype(object).where(pd.Series(g).notna(), None)
            ws = pd.Series(w).astype(object).where(pd.Series(w).notna(), None)
            ok = np.array([a == b for a, b in zip(gs, ws, strict=True)])
        if not bool(np.all(ok)):
            bad = int(np.argmin(ok))
            raise AssertionError(
                f"value mismatch in column {c!r} at sorted row {bad}: "
                f"spark={got[c].iloc[bad]!r} duckdb={want[c].iloc[bad]!r} "
                f"({int((~ok).sum())} mismatching rows)"
            )

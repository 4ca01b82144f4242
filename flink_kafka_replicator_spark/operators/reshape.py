"""Reshape + API-surface coverage: unpivot (melt), collect_set
aggregation, bitwise functions, URL parsing, window value frames
(first/last/nth), SQL LATERAL join, and applyInPandas grouped-map.

All oracle-backed. The grouped-map z-score demonstrates the
``groupBy().applyInPandas`` path (Arrow-batched, one pandas frame per
group) that a training pipeline uses for per-stratum normalization;
everything else is JVM-side built-ins.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table


def unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of the lineitem charge columns (Spark ``unpivot``,
    the relational MELT operator): one row per (line, metric)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    ).select(
        "l_orderkey", "l_linenumber", "metric", F.round("val", 4).alias("val")
    )


def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-valued aggregation projected to a stable scalar: the sorted
    distinct status list per priority (array_join pins cross-engine
    comparability; raw array columns don't hash stably)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.count_distinct("o_orderstatus").alias("n_statuses"),
        F.count("*").alias("n_orders"),
    )


def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("b_and"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("b_or"),
        F.col("event_id").bitwiseXOR(F.lit(1535)).alias("b_xor"),
        F.shiftleft(F.col("event_id"), 2).alias("b_shl"),
        F.shiftright(F.col("event_id"), 2).alias("b_shr"),
        F.bit_count(F.col("event_id")).alias("b_pop"),
    )


def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url over a synthesized URL column; the oracle reconstructs
    host/path/query-param from the source parts, so Spark's parser is
    checked against ground truth rather than another parser."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc?id="),
        F.col("doc_id").cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("url_host"),
        F.parse_url(url, F.lit("PATH")).alias("url_path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("url_qid"),
    )


def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit full-frame
    window (ROWS UNBOUNDED PRECEDING..FOLLOWING — last_value under the
    default frame is a classic wrong-answer trap in both engines)."""
    ev = load_table(spark, sf_dir, "events")
    w_full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.first("value").over(w_full), 4).alias("first_v"),
        F.round(F.last("value").over(w_full), 4).alias("last_v"),
        F.round(F.nth_value("value", 2).over(w_full), 4).alias("second_v"),
    )


def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    SQL-surface twin of topk_per_group (Catalyst rewrites it to a
    DomainJoin; no driver-side iteration)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
               ROUND(t.o_totalprice, 4) AS top_price
        FROM customer c
        JOIN LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 2
        ) t
        """
    )


ZSCORE_SCHEMA = "doc_id bigint, lang string, z_raw double"


def _zscore_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    mean = pdf["n_chars"].mean()
    std = pdf["n_chars"].std(ddof=1)  # sample stddev == stddev_samp
    if pd.isna(std) or std == 0.0:
        z = pd.Series([None] * len(pdf), dtype="float64")
    else:
        z = (pdf["n_chars"] - mean) / std
    return pd.DataFrame({"doc_id": pdf["doc_id"], "lang": pdf["lang"], "z_raw": z})


def grouped_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score of document length via groupBy().applyInPandas
    — the grouped-map Pandas-UDF path (one Arrow batch per group). The
    per-stratum normalization move; rounding happens Spark-side so both
    engines round the same double."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "lang", "n_chars")
        .groupBy("lang")
        .applyInPandas(_zscore_fn, ZSCORE_SCHEMA)
        .select("doc_id", "lang", F.round("z_raw", 4).alias("z_chars"))
    )


def grouped_zscore_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score via built-in window functions — the
    PRODUCTION twin of grouped_zscore_pandas. Same result, but the
    plan is one hash exchange + codegen'd window aggregates: no Arrow
    transfer and no whole-group pandas frame on one executor, so a hot
    stratum (one language = 40% of a 100 TB corpus) streams through the
    window operator instead of materializing in executor memory."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang")
    return d.select(
        "doc_id",
        "lang",
        F.round(
            (F.col("n_chars") - F.avg("n_chars").over(w))
            / F.stddev_samp("n_chars").over(w),
            4,
        ).alias("z_chars"),
    )


def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: try_divide / try_multiply / try_cast return
    NULL instead of raising under Spark 4's default ANSI mode — the
    dirty-data-tolerant path a large-scale pipeline needs (one bad row
    must not kill a 100 TB job)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # floor-quantized, not ROUND: the two engines' ROUND tie-breaks
        # differ on division results; floor(x*1e4) is IEEE-deterministic
        F.floor(
            F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25.0)
            * 10000
        ).alias("ppe_e4"),
        F.round(F.try_multiply(F.col("l_extendedprice"), F.lit(2.0)), 4).alias(
            "price_x2"
        ),
        F.expr("try_cast(l_returnflag AS INT)").alias("flag_as_int"),
    )


def time_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time rollup: one pass producing aggregates at
    every granularity of the year→month→day hierarchy (ROLLUP expands to
    grouping sets; partial aggregation combines map-side, so the shuffle
    carries one row per (grain, bucket), not per event)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
            "value",
        )
        .rollup("y", "m", "d")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


QUERIES = {
    "fn_try_arith": fn_try_arith,
    "time_rollup_hierarchy": time_rollup_hierarchy,
    "unpivot_lineitem": unpivot_lineitem,
    "agg_collect_set": agg_collect_set,
    "fn_bitwise": fn_bitwise,
    "fn_url": fn_url,
    "window_first_last": window_first_last,
    "sql_lateral_topk": sql_lateral_topk,
    "grouped_zscore_pandas": grouped_zscore_pandas,
    "grouped_zscore_window": grouped_zscore_window,
}

ORACLES = {
    "fn_try_arith": """
        SELECT l_orderkey, l_linenumber,
               CAST(FLOOR(CASE WHEN l_quantity - 25.0 = 0 THEN NULL
                               ELSE l_extendedprice / (l_quantity - 25.0) END
                          * 10000) AS BIGINT) AS ppe_e4,
               ROUND(l_extendedprice * 2.0, 4) AS price_x2,
               TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int
        FROM lineitem
    """,
    "time_rollup_hierarchy": """
        SELECT CAST(YEAR(ts) AS INTEGER)  AS y,
               CAST(MONTH(ts) AS INTEGER) AS m,
               CAST(DAY(ts) AS INTEGER)   AS d,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM events
        GROUP BY ROLLUP (1, 2, 3)
        -- vacuous on non-empty data; pins Spark's no-rows-on-empty
        -- ROLLUP semantics (see agg_rollup)
        HAVING COUNT(*) > 0
    """,
    "unpivot_lineitem": """
        SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS metric,
               ROUND(l_extendedprice, 4) AS val FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount',
               ROUND(l_discount, 4) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax',
               ROUND(l_tax, 4) FROM lineitem
    """,
    "agg_collect_set": """
        SELECT o_orderpriority,
               array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
                   AS statuses,
               COUNT(DISTINCT o_orderstatus) AS n_statuses,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    "fn_bitwise": """
        SELECT event_id,
               event_id & 255    AS b_and,
               event_id | 4096   AS b_or,
               xor(event_id, 1535) AS b_xor,
               event_id << 2     AS b_shl,
               event_id >> 2     AS b_shr,
               CAST(bit_count(event_id) AS INTEGER) AS b_pop
        FROM events
    """,
    "fn_url": """
        -- a NULL source or lang NULLs the whole synthesized URL (Spark
        -- CONCAT is NULL-poisoning), so every parsed field is NULL -
        -- the ground-truth reconstruction must gate on BOTH parts
        SELECT doc_id,
               CASE WHEN source IS NOT NULL AND lang IS NOT NULL
                    THEN source || '.example.com' END AS url_host,
               CASE WHEN source IS NOT NULL AND lang IS NOT NULL
                    THEN '/' || lang || '/doc' END    AS url_path,
               CASE WHEN source IS NOT NULL AND lang IS NOT NULL
                    THEN CAST(doc_id AS VARCHAR) END  AS url_qid
        FROM documents
    """,
    "window_first_last": """
        SELECT event_id, user_id,
               ROUND(first_value(value) OVER w, 4) AS first_v,
               ROUND(last_value(value)  OVER w, 4) AS last_v,
               ROUND(nth_value(value, 2) OVER w, 4) AS second_v
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
    """,
    "sql_lateral_topk": """
        SELECT c.c_custkey, t.o_orderkey,
               ROUND(t.o_totalprice, 4) AS top_price
        FROM customer c
        JOIN LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 2
        ) t ON TRUE
    """,
    "grouped_zscore_pandas": """
        SELECT doc_id, lang,
               ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
                     / STDDEV_SAMP(n_chars) OVER (PARTITION BY lang), 4)
                   AS z_chars
        FROM documents
    """,
    "grouped_zscore_window": """
        SELECT doc_id, lang,
               ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
                     / STDDEV_SAMP(n_chars) OVER (PARTITION BY lang), 4)
                   AS z_chars
        FROM documents
    """,
}

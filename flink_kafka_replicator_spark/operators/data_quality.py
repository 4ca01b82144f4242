"""Data-quality auditing: the checks a pipeline runs before trusting a
100 TB batch — referential integrity across tables and single-pass
column profiling. Both are plain aggregations/joins (one shuffle each),
cheap enough to gate every ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key audit across the TPC-H-ish schema: orphaned rows per
    relationship (child keys with no parent), as one union'd report.
    Each check is a left-anti join + count — at scale the parent key
    sets are dimension-sized and broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")

    def orphans(child, child_key, parent, parent_key, name):
        return (
            child.join(
                parent.select(F.col(parent_key).alias(child_key)),
                child_key,
                "left_anti",
            )
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(name).alias("relationship"), "n_orphans")
        )

    return (
        orphans(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionByName(orphans(li, "l_suppkey", s, "s_suppkey", "lineitem->supplier"))
        .unionByName(orphans(li, "l_partkey", p, "p_partkey", "lineitem->part"))
        .unionByName(orphans(o, "o_custkey", c, "c_custkey", "orders->customer"))
    )


def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of orders: row count, nulls, distinct
    counts, and value bounds — every statistic in ONE aggregate (one
    scan, one reduce), the shape that keeps profiling affordable at
    100 TB. Long/melted output: one row per profiled column."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("nulls_custkey"),
        F.count_distinct("o_custkey").alias("distinct_custkey"),
        F.count_distinct("o_orderstatus").alias("distinct_status"),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )
    # melt to (metric, value) strings so the report is schema-stable as
    # profiled columns are added
    cols = [
        "n_rows",
        "nulls_custkey",
        "distinct_custkey",
        "distinct_status",
        "min_price",
        "max_price",
        "min_date",
        "max_date",
    ]
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("metric"), F.col(c).cast("string").alias("value")
            )
            for c in cols
        ]
    )
    return agg.select(F.explode(pairs).alias("kv")).select(
        F.col("kv.metric").alias("metric"), F.col("kv.value").alias("value")
    )


def dq_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-entity anomaly detection: median/MAD outlier counts of
    each user's event values (|x − med| > 3·1.4826·MAD, the normal-
    consistent robust z-score). The per-ENTITY grouping is the scale
    design: user_id is high-cardinality with bounded per-group size, so
    exact percentiles stay cheap per group — a 5-value key (event_type)
    would buffer a fifth of the corpus per group instead.

    Shape: two chained percentile windows (median, then MAD over the
    bound median) + the final per-user collapse, all sharing ONE user_id
    exchange — the funnel_stages pattern."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select("user_id", "value")
    w = Window.partitionBy("user_id")
    d1 = e.withColumn("med", F.expr("percentile(value, 0.5D)").over(w))
    d2 = d1.withColumn(
        "mad", F.expr("percentile(abs(value - med), 0.5D)").over(w)
    )
    return (
        d2.groupBy("user_id", "med", "mad")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                (F.abs(F.col("value") - F.col("med"))
                 > 3 * 1.4826 * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
        .select(
            "user_id",
            "n_events",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n_outliers",
        )
    )


QUERIES = {
    "dq_referential_integrity": dq_referential_integrity,
    "dq_profile": dq_profile,
    "dq_outlier_mad": dq_outlier_mad,
}

ORACLES = {
    "dq_referential_integrity": """
        SELECT 'lineitem->orders' AS relationship,
               COUNT(*) AS n_orphans
        FROM lineitem l WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'lineitem->supplier', COUNT(*)
        FROM lineitem l WHERE NOT EXISTS (
            SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
        UNION ALL
        SELECT 'lineitem->part', COUNT(*)
        FROM lineitem l WHERE NOT EXISTS (
            SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        UNION ALL
        SELECT 'orders->customer', COUNT(*)
        FROM orders o WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
    "dq_profile": """
        WITH a AS (
            SELECT COUNT(*) AS n_rows,
                   SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nulls_custkey,
                   COUNT(DISTINCT o_custkey) AS distinct_custkey,
                   COUNT(DISTINCT o_orderstatus) AS distinct_status,
                   ROUND(MIN(o_totalprice), 4) AS min_price,
                   ROUND(MAX(o_totalprice), 4) AS max_price,
                   MIN(o_orderdate) AS min_date,
                   MAX(o_orderdate) AS max_date
            FROM orders
        )
        SELECT 'n_rows' AS metric, CAST(n_rows AS VARCHAR) AS value FROM a
        UNION ALL SELECT 'nulls_custkey', CAST(nulls_custkey AS VARCHAR) FROM a
        UNION ALL SELECT 'distinct_custkey', CAST(distinct_custkey AS VARCHAR) FROM a
        UNION ALL SELECT 'distinct_status', CAST(distinct_status AS VARCHAR) FROM a
        UNION ALL SELECT 'min_price', CAST(min_price AS VARCHAR) FROM a
        UNION ALL SELECT 'max_price', CAST(max_price AS VARCHAR) FROM a
        UNION ALL SELECT 'min_date', CAST(min_date AS VARCHAR) FROM a
        UNION ALL SELECT 'max_date', CAST(max_date AS VARCHAR) FROM a
    """,
    "dq_outlier_mad": """
        WITH m AS (
            SELECT user_id, value,
                   quantile_cont(value, 0.5)
                       OVER (PARTITION BY user_id) AS med
            FROM events
        ),
        d AS (
            SELECT user_id, value, med,
                   quantile_cont(abs(value - med), 0.5)
                       OVER (PARTITION BY user_id) AS mad
            FROM m
        )
        SELECT user_id,
               COUNT(*) AS n_events,
               ROUND(med, 4) AS med,
               ROUND(mad, 4) AS mad,
               CAST(SUM(CASE WHEN abs(value - med) > 3 * 1.4826 * mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM d
        GROUP BY user_id, med, mad
    """,
}

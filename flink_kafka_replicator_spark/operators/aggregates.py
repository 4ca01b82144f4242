"""Aggregation operators: hash aggregate, distinct agg, rollup, approx.

All built-in Catalyst operators — partial (map-side) aggregation, AQE
partition coalescing and codegen come for free. Float aggregates are
wrapped in round(x, 4) on both the Spark and oracle side for
hash-stable comparison (SURVEY.md §2.5 rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

# TPC-H Q1 cutoff adapted to the synthetic data's 1995..2001 shipdate range.
Q1_CUTOFF = "1998-09-02"


def agg_hash_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filtered multi-aggregate hash groupBy on lineitem.

    The flagship query — exercises scan → pushed filter → project →
    partial agg → shuffle on (returnflag, linestatus) → final agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate (expands to a two-phase plan under Catalyst)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count("*").alias("n_orders"),
    )


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets rollup over (returnflag, linestatus)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count("*").alias("n_items"),
    )


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate count-distinct (rows-only check:
    approximation differs across engines by design)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count("*").alias("n_items"),
    )


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev/variance, correlation and
    covariance — single hash aggregate, partial moments combine
    map-side like any algebraic agg. Normalized statistics (corr) and
    ~1e4-magnitude moments round stably to 4 dp across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 4).alias("cov_pd"),
        F.count("*").alias("n"),
    )


def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the GK/KLL-style sketch
    (percentile_approx, accuracy=1000) — the mergeable-sketch path a
    100 TB percentile needs (exact percentile sorts every group).
    Rows-only for the driver (sketch internals differ across engines);
    pytest pins the rank-error bound against the exact percentile."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50_approx"),
        F.percentile_approx("l_extendedprice", 0.95, 1000).alias("p95_approx"),
        F.count("*").alias("n_items"),
    )


def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (Apache DataSketches HLL via
    hll_sketch_agg/hll_union_agg): per-group sketches estimated, plus
    the cross-group UNION re-estimated — the incremental pattern a
    100 TB pipeline needs (sketch each day/partition once, union
    later; never re-scan history for a new rollup). Rows-only for the
    driver (sketch internals are engine-specific); pytest pins the
    estimates against exact counts."""
    li = load_table(spark, sf_dir, "lineitem")
    sk = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk"),
        F.count("*").alias("n_items"),
    )
    per_group = sk.select(
        "l_returnflag",
        F.hll_sketch_estimate("sk").alias("distinct_est"),
        "n_items",
    )
    total = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_est"),
        F.sum("n_items").alias("n_items"),
    ).select(F.lit("__union__").alias("l_returnflag"), "distinct_est", "n_items")
    return per_group.unionByName(total)


QUERIES = {
    "agg_stats": agg_stats,
    "agg_hash_groupby": agg_hash_groupby,
    "agg_distinct": agg_distinct,
    "agg_rollup": agg_rollup,
    "agg_approx_distinct": agg_approx_distinct,
    "agg_percentile_approx": agg_percentile_approx,
    "agg_hll_sketch_union": agg_hll_sketch_union,
}

ORACLES = {
    "agg_stats": """
        SELECT l_returnflag,
               ROUND(STDDEV_SAMP(l_extendedprice), 4) AS sd_price,
               ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
               ROUND(CORR(l_extendedprice, l_quantity), 4) AS corr_pq,
               ROUND(COVAR_SAMP(l_extendedprice, l_discount), 4) AS cov_pd,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "agg_hash_groupby": f"""
        SELECT l_returnflag,
               l_linestatus,
               ROUND(SUM(l_quantity), 4)      AS sum_qty,
               ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
               ROUND(AVG(l_quantity), 4)      AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 4)      AS avg_disc,
               COUNT(*)                       AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "agg_distinct": """
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey) AS n_cust,
               COUNT(*)                  AS n_orders
        FROM orders
        GROUP BY o_orderstatus
    """,
    "agg_rollup": """
        SELECT l_returnflag,
               l_linestatus,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               COUNT(*)                  AS n_items
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
}

"""Set operations: UNION ALL / INTERSECT (distinct) / EXCEPT ALL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (Spark ``union`` is bag semantics) of two id streams."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.lit("customer").alias("side")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("id"), F.lit("orders").alias("side")
    )
    return c.union(o)


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of customer keys present in both tables."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("id"))
    return c.intersect(o)


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference): order custkeys minus customer keys,
    multiplicity-aware."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("id"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    return o.exceptAll(c)


QUERIES = {
    "set_union": set_union,
    "set_intersect": set_intersect,
    "set_except": set_except,
}

ORACLES = {
    "set_union": """
        SELECT c_custkey AS id, 'customer' AS side FROM customer
        UNION ALL
        SELECT o_custkey AS id, 'orders' AS side FROM orders
    """,
    "set_intersect": """
        SELECT c_custkey AS id FROM customer
        INTERSECT
        SELECT o_custkey AS id FROM orders
    """,
    "set_except": """
        SELECT o_custkey AS id FROM orders
        EXCEPT ALL
        SELECT c_custkey AS id FROM customer
    """,
}

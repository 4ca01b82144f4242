"""Bucketed co-located joins: the pre-shuffle data layout that turns
the biggest fact⋈fact join at 100 TB into a shuffle-free local join.

Broadcast handles small dims; skew-salting handles hot keys; BUCKETING
handles the remaining case — two huge tables repeatedly joined on the
same key. Writing both sides bucketed (and sorted) by the join key
moves the shuffle to write time, once, instead of every query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_kafka_replicator_spark.plans import exchange_count, formatted_plan


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # warehouse.dir is a static conf on a live session; external bucketed
    # tables (explicit path) keep the metastore entries but put data in tmp
    wh = str(tmp_path_factory.mktemp("warehouse"))
    from flink_kafka_replicator_spark.io import load_table

    n_buckets = 8
    (
        load_table(spark, sf_dir, "lineitem")
        .write.bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{wh}/lineitem_b")
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    (
        load_table(spark, sf_dir, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{wh}/orders_b")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    yield "lineitem_b", "orders_b"
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    """Join of two same-bucketed tables on the bucket key must plan with
    ZERO exchanges — bucket co-location replaces the shuffle."""
    li, od = bucketed_tables
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(li).join(spark.table(od), "l_orderkey").select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan, plan
        assert exchange_count(j) == 0, (
            f"bucketed join must not shuffle:\n{plan}"
        )
        # correctness: same result as the plain shuffled join
        n_plain = (
            spark.table(li)
            .join(spark.table(od).hint("shuffle_merge"), "l_orderkey")
            .count()
        )
        assert j.count() == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_bucketed_aggregation_avoids_exchange(spark, bucketed_tables):
    """groupBy on the bucket key reuses the bucket distribution — the
    partial/final aggregate runs without a shuffle."""
    li, _ = bucketed_tables
    agg = spark.table(li).groupBy("l_orderkey").agg(
        F.round(F.sum("l_quantity"), 4).alias("qty")
    )
    assert exchange_count(agg) == 0, formatted_plan(agg)

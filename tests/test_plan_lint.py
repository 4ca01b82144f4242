"""Behavior pins for plans.lint_plan — the product-facing plan linter.

Crafted plans, one per classification rule, so the detector's contract
is pinned independently of the registry sweep (tests/plan_audit.py):
a keyless global aggregate must NOT flag (its SinglePartition exchange
is the correct distributed plan), an unpartitioned window MUST flag,
a crossJoin of two open tables must flag cartesian, and a clean
grouped aggregate must flag nothing.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_kafka_replicator_spark.plans import lint_plan


def _events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_global_keyless_aggregate_is_clean(spark):
    df = _events(spark).agg(F.count("*").alias("n"))
    assert lint_plan(df) == {}


def test_grouped_aggregate_is_clean(spark):
    df = _events(spark).groupBy("event_type").agg(F.count("*").alias("n"))
    assert lint_plan(df) == {}


def test_unpartitioned_window_flags_single_part(spark):
    w = Window.partitionBy(F.lit(1)).orderBy("ts")
    df = _events(spark).select("event_id", F.row_number().over(w).alias("r"))
    hits = lint_plan(df)
    assert hits.get("single_part", 0) >= 1, hits


def test_cross_join_flags(spark):
    ev = _events(spark).select("event_id")
    df = ev.crossJoin(ev.select(F.col("event_id").alias("b")))
    hits = lint_plan(df)
    # Spark plans an un-broadcast cross join as CartesianProduct; if
    # either side is small enough for auto-broadcast it becomes BNL —
    # both are flagged shapes, and for an open-cardinality self-join
    # neither survives scale
    assert hits.get("cartesian", 0) + hits.get("bnl", 0) >= 1, hits


def test_one_row_broadcast_epilogue_flags_as_bnl_only(spark):
    ev = _events(spark)
    bound = ev.agg(F.max("value").alias("vmax"))
    df = ev.crossJoin(F.broadcast(bound)).select(
        "event_id", (F.col("value") / F.col("vmax")).alias("share")
    )
    hits = lint_plan(df)
    # the engine's scalar-broadcast idiom: shows up as bnl (allowlisted
    # per id in the registry audit), never as cartesian or single_part
    assert "cartesian" not in hits and "single_part" not in hits, hits

"""Plan-shape tests: pin the physical properties that matter at scale.

These fail if a future change silently regresses a broadcast join into
a shuffle join, drops filter pushdown, or introduces a cartesian
product into an LSH pipeline."""

from __future__ import annotations

from flink_kafka_replicator_spark.operators.aggregates import agg_hash_groupby
from flink_kafka_replicator_spark.operators.joins import join_broadcast, join_range
from flink_kafka_replicator_spark.operators.replication import topic_pattern_filter
from flink_kafka_replicator_spark.operators.windows import topk_orders
from flink_kafka_replicator_spark.functions.pipeline_queries import (
    dedup_fuzzy_minhash,
    sim_topk_ivf,
)
import re

from flink_kafka_replicator_spark.plans import (
    exchange_count,
    executed_plan,
    formatted_plan,
    plan_contains,
    pushed_filters,
)


def test_q1_filter_reaches_parquet_scan(spark, sf_dir):
    df = agg_hash_groupby(spark, sf_dir)
    pushed = pushed_filters(df)
    assert any("l_shipdate" in f for f in pushed), f"no shipdate pushdown: {pushed}"
    plan = formatted_plan(df)
    assert "ReadSchema" in plan
    # column pruning: untouched wide columns must not be read
    assert "l_comment" not in plan


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    plan = formatted_plan(agg_hash_groupby(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, "expected partial+final hash aggregate"


def test_broadcast_join_is_broadcast(spark, sf_dir):
    assert plan_contains(join_broadcast(spark, sf_dir), "BroadcastHashJoin")


def test_range_join_broadcasts_tiny_side(spark, sf_dir):
    plan = formatted_plan(join_range(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_topk_compiles_to_take_ordered(spark, sf_dir):
    assert plan_contains(topk_orders(spark, sf_dir), "TakeOrderedAndProject")


def test_regex_source_selection_pushdown(spark, sf_dir):
    df = topic_pattern_filter(spark, sf_dir)
    plan = formatted_plan(df)
    # rlike itself can't push to parquet, but the not-null guard must, and
    # the filter must sit directly on the scan (no shuffle before it)
    assert "Exchange" not in plan.split("Filter")[0], "filter must precede any exchange"


def test_lsh_pipelines_have_no_cartesian_product(spark, sf_dir):
    for q in (dedup_fuzzy_minhash, sim_topk_ivf):
        plan = formatted_plan(q(spark, sf_dir))
        assert "CartesianProduct" not in plan, f"{q.__name__} regressed to cartesian"


def test_asof_join_single_shuffle_no_pair_explosion(spark, sf_dir):
    from flink_kafka_replicator_spark.operators.advanced import join_asof

    plan = formatted_plan(join_asof(spark, sf_dir))
    # the union trick: one keyed exchange feeding the window, and never a
    # range-join (BNLJ/cartesian) pair explosion
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert exchange_count(join_asof(spark, sf_dir)) == 1, (
        f"as-of join must shuffle exactly once on the key, got:\n{plan}"
    )
    assert "Window" in plan


def test_topk_per_group_no_global_sort(spark, sf_dir):
    from flink_kafka_replicator_spark.operators.advanced import topk_per_group

    plan = formatted_plan(topk_per_group(spark, sf_dir))
    assert exchange_count(topk_per_group(spark, sf_dir)) == 1, (
        "one hash exchange on the group key"
    )
    # the only sort is the per-partition window sort, no global ordering
    assert "rangepartitioning" not in plan.lower(), "global sort leaked into plan"
    # Spark pushes the rank limit below the exchange: each map task emits
    # at most k rows per group before shuffling
    assert "WindowGroupLimit" in plan


def test_salted_agg_partials_collapse_before_shuffle(spark, sf_dir):
    from flink_kafka_replicator_spark.operators.advanced import agg_salted_skew

    plan = formatted_plan(agg_salted_skew(spark, sf_dir))
    # two-phase: salted partial agg + final combine, each with map-side
    # partial aggregation (4 HashAggregate nodes), exactly two exchanges
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) == 4
    assert exchange_count(agg_salted_skew(spark, sf_dir)) == 2


def test_whole_stage_codegen_active(spark, sf_dir):
    from flink_kafka_replicator_spark.plans import codegen_stage_count

    assert codegen_stage_count(agg_hash_groupby(spark, sf_dir)) >= 2, (
        "partial and final agg should each run inside a codegen span"
    )

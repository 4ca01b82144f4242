"""Stream-stream interval join: micro-batch runs vs the batch equivalent."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from flink_kafka_replicator_spark.streaming.joins import interval_join_clicks_to_views
from tests.streamutil import drain

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, value double"
BASE = dt.datetime(2024, 1, 1)


def _rows(spec):
    # spec: list of (event_id, seconds_offset, user_id)
    return [
        Row(event_id=i, ts=BASE + dt.timedelta(seconds=s), user_id=u, value=float(i))
        for i, s, u in spec
    ]


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_interval_join_matches_batch_semantics(spark, tmp_path):
    clicks_dir, views_dir = str(tmp_path / "clicks"), str(tmp_path / "views")
    # user 1: views at t=0,100; clicks at t=120 (view@100 within 5 min,
    # view@0 also within 300s) and t=500 (only view@290 in range)
    _write(spark, views_dir, _rows([(1, 0, 1), (2, 100, 1), (3, 290, 1), (4, 0, 2)]))
    _write(spark, clicks_dir, _rows([(10, 120, 1), (11, 500, 1), (12, 600, 3)]))

    clicks = spark.readStream.schema(SCHEMA).parquet(clicks_dir)
    views = spark.readStream.schema(SCHEMA).parquet(views_dir)
    out = str(tmp_path / "out")
    q = (
        interval_join_clicks_to_views(clicks, views)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    got = {
        (r.click_id, r.view_id) for r in spark.read.parquet(out).collect()
    }
    # click 10 (t=120): views 1 (t=0) and 2 (t=100) both within 300 s before
    # click 11 (t=500): only view 3 (t=290) in [200, 500]
    # click 12: user 3 has no views
    assert got == {(10, 1), (10, 2), (11, 3)}, got


def test_interval_join_batch_plan_is_same_code(spark, tmp_path):
    """The unified model: the identical function works on batch frames."""
    clicks = spark.createDataFrame(_rows([(10, 120, 1)]), SCHEMA)
    views = spark.createDataFrame(_rows([(1, 0, 1), (2, 400, 1)]), SCHEMA)
    got = interval_join_clicks_to_views(clicks, views).collect()
    assert [(r.click_id, r.view_id) for r in got] == [(10, 1)]


def test_left_outer_interval_join_emits_unmatched_after_watermark(spark, tmp_path):
    """Clicks with no view in the window emit null-padded once the
    watermark passes their join bound (watermark-driven, so a far-future
    event in a later micro-batch is what releases them)."""
    from flink_kafka_replicator_spark.streaming.joins import (
        left_outer_interval_join_clicks_to_views,
    )

    clicks_dir, views_dir = str(tmp_path / "clicks"), str(tmp_path / "views")
    # user 1 click has a matching view; user 3 click has none
    _write(spark, views_dir, _rows([(1, 100, 1)]))
    _write(spark, clicks_dir, _rows([(10, 120, 1), (12, 130, 3)]))
    # watermark drivers in a second file → second micro-batch pushes the
    # watermark far past click_ts + gap on BOTH sides, releasing user 3
    _write(spark, views_dir, _rows([(98, 90000, 9)]))
    _write(spark, clicks_dir, _rows([(99, 90000, 9)]))

    clicks = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(clicks_dir)
    views = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(views_dir)
    out = str(tmp_path / "out")
    q = (
        left_outer_interval_join_clicks_to_views(clicks, views)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    got = {(r.click_id, r.view_id) for r in spark.read.parquet(out).collect()}
    assert (10, 1) in got, f"matched pair missing: {got}"
    assert (12, None) in got, f"unmatched click not emitted: {got}"


def test_semi_interval_join_no_pair_expansion(spark, tmp_path):
    """Left-semi: a click with N matching views emits exactly one row;
    a click with none emits nothing."""
    from flink_kafka_replicator_spark.streaming.joins import (
        semi_interval_join_clicks_with_views,
    )

    clicks_dir, views_dir = str(tmp_path / "clicks"), str(tmp_path / "views")
    # user 1 click t=120 has TWO views in range (t=0, t=100); click t=900
    # has none; user 3 click has no views at all
    _write(spark, views_dir, _rows([(1, 0, 1), (2, 100, 1), (4, 0, 2)]))
    _write(spark, clicks_dir, _rows([(10, 120, 1), (11, 900, 1), (12, 600, 3)]))

    clicks = spark.readStream.schema(SCHEMA).parquet(clicks_dir)
    views = spark.readStream.schema(SCHEMA).parquet(views_dir)
    out = str(tmp_path / "semi_out")
    q = (
        semi_interval_join_clicks_with_views(clicks, views)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "semi_ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    got = [r.click_id for r in spark.read.parquet(out).collect()]
    assert got == [10], f"semi join must emit one row per matched click: {got}"


def test_full_outer_interval_join_emits_both_unmatched_sides(spark, tmp_path):
    """Full-outer: the unmatched CLICK (user 3) emits null view columns
    AND the unmatched VIEW (user 2) emits null click columns, each once
    the watermark proves no counterpart can arrive — closing the
    stream-join matrix (inner / left-outer / left-semi / full-outer)."""
    from flink_kafka_replicator_spark.streaming.joins import (
        full_outer_interval_join_clicks_to_views,
    )

    clicks_dir, views_dir = str(tmp_path / "clicks"), str(tmp_path / "views")
    # user 1: matched pair; user 2: view with no click; user 3: click
    # with no view
    _write(spark, views_dir, _rows([(1, 100, 1), (4, 50, 2)]))
    _write(spark, clicks_dir, _rows([(10, 120, 1), (12, 130, 3)]))
    # watermark drivers in a second file release the unmatched state
    _write(spark, views_dir, _rows([(98, 90000, 9)]))
    _write(spark, clicks_dir, _rows([(99, 90000, 9)]))

    clicks = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(clicks_dir)
    views = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(views_dir)
    out = str(tmp_path / "fo_out")
    q = (
        full_outer_interval_join_clicks_to_views(clicks, views)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "fo_ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    rows = spark.read.parquet(out).collect()
    got = {(r.click_id, r.view_id) for r in rows}
    assert (10, 1) in got, f"matched pair missing: {got}"
    assert (12, None) in got, f"unmatched click not emitted: {got}"
    assert (None, 4) in got, f"unmatched view not emitted: {got}"
    # user_id survives from the non-null side on both null-padded rows
    by_pair = {(r.click_id, r.view_id): r.user_id for r in rows}
    assert by_pair[(12, None)] == 3
    assert by_pair[(None, 4)] == 2


def test_full_outer_interval_join_batch_same_code(spark):
    """Unified model: the same function on batch frames gives the full
    outer-join truth table."""
    from flink_kafka_replicator_spark.streaming.joins import (
        full_outer_interval_join_clicks_to_views,
    )

    clicks = spark.createDataFrame(_rows([(10, 120, 1), (12, 130, 3)]), SCHEMA)
    views = spark.createDataFrame(_rows([(1, 100, 1), (4, 50, 2)]), SCHEMA)
    got = {
        (r.click_id, r.view_id)
        for r in full_outer_interval_join_clicks_to_views(clicks, views).collect()
    }
    assert got == {(10, 1), (12, None), (None, 4)}, got

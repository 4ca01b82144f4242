"""Stream-stream joins with watermark-bounded state.

The reference carries event timestamps but never interprets them
(SURVEY.md §2.4: no join/connect/coGroup anywhere); this module supplies
the streaming-join capability class on Structured Streaming's model
(SIGMOD '18): both sides watermarked, the join condition time-bounded so
the state store can evict rows once the watermark passes the bound.

Scale notes: state size is O(input rate × interval bound) per key range,
independent of stream length — the time bound is what makes an unbounded
join feasible. The equi-key (``user_id``) hash-partitions both sides to
the same tasks; without it a stream-stream join would be a broadcast of
everything forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_clicks_to_views(
    clicks: DataFrame,
    views: DataFrame,
    watermark: str = "10 minutes",
    max_gap: str = "5 minutes",
) -> DataFrame:
    """Inner interval join: each click paired with view events by the
    same user in the ``max_gap`` window *before* the click.

    Both inputs must carry (user_id, ts, event_id, value). Watermarks
    bound the state store on both sides; the two-sided time predicate
    (view before click AND within the gap) is what lets Spark GC state.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
            F.col("value").alias("view_value"),
        )
    )
    return c.join(
        v,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {max_gap}")),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "view_id",
        "view_ts",
        "view_value",
    )


def left_outer_interval_join_clicks_to_views(
    clicks: DataFrame,
    views: DataFrame,
    watermark: str = "10 minutes",
    max_gap: str = "5 minutes",
) -> DataFrame:
    """Left-outer interval join: like the inner variant, but clicks with
    no view in the window still emit (null view columns) — once the
    watermark passes the click's join bound and Spark can prove no
    matching view can arrive. Un-matched emission is watermark-driven,
    not data-driven: the state store evicts the click and emits the
    null-padded row at that point, which is what bounds state AND gives
    a complete result over an unbounded stream.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    return c.join(
        v,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {max_gap}")),
        "leftOuter",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "view_id",
        "view_ts",
        "view_value",
    )


def full_outer_interval_join_clicks_to_views(
    clicks: DataFrame,
    views: DataFrame,
    watermark: str = "10 minutes",
    max_gap: str = "5 minutes",
) -> DataFrame:
    """Full-outer interval join — the last cell of the stream-join
    matrix (inner / left-outer / left-semi / full-outer): matched pairs
    emit as they join; an unmatched CLICK emits null view columns and
    an unmatched VIEW emits null click columns, each released only when
    the watermark passes the point where a match could still arrive.
    Null emission on BOTH sides is watermark-driven (the state store
    proves no counterpart can come, evicts, and emits) — the only
    full-outer semantics that both bounds state and is complete over an
    unbounded stream. State scale is the same O(rate × bound) as the
    other variants; the full-outer adds no state, only the two-sided
    null emission at eviction."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    return c.join(
        v,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {max_gap}")),
        "fullOuter",
    ).select(
        # user_id survives from whichever side is non-null
        F.coalesce(F.col("c_user"), F.col("v_user")).alias("user_id"),
        "click_id",
        "click_ts",
        "view_id",
        "view_ts",
        "view_value",
    )


def semi_interval_join_clicks_with_views(
    clicks: DataFrame,
    views: DataFrame,
    watermark: str = "10 minutes",
    max_gap: str = "5 minutes",
) -> DataFrame:
    """Left-SEMI interval join: clicks that had at least one view by the
    same user within the window — existence only, no pair expansion.
    At scale this is the cheap variant: the state store still holds both
    sides within the watermark bound, but the output never multiplies a
    click by its N matching views (an attribution EXISTS check, not an
    attribution TABLE)."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    return c.join(
        v,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {max_gap}")),
        "left_semi",
    ).select(F.col("c_user").alias("user_id"), "click_id", "click_ts")

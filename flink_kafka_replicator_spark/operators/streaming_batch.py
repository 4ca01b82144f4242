"""Batch-verifiable equivalents of the streaming layer (SURVEY.md §2.5).

Structured Streaming's windowed aggregations have exact batch
equivalents (the unified-model guarantee from the Structured Streaming
paper, SIGMOD '18): a streaming query over a bounded source must equal
the batch query over the same data. These queries pin those semantics
so the DuckDB oracle can check them; streaming/ runs the same shapes
through readStream in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

SESSION_GAP = "10 minutes"


def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate (epoch-aligned, so the
    batch equivalent is date_trunc('hour'))."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour windows every 30 minutes — each event lands
    in exactly two windows (window/slide = 2 copies)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (10-minute gap) per user via the native
    session_window; the oracle reproduces it with gaps-and-islands
    (lag + cumulative flag sum). Session end = last event + gap."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics, batch-simulated: with the watermark
    at max(ts) - 10 minutes, count the events that are still 'live'
    (would not be dropped as late) per topic."""
    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 10 MINUTES")).alias("watermark")
    )
    return (
        ev.crossJoin(F.broadcast(wm))
        .filter(F.col("ts") >= F.col("watermark"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_live"))
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact key dedup — the batch face of streaming dropDuplicates."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()


QUERIES = {
    "stream_tumbling": stream_tumbling,
    "stream_sliding": stream_sliding,
    "stream_session": stream_session,
    "stream_watermark": stream_watermark,
    "dedup_exact": dedup_exact,
}

ORACLES = {
    "stream_tumbling": """
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               COUNT(*)               AS n_events,
               ROUND(SUM(value), 4)   AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "stream_sliding": """
        WITH exploded AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value
            FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value
            FROM events
        )
        SELECT window_start,
               COUNT(*)             AS n_events,
               ROUND(SUM(value), 4) AS sum_value
        FROM exploded
        GROUP BY 1
    """,
    "stream_session": """
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts >= LAG(ts) OVER w + INTERVAL '10 minutes'
                             OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ), islands AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts ASC
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM flagged
        )
        SELECT user_id,
               MIN(ts)                          AS session_start,
               MAX(ts) + INTERVAL '10 minutes'  AS session_end,
               COUNT(*)                         AS n_events,
               ROUND(SUM(value), 4)             AS sum_value
        FROM islands
        GROUP BY user_id, session_id
    """,
    "stream_watermark": """
        WITH wm AS (SELECT MAX(ts) - INTERVAL '10 minutes' AS watermark FROM events)
        SELECT event_type, COUNT(*) AS n_live
        FROM events, wm
        WHERE ts >= watermark
        GROUP BY event_type
    """,
    "dedup_exact": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
}

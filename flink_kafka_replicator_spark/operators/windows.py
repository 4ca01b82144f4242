"""Window functions and top-k.

Every ORDER BY inside a window carries a deterministic tiebreak key
(orderkey / event_id) so results are hash-stable against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number (ranking window fn)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per user with an explicit ROWS frame."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic: inter-event gap per user in seconds."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # go through TIMESTAMP before the numeric cast: a no-op on the
    # load_table-normalized column, and keeps the query legal even if a
    # caller feeds a raw TIMESTAMP_NTZ column (which cannot cast to
    # DOUBLE directly)
    prev_ts = F.lag("ts").over(w)
    gap = F.col("ts").cast("timestamp").cast("double") - prev_ts.cast(
        "timestamp"
    ).cast("double")
    return ev.select(
        "user_id",
        "event_id",
        F.round(gap, 4).alias("gap_seconds"),
    )


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per-user rolling 1-hour sum/count.

    The frame is value-based (all rows within 3600 s before the current
    row's timestamp), not row-count-based — Spark requires a numeric
    ordering expression for rangeBetween, so the frame runs over epoch
    seconds. Same single keyed shuffle as any partitioned window.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        # TIMESTAMP first for NTZ robustness (see window_lag_delta)
        .orderBy(F.col("ts").cast("timestamp").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("hour_value"),
        F.count("*").over(w).alias("hour_events"),
    )


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + limit: global top-20 orders by price (TakeOrderedAndProject —
    a per-partition top-k then a driver merge of k·partitions rows, never
    a full sort at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered 5-row moving average per user over event time — the
    smoothing window with an explicit ROWS frame both before AND after
    the current row."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 2)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("ma5"),
        F.count("*").over(w).alias("frame_n"),
    )


def window_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count over a running window. Spark rejects
    COUNT(DISTINCT) OVER; the canonical workaround is
    size(collect_set() OVER) — set state is bounded by the distinct
    cardinality inside the frame (event types here: ≤5), so it scales;
    for high-cardinality columns the HLL-sketch aggregate is the move."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_types_so_far"),
    )


def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank + cume_dist of each
    customer's balance within its market segment. Ordered by the VALUE
    alone (no tiebreak key) on purpose — both functions are defined over
    peer groups, so equal balances must share a result; that makes them
    deterministic under any row order, unlike row_number."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 4).alias("c_acctbal"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


# Finite-horizon EWMA: alpha = 1/2, so the (1-alpha)^i decay weights
# are exact powers of two — scaled by 2^(LAGS-1) they become exact
# BIGINT weights and the whole smoother is integer arithmetic until
# one final division. 8 lags ≡ the last term carries 1/255 of the
# mass; longer horizons change nothing structurally.
EWMA_LAGS = 8


def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of the event value per
    user — the smoother every metrics/monitoring pipeline runs before
    thresholding (pandas ``ewm(alpha=.5, adjust=True)`` over a finite
    8-sample horizon).

    Cross-engine exactness by construction: value has 2 decimals so
    ``v100 = round(value·100)`` is an exact BIGINT; with alpha = 1/2
    the decay weights scale to integers 128,64,…,1, making numerator
    and denominator exact integer sums over LAG columns — one double
    division at the end, identical in both engines. ONE window
    exchange on user_id (all 8 lags share the frame); map-side
    otherwise, no joins, no state beyond the 8-row frame — at 100 TB
    this is the per-key sorted-scan shape streaming engines run with
    rocksdb state, here amortized into a single sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    d = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.round(F.col("value") * 100).try_cast("long").alias("v100"),
    )
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for i in range(EWMA_LAGS):
        wt = 1 << (EWMA_LAGS - 1 - i)
        lag_i = F.col("v100") if i == 0 else F.lag("v100", i).over(w)
        num = num + F.coalesce(lag_i * F.lit(wt), F.lit(0))
        den = den + F.when(lag_i.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
    return d.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        # den = 0 (every sample in the frame NULL) → ewma NULL: ANSI
        # Spark would otherwise raise DIVIDE_BY_ZERO where DuckDB
        # yields NULL — pinned by tests/adversarial_sweep.py
        F.when(
            den > 0, F.round(num.cast("double") / den / F.lit(100.0), 4)
        ).alias("ewma"),
    )


def _ewma_oracle() -> str:
    lag_cols = ", ".join(
        f"LAG(v100, {i}) OVER w AS l{i}" for i in range(1, EWMA_LAGS)
    )
    # the current-row term is coalesced/guarded exactly like the lag
    # terms (NULL value rows contribute neither numerator nor weight —
    # mirrors the Spark expression; an unguarded v100 * 128 would
    # NULL-poison the whole numerator where Spark skips the sample)
    num_terms = " + ".join(
        [
            f"COALESCE(l{i} * {1 << (EWMA_LAGS - 1 - i)}, 0)"
            if i
            else "COALESCE(v100 * 128, 0)"
            for i in range(EWMA_LAGS)
        ]
    )
    den_terms = " + ".join(
        [
            f"CASE WHEN {'l' + str(i) if i else 'v100'} IS NOT NULL"
            f" THEN {1 << (EWMA_LAGS - 1 - i)} ELSE 0 END"
            for i in range(EWMA_LAGS)
        ]
    )
    return f"""
        WITH d AS (
            SELECT user_id, event_id, value,
                   TRY_CAST(ROUND(value * 100, 0) AS BIGINT) AS v100,
                   {lag_cols}
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        )
        SELECT user_id, event_id, ROUND(value, 4) AS value,
               CASE WHEN ({den_terms}) > 0
                    THEN ROUND(CAST({num_terms} AS DOUBLE)
                               / ({den_terms}) / 100.0, 4) END AS ewma
        FROM d
    """


ROLLMED_LAGS = 8


def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median of the event value over each user's
    trailing 8 samples — the robust smoother next to
    :func:`window_ewma`: one fat-fingered spike moves an EWMA but not
    a median, which is why alerting pipelines threshold on this.

    Exactness: values have 2 decimals → the frame is a sorted array of
    exact v100 BIGINTs; the median is elementwise (odd n: the middle,
    even n: the mean of the two middles — computed as an integer SUM
    divided once), so both engines pick identical elements. Shape: the
    EWMA pattern exactly — 8 LAG columns sharing ONE (user_id)
    window exchange, then map-side array sort over ≤8 elements; no
    joins, no second shuffle, state bounded by the frame.

    Round 14: the sorted frame is pinned in its OWN projection before
    the median arithmetic. Inlined, the six frame references (size ×4,
    element_at ×3 through the conditionals) each re-ran the
    array_sort+filter per row — whole-stage codegen's subexpression
    elimination does not reach through the conditional branches — and
    the interleaved A/B measured the staged form 2.5× faster
    (0.99 s vs 2.46 s at sf0.1) with bit-identical rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    d = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.round(F.col("value") * 100).try_cast("long").alias("v100"),
    )
    lags = [F.col("v100")] + [
        F.lag("v100", i).over(w) for i in range(1, ROLLMED_LAGS)
    ]
    frame = F.array_sort(
        F.filter(F.array(*lags), lambda x: x.isNotNull())
    )
    staged = d.select(
        "user_id", "event_id", "value", frame.alias("frame")
    )
    n = F.size("frame")
    # 1-indexed middles: odd -> element (n+1)/2 twice; even -> n/2 and
    # n/2+1 — summed exactly, one division at the end. The n > 0 guard
    # pins the empty frame (every sample NULL) to a NULL median: the
    # even branch would hit element_at(frame, 0), an error under ANSI
    # Spark where DuckDB's frame[0] is silently NULL.
    med2 = F.when(
        n % 2 == 1,
        F.element_at("frame", ((n + 1) / 2).cast("int")) * 2,
    ).when(
        n > 0,
        F.element_at("frame", (n / 2).cast("int"))
        + F.element_at("frame", (n / 2 + 1).cast("int")),
    )
    return staged.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        F.size("frame").cast("int").alias("n_window"),
        F.round(med2.cast("double") / F.lit(200.0), 4).alias(
            "rolling_median"
        ),
    )


MAD_K = 3  # Hampel's standard threshold: |x − med| > K·MAD


def window_rolling_mad_anomaly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hampel filter over each user's trailing 8 samples: flag a value
    as anomalous when it sits more than MAD_K rolling MADs from the
    rolling median — the streaming-shaped outlier detector robust to
    the very spikes it hunts (a z-score's mean AND std are both moved
    by the outlier; the median/MAD pair is not).

    Exactness: everything stays integer until the output. With v100
    the exact cents, med2 = 2·median (integer: middle element doubled,
    or the sum of the two middles), dev2_i = |2·v100_i − med2|
    (= 2·|v−med|, integer), mad4 = 2·median(dev2) (= 4·MAD, integer).
    The flag |x − med| > K·MAD becomes 2·dev2_self > K·mad4 — an
    exact integer comparison, no float anywhere. Shape: the EWMA/
    rolling-median pattern — 8 LAGs in ONE user_id exchange, then
    map-side ≤8-element array arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    d = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.round(F.col("value") * 100).try_cast("long").alias("v100"),
    )
    lags = [F.col("v100")] + [
        F.lag("v100", i).over(w) for i in range(1, ROLLMED_LAGS)
    ]
    staged = d.select(
        "user_id",
        "event_id",
        "value",
        "v100",
        F.array_sort(
            F.filter(F.array(*lags), lambda x: x.isNotNull())
        ).alias("frame"),
    )
    # size = 0 → NULL (not the else branch: element_at(frame, 0) is an
    # ANSI error where DuckDB's frame[0] is NULL — same pin as
    # window_rolling_median)
    med2_sql = (
        "case when size(frame) % 2 = 1"
        " then element_at(frame, cast((size(frame) + 1) / 2 as int)) * 2L"
        " when size(frame) > 0"
        " then element_at(frame, cast(size(frame) / 2 as int))"
        "      + element_at(frame, cast(size(frame) / 2 + 1 as int))"
        " end"
    )
    staged = staged.withColumn("med2", F.expr(med2_sql)).withColumn(
        "dev2",
        F.expr("array_sort(transform(frame, x -> abs(2L * x - med2)))"),
    )
    mad4_sql = (
        "case when size(dev2) % 2 = 1"
        " then element_at(dev2, cast((size(dev2) + 1) / 2 as int)) * 2L"
        " when size(dev2) > 0"
        " then element_at(dev2, cast(size(dev2) / 2 as int))"
        "      + element_at(dev2, cast(size(dev2) / 2 + 1 as int))"
        " end"
    )
    return staged.withColumn("mad4", F.expr(mad4_sql)).select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        F.round(F.col("med2").cast("double") / 200.0, 4).alias(
            "rolling_median"
        ),
        F.round(F.col("mad4").cast("double") / 400.0, 4).alias(
            "rolling_mad"
        ),
        F.expr(
            f"abs(2L * v100 - med2) * 2L > {MAD_K}L * mad4"
        ).alias("is_anomaly"),
    )


CUSUM_SLACK_C = 50  # slack in cents: drift must exceed mean + 0.50
CUSUM_THRESH_C = 500  # alarm when the statistic passes 5.00


def window_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector per user: the classic
    S_t = max(0, S_{t-1} + (x_t − target − slack)) change-point
    statistic, alarming when S_t exceeds CUSUM_THRESH_C — the
    sequential test monitoring pipelines run when a mean SHIFT matters
    but single-point outlier flags (the Hampel filter) stay quiet.

    The recursion LOOKS inherently sequential, but has a closed
    prefix form: with P_t = Σ_{j≤t}(x_j − target − slack),
    S_t = P_t − min(0, min_{j≤t} P_j) — so two running windows
    (prefix sum + running min) over ONE user_id exchange compute it
    exactly, no recursion, no UDF, no state. target is each user's own
    exact mean in cents ((Σv100) div n — integer), so everything stays
    BIGINT and the alarm is an exact integer comparison."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.round(F.col("value") * 100).try_cast("long").alias("v100"),
    )
    wall = Window.partitionBy("user_id")
    # explicit ROWS frame: the default RANGE frame includes peers, so
    # parity with the oracle's ROWS BETWEEN ... CURRENT ROW would hang
    # on (ts, event_id) uniqueness instead of holding by construction
    wrun = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = d.withColumn(
        "target", F.expr("sum(v100) over (partition by user_id)")
    ).withColumn("n_user", F.count("*").over(wall))
    # per-step increment scaled by n_user so the per-user mean stays
    # an exact integer: inc = n*x − Σx − n*slack (all BIGINT)
    staged = staged.withColumn(
        "inc",
        F.expr(f"n_user * v100 - target - n_user * {CUSUM_SLACK_C}L"),
    )
    staged = staged.withColumn(
        "p", F.sum("inc").over(wrun)
    ).withColumn("minp", F.min("p").over(wrun))
    # S_t (scaled by n_user): P_t − min(0, running-min P)
    s_scaled = F.expr("p - least(0L, minp)")
    return staged.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        # floor-quantize via exact integer div (never ROUND on a
        # division result — the half-tie differs across engines):
        # S/(n·100) at 4 decimals == (S·100) div n, then /1e4
        F.expr("cast((p - least(0L, minp)) * 100L div n_user as double)"
               " / 10000.0D").alias("cusum"),
        (s_scaled > F.col("n_user") * F.lit(CUSUM_THRESH_C)).alias(
            "is_drift"
        ),
    )


def window_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user over the running value total — the
    peak-to-trough statistic every risk/monitoring dashboard computes
    on an equity-like curve (here: each user's cumulative event value
    in time order). Reported per user: final cumulative value, the
    running peak, and the largest peak-to-trough drop.

    Exactness: values quantize to exact cents once, then cum, peak,
    and drawdown are pure BIGINT window arithmetic — drawdown_t =
    max_{j<=t}(cum_j) − cum_t, max over the user. Shape: ONE user_id
    exchange; both running windows (prefix sum, prefix max) and the
    final per-user aggregate share it. Explicit ROWS frames (the
    engine's running-window contract)."""
    ev = load_table(spark, sf_dir, "events")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).try_cast("long").alias("v100"),
    )
    curve = d.withColumn("cum", F.sum("v100").over(wrun))
    curve = curve.withColumn("peak", F.max("cum").over(wrun))
    return curve.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(F.max("cum").cast("double") / 100.0, 2).alias("peak_value"),
        # final = cum at the max (ts, event_id) — max_by on the unique
        # composite key, never F.last (order after a shuffle is not
        # deterministic inside a hash aggregate)
        F.round(
            F.max_by("cum", F.struct("ts", "event_id")).cast("double")
            / 100.0,
            2,
        ).alias("final_value"),
        F.round(
            F.max(F.col("peak") - F.col("cum")).cast("double") / 100.0, 2
        ).alias("max_drawdown"),
    )


def _drawdown_oracle() -> str:
    return """
        WITH d AS (
            SELECT user_id, ts, event_id,
                   TRY_CAST(ROUND(value * 100, 0) AS BIGINT) AS v100
            FROM events
        ),
        c0 AS (
            SELECT user_id, ts, event_id,
                   SUM(v100) OVER w AS cum
            FROM d
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        c AS (
            SELECT user_id, ts, event_id, cum,
                   MAX(cum) OVER w AS peak
            FROM c0
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(CAST(MAX(cum) AS DOUBLE) / 100.0, 2) AS peak_value,
               ROUND(CAST(MAX(CASE WHEN rn = n THEN cum END) AS DOUBLE)
                     / 100.0, 2) AS final_value,
               ROUND(CAST(MAX(peak - cum) AS DOUBLE) / 100.0, 2)
                   AS max_drawdown
        FROM (SELECT *,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts ASC, event_id ASC)
                         AS rn,
                     COUNT(*) OVER (PARTITION BY user_id) AS n
              FROM c)
        GROUP BY user_id
    """


def _cusum_oracle() -> str:
    return f"""
        WITH d AS (
            SELECT user_id, event_id, ts, value,
                   TRY_CAST(ROUND(value * 100, 0) AS BIGINT) AS v100
            FROM events
        ),
        st AS (
            SELECT user_id, event_id, ts, value, v100,
                   SUM(v100) OVER (PARTITION BY user_id) AS target,
                   COUNT(*) OVER (PARTITION BY user_id) AS n_user
            FROM d
        ),
        inc AS (
            SELECT *,
                   n_user * v100 - target - n_user * {CUSUM_SLACK_C}
                       AS inc
            FROM st
        ),
        pfx AS (
            SELECT *,
                   SUM(inc) OVER (PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS p
            FROM inc
        ),
        run AS (
            SELECT *,
                   MIN(p) OVER (PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS minp
            FROM pfx
        )
        SELECT user_id, event_id, ROUND(value, 4) AS value,
               CAST((p - LEAST(0, minp)) * 100 // n_user AS DOUBLE)
                   / 10000.0 AS cusum,
               p - LEAST(0, minp) > n_user * {CUSUM_THRESH_C}
                   AS is_drift
        FROM run
    """


def _rollmad_oracle() -> str:
    lag_cols = ", ".join(
        f"LAG(v100, {i}) OVER w AS l{i}" for i in range(1, ROLLMED_LAGS)
    )
    arr = "[v100, " + ", ".join(
        f"l{i}" for i in range(1, ROLLMED_LAGS)
    ) + "]"
    med2 = (
        "CASE WHEN len(frame) % 2 = 1"
        " THEN frame[(len(frame) + 1) // 2] * 2"
        " ELSE frame[len(frame) // 2] + frame[len(frame) // 2 + 1] END"
    )
    mad4 = (
        "CASE WHEN len(dev2) % 2 = 1"
        " THEN dev2[(len(dev2) + 1) // 2] * 2"
        " ELSE dev2[len(dev2) // 2] + dev2[len(dev2) // 2 + 1] END"
    )
    return f"""
        WITH d AS (
            SELECT user_id, event_id, value,
                   TRY_CAST(ROUND(value * 100, 0) AS BIGINT) AS v100,
                   {lag_cols}
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        f AS (
            SELECT user_id, event_id, value, v100,
                   list_sort(list_filter({arr}, x -> x IS NOT NULL))
                       AS frame
            FROM d
        ),
        m AS (
            SELECT *, {med2} AS med2 FROM f
        ),
        dv AS (
            SELECT *, list_sort(list_transform(frame,
                          x -> abs(2 * x - med2))) AS dev2
            FROM m
        ),
        md AS (
            SELECT *, {mad4} AS mad4 FROM dv
        )
        SELECT user_id, event_id, ROUND(value, 4) AS value,
               ROUND(CAST(med2 AS DOUBLE) / 200.0, 4) AS rolling_median,
               ROUND(CAST(mad4 AS DOUBLE) / 400.0, 4) AS rolling_mad,
               abs(2 * v100 - med2) * 2 > {MAD_K} * mad4 AS is_anomaly
        FROM md
    """


def _rollmed_oracle() -> str:
    lag_cols = ", ".join(
        f"LAG(v100, {i}) OVER w AS l{i}" for i in range(1, ROLLMED_LAGS)
    )
    arr = "[v100, " + ", ".join(
        f"l{i}" for i in range(1, ROLLMED_LAGS)
    ) + "]"
    return f"""
        WITH d AS (
            SELECT user_id, event_id, value,
                   TRY_CAST(ROUND(value * 100, 0) AS BIGINT) AS v100,
                   {lag_cols}
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        f AS (
            SELECT user_id, event_id, value,
                   list_sort(list_filter({arr}, x -> x IS NOT NULL))
                       AS frame
            FROM d
        )
        SELECT user_id, event_id, ROUND(value, 4) AS value,
               CAST(len(frame) AS INTEGER) AS n_window,
               ROUND(CAST(CASE WHEN len(frame) % 2 = 1
                               THEN frame[(len(frame) + 1) // 2] * 2
                               ELSE frame[len(frame) // 2]
                                    + frame[len(frame) // 2 + 1]
                          END AS DOUBLE) / 200.0, 4) AS rolling_median
        FROM f
    """


BOLLINGER_N = 20
BOLLINGER_K = 2


def window_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands per user over the event-value series: rolling
    mean ± K·stddev on a BOLLINGER_N-row window, plus the breakout
    flag — the volatility envelope monitoring dashboards draw around
    any noisy metric.

    Exactness discipline (the cusum/drawdown family's): NEVER a float
    STDDEV aggregate (its partial-merge order differs across engines);
    instead the frame's Σv and Σv² run as exact-BIGINT rolling sums
    over cents, and mean/variance come from the closed forms
    mean = s/n, var = (n·Σv² − s²)/(n·(n−1)) — each ONE IEEE division
    over identical integers, so both engines produce identical bits.
    Only full frames are emitted (bands on a half-filled window are
    not comparable rows). Shape: one user_id exchange shared by both
    rolling sums; explicit ROWS frame."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-(BOLLINGER_N - 1), Window.currentRow)
    )
    d = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.round(F.col("value") * 100).try_cast("long").alias("v100"),
    )
    staged = (
        d.withColumn("n", F.count("*").over(w))
        .withColumn("s", F.sum("v100").over(w))
        .withColumn("ss", F.sum(F.expr("v100 * v100")).over(w))
        .filter(F.col("n") == BOLLINGER_N)
    )
    mean_c = F.expr("s / n")  # cents, one exact division
    sd_c = F.expr("sqrt((n * ss - s * s) / (n * (n - 1.0D)))")
    return staged.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        F.round(mean_c / 100.0, 4).alias("ma"),
        F.round(sd_c / 100.0, 4).alias("sd"),
        F.round((mean_c + BOLLINGER_K * sd_c) / 100.0, 4).alias("upper"),
        F.round((mean_c - BOLLINGER_K * sd_c) / 100.0, 4).alias("lower"),
        (
            (F.col("v100") > mean_c + BOLLINGER_K * sd_c)
            | (F.col("v100") < mean_c - BOLLINGER_K * sd_c)
        ).alias("is_breakout"),
    )


def _bollinger_oracle() -> str:
    n, k = BOLLINGER_N, BOLLINGER_K
    return f"""
        WITH d AS (
            SELECT user_id, event_id, ts, value,
                   TRY_CAST(ROUND(value * 100, 0) AS BIGINT) AS v100
            FROM events
        ),
        staged AS (
            SELECT user_id, event_id, value, v100,
                   COUNT(*) OVER w AS n,
                   SUM(v100) OVER w AS s,
                   SUM(v100 * v100) OVER w AS ss
            FROM d
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, event_id,
               ROUND(value, 4) AS value,
               ROUND((s / n) / 100.0, 4) AS ma,
               ROUND(sqrt((n * ss - s * s) / (n * (n - 1.0)))
                     / 100.0, 4) AS sd,
               ROUND((s / n + {k} * sqrt((n * ss - s * s)
                     / (n * (n - 1.0)))) / 100.0, 4) AS upper,
               ROUND((s / n - {k} * sqrt((n * ss - s * s)
                     / (n * (n - 1.0)))) / 100.0, 4) AS lower,
               (v100 > s / n + {k} * sqrt((n * ss - s * s)
                    / (n * (n - 1.0)))
                OR v100 < s / n - {k} * sqrt((n * ss - s * s)
                    / (n * (n - 1.0)))) AS is_breakout
        FROM staged
        WHERE n = {n}
    """


RSI_N = 14


def window_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index (Wilder's RSI, simple-average form)
    per user over the event-value series: the bounded 0-100 momentum
    oscillator every monitoring/trading dashboard pairs with the
    Bollinger envelope. RSI = 100·ΣG/(ΣG+ΣL) over the last RSI_N
    value deltas (gains G, losses L).

    Exactness: deltas are exact cent BIGINTs (lag over the same
    (ts, event_id) order every series query uses), the gain/loss
    split and both rolling sums stay BIGINT, and the single division
    happens at output — no float aggregate anywhere. Zero-movement
    frames (ΣG+ΣL = 0) emit the conventional neutral 50. Only full
    frames are emitted. One user_id exchange shared by the lag and
    both rolling sums."""
    ev = load_table(spark, sf_dir, "events")
    word = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    d = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).try_cast("long").alias("v100"),
    ).withColumn("delta", F.col("v100") - F.lag("v100").over(word))
    d = d.filter(F.col("delta").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-(RSI_N - 1), Window.currentRow)
    )
    staged = (
        d.withColumn("n", F.count("*").over(w))
        .withColumn(
            "sg", F.sum(F.expr("greatest(delta, 0L)")).over(w)
        )
        .withColumn(
            "sl", F.sum(F.expr("greatest(-delta, 0L)")).over(w)
        )
        .filter(F.col("n") == RSI_N)
    )
    return staged.select(
        "user_id",
        "event_id",
        F.round(F.col("delta").cast("double") / 100.0, 2).alias("delta"),
        F.when(F.col("sg") + F.col("sl") == 0, F.lit(50.0))
        .otherwise(
            F.round(
                100.0 * F.col("sg") / (F.col("sg") + F.col("sl")), 4
            )
        )
        .alias("rsi"),
    )


def _rsi_oracle() -> str:
    n = RSI_N
    return f"""
        WITH d AS (
            SELECT user_id, event_id, ts,
                   TRY_CAST(ROUND(value * 100, 0) AS BIGINT) AS v100
            FROM events
        ),
        deltas AS (
            SELECT user_id, event_id, ts,
                   v100 - LAG(v100) OVER (PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC) AS delta
            FROM d
        ),
        clean AS (SELECT * FROM deltas WHERE delta IS NOT NULL),
        staged AS (
            SELECT user_id, event_id, delta,
                   COUNT(*) OVER w AS n,
                   SUM(GREATEST(delta, 0)) OVER w AS sg,
                   SUM(GREATEST(-delta, 0)) OVER w AS sl
            FROM clean
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)
        )
        SELECT user_id, event_id,
               ROUND(CAST(delta AS DOUBLE) / 100.0, 2) AS delta,
               CASE WHEN sg + sl = 0 THEN 50.0
                    ELSE ROUND(100.0 * sg / (sg + sl), 4) END AS rsi
        FROM staged
        WHERE n = {n}
    """


ACF_MIN_PAIRS = 8


def window_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag-1 and lag-2 autocorrelation of the event-value
    series — the stationarity probe a forecasting/monitoring pipeline
    runs before choosing a smoother (white noise → ACF≈0; a sticky
    level → ACF1 near 1; ACF2 tells you whether it persists).

    Pearson r over (v_t, v_{t-k}) pairs, per user, each lag over its
    own pair set. Exactness: values are exact cent BIGINTs, the five
    sufficient statistics per lag (n, Σx, Σy, Σxy, Σx², Σy²) stay
    integer — cross products in DECIMAL(38,0), the eval_roc_auc
    overflow discipline (n·Σxy exceeds int64 past ~10⁶ rows/user) —
    and the only float math is the final (num, √(varx·vary)) division,
    identical IEEE in both engines. Shape: ONE user_id window exchange
    shared by both lags, then a hash aggregate whose output is one row
    per user — at 100 TB this is the per-key sorted scan plus a
    map-side-combinable agg; no joins, no global sort. Users with
    fewer than ACF_MIN_PAIRS lag-1 pairs are dropped (r over a
    handful of points is noise); zero-variance series emit NULL.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    d = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).try_cast("long").alias("x"),
    ).select(
        "user_id",
        "x",
        F.lag("x", 1).over(w).alias("y1"),
        F.lag("x", 2).over(w).alias("y2"),
    )
    dec = "decimal(38,0)"

    def _stats(ycol: str, tag: str):
        y = F.col(ycol)
        has = y.isNotNull()
        xx = F.when(has, F.col("x")).cast(dec)
        yy = y.cast(dec)
        return [
            F.sum(F.when(has, 1).otherwise(0)).cast("long").alias(f"n{tag}"),
            F.sum(xx).alias(f"sx{tag}"),
            F.sum(yy).alias(f"sy{tag}"),
            F.sum(xx * yy).alias(f"sxy{tag}"),
            F.sum(xx * xx).alias(f"sxx{tag}"),
            F.sum(yy * yy).alias(f"syy{tag}"),
        ]

    g = d.groupBy("user_id").agg(*(_stats("y1", "1") + _stats("y2", "2")))

    def _corr(tag: str):
        n = F.col(f"n{tag}").cast(dec)
        num = (n * F.col(f"sxy{tag}") - F.col(f"sx{tag}") * F.col(f"sy{tag}")).cast(
            "double"
        )
        vx = (n * F.col(f"sxx{tag}") - F.col(f"sx{tag}") * F.col(f"sx{tag}")).cast(
            "double"
        )
        vy = (n * F.col(f"syy{tag}") - F.col(f"sy{tag}") * F.col(f"sy{tag}")).cast(
            "double"
        )
        return F.when(
            (vx > 0) & (vy > 0), F.round(num / F.sqrt(vx * vy), 4)
        ).otherwise(F.lit(None).cast("double"))

    return g.filter(F.col("n1") >= ACF_MIN_PAIRS).select(
        "user_id",
        F.col("n1").alias("n_pairs_lag1"),
        _corr("1").alias("acf1"),
        _corr("2").alias("acf2"),
    )


def _autocorr_oracle() -> str:
    def stats(tag: str) -> str:
        y = f"y{tag}"
        return f"""
               SUM(CASE WHEN {y} IS NOT NULL THEN 1 ELSE 0 END) AS n{tag},
               SUM(CASE WHEN {y} IS NOT NULL
                   THEN CAST(x AS DECIMAL(38,0)) END) AS sx{tag},
               SUM(CAST({y} AS DECIMAL(38,0))) AS sy{tag},
               SUM(CAST(x AS DECIMAL(38,0))
                   * CAST({y} AS DECIMAL(38,0))) AS sxy{tag},
               SUM(CASE WHEN {y} IS NOT NULL
                   THEN CAST(x AS DECIMAL(38,0))
                      * CAST(x AS DECIMAL(38,0)) END) AS sxx{tag},
               SUM(CAST({y} AS DECIMAL(38,0))
                   * CAST({y} AS DECIMAL(38,0))) AS syy{tag}"""

    def corr(tag: str) -> str:
        n = f"CAST(n{tag} AS DECIMAL(38,0))"
        num = f"CAST({n} * sxy{tag} - sx{tag} * sy{tag} AS DOUBLE)"
        vx = f"CAST({n} * sxx{tag} - sx{tag} * sx{tag} AS DOUBLE)"
        vy = f"CAST({n} * syy{tag} - sy{tag} * sy{tag} AS DOUBLE)"
        return (
            f"CASE WHEN {vx} > 0 AND {vy} > 0"
            f" THEN ROUND({num} / SQRT({vx} * {vy}), 4) END"
        )

    return f"""
        WITH d AS (
            SELECT user_id,
                   TRY_CAST(ROUND(value * 100, 0) AS BIGINT) AS x,
                   LAG(TRY_CAST(ROUND(value * 100, 0) AS BIGINT), 1) OVER w AS y1,
                   LAG(TRY_CAST(ROUND(value * 100, 0) AS BIGINT), 2) OVER w AS y2
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        g AS (
            SELECT user_id, {stats("1")}, {stats("2")}
            FROM d GROUP BY user_id
        )
        SELECT user_id,
               CAST(n1 AS BIGINT) AS n_pairs_lag1,
               {corr("1")} AS acf1,
               {corr("2")} AS acf2
        FROM g
        WHERE n1 >= {ACF_MIN_PAIRS}
    """


# MACD: finite-horizon adjust=True EWMAs with dyadic alphas so every
# decay weight is an exact integer after scaling. Fast leg alpha=1/2
# over 8 lags (weights 2^(7-i)); slow leg alpha=1/4 over 12 lags
# (weights (3/4)^i scaled by 4^11 → 3^i·4^(11-i), max ~4.2e6 — times
# cent values times 12 terms stays ≤ ~5e12, comfortably BIGINT).
MACD_FAST_LAGS = 8
MACD_SLOW_LAGS = 12
MACD_SIGNAL_LAGS = 8


def window_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD oscillator per user over the event-value series: fast
    EWMA − slow EWMA, plus the signal line (an EWMA of the MACD) and
    the divergence histogram — the trend-change detector layered on
    the same smoother family as :func:`window_ewma`.

    Exactness: both legs are ratios of exact BIGINT sums (integer
    decay weights over exact cent values — see the lag constants
    above), so macd is a deterministic double; the signal line is an
    integer-weighted average over lagged macd doubles — identical
    IEEE expression trees in both engines, one ROUND(…, 4) at output.
    Shape: THREE window passes but all on the identical
    (user_id | ts, event_id) spec, so Catalyst plans ONE exchange +
    ONE sort and evaluates the lag stacks in two Window operators
    over it — per-key sorted-scan at 100 TB, no joins, frame-bounded
    state."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    d = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).try_cast("long").alias("v100"),
    )

    def _ewma_terms(lags: int, wt_of, src: F.Column):
        num = F.lit(0).cast("long")
        den = F.lit(0).cast("long")
        for i in range(lags):
            wt = wt_of(i)
            lag_i = src if i == 0 else F.lag(src, i).over(w)
            num = num + F.coalesce(lag_i * F.lit(wt), F.lit(0))
            den = den + F.when(lag_i.isNotNull(), F.lit(wt)).otherwise(
                F.lit(0)
            )
        return num, den

    fnum, fden = _ewma_terms(
        MACD_FAST_LAGS,
        lambda i: 1 << (MACD_FAST_LAGS - 1 - i),
        F.col("v100"),
    )
    snum, sden = _ewma_terms(
        MACD_SLOW_LAGS,
        lambda i: 3**i * 4 ** (MACD_SLOW_LAGS - 1 - i),
        F.col("v100"),
    )
    # an all-NULL frame on either leg → macd NULL (den = 0 would be an
    # ANSI DIVIDE_BY_ZERO where DuckDB yields NULL); a NULL-value row
    # inside a populated frame still averages the available samples
    staged = d.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (fden > 0) & (sden > 0),
            fnum.cast("double") / fden.cast("double")
            - snum.cast("double") / sden.cast("double"),
        ).alias("macd_raw"),
    )
    # signal line: integer-weighted EWMA over the (double) macd series
    gnum = F.lit(0.0)
    gden = F.lit(0).cast("long")
    for i in range(MACD_SIGNAL_LAGS):
        wt = 1 << (MACD_SIGNAL_LAGS - 1 - i)
        lag_i = (
            F.col("macd_raw") if i == 0 else F.lag("macd_raw", i).over(w)
        )
        gnum = gnum + F.coalesce(lag_i * F.lit(float(wt)), F.lit(0.0))
        gden = gden + F.when(lag_i.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
    sig = F.when(gden > 0, gnum / gden.cast("double"))
    return staged.select(
        "user_id",
        "event_id",
        F.round(F.col("macd_raw") / 100.0, 4).alias("macd"),
        F.round(sig / 100.0, 4).alias("signal"),
        F.round((F.col("macd_raw") - sig) / 100.0, 4).alias("macd_hist"),
    )


def _macd_oracle() -> str:
    def lag_cols(name: str, src: str, lags: int) -> str:
        return ", ".join(
            f"LAG({src}, {i}) OVER w AS {name}{i}" for i in range(1, lags)
        )

    def terms(name: str, src: str, lags: int, wt_of, zero: str):
        # current-row term coalesced/guarded like the lags — a NULL
        # value contributes neither numerator nor weight (mirrors the
        # Spark expression tree; see _ewma_oracle)
        num = " + ".join(
            [f"COALESCE({src} * {wt_of(0)}, {zero})"]
            + [
                f"COALESCE({name}{i} * {wt_of(i)}, {zero})"
                for i in range(1, lags)
            ]
        )
        den = " + ".join(
            [f"CASE WHEN {src} IS NOT NULL THEN {wt_of(0)} ELSE 0 END"]
            + [
                f"CASE WHEN {name}{i} IS NOT NULL THEN {wt_of(i)} ELSE 0 END"
                for i in range(1, lags)
            ]
        )
        return num, den

    fw = lambda i: 1 << (MACD_FAST_LAGS - 1 - i)  # noqa: E731
    sw = lambda i: 3**i * 4 ** (MACD_SLOW_LAGS - 1 - i)  # noqa: E731
    gw = lambda i: 1 << (MACD_SIGNAL_LAGS - 1 - i)  # noqa: E731
    fnum, fden = terms("f", "v100", MACD_FAST_LAGS, fw, "0")
    snum, sden = terms("s", "v100", MACD_SLOW_LAGS, sw, "0")
    gnum, gden = terms(
        "g", "macd_raw", MACD_SIGNAL_LAGS, lambda i: f"{float(gw(i))!r}", "0.0"
    )
    # the CASE weights in gden are integers even though the gnum
    # weights are float literals (mirrors the Spark expression tree)
    gden = " + ".join(
        [f"CASE WHEN macd_raw IS NOT NULL THEN {gw(0)} ELSE 0 END"]
        + [
            f"CASE WHEN g{i} IS NOT NULL THEN {gw(i)} ELSE 0 END"
            for i in range(1, MACD_SIGNAL_LAGS)
        ]
    )
    return f"""
        WITH d AS (
            SELECT user_id, event_id, ts,
                   TRY_CAST(ROUND(value * 100, 0) AS BIGINT) AS v100
            FROM events
        ),
        lagged AS (
            SELECT user_id, event_id, ts, v100,
                   {lag_cols("f", "v100", MACD_FAST_LAGS)},
                   {lag_cols("s", "v100", MACD_SLOW_LAGS)}
            FROM d
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        staged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN ({fden}) > 0 AND ({sden}) > 0
                        THEN CAST({fnum} AS DOUBLE) / CAST({fden} AS DOUBLE)
                             - CAST({snum} AS DOUBLE) / CAST({sden} AS DOUBLE)
                   END AS macd_raw
            FROM lagged
        ),
        siglag AS (
            SELECT user_id, event_id, macd_raw,
                   {lag_cols("g", "macd_raw", MACD_SIGNAL_LAGS)}
            FROM staged
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        )
        SELECT user_id, event_id,
               ROUND(macd_raw / 100.0, 4) AS macd,
               CASE WHEN ({gden}) > 0
                    THEN ROUND(({gnum}) / CAST({gden} AS DOUBLE)
                               / 100.0, 4) END AS signal,
               CASE WHEN ({gden}) > 0
                    THEN ROUND((macd_raw - ({gnum}) / CAST({gden} AS DOUBLE))
                               / 100.0, 4) END AS macd_hist
        FROM siglag
    """


def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing window functions over each event type:
    percent_rank (share of peers strictly below), dense_rank, and the
    third-lowest value so far (nth_value over an explicit running
    frame) — the remaining rank-function API surface next to
    window_rank / window_cume_dist / window_ntile.

    Shape: ONE event_type-keyed window exchange carries all three
    functions (identical partition + order spec, so Catalyst plans a
    single Window node / single sort). Determinism: ties broken by
    event_id; percent_rank rounds at 6 (it divides by n−1).
    Scale note: per-type partitions are value-domain wide — this is
    the API-coverage twin; rank statistics at corpus scale go through
    the histogram discipline (agg_pareto_share)."""
    ev = load_table(spark, sf_dir, "events")
    # NULLS LAST pinned explicitly: Spark defaults ASC to NULLS FIRST,
    # DuckDB to NULLS LAST — events.value happens to be NULL-free today,
    # but the ordering semantics must not hinge on that (ADVICE r12)
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "event_type",
        F.round("value", 4).alias("value"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.dense_rank().over(w).cast("bigint").alias("dense_rk"),
        F.round(F.nth_value("value", 3).over(wrun), 4).alias(
            "third_lowest"
        ),
    )


_PERCENT_RANK_ORACLE = """
    SELECT event_id, event_type,
           ROUND(value, 4) AS value,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS dense_rk,
           ROUND(NTH_VALUE(value, 3) OVER (PARTITION BY event_type
                 ORDER BY value ASC NULLS LAST, event_id ASC NULLS LAST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 4) AS third_lowest
    FROM events
    WINDOW w AS (PARTITION BY event_type
                 ORDER BY value ASC NULLS LAST, event_id ASC NULLS LAST)
"""


QUERIES = {
    "window_percent_rank": window_percent_rank,
    "window_rank": window_rank,
    "window_bollinger_bands": window_bollinger_bands,
    "window_rsi": window_rsi,
    "window_ewma": window_ewma,
    "window_rolling_median": window_rolling_median,
    "window_rolling_mad_anomaly": window_rolling_mad_anomaly,
    "window_cusum_drift": window_cusum_drift,
    "window_drawdown": window_drawdown,
    "window_running_sum": window_running_sum,
    "window_lag_delta": window_lag_delta,
    "window_range_frame": window_range_frame,
    "topk_orders": topk_orders,
    "window_moving_avg": window_moving_avg,
    "window_distinct_count": window_distinct_count,
    "window_cume_dist": window_cume_dist,
    "window_autocorr": window_autocorr,
    "window_macd": window_macd,
}

ORACLES = {
    "window_percent_rank": _PERCENT_RANK_ORACLE,
    "window_autocorr": _autocorr_oracle(),
    "window_macd": _macd_oracle(),
    "window_ewma": _ewma_oracle(),
    "window_bollinger_bands": _bollinger_oracle(),
    "window_rsi": _rsi_oracle(),
    "window_rolling_median": _rollmed_oracle(),
    "window_rolling_mad_anomaly": _rollmad_oracle(),
    "window_cusum_drift": _cusum_oracle(),
    "window_drawdown": _drawdown_oracle(),
    "window_distinct_count": """
        SELECT event_id, user_id,
               CAST(COUNT(DISTINCT event_type) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS INTEGER) AS n_types_so_far
        FROM events
    """,
    "window_moving_avg": """
        SELECT event_id, user_id,
               ROUND(AVG(value) OVER w, 4) AS ma5,
               COUNT(*) OVER w AS frame_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
    """,
    "window_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders)
        WHERE rn <= 3
    """,
    "window_running_sum": """
        SELECT user_id,
               event_id,
               ROUND(SUM(value) OVER (PARTITION BY user_id
                                      ORDER BY ts ASC, event_id ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                   AS running_value
        FROM events
    """,
    "window_lag_delta": """
        SELECT user_id,
               event_id,
               ROUND(EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id
                                                     ORDER BY ts ASC, event_id ASC)), 4)
                   AS gap_seconds
        FROM events
    """,
    "window_range_frame": """
        SELECT user_id,
               event_id,
               ROUND(SUM(value) OVER w, 4) AS hour_value,
               COUNT(*) OVER w AS hour_events
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    "topk_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 20
    """,
    "window_cume_dist": """
        SELECT c_custkey,
               c_mktsegment,
               ROUND(c_acctbal, 4) AS c_acctbal,
               ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 4) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC)
    """,
}

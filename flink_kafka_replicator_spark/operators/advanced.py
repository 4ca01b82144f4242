"""Advanced relational operators Spark lacks as built-ins.

The reference's dataflow surface is the identity function
(``FlinkKafkaReplicator.java:126-134``); these operators extend the
declared analytics surface (SURVEY.md §2.5) with the shapes a
time-series / training-data pipeline needs and that vanilla Spark has no
single primitive for: as-of joins, per-group top-k, and skew-safe
aggregation. Each is a composition of built-in DataFrame ops — no UDFs,
no Catalyst changes — chosen for its 100 TB plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table, materialize_small, trunc_ntz

TOPK_PER_GROUP = 3
SKEW_SALT_BUCKETS = 16


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click event matched to the latest view
    event by the same user at-or-before the click's timestamp.

    Implementation is the scale-correct union trick, NOT a range join:
    tag both sides, union, and carry the right side forward with
    ``last(ignorenulls)`` over a (user, time)-ordered running window.
    One shuffle on the join key, sort within partitions, zero pair
    explosion — a range-predicate join would degenerate to a per-user
    cross product, and per-key ``collect_list`` would OOM on hot keys.
    Sort order (ts, side) with views first makes an equal-timestamp view
    visible to the click, matching ASOF's ``>=`` bound.
    """
    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("double").alias("click_value"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
        F.lit(None).cast("timestamp").alias("view_ts"),
        F.lit(None).cast("double").alias("view_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # ONE struct carried forward, not per-column last(ignorenulls):
    # separate carries desynchronize on a NULL view value (the ts would
    # track the newest view while the value falls back to an older
    # one); ASOF semantics match the latest ROW, value as-is — pinned
    # against DuckDB's native ASOF JOIN by tests/adversarial_sweep.py
    m_view = F.last(
        F.when(
            F.col("side") == 0,
            F.struct(
                F.col("view_ts").alias("ts"),
                F.col("view_value").alias("val"),
            ),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        views.unionByName(clicks)
        .withColumn("m_view", m_view)
        .filter(F.col("side") == 1)
        .select(
            "click_id",
            "user_id",
            F.col("ts").alias("click_ts"),
            F.round("click_value", 4).alias("click_value"),
            F.col("m_view.ts").alias("view_ts"),
            F.round("m_view.val", 4).alias("view_value"),
        )
    )


ASOF_TOLERANCE_S = 3600


def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a MAX STALENESS bound — pandas
    ``merge_asof(tolerance=...)``: each click matched to the latest
    same-user view at-or-before it, but only if that view is within
    ASOF_TOLERANCE_S seconds; older matches null out (left-join
    semantics keep the click). The bound is what makes as-of joins
    safe in feature pipelines — an hours-stale "latest" attribution is
    usually worse than none.

    Same union-trick plan as :func:`join_asof` (one user_id exchange,
    zero pair explosion); the tolerance is one map-side integer
    microsecond comparison applied after the carry-forward, so the
    plan cost is identical to the unbounded form."""
    matched = join_asof(spark, sf_dir)
    in_tol = F.expr(
        "unix_micros(click_ts) - unix_micros(view_ts)"
        f" <= {ASOF_TOLERANCE_S}L * 1000000L"
    )
    return matched.select(
        "click_id",
        "user_id",
        "click_ts",
        "click_value",
        F.when(in_tol, F.col("view_ts")).alias("view_ts"),
        F.when(in_tol, F.col("view_value")).alias("view_value"),
        F.when(
            in_tol,
            F.expr(
                "(unix_micros(click_ts) - unix_micros(view_ts))"
                " div 1000000"
            ),
        )
        .cast("bigint")
        .alias("staleness_s"),
    )


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k rows per group (k=3 priciest orders per priority class).

    ``row_number`` over a partitioned window + rank filter: the shuffle
    is one hash exchange on the group key and the filter cuts each
    partition to k rows before anything downstream — never a global
    sort. Tie-broken on the unique key so results are deterministic.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPK_PER_GROUP)
        .select(
            "o_orderpriority",
            "rk",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("o_totalprice"),
        )
    )


def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation: salt the group key into
    SKEW_SALT_BUCKETS sub-keys, partially aggregate, then combine.

    With only a handful of event types, a plain ``groupBy(event_type)``
    at 100 TB funnels each type through one reducer; salting fans the
    heavy keys across the cluster and the final combine touches
    #types × #salts rows. Result is identical to the unsalted
    aggregate — which is exactly what the oracle checks. (AQE's skew
    handling covers joins; skewed *aggregation* keys still need this.)
    """
    e = load_table(spark, sf_dir, "events")
    partial = (
        e.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(SKEW_SALT_BUCKETS)))
        .groupBy("event_type", "salt")
        .agg(F.count("*").alias("pn"), F.sum("value").alias("psum"))
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.round(F.sum("psum"), 4).alias("sum_value"),
        F.round(F.sum("psum") / F.sum("pn"), 4).alias("avg_value"),
    )


def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile bucket + percent_rank +
    cume_dist per priority class, windows partitioned (never a single
    global window, which would serialize on one task)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


# (session appId, sf_dir) → pinned hourly rollup for gap_fill_locf.
# The pin is an EAGER checkpoint, so without a memo every query build
# would re-run its jobs (tests/test_build_guard.py).
_HOURLY_CACHE: dict[tuple[str, str], DataFrame] = {}


def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap fill + last-observation-carried-forward: a
    dense hourly grid per event_type (sequence + explode over each key's
    own [min, max] span), counts zero-filled, sums carried forward with
    last(ignorenulls) over an ordered per-key window.

    Scale shape: events collapse to one row per (key, hour) BEFORE any
    join — everything downstream is proportional to grid size (keys ×
    hours), not event count. The hourly rollup feeds both the bounds agg
    and the final join; it is tiny, so materialize_small pins it and the
    event scan runs exactly once (same move as the LSH candidate table in
    pipeline_queries; uses the reliable checkpoint dir when one is
    configured).
    """
    import os

    ck = (spark.sparkContext.applicationId, os.path.normpath(sf_dir))
    hourly = _HOURLY_CACHE.get(ck)
    if hourly is None:
        ev = load_table(spark, sf_dir, "events")
        hourly = materialize_small(
            ev.groupBy("event_type", trunc_ntz("hour", "ts").alias("h")).agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
        )
        from ..functions.pipeline_queries import _cache_put

        _cache_put(_HOURLY_CACHE, ck, hourly)
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_locf"),
    )


def resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per (event_type, hour), the opening value
    (earliest event), high, low, and closing value (latest event) — the
    canonical time-series resample. max_by/min_by on (ts, event_id)
    pick open/close inside ONE hash aggregate: no window, no sort, no
    self-join; partials combine map-side so the shuffle carries only
    agg buffers. The fixture's nanosecond timestamps are unique per
    event_type (verified at every SF), so ts alone is a deterministic
    open/close key; production data with ts ties would use a composite
    (ts, sequence) key instead."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", trunc_ntz("hour", "ts").alias("hour"))
        .agg(
            F.round(F.min_by("value", F.col("ts")), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", F.col("ts")), 4).alias("close"),
            F.count("*").alias("n_events"),
        )
    )


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC change log → SCD2 dimension history: each (user, event_type)
    change event becomes a versioned row with [valid_from, valid_to)
    and a current-row flag — the MERGE-less construction (Spark has no
    MERGE INTO without a lakehouse format): one window pass, valid_to =
    lead(ts), no join, no union. Rebuilding history from the full log
    this way is idempotent, which is what replaces transactional MERGE
    at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_type",
        F.round("value", 4).alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


SESSION_GAP_SECONDS = 600


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT sessionization (gaps-and-islands): assign every event its
    per-user session sequence number — the batch face of session_window
    that keeps event granularity (stream_session only emits per-session
    aggregates; training pipelines need the session id ON each event to
    build per-session examples).

    Two stacked windows over ONE user_id shuffle: lag(ts) flags session
    starts (gap > SESSION_GAP_SECONDS), a running sum of flags numbers
    the sessions. Spark evaluates both window batches in the same
    exchange — no second shuffle.

    Skew note: a window partition is one user's full history, so a
    pathological hot key (one user = billions of events) serializes on
    one task. Sessionization cannot be salted (the running sum is
    order-dependent across the whole key); the scale mitigation is
    time-range pre-splitting (sessionize per day, then merge boundary
    sessions) — the same trade Flink's keyed session windows make."""
    return sessionize(
        load_table(spark, sf_dir, "events"), gap_seconds=SESSION_GAP_SECONDS
    )


def sessionize(ev: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Core gaps-and-islands over any (user_id, event_id, ts) frame —
    split out of sessionize_events so property tests can drive it with
    synthetic boundary cases (gap exactly == gap_seconds, ts ties)."""
    return sessionize_with_ts(ev, gap_seconds).select(
        "user_id", "event_id", "session_seq"
    )


def sessionize_with_ts(
    ev: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """:func:`sessionize` keeping ``ts`` on each row: the window pass
    already orders by ts, so consumers that need per-session time
    bounds (peak concurrency, session durations) read it here instead
    of re-joining the event stream on event_id — that join was a full
    event_id exchange of BOTH sides purely to recover a column this
    pass had in hand (round 13; guide §2.4 remove-shuffles)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull()
        | (
            F.col("ts").cast("double") - prev.cast("double")
            > float(gap_seconds)
        ),
        1,
    ).otherwise(0)
    flagged = ev.select("user_id", "event_id", "ts", new_s.alias("new_s"))
    wc = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return flagged.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("new_s").over(wc).cast("int").alias("session_seq"),
    )


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (either direction): each click matched to the
    view event by the same user with the smallest |Δt| — sensor/event
    alignment where "latest before" is the wrong bias (pandas
    merge_asof direction='nearest').

    Scale shape: the SAME union trick as join_asof run in both
    directions inside ONE (user, time)-sorted window pass — a backward
    last(ignorenulls) and a forward first(ignorenulls) — then a
    two-candidate pick. Still one shuffle, zero pair explosion; a
    |Δt|-argmin range join would be a per-user cross product. An
    equal-timestamp view sorts before the click (side ordering), so it
    is the backward candidate — and backward wins exact |Δt| ties, the
    merge_asof convention. All Δt math in integer microseconds."""
    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("timestamp").alias("view_ts"),
    )
    ord_cols = [F.col("ts").asc(), F.col("side").asc()]
    w_b = (
        Window.partitionBy("user_id")
        .orderBy(*ord_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_f = (
        Window.partitionBy("user_id")
        .orderBy(*ord_cols)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    both = (
        views.unionByName(clicks)
        .withColumn("b_ts", F.last("view_ts", ignorenulls=True).over(w_b))
        .withColumn("f_ts", F.first("view_ts", ignorenulls=True).over(w_f))
        .filter(F.col("side") == 1)
    )
    c_us = F.unix_micros("ts")
    b_d = c_us - F.unix_micros("b_ts")
    f_d = F.unix_micros("f_ts") - c_us
    take_b = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull() | (b_d <= f_d)
    )
    chosen = F.when(take_b, F.col("b_ts")).otherwise(F.col("f_ts"))
    return both.select(
        "click_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        chosen.alias("view_ts"),
        # exact signed microseconds, no divided-and-rounded seconds:
        # a /1e6 quotient can land exactly on a round-half boundary
        # where the two engines' ROUND disagree by 1e-4
        (F.unix_micros(chosen) - c_us).alias("delta_us"),
        F.when(chosen.isNull(), F.lit(None).cast("string"))
        .when(take_b, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


# Z-order layout: 8 low bits of each key interleaved into a 16-bit
# curve value; 256 file buckets = the top 8 curve bits.
_Z_KEY_BITS = 8
_Z_BUCKET_SHIFT = 8


def _z_interleave(col: str, offset: int) -> str:
    """SQL summing bit i of ``col`` shifted to curve position 2i+offset
    — unrolled integer bit arithmetic, identical text in both engines."""
    return " + ".join(
        f"((({col} >> {i}) & 1) << {2 * i + offset})"
        for i in range(_Z_KEY_BITS)
    )


def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton curve) clustering audit for a two-key scan
    workload: interleave the low 8 bits of (l_partkey, l_suppkey) into a
    16-bit curve value, assign each row to one of 256 curve-range file
    buckets, and report per-bucket row counts plus the min/max of each
    binned key — the locality evidence: every bucket covers a narrow
    rectangle of the key space, so a scan filtered on EITHER key prunes
    most buckets (the property Delta/Iceberg OPTIMIZE ZORDER buys).

    At 100 TB this is the write-path layout job: compute z, repartition
    by range on it, write. Pure unrolled integer bit arithmetic — one
    codegen'd projection, one aggregate exchange on the bucket id."""
    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        F.expr(f"l_partkey & {(1 << _Z_KEY_BITS) - 1}").alias("xb"),
        F.expr(f"l_suppkey & {(1 << _Z_KEY_BITS) - 1}").alias("yb"),
    ).select(
        "xb",
        "yb",
        F.expr(
            f"({_z_interleave('xb', 0)}) + ({_z_interleave('yb', 1)})"
        ).alias("z"),
    )
    return (
        z.select("xb", "yb", F.expr(f"z >> {_Z_BUCKET_SHIFT}").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("xb").alias("min_x"),
            F.max("xb").alias("max_x"),
            F.min("yb").alias("min_y"),
            F.max("yb").alias("max_y"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_rows",
            "min_x",
            "max_x",
            "min_y",
            "max_y",
            # rectangle area each bucket covers: small == good locality
            (
                (F.col("max_x") - F.col("min_x") + 1)
                * (F.col("max_y") - F.col("min_y") + 1)
            ).alias("key_rect_area"),
        )
    )


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of the event value — the LOCF
    integral timeseries engines ship as ``twavg``: each value holds
    until the next observation, so the mean weights each value by its
    holding duration instead of over-counting burst samples.

    Shape: one lead() window per user (the sessionize exchange), exact
    integer-microsecond durations, one aggregate — weighted sums in
    int×int products divided once at the end, so both engines agree
    bit-for-bit. The last observation of a user carries zero weight
    (nothing to hold until), the standard open-interval convention."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    d = e.select(
        "user_id",
        "value",
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias(
            "hold_us"
        ),
    )
    return (
        d.filter(F.col("hold_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            # value has 2 decimals: value*100 is an exact integer, so
            # sum(value*100*hold_us) is exact integer arithmetic and
            # the single final division is deterministic. The product
            # accumulates in DECIMAL(38,0), not BIGINT: a long gap
            # (pre-epoch outlier, or simply enough cents×micros) pushes
            # cents×micros past 2^63 and both engines raise on INT64
            # overflow — the oracle multiplies in HUGEINT for the same
            # reason (pinned by tests/adversarial_sweep.py)
            (
                # try_cast: a NaN/Inf measure is MISSING (NULL cents) —
                # the interval contributes time but no value weight,
                # the same contract as a NULL value
                F.sum(
                    (
                        F.round(F.col("value") * 100)
                        .try_cast("long")
                        .cast("decimal(38,0)")
                    )
                    * F.col("hold_us")
                ).cast("double")
                / F.lit(100.0)
            ).alias("_wsum"),
            F.sum("hold_us").alias("_tspan"),
        )
        .select(
            "user_id",
            "n_intervals",
            F.round(F.col("_wsum") / F.col("_tspan"), 4).alias("twavg"),
            F.round(F.col("_tspan") / F.lit(1_000_000.0), 4).alias(
                "span_sec"
            ),
        )
    )


def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the SCD2 dimension history — the
    read side of :func:`scd2_history` and the query every
    training-data pipeline runs to avoid feature leakage: "what was
    this attribute's value AS OF time T", answered from the versioned
    rows, never from current state.

    The probe instant is derived in-plan — the exact microsecond
    midpoint of the event time range, a deterministic data-dependent T
    from ONE min/max aggregate (never a global sort) — and broadcast
    as one row; the lookup is the half-open interval containment
    valid_from <= T < valid_to (open-ended current rows match any
    future T). Exactly one version matches per key by the SCD2
    construction — pinned in pytest.

    At 100 TB: history is scanned once with a map-side containment
    filter against the broadcast probe — no join explosion, no window;
    with the history stored partitioned on valid_from date the filter
    also prunes partitions."""
    ev = load_table(spark, sf_dir, "events")
    probe = ev.agg(
        F.expr(
            "timestamp_micros(cast((unix_micros(min(ts))"
            " + unix_micros(max(ts))) div 2 as bigint))"
        ).alias("t_probe")
    )
    hist = scd2_history(spark, sf_dir)
    return (
        hist.crossJoin(F.broadcast(probe))
        .filter(
            (F.col("valid_from") <= F.col("t_probe"))
            & (
                F.col("valid_to").isNull()
                | (F.col("t_probe") < F.col("valid_to"))
            )
        )
        .select(
            "user_id",
            "event_type",
            "attr_value",
            "version",
            "is_current",
            "t_probe",
        )
    )


def session_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-shape distribution over the engine's own sessionizer:
    per session LENGTH (event count), how many sessions, their share,
    and the mean duration — the table that justifies (or indicts) the
    session gap setting before anything downstream consumes sessions.

    Shape: the sessionizer's one user_id exchange, a per-(user,
    session) aggregate carrying exact min/max epoch-micros, then a
    ≤|max length| histogram; the mean duration divides exact integer
    micros sums ONCE at output. No float aggregates anywhere."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    sess = (
        sessionize_with_ts(ev, gap_seconds=SESSION_GAP_SECONDS)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").cast("int").alias("session_len"),
            (
                F.expr("max(unix_micros(ts))")
                - F.expr("min(unix_micros(ts))")
            ).alias("dur_us"),
        )
    )
    hist = sess.groupBy("session_len").agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum("dur_us").cast("bigint").alias("sdur"),
    )
    # share denominator as a scalar subquery (round 14): replaces the
    # partitionBy(lit(1)) window — no SinglePartition exchange; the
    # total's agg reuses the histogram exchange (ReusedExchange)
    tot = hist.agg(F.sum("n_sessions").alias("t"))
    return (
        hist
        .select(
            "session_len",
            "n_sessions",
            F.round(
                F.col("n_sessions").cast("double") / tot.scalar(),
                6,
            ).alias("session_share"),
            F.round(
                F.col("sdur").cast("double")
                / (F.col("n_sessions") * 1000000.0),
                3,
            ).alias("mean_duration_sec"),
        )
    )


TSD_PERIOD = 7  # weekly seasonality over the daily series


def time_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily order-
    revenue series: revenue = trend + seasonal + residual, with trend
    a centered 7-day moving average, seasonal the ISO-weekday mean of
    the detrended series, residual the remainder — the moving-average
    step of STL, the first thing a forecasting pipeline fits and the
    view an anomaly review reads (is the dip trend, weekday, or
    genuinely anomalous?).

    Scale shape — the histogram discipline applied to time series:
    the corpus-sized scan collapses FIRST to one exact-cent row per
    calendar day (a hash agg; the shuffle carries ≤ days rows
    regardless of order count), and every window/self-join after that
    runs over the bounded daily series (~2.5k rows for 7 years — the
    eval_roc_auc distinct-histogram argument), so the unpartitioned
    ORDER BY day window is a bounded-cardinality sort by
    construction, not a corpus sort. Exactness: trend·7 and the
    seasonal numerator (Σ of rev·7 − trend·7, i.e. 700× the real
    values) stay exact BIGINT cents; only the three output divisions
    are float, identically structured in both engines. Only days with
    a full 7-observed-day centered frame emit (calendar gaps widen
    the frame's span — documented, matching statsmodels' NaN edge)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "rev100"
        )
    )
    half = TSD_PERIOD // 2
    w = (
        Window.orderBy(F.col("day").asc())
        .rowsBetween(-half, half)
    )
    # the window runs over the daily series, not the orders table
    trended = (
        daily.withColumn("n_frame", F.count("*").over(w))
        .withColumn("trend7", F.sum("rev100").over(w))
        .filter(F.col("n_frame") == TSD_PERIOD)
        .withColumn(
            "iso_weekday",
            (F.weekday("day") + F.lit(1)).cast("int"),
        )
        .withColumn(
            "detrend7", F.col("rev100") * TSD_PERIOD - F.col("trend7")
        )
    )
    seasonal = trended.groupBy("iso_weekday").agg(
        F.sum("detrend7").alias("snum"),
        F.count("*").alias("scnt"),
    )
    rev = F.col("rev100").cast("double") / 100.0
    trend = F.col("trend7").cast("double") / (TSD_PERIOD * 100.0)
    seas = F.col("snum").cast("double") / (
        F.col("scnt").cast("double") * (TSD_PERIOD * 100.0)
    )
    return (
        trended.join(F.broadcast(seasonal), "iso_weekday")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "iso_weekday",
            F.round(rev, 2).alias("revenue"),
            F.round(trend, 4).alias("trend"),
            F.round(seas, 4).alias("seasonal"),
            F.round(rev - trend - seas, 4).alias("residual"),
        )
    )


def _seasonal_decompose_oracle() -> str:
    p = TSD_PERIOD
    half = p // 2
    return f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                       AS rev100
            FROM orders GROUP BY 1
        ),
        trended AS (
            SELECT day, rev100,
                   COUNT(*) OVER w AS n_frame,
                   SUM(rev100) OVER w AS trend7,
                   CAST(isodow(day) AS INTEGER) AS iso_weekday,
                   rev100 * {p} - SUM(rev100) OVER w AS detrend7
            FROM daily
            WINDOW w AS (ORDER BY day ASC
                         ROWS BETWEEN {half} PRECEDING
                         AND {half} FOLLOWING)
        ),
        full_frames AS (
            SELECT * FROM trended WHERE n_frame = {p}
        ),
        seasonal AS (
            SELECT iso_weekday, SUM(detrend7) AS snum,
                   COUNT(*) AS scnt
            FROM full_frames GROUP BY iso_weekday
        )
        SELECT CAST(day AS TIMESTAMP) AS day, f.iso_weekday,
               ROUND(CAST(rev100 AS DOUBLE) / 100.0, 2) AS revenue,
               ROUND(CAST(trend7 AS DOUBLE) / ({p} * 100.0), 4) AS trend,
               ROUND(CAST(snum AS DOUBLE)
                     / (CAST(scnt AS DOUBLE) * ({p} * 100.0)), 4)
                   AS seasonal,
               ROUND(CAST(rev100 AS DOUBLE) / 100.0
                     - CAST(trend7 AS DOUBLE) / ({p} * 100.0)
                     - CAST(snum AS DOUBLE)
                       / (CAST(scnt AS DOUBLE) * ({p} * 100.0)), 4)
                   AS residual
        FROM full_frames f
        JOIN seasonal s ON s.iso_weekday = f.iso_weekday
    """


def time_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per
    (event_type, hour) bucket keep exactly the first, last, min and
    max values — the four points that make a line chart of the bucket
    pixel-identical to the full series. The dashboard-serving
    downsample: a year of per-event data collapses to 4 points per
    pixel column regardless of event volume.

    Shape: two row_number stacks (forward/backward) sharing ONE
    (event_type, hour) exchange, then a single conditional hash
    aggregate; min/max are plain aggregates on exact cents. Output is
    bucket-count-sized. Deterministic endpoints: ties broken on
    event_id in both engines."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "event_type",
        trunc_ntz("hour", F.col("ts")).alias("bucket"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).try_cast("long").alias("v100"),
    )
    fwd = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    bwd = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    staged = d.select(
        "event_type",
        "bucket",
        "v100",
        F.row_number().over(fwd).alias("rf"),
        F.row_number().over(bwd).alias("rb"),
    )
    cents = lambda c: F.round(c.cast("double") / 100.0, 2)  # noqa: E731
    return staged.groupBy("event_type", "bucket").agg(
        F.count("*").cast("bigint").alias("n_points"),
        cents(F.max(F.when(F.col("rf") == 1, F.col("v100")))).alias(
            "v_first"
        ),
        cents(F.max(F.when(F.col("rb") == 1, F.col("v100")))).alias(
            "v_last"
        ),
        cents(F.min("v100")).alias("v_min"),
        cents(F.max("v100")).alias("v_max"),
    )


_M4_ORACLE = """
    WITH d AS (
        SELECT event_type,
               date_trunc('hour', ts) AS bucket,
               ts, event_id,
               TRY_CAST(ROUND(value * 100, 0) AS BIGINT) AS v100
        FROM events
    ),
    staged AS (
        SELECT event_type, bucket, v100,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                   ORDER BY ts ASC, event_id ASC) AS rf,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                   ORDER BY ts DESC, event_id DESC) AS rb
        FROM d
    )
    SELECT event_type, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(CAST(MAX(CASE WHEN rf = 1 THEN v100 END) AS DOUBLE)
                 / 100.0, 2) AS v_first,
           ROUND(CAST(MAX(CASE WHEN rb = 1 THEN v100 END) AS DOUBLE)
                 / 100.0, 2) AS v_last,
           ROUND(CAST(MIN(v100) AS DOUBLE) / 100.0, 2) AS v_min,
           ROUND(CAST(MAX(v100) AS DOUBLE) / 100.0, 2) AS v_max
    FROM staged
    GROUP BY event_type, bucket
"""


def merge_intervals(
    iv: DataFrame, key: str, tie_cols: list[str] | None = None
) -> DataFrame:
    """Union overlapping/adjacent closed integer intervals per key.

    Input columns: ``key``, ``s``, ``e`` (integer day/unit bounds,
    s ≤ e) plus optional ``tie_cols`` for deterministic ordering of
    identical bounds. Output: one row per merged island — (key,
    island, m_start, m_end, n_raw). Gaps-and-islands: a new island
    starts where an interval's start clears the running max of all
    earlier ends by more than one unit; ONE key-keyed window exchange
    carries both the running max and the island counter."""
    order = [F.col("s").asc(), F.col("e").asc()] + [
        F.col(c).asc() for c in (tie_cols or [])
    ]
    w = Window.partitionBy(key).orderBy(*order)
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e + 1), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return islands.groupBy(key, "island").agg(
        F.min("s").alias("m_start"),
        F.max("e").alias("m_end"),
        F.count("*").cast("bigint").alias("n_raw"),
    )


def intervals_merge_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping order-fulfillment intervals per customer —
    the classic interval-union: each order spans [orderdate, last
    lineitem shipdate]; a customer with overlapping open orders counts
    those calendar days ONCE (distinct days with at least one order in
    flight). The gaps-and-islands recipe: a new island starts where an
    interval's start clears the running max of all earlier ends;
    island id = running count of starts.

    Shape: one orderkey-keyed agg builds the spans (co-partitioned
    orders⨝lineitem shuffle), then ONE customer-keyed window exchange
    carries both the running-max-end and the island counter (same
    frame), a (customer, island) hash agg and a per-customer rollup —
    no self-join, no explode-per-day (the naive coverage count
    explodes ~70 rows per order; this stays one row per order).
    Closed-interval semantics: touching or adjacent-by-one-day
    intervals merge (start ≤ prev_end + 1); inverted spans clamp to
    the start day. Determinism: ties ordered by (start, end,
    orderkey). All integer day arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    close = li.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("close_date")
    )
    iv = (
        o.select("o_orderkey", "o_custkey", "o_orderdate")
        .join(close, F.col("o_orderkey") == F.col("l_orderkey"), "inner")
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(
                F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
            ).alias("s"),
            F.greatest(
                F.datediff(
                    F.col("close_date"), F.to_date(F.lit("1970-01-01"))
                ),
                F.datediff(
                    F.to_date("o_orderdate"),
                    F.to_date(F.lit("1970-01-01")),
                ),
            ).alias("e"),
        )
    )
    merged = merge_intervals(iv, "o_custkey", tie_cols=["o_orderkey"])
    return (
        merged.groupBy("o_custkey")
        .agg(
            F.sum("n_raw").cast("bigint").alias("n_orders"),
            F.count("*").cast("bigint").alias("n_merged_intervals"),
            F.sum(F.col("m_end") - F.col("m_start") + 1)
            .cast("bigint")
            .alias("covered_days"),
            F.max(F.col("m_end") - F.col("m_start") + 1)
            .cast("bigint")
            .alias("longest_interval_days"),
        )
        .select(
            "o_custkey",
            "n_orders",
            "n_merged_intervals",
            "covered_days",
            "longest_interval_days",
        )
    )


_INTERVALS_MERGE_ORACLE = """
    WITH close AS (
        SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_date
        FROM lineitem GROUP BY l_orderkey
    ),
    iv AS (
        SELECT o.o_custkey, o.o_orderkey,
               date_diff('day', DATE '1970-01-01',
                         CAST(o.o_orderdate AS DATE)) AS s,
               GREATEST(
                   date_diff('day', DATE '1970-01-01', c.close_date),
                   date_diff('day', DATE '1970-01-01',
                             CAST(o.o_orderdate AS DATE))) AS e
        FROM orders o JOIN close c ON o.o_orderkey = c.l_orderkey
    ),
    flagged AS (
        SELECT o_custkey, o_orderkey, s, e,
               CASE WHEN MAX(e) OVER (PARTITION BY o_custkey
                        ORDER BY s, e, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) IS NULL
                    OR s > MAX(e) OVER (PARTITION BY o_custkey
                        ORDER BY s, e, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) + 1
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT o_custkey, s, e,
               SUM(new_island) OVER (PARTITION BY o_custkey
                   ORDER BY s, e, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM flagged
    ),
    merged AS (
        SELECT o_custkey, island,
               MIN(s) AS m_start, MAX(e) AS m_end,
               CAST(COUNT(*) AS BIGINT) AS n_raw
        FROM islands GROUP BY o_custkey, island
    )
    SELECT o_custkey,
           CAST(SUM(n_raw) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_merged_intervals,
           CAST(SUM(m_end - m_start + 1) AS BIGINT) AS covered_days,
           CAST(MAX(m_end - m_start + 1) AS BIGINT)
               AS longest_interval_days
    FROM merged GROUP BY o_custkey
"""


def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog timeline: orders open at end of each
    day (opened on or before, not yet fully received) — the
    work-in-progress curve an operations dashboard draws, computed as
    a sweep over daily open/close deltas instead of an
    order×day explode.

    Shape: close day = max lineitem shipdate per order (one
    orderkey-keyed agg); open/close events collapse to DAY grain
    first, so the only unpartitioned cumulative window runs over the
    ~2.5k-row daily series (the bounded-series discipline from
    time_seasonal_decompose), never the order stream. Backlog is a
    running sum of exact integer deltas. Orders appear on both sides
    of one inner join on orderkey — co-partitioned shuffle, no
    broadcast needed at any scale."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    close = li.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("close_date")
    )
    spans = o.select(
        "o_orderkey", F.to_date("o_orderdate").alias("open_date")
    ).join(close, F.col("o_orderkey") == F.col("l_orderkey"), "inner")
    opened = spans.groupBy(
        F.col("open_date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("opened"))
    closed = spans.groupBy(
        F.col("close_date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("closed"))
    daily = (
        opened.join(closed, "day", "full_outer")
        .select(
            "day",
            F.coalesce("opened", F.lit(0)).cast("bigint").alias("opened"),
            F.coalesce("closed", F.lit(0)).cast("bigint").alias("closed"),
        )
    )
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return daily.select(
        F.col("day").cast("timestamp").alias("day"),
        "opened",
        "closed",
        F.sum(F.col("opened") - F.col("closed"))
        .over(wcum)
        .cast("bigint")
        .alias("backlog"),
    )


_OPEN_BACKLOG_ORACLE = """
    WITH close AS (
        SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_date
        FROM lineitem GROUP BY l_orderkey
    ),
    spans AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS open_date,
               c.close_date
        FROM orders o JOIN close c ON o.o_orderkey = c.l_orderkey
    ),
    opened AS (
        SELECT open_date AS day,
               CAST(COUNT(*) AS BIGINT) AS opened
        FROM spans GROUP BY 1
    ),
    closed AS (
        SELECT close_date AS day,
               CAST(COUNT(*) AS BIGINT) AS closed
        FROM spans GROUP BY 1
    ),
    daily AS (
        SELECT COALESCE(o.day, c.day) AS day,
               CAST(COALESCE(o.opened, 0) AS BIGINT) AS opened,
               CAST(COALESCE(c.closed, 0) AS BIGINT) AS closed
        FROM opened o FULL OUTER JOIN closed c ON o.day = c.day
    )
    SELECT CAST(day AS TIMESTAMP) AS day, opened, closed,
           CAST(SUM(opened - closed) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS backlog
    FROM daily
"""


QUERIES = {
    "intervals_merge_overlaps": intervals_merge_overlaps,
    "orders_open_backlog": orders_open_backlog,
    "time_seasonal_decompose": time_seasonal_decompose,
    "time_downsample_m4": time_downsample_m4,
    "session_length_stats": session_length_stats,
    "join_asof": join_asof,
    "join_asof_tolerance": join_asof_tolerance,
    "scd2_point_in_time": scd2_point_in_time,
    "topk_per_group": topk_per_group,
    "agg_salted_skew": agg_salted_skew,
    "gap_fill_locf": gap_fill_locf,
    "resample_ohlc": resample_ohlc,
    "scd2_history": scd2_history,
    "window_ntile": window_ntile,
    "sessionize_events": sessionize_events,
    "layout_zorder": layout_zorder,
    "time_weighted_avg": time_weighted_avg,
    "join_asof_nearest": join_asof_nearest,
}

def _session_length_stats_oracle() -> str:
    return f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                        OR epoch(ts) - epoch(LAG(ts) OVER w)
                           > {float(SESSION_GAP_SECONDS)}
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY ts ASC, event_id ASC)
        ),
        sessioned AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_seq
            FROM flagged
        ),
        sess AS (
            SELECT user_id, session_seq,
                   CAST(COUNT(*) AS INTEGER) AS session_len,
                   MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS dur_us
            FROM sessioned GROUP BY user_id, session_seq
        )
        SELECT session_len,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               ROUND(CAST(COUNT(*) AS DOUBLE)
                     / SUM(COUNT(*)) OVER (), 6) AS session_share,
               ROUND(CAST(SUM(dur_us) AS DOUBLE)
                     / (COUNT(*) * 1000000.0), 3) AS mean_duration_sec
        FROM sess
        GROUP BY session_len
    """


ORACLES = {
    "intervals_merge_overlaps": _INTERVALS_MERGE_ORACLE,
    "orders_open_backlog": _OPEN_BACKLOG_ORACLE,
    "time_seasonal_decompose": _seasonal_decompose_oracle(),
    "time_downsample_m4": _M4_ORACLE,
    "session_length_stats": _session_length_stats_oracle(),
    "scd2_point_in_time": """
        WITH probe AS (
            SELECT make_timestamp(
                (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2
            ) AS t_probe
            FROM events
        ),
        hist AS (
            SELECT user_id, event_type,
                   ROUND(value, 4) AS attr_value,
                   ts AS valid_from,
                   LEAD(ts) OVER w AS valid_to,
                   CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
                   LEAD(ts) OVER w IS NULL AS is_current
            FROM events
            WINDOW w AS (PARTITION BY user_id, event_type
                         ORDER BY ts ASC, event_id ASC)
        )
        SELECT user_id, event_type, attr_value, version, is_current,
               t_probe
        FROM hist CROSS JOIN probe
        WHERE valid_from <= t_probe
          AND (valid_to IS NULL OR t_probe < valid_to)
    """,
    "join_asof_nearest": """
        WITH clicks AS (
            SELECT event_id AS click_id, user_id, ts AS cts
            FROM events WHERE event_type = 'click'
        ),
        views AS (
            SELECT user_id, ts AS vts FROM events WHERE event_type = 'view'
        ),
        cand AS (
            SELECT c.click_id, c.user_id, c.cts,
                   (SELECT MAX(v.vts) FROM views v
                    WHERE v.user_id = c.user_id AND v.vts <= c.cts) AS b_ts,
                   (SELECT MIN(v.vts) FROM views v
                    WHERE v.user_id = c.user_id AND v.vts > c.cts) AS f_ts
            FROM clicks c
        ),
        pick AS (
            SELECT click_id, user_id, cts,
                   b_ts IS NOT NULL AND (f_ts IS NULL OR
                       epoch_us(cts) - epoch_us(b_ts)
                           <= epoch_us(f_ts) - epoch_us(cts)) AS take_b,
                   b_ts, f_ts
            FROM cand
        )
        SELECT click_id, user_id, cts AS click_ts,
               CASE WHEN take_b THEN b_ts ELSE f_ts END AS view_ts,
               epoch_us(CASE WHEN take_b THEN b_ts ELSE f_ts END)
                   - epoch_us(cts) AS delta_us,
               CASE WHEN CASE WHEN take_b THEN b_ts ELSE f_ts END IS NULL
                    THEN NULL
                    WHEN take_b THEN 'backward' ELSE 'forward'
               END AS direction
        FROM pick
    """,
    "layout_zorder": f"""
        WITH b AS (
            SELECT l_partkey & {(1 << _Z_KEY_BITS) - 1} AS xb,
                   l_suppkey & {(1 << _Z_KEY_BITS) - 1} AS yb
            FROM lineitem
        ),
        z AS (
            SELECT xb, yb,
                   (({_z_interleave('xb', 0)})
                    + ({_z_interleave('yb', 1)})) >> {_Z_BUCKET_SHIFT}
                       AS bucket
            FROM b
        )
        SELECT bucket,
               COUNT(*) AS n_rows,
               MIN(xb) AS min_x, MAX(xb) AS max_x,
               MIN(yb) AS min_y, MAX(yb) AS max_y,
               (MAX(xb) - MIN(xb) + 1) * (MAX(yb) - MIN(yb) + 1)
                   AS key_rect_area
        FROM z GROUP BY bucket
    """,
    "time_weighted_avg": """
        WITH d AS (
            SELECT user_id, value,
                   LEAD(epoch_us(ts)) OVER (
                       PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC
                   ) - epoch_us(ts) AS hold_us
            FROM events
        )
        SELECT user_id,
               COUNT(*) AS n_intervals,
               ROUND(CAST(SUM(TRY_CAST(ROUND(value * 100, 0) AS HUGEINT)
                              * hold_us) AS DOUBLE) / 100.0
                     / SUM(hold_us), 4) AS twavg,
               ROUND(SUM(hold_us) / 1000000.0, 4) AS span_sec
        FROM d WHERE hold_us IS NOT NULL
        GROUP BY user_id
    """,
    "scd2_history": """
        SELECT user_id, event_type,
               ROUND(value, 4) AS attr_value,
               ts AS valid_from,
               LEAD(ts) OVER w AS valid_to,
               CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
               LEAD(ts) OVER w IS NULL AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC)
    """,
    "resample_ohlc": """
        -- open/close ride inside never-NULL structs: DuckDB's bare
        -- MIN_BY/MAX_BY skip NULL args (sliding to the next non-NULL
        -- sample) while OHLC row semantics - and Spark's min_by/max_by
        -- - report the boundary ROW's value even when it is NULL
        SELECT event_type,
               date_trunc('hour', ts) AS hour,
               ROUND((MIN_BY(struct_pack(v := value), ts)).v, 4) AS open,
               ROUND(MAX(value), 4) AS high,
               ROUND(MIN(value), 4) AS low,
               ROUND((MAX_BY(struct_pack(v := value), ts)).v, 4) AS close,
               COUNT(*) AS n_events
        FROM events
        GROUP BY 1, 2
    """,
    "gap_fill_locf": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY 1
        ),
        grid AS (
            SELECT event_type,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
            FROM bounds
        )
        SELECT g.event_type, g.h,
               COALESCE(hh.n_events, 0) AS n_events,
               last_value(hh.sum_value IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sum_value_locf
        FROM grid g LEFT JOIN hourly hh USING (event_type, h)
    """,
    "join_asof": """
        SELECT c.event_id AS click_id,
               c.user_id,
               c.ts AS click_ts,
               ROUND(c.value, 4) AS click_value,
               v.ts AS view_ts,
               ROUND(v.value, 4) AS view_value
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
    "join_asof_tolerance": f"""
        WITH m AS (
            SELECT c.event_id AS click_id,
                   c.user_id,
                   c.ts AS click_ts,
                   ROUND(c.value, 4) AS click_value,
                   v.ts AS view_ts,
                   ROUND(v.value, 4) AS view_value
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN
                 (SELECT * FROM events WHERE event_type = 'view') v
              ON c.user_id = v.user_id AND c.ts >= v.ts
        )
        SELECT click_id, user_id, click_ts, click_value,
               CASE WHEN epoch_us(click_ts) - epoch_us(view_ts)
                         <= {ASOF_TOLERANCE_S}::BIGINT * 1000000
                    THEN view_ts END AS view_ts,
               CASE WHEN epoch_us(click_ts) - epoch_us(view_ts)
                         <= {ASOF_TOLERANCE_S}::BIGINT * 1000000
                    THEN view_value END AS view_value,
               CAST(CASE WHEN epoch_us(click_ts) - epoch_us(view_ts)
                              <= {ASOF_TOLERANCE_S}::BIGINT * 1000000
                         THEN (epoch_us(click_ts) - epoch_us(view_ts))
                              // 1000000
                    END AS BIGINT) AS staleness_s
        FROM m
    """,
    "topk_per_group": """
        SELECT o_orderpriority, rk, o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
        FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
            FROM orders
        )
        WHERE rk <= 3
    """,
    "agg_salted_skew": """
        SELECT event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value,
               ROUND(SUM(value) / COUNT(*), 4) AS avg_value
        FROM events
        GROUP BY event_type
    """,
    "window_ntile": """
        SELECT o_orderkey,
               o_orderpriority,
               ROUND(o_totalprice, 4) AS o_totalprice,
               NTILE(4) OVER w AS quartile,
               ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 4) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    "sessionize_events": f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR EPOCH(ts) - EPOCH(LAG(ts) OVER w)
                                > {SESSION_GAP_SECONDS}
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        )
        SELECT user_id, event_id,
               CAST(SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS INTEGER) AS session_seq
        FROM flagged
    """,
}

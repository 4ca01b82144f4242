"""Join operators: inner / broadcast / outer / semi / anti / range.

Strategy notes for scale:
  - dimension tables (customer, part, the literal band table) are
    broadcast — no shuffle of the fact side;
  - fact-fact joins shuffle on the join key and rely on AQE skew
    splitting;
  - the range join keeps the tiny side broadcast so the non-equi
    predicate evaluates as a BroadcastNestedLoopJoin instead of a
    cartesian shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..io import fan_out_small_scan, load_table

PRICE_BANDS = [(i, i * 100_000.0, (i + 1) * 100_000.0) for i in range(5)]


def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders ⋈ customer (dim side broadcast-able)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )


def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast join lineitem ⋈ part: the fact table never
    shuffles; only the aggregate exchanges on p_brand."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
        )
    )


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping customers without orders (count = 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias(
                "total_spend"
            ),
        )
    )


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: suppliers × lineitem usage, keeping both unmatched
    suppliers and (synthetically filtered) unmatched lineitem keys."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_heavy_items"))
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey, "full_outer")
        .select(
            "s_suppkey",
            "s_name",
            "l_suppkey",
            F.coalesce("n_heavy_items", F.lit(0)).alias("n_heavy_items"),
        )
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: customers having at least one 'O' order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no 'O' order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range-predicate) join: orders against price bands.

    The band table is a 5-row literal → broadcast nested-loop join, the
    right physical shape for interval joins with a tiny build side. The
    literal is a SQL VALUES LocalRelation, not createDataFrame — the
    latter plans a Python RDD scan whose worker spin-up dwarfs the join
    (measured 2.4s → 0.6s at sf0.1).
    """
    o = load_table(spark, sf_dir, "orders")
    bands = spark.sql(
        f"SELECT * FROM VALUES {_BAND_VALUES} AS t(band_id, lo, hi)"
    ).select(
        F.col("band_id").cast("int").alias("band_id"),
        F.col("lo").cast("double").alias("lo"),
        F.col("hi").cast("double").alias("hi"),
    )
    cond = (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi"))
    return (
        o.join(broadcast(bands), cond, "inner")
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
    )


# Binned range join: 1000 overlapping price bands, width 110 over
# [0, 110_000). Bucket width = band span, so every band covers at most
# two buckets and every fact row probes exactly one bucket.
N_BANDS = 1000
BAND_W = 110.0


def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join at fact scale: when the interval side is too big to
    broadcast, a nested-loop join is O(rows × bands). The scale-correct
    plan BINS the range dimension: each band explodes into the fixed
    buckets it covers, each fact row computes its single bucket, the
    bucket equi-join prunes candidates to O(1) per row, and the exact
    BETWEEN predicate refines. This compiles to a plain shuffled
    hash/sort-merge equi-join — no BNLJ, no cartesian — and scales as
    rows, not rows × bands.

    Bands are generated with spark.range (a JVM LocalTableScan-style
    range, not a Python RDD); band i covers [i*110, i*110 + 165) so
    consecutive bands overlap — rows can match 1-2 bands, proving the
    join is genuinely non-equi."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.range(N_BANDS).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * BAND_W).alias("lo"),
        (F.col("id") * BAND_W + BAND_W * 1.5).alias("hi"),
    )
    # band → every bucket index its [lo, hi) span touches
    b = bands.select(
        "band_id",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / BAND_W).cast("long"),
                F.floor((F.col("hi") - 0.000001) / BAND_W).cast("long"),
            )
        ).alias("bucket"),
    )
    f = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.floor(F.col("l_extendedprice") / BAND_W).cast("long").alias("bucket"),
    )
    return (
        f.join(b, "bucket")
        .filter(
            (F.col("l_extendedprice") >= F.col("lo"))
            & (F.col("l_extendedprice") < F.col("hi"))
        )
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        )
    )


def join_fuzzy_lev1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy self-join: customer-name pairs within
    edit distance 1, via deletion-neighborhood blocking (the FastSS
    family): each name contributes itself plus every delete-one-char
    variant as blocking keys; any two strings within edit distance 1
    share at least one key (substitution → same deletion variant;
    insert/delete → one side's full string equals the other's variant),
    so recall is EXACT — unlike LSH there is no probabilistic miss.

    Scale shape: O(n·L) blocking keys instead of O(n²) comparisons; the
    candidate join is a pure equi-join on the key; the cheap levenshtein
    verify runs only on bucket-mates. At 100 TB the key table is the
    persisted match index. The brute-force oracle proves the exact
    recall claim at test scale."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    keys = c.select(
        "c_custkey",
        "c_name",
        F.explode(
            # the empty-string guard matters on arbitrary inputs:
            # sequence(1, 0) is DESCENDING [1, 0], so an empty name
            # would emit junk variant keys (harmless here only because
            # the levenshtein verify filters them — don't rely on that)
            F.expr(
                "array_union(array(c_name),"
                " if(length(c_name) = 0, cast(array() as array<string>),"
                "  transform(sequence(1, length(c_name)),"
                "   i -> concat(substring(c_name, 1, i-1),"
                "               substring(c_name, i+1, length(c_name))))))"
            )
        ).alias("k"),
    )
    a = keys.select(
        F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"), "k"
    )
    b = keys.select(
        F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"), "k"
    )
    return (
        a.join(b, "k")
        .filter(F.col("key_a") < F.col("key_b"))
        .filter(F.levenshtein("name_a", "name_b") <= 1)
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("lev"),
        )
        .dropDuplicates(["key_a", "key_b"])
    )


# Bloom prefilter: M bits, K portable md5-derived hash functions — the
# same deterministic-hash idiom as the minhash/simhash family, so the
# DuckDB oracle replays the filter bit-for-bit.
BLOOM_M = 8192
BLOOM_K = 3


def _bloom_pos(j: int, key_sql: str) -> str:
    """SQL for bloom hash j of an integer key: ONE md5 per key, split
    into K independent 8-hex chunks (a 128-bit digest carries 4 of
    them) — a third of the hashing cost of per-j salted digests, and
    the j-th chunk is as uniform as a fresh hash."""
    return (
        f"cast(conv(substring(md5(concat('bf:', cast({key_sql} as string)))"
        f", {1 + 8 * j}, 8), 16, 10) as bigint) % {BLOOM_M}"
    )


def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pushdown, made explicit and portable: the
    big-side scan is prefiltered by a broadcast Bloom bitset built from
    the small side's join keys BEFORE any shuffle — the classic
    runtime-filter optimization (Spark's AQE injects an opaque version;
    this one uses portable md5 hashes so the oracle can replay it).

    Shape: small side (urgent orders) → K=3 md5 bucket positions per
    key → ONE collected bit-position array (≤ M=8192 ints) broadcast to
    every lineitem partition → map-side array_contains ×3 prefilter →
    exact semi-join only on survivors. At 100 TB the fact table never
    shuffles rows the filter can reject: the bitset rides the broadcast,
    the md5s are codegen'd, and only bloom-passing rows reach the join
    exchange. Output is the filter's measured effectiveness report
    (candidates, true matches, false positives) — the numbers a query
    optimizer's runtime-filter decision needs."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    small = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    ).distinct()
    positions = small.select(
        F.explode(
            F.array(
                *[
                    F.expr(_bloom_pos(j, "o_orderkey"))
                    for j in range(BLOOM_K)
                ]
            )
        ).alias("pos")
    )
    # a REAL bitmap, not a position list: M bits packed into M/64
    # longs (word = pos >> 6, bit = pos & 63, OR-merged per word, then
    # densified over the full word range). The probe is then O(1) bit
    # arithmetic — measured 30× faster than array_contains over a
    # sorted position array, whose per-probe linear scan dominated the
    # first bench (7.9 s → this plan)
    words = positions.groupBy(
        F.expr("pos >> 6").alias("w")
    ).agg(F.expr("bit_or(1L << cast(pos & 63 as int))").alias("bm"))
    # coalesced: an empty build side sets ZERO bits (sum over no words
    # is NULL, but the report must say 0 — the filter rejects all)
    bits = words.agg(
        F.expr("map_from_entries(collect_list(struct(w, bm)))").alias("m"),
        F.expr("cast(coalesce(sum(bit_count(bm)), 0L) as int)").alias(
            "n_set"
        ),
    ).select(
        F.expr(
            f"transform(sequence(0, {BLOOM_M // 64 - 1}),"
            " wi -> coalesce(m[wi], 0L))"
        ).alias("bits"),
        "n_set",
    )
    # ONE scan of the fact side computes the whole effectiveness
    # report: positions projected once (each probe uses its position
    # twice — word and bit index — and duplicated md5 subtrees are not
    # CSE'd inside one predicate), the bloom verdict and the exact
    # broadcast-semi verdict carried as flag columns into a single
    # aggregate. (The first cut re-scanned lineitem for each stat —
    # 3.4 s; this plan is the one-pass form.)
    hit = small.select(
        F.col("o_orderkey").alias("l_orderkey"), F.lit(1).alias("hit")
    )
    # the probe side pays 3 md5+conv probes per row — on sf-scale data
    # that whole expression stage lands on ONE scan split (guide §2.5
    # input skew); fan out AFTER the 1-column projection so the spread
    # shuffle moves only the key (io.fan_out_small_scan is a no-op on
    # production-sized scans)
    probed = (
        fan_out_small_scan(li.select("l_orderkey"))
        .join(broadcast(hit), "l_orderkey", "left")
        .crossJoin(broadcast(bits))
        .select(
            "hit",
            "bits",
            *[
                F.expr(_bloom_pos(j, "l_orderkey")).alias(f"p{j}")
                for j in range(BLOOM_K)
            ],
        )
        .select(
            "hit",
            F.expr(
                " AND ".join(
                    f"((element_at(bits, cast(p{j} >> 6 as int) + 1)"
                    f" >> cast(p{j} & 63 as int)) & 1L) = 1L"
                    for j in range(BLOOM_K)
                )
            ).alias("pass"),
        )
    )
    stats = (
        probed.agg(
            F.count("*").alias("n_big_rows"),
            F.coalesce(
                F.sum(F.col("pass").cast("long")), F.lit(0).cast("long")
            ).alias("n_pass_bloom"),
            F.coalesce(
                F.sum(
                    (F.col("pass") & F.col("hit").isNotNull()).cast("long")
                ),
                F.lit(0).cast("long"),
            ).alias("n_true_match"),
        )
        .crossJoin(broadcast(small.agg(F.count("*").alias("n_small_keys"))))
        .crossJoin(
            broadcast(bits.select(F.col("n_set").alias("n_bits_set")))
        )
    )
    return stats.select(
        "n_big_rows",
        "n_small_keys",
        "n_bits_set",
        "n_pass_bloom",
        "n_true_match",
        (F.col("n_pass_bloom") - F.col("n_true_match")).alias("n_false_pos"),
        # empty fact side → NULL rate (0/0)
        F.when(
            F.col("n_big_rows") > 0,
            F.round(
                (F.col("n_pass_bloom") - F.col("n_true_match"))
                / F.col("n_big_rows"),
                6,
            ),
        ).alias("fp_rate"),
    )


# Interval-overlap join: hour-wide buckets; an incident window is ±15
# minutes around an error event, so it covers at most 2 buckets.
_HOUR_US = 3_600_000_000
_INCIDENT_HALF_US = 900_000_000  # 15 min


def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (both sides are intervals — the shape
    range-join optimizers special-case): per-user daily activity spans
    [min ts, max ts] × global incident windows (error-event ts ± 15
    min), reporting per user-day how many incidents overlapped and the
    total overlap seconds.

    Scale design: a naive interval×interval join is a BNLJ cartesian.
    Binning makes it an equi-join — BOTH sides explode into the fixed
    hour buckets they cover (activity span ≤ 25, incident ≤ 2), the
    bucket equi-join prunes candidates to co-bucketed pairs, the exact
    overlap predicate refines, and the pair dedup collapses multi-bucket
    matches. All timestamp math in integer microseconds (unix_micros /
    epoch_us) so both engines agree bit-for-bit."""
    e = load_table(spark, sf_dir, "events")
    spans = (
        # day as a plain string: date dtypes round-trip differently
        # through the two engines' pandas bridges (datetime.date vs
        # datetime64), and the day is a label here, not arithmetic
        e.groupBy(
            "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.min(F.unix_micros("ts")).alias("a_start"),
            F.max(F.unix_micros("ts")).alias("a_end"),
        )
    )
    incidents = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        (F.unix_micros("ts") - F.lit(_INCIDENT_HALF_US)).alias("w_start"),
        (F.unix_micros("ts") + F.lit(_INCIDENT_HALF_US)).alias("w_end"),
    )
    a = spans.select(
        "user_id",
        "day",
        "a_start",
        "a_end",
        F.explode(
            F.sequence(
                F.expr(f"a_start div {_HOUR_US}"),
                F.expr(f"a_end div {_HOUR_US}"),
            )
        ).alias("bucket"),
    )
    b = incidents.select(
        "incident_id",
        "w_start",
        "w_end",
        F.explode(
            F.sequence(
                F.expr(f"w_start div {_HOUR_US}"),
                F.expr(f"w_end div {_HOUR_US}"),
            )
        ).alias("bucket"),
    )
    pairs = (
        a.join(b, "bucket")
        .filter(
            (F.col("a_start") <= F.col("w_end"))
            & (F.col("w_start") <= F.col("a_end"))
            # emit each overlapping pair ONLY in the bucket where its
            # overlap starts — a co-bucketed pair matches once by
            # construction, so no dedup shuffle over the pair fanout
            # (measured: replaced a dropDuplicates that dominated the
            # first bench at 12.8 s)
            & (
                F.col("bucket")
                == F.expr(
                    f"greatest(a_start, w_start) div {_HOUR_US}"
                )
            )
        )
    )
    return (
        pairs.groupBy("user_id", "day")
        .agg(
            F.count("*").alias("n_incidents"),
            # sum the exact integer microseconds, divide ONCE: summing
            # per-row doubles is order-dependent across engines
            F.round(
                F.sum(
                    F.least("a_end", "w_end")
                    - F.greatest("a_start", "w_start")
                )
                / F.lit(1_000_000.0),
                4,
            ).alias("overlap_sec"),
        )
    )


def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic for the orders⋈lineitem key — the
    report a scale review reads BEFORE choosing a mitigation (AQE
    skew-split handles moderate skew; a whale key needs salting; this
    tells you which): per-key fact-side group sizes summarized as key
    count, row count, max/p50/p99 group size, the mean, and the
    max/mean skew ratio.

    Shape: one l_orderkey-keyed count aggregate (map-side combined),
    then every statistic comes from the (group_size, n_keys) HISTOGRAM
    — cumulative nearest-rank picks for the percentiles (the
    funnel_time_to_convert discipline), never a sort of per-key rows.
    Exact integers + two final divisions. 1-row output."""
    li = load_table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(F.count("*").alias("g"))
    hist = sizes.groupBy("g").agg(F.count("*").alias("k"))
    from pyspark.sql import Window

    wt = Window.orderBy("g").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy(F.lit(1))
    cum = hist.select(
        "g",
        "k",
        F.sum("k").over(wt).alias("cum_k"),
        F.sum("k").over(wall).alias("n_keys"),
        F.sum(F.col("g").cast("bigint") * F.col("k"))
        .over(wall)
        .alias("n_rows"),
    )
    pick = lambda p: F.min(  # noqa: E731 — nearest-rank selector
        F.when(
            F.col("cum_k")
            >= F.expr(f"cast(ceil({p} * n_keys) as bigint)"),
            F.col("g"),
        )
    )
    return cum.agg(
        F.max("n_keys").cast("bigint").alias("n_keys"),
        F.max("n_rows").cast("bigint").alias("n_rows"),
        pick(0.5).cast("bigint").alias("p50_group"),
        pick(0.99).cast("bigint").alias("p99_group"),
        F.max("g").cast("bigint").alias("max_group"),
        F.round(
            F.max("n_rows").cast("double") / F.max("n_keys"), 4
        ).alias("mean_group"),
        F.round(
            F.max("g").cast("double")
            / (F.max("n_rows").cast("double") / F.max("n_keys")),
            4,
        ).alias("skew_max_over_mean"),
    )


QUERIES = {
    "join_skew_report": join_skew_report,
    "join_inner": join_inner,
    "join_broadcast": join_broadcast,
    "join_left_outer": join_left_outer,
    "join_full_outer": join_full_outer,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_range": join_range,
    "join_range_binned": join_range_binned,
    "join_fuzzy_lev1": join_fuzzy_lev1,
    "join_bloom_prefilter": join_bloom_prefilter,
    "join_interval_overlap": join_interval_overlap,
}


def _duck_bloom_pos(j: int, key_sql: str) -> str:
    """DuckDB twin of _bloom_pos (same one-digest chunked arithmetic)."""
    return (
        f"('0x' || substr(md5('bf:' || CAST({key_sql} AS VARCHAR)),"
        f" {1 + 8 * j}, 8))::BIGINT % {BLOOM_M}"
    )

_BAND_VALUES = ", ".join(f"({i}, {lo}, {hi})" for i, lo, hi in PRICE_BANDS)

ORACLES = {
    "join_skew_report": """
        WITH sizes AS (
            SELECT l_orderkey, COUNT(*) AS g FROM lineitem
            GROUP BY l_orderkey
        ),
        hist AS (SELECT g, COUNT(*) AS k FROM sizes GROUP BY g),
        cum AS (
            SELECT g, k,
                   SUM(k) OVER (ORDER BY g
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_k,
                   SUM(k) OVER () AS n_keys,
                   SUM(CAST(g AS BIGINT) * k) OVER () AS n_rows
            FROM hist
        )
        SELECT CAST(MAX(n_keys) AS BIGINT) AS n_keys,
               CAST(MAX(n_rows) AS BIGINT) AS n_rows,
               CAST(MIN(CASE WHEN cum_k >=
                    CAST(CEIL(0.5 * n_keys) AS BIGINT) THEN g END)
                    AS BIGINT) AS p50_group,
               CAST(MIN(CASE WHEN cum_k >=
                    CAST(CEIL(0.99 * n_keys) AS BIGINT) THEN g END)
                    AS BIGINT) AS p99_group,
               CAST(MAX(g) AS BIGINT) AS max_group,
               ROUND(CAST(MAX(n_rows) AS DOUBLE) / MAX(n_keys), 4)
                   AS mean_group,
               ROUND(CAST(MAX(g) AS DOUBLE)
                     / (CAST(MAX(n_rows) AS DOUBLE) / MAX(n_keys)), 4)
                   AS skew_max_over_mean
        FROM cum
    """,
    "join_fuzzy_lev1": """
        SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
               CAST(levenshtein(a.c_name, b.c_name) AS INT) AS lev
        FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    "join_range_binned": """
        WITH bands AS (
            SELECT CAST(i AS INTEGER) AS band_id,
                   i * 110.0 AS lo,
                   i * 110.0 + 165.0 AS hi
            FROM range(0, 1000) t(i)
        )
        SELECT band_id,
               COUNT(*) AS n_items,
               ROUND(SUM(l_extendedprice), 4) AS sum_price
        FROM lineitem l JOIN bands b
          ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
        GROUP BY band_id
    """,
    "join_inner": """
        SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "join_broadcast": """
        SELECT p_brand,
               COUNT(*) AS n_items,
               ROUND(SUM(l_extendedprice), 4) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "join_full_outer": """
        SELECT s.s_suppkey,
               s.s_name,
               li.l_suppkey,
               COALESCE(li.n_heavy_items, 0) AS n_heavy_items
        FROM (SELECT s_suppkey, s_name FROM supplier) s
        FULL OUTER JOIN (
            SELECT l_suppkey, COUNT(*) AS n_heavy_items
            FROM lineitem WHERE l_quantity > 45
            GROUP BY l_suppkey
        ) li ON s.s_suppkey = li.l_suppkey
    """,
    "join_left_outer": """
        SELECT c_custkey,
               c_name,
               COUNT(o_orderkey) AS n_orders,
               ROUND(COALESCE(SUM(o_totalprice), 0.0), 4) AS total_spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
    """,
    "join_semi": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    "join_anti": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    "join_range": f"""
        SELECT band_id,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS sum_price
        FROM orders
        JOIN (VALUES {_BAND_VALUES}) AS b(band_id, lo, hi)
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band_id
    """,
    "join_bloom_prefilter": f"""
        WITH small AS (
            SELECT DISTINCT o_orderkey FROM orders
            WHERE o_orderpriority = '1-URGENT'
        ),
        bits AS (
            SELECT DISTINCT
                   ('0x' || substr(md5('bf:' || CAST(o_orderkey AS VARCHAR)),
                                   1 + 8 * j, 8))::BIGINT
                       % {BLOOM_M} AS pos
            FROM small, range(0, {BLOOM_K}) t(j)
        ),
        pass AS (
            SELECT l_orderkey FROM lineitem
            WHERE {" AND ".join(
                f"({_duck_bloom_pos(j, 'l_orderkey')}) IN (SELECT pos FROM bits)"
                for j in range(BLOOM_K))}
        ),
        tm AS (
            SELECT COUNT(*) AS n_true_match FROM pass
            WHERE l_orderkey IN (SELECT o_orderkey FROM small)
        )
        SELECT (SELECT COUNT(*) FROM lineitem) AS n_big_rows,
               (SELECT COUNT(*) FROM small) AS n_small_keys,
               CAST((SELECT COUNT(*) FROM bits) AS INTEGER) AS n_bits_set,
               (SELECT COUNT(*) FROM pass) AS n_pass_bloom,
               (SELECT n_true_match FROM tm) AS n_true_match,
               (SELECT COUNT(*) FROM pass) - (SELECT n_true_match FROM tm)
                   AS n_false_pos,
               -- empty fact side -> NULL rate (see the Spark twin)
               CASE WHEN (SELECT COUNT(*) FROM lineitem) > 0 THEN
                   ROUND(CAST((SELECT COUNT(*) FROM pass)
                              - (SELECT n_true_match FROM tm) AS DOUBLE)
                         / (SELECT COUNT(*) FROM lineitem), 6)
               END AS fp_rate
    """,
    "join_interval_overlap": f"""
        WITH spans AS (
            SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                   MIN(epoch_us(ts)) AS a_start,
                   MAX(epoch_us(ts)) AS a_end
            FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')
        ),
        incidents AS (
            SELECT event_id AS incident_id,
                   epoch_us(ts) - {_INCIDENT_HALF_US} AS w_start,
                   epoch_us(ts) + {_INCIDENT_HALF_US} AS w_end
            FROM events WHERE event_type = 'error'
        ),
        pairs AS (
            SELECT DISTINCT s.user_id, s.day, i.incident_id,
                   s.a_start, s.a_end, i.w_start, i.w_end
            FROM spans s JOIN incidents i
              ON s.a_start <= i.w_end AND i.w_start <= s.a_end
        )
        SELECT user_id, day,
               COUNT(*) AS n_incidents,
               ROUND(SUM(LEAST(a_end, w_end) - GREATEST(a_start, w_start))
                     / 1000000.0, 4) AS overlap_sec
        FROM pairs GROUP BY user_id, day
    """,
}

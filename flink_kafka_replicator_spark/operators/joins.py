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


_DAY_US = 86_400_000_000


def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (both sides are intervals — the shape
    range-join optimizers special-case): per-user daily activity spans
    [min ts, max ts] × global incident windows (error-event ts ± 15
    min), reporting per user-day how many incidents overlapped and the
    total overlap seconds.

    Scale design (round 14): the rounds-2..13 shape binned both sides
    into hour buckets and equi-joined — correct, but the candidate set
    nearly IS the answer set (measured at sf0.1: 15.25M co-bucketed
    candidates for 9.64M truly-overlapping pairs from 40k spans ×
    19.8k incidents), so no bin width can beat ~1.6× and the pair
    fan-out grows ~|spans|·|incidents-per-day|. The aggregates never
    need the pairs: with f_i(x) = (min(w_end_i, x) − w_start_i)⁺ — the
    mass of incident i at or below x —

        Σ_i |[w_s_i, w_e_i] ∩ [a, b]|  =  M(b) − M(a),
        M(x) = Σ_i f_i(x)  (the running integral of the open-incident
                            count O(t) over time),
        n_overlapping      =  #{w_s <= b} − #{w_e <= a−1},

    both exactly the original `w_s <= a_end AND w_e >= a_start` filter
    and its µs sum (touching intervals count with zero mass). So this
    runs ONE day-partitioned sweep: incident boundary points carry
    (+open/+close) deltas, every span endpoint rides the same ordered
    stream as a zero-mass probe row (a probe splits a gap without
    changing the integral), running sums give the within-day values, a
    calendar-bounded per-day carry table chains them across partitions,
    and a per-span pivot emits the report. Work is
    O((|spans| + |incidents|)·log) with NO pair ever materialized; all
    arithmetic stays integer µs, and every product is (open count ×
    bounded gap) — the integral is bounded by the total incident mass
    (Σ durations), never by epoch magnitudes, so nothing can overflow
    int64 even on pre-epoch adversarial data. Row-identity with the
    binned join is oracle-checked (the DuckDB twin still replays the
    bucket join) and pytest-pinned."""
    from pyspark.sql import Window

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
        # NULL-ts groups have no epoch span — the binned form dropped
        # them via explode(sequence(NULL)); drop them explicitly here
        .filter(F.col("a_start").isNotNull())
    )
    incidents = e.filter(
        (F.col("event_type") == "error") & F.col("ts").isNotNull()
    ).select(
        (F.unix_micros("ts") - F.lit(_INCIDENT_HALF_US)).alias("w_start"),
        (F.unix_micros("ts") + F.lit(_INCIDENT_HALF_US)).alias("w_end"),
    )
    zero = F.lit(0).cast("bigint")
    nul_u = F.lit(None).cast(spans.schema["user_id"].dataType)
    # incident boundary deltas and span-endpoint probes, ONE explode
    # each: probes evaluate the running values at b (count + integral),
    # a (integral) and a−1 (the strict end-count — integer µs make
    # `w_end < a` the same as `w_end <= a−1`)
    pts = incidents.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("w_start").alias("t"),
                    F.lit(1).alias("ds"),
                    F.lit(0).alias("de"),
                ),
                F.struct(
                    F.col("w_end").alias("t"),
                    F.lit(0).alias("ds"),
                    F.lit(1).alias("de"),
                ),
            )
        ).alias("p")
    ).select(
        F.col("p.t").alias("t"),
        F.col("p.ds").alias("ds"),
        F.col("p.de").alias("de"),
        F.lit(0).alias("probe"),
        nul_u.alias("p_user"),
        F.lit(None).cast("string").alias("p_day"),
        F.lit(None).cast("string").alias("p_side"),
    )
    probes = spans.select(
        "user_id",
        "day",
        F.explode(
            F.array(
                F.struct(
                    (F.col("a_start") - 1).alias("t"),
                    F.lit("a1").alias("side"),
                ),
                F.struct(F.col("a_start").alias("t"), F.lit("a").alias("side")),
                F.struct(F.col("a_end").alias("t"), F.lit("b").alias("side")),
            )
        ).alias("p"),
    ).select(
        F.col("p.t").alias("t"),
        F.lit(0).alias("ds"),
        F.lit(0).alias("de"),
        F.lit(1).alias("probe"),
        F.col("user_id").alias("p_user"),
        F.col("day").alias("p_day"),
        F.col("p.side").alias("p_side"),
    )
    # the day-partitioned sweep: probes sort AFTER boundary points at
    # equal t (probe ASC) so every running value is the <=t prefix.
    # The within-day integral needs NO gap/lag bookkeeping — by parts,
    #   ∫_{<=x} O_local dt = x·D(x) − Σ_{t<=x} (ds−de)·t
    # with D(x) the running net-delta sum, and it is shift-invariant
    # per day, so t is rebased to the day (t_rel < 86400e6) and every
    # product stays far from int64 range even on pre-epoch data.
    stream = (
        pts.unionByName(probes)
        .withColumn("day_k", F.expr(f"t div {_DAY_US}"))
        .withColumn(
            "t_rel", (F.col("t") - F.col("day_k") * F.lit(_DAY_US))
        )
    )
    w = Window.partitionBy("day_k").orderBy(
        F.col("t").asc(), F.col("probe").asc()
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    st = (
        stream.withColumn("cs_run", F.sum("ds").over(wrun))
        .withColumn("ce_run", F.sum("de").over(wrun))
        .withColumn(
            "dt_run",
            F.sum((F.col("ds") - F.col("de")) * F.col("t_rel")).over(wrun),
        )
        .withColumn(
            "j_run",
            F.col("t_rel") * (F.col("cs_run") - F.col("ce_run"))
            - F.col("dt_run"),
        )
    )
    # per-day totals → carry-ins (a ≤|days| calendar-bounded table; its
    # cumulative windows are the one allowlisted single-partition step).
    # Probe rows carry zero deltas, so aggregating the raw stream gives
    # the boundary-only totals; the day's full integral is the same
    # by-parts form evaluated at the day's last row.
    day_tot = stream.groupBy("day_k").agg(
        F.sum(F.col("ds") - F.col("de")).alias("o_day"),
        F.sum("ds").alias("cs_day"),
        F.sum("de").alias("ce_day"),
        F.sum((F.col("ds") - F.col("de")) * F.col("t_rel")).alias("dt_day"),
        F.max("t").alias("t_last"),
        F.max("t_rel").alias("t_last_rel"),
    ).withColumn(
        "j_day",
        F.col("t_last_rel") * F.col("o_day") - F.col("dt_day"),
    )
    wday = Window.orderBy("day_k")
    wday_prev = wday.rowsBetween(Window.unboundedPreceding, -1)
    carry = (
        day_tot.withColumn(
            "o_carry", F.coalesce(F.sum("o_day").over(wday_prev), zero)
        )
        .withColumn(
            "cs_carry", F.coalesce(F.sum("cs_day").over(wday_prev), zero)
        )
        .withColumn(
            "ce_carry", F.coalesce(F.sum("ce_day").over(wday_prev), zero)
        )
        .withColumn("t_last_prev", F.lag("t_last").over(wday))
        # a completed day's full integral = its local terms + the carry
        # level across every gap it spans (telescopes to t_last−t_last′;
        # o_carry > 0 forces the gap ≤ one incident length, so the
        # product stays mass-bounded)
        .withColumn(
            "i_full",
            F.col("j_day")
            + F.coalesce(
                F.col("o_carry")
                * (F.col("t_last") - F.col("t_last_prev")),
                zero,
            ),
        )
        .withColumn(
            "i_prev", F.coalesce(F.sum("i_full").over(wday_prev), zero)
        )
        .select(
            "day_k", "o_carry", "cs_carry", "ce_carry", "t_last_prev",
            "i_prev",
        )
    )
    ev = (
        st.filter(F.col("probe") == 1)
        .join(F.broadcast(carry), "day_k")
        .select(
            "p_user",
            "p_day",
            "p_side",
            (F.col("cs_carry") + F.col("cs_run")).alias("cs"),
            (F.col("ce_carry") + F.col("ce_run")).alias("ce"),
            (
                F.col("i_prev")
                + F.col("o_carry")
                * (F.col("t") - F.coalesce(F.col("t_last_prev"), F.col("t")))
                + F.col("j_run")
            ).alias("ii"),
        )
    )
    per_span = ev.groupBy(
        F.col("p_user").alias("user_id"), F.col("p_day").alias("day")
    ).agg(
        F.max(F.when(F.col("p_side") == "b", F.col("cs"))).alias("cs_b"),
        F.max(F.when(F.col("p_side") == "a1", F.col("ce"))).alias("ce_a1"),
        F.max(F.when(F.col("p_side") == "b", F.col("ii"))).alias("i_b"),
        F.max(F.when(F.col("p_side") == "a", F.col("ii"))).alias("i_a"),
    )
    return (
        per_span.withColumn(
            "n_incidents",
            (F.col("cs_b") - F.col("ce_a1")).cast("bigint"),
        )
        # rows exist exactly where the binned join emitted one: some
        # incident satisfies w_start <= a_end AND w_end >= a_start
        .filter(F.col("n_incidents") >= 1)
        .select(
            "user_id",
            "day",
            "n_incidents",
            # the µs integral difference is the same exact integer the
            # pair sum produced; one division, one rounding
            F.round(
                (F.col("i_b") - F.col("i_a")) / F.lit(1_000_000.0), 4
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

"""Data-quality auditing: the checks a pipeline runs before trusting a
100 TB batch — referential integrity across tables and single-pass
column profiling. Both are plain aggregations/joins (one shuffle each),
cheap enough to gate every ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table


def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key audit across the TPC-H-ish schema: orphaned rows per
    relationship (child keys with no parent), as one union'd report.
    Each check is a left-anti join + count — at scale the parent key
    sets are dimension-sized and broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")

    def orphans(child, child_key, parent, parent_key, name):
        return (
            child.join(
                parent.select(F.col(parent_key).alias(child_key)),
                child_key,
                "left_anti",
            )
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(name).alias("relationship"), "n_orphans")
        )

    return (
        orphans(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionByName(orphans(li, "l_suppkey", s, "s_suppkey", "lineitem->supplier"))
        .unionByName(orphans(li, "l_partkey", p, "p_partkey", "lineitem->part"))
        .unionByName(orphans(o, "o_custkey", c, "c_custkey", "orders->customer"))
    )


def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of orders: row count, nulls, distinct
    counts, and value bounds — every statistic in ONE aggregate (one
    scan, one reduce), the shape that keeps profiling affordable at
    100 TB. Long/melted output: one row per profiled column."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("nulls_custkey"),
        F.count_distinct("o_custkey").alias("distinct_custkey"),
        F.count_distinct("o_orderstatus").alias("distinct_status"),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )
    # melt to (metric, value) strings so the report is schema-stable as
    # profiled columns are added
    cols = [
        "n_rows",
        "nulls_custkey",
        "distinct_custkey",
        "distinct_status",
        "min_price",
        "max_price",
        "min_date",
        "max_date",
    ]
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("metric"), F.col(c).cast("string").alias("value")
            )
            for c in cols
        ]
    )
    return agg.select(F.explode(pairs).alias("kv")).select(
        F.col("kv.metric").alias("metric"), F.col("kv.value").alias("value")
    )


def dq_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-entity anomaly detection: median/MAD outlier counts of
    each user's event values (|x − med| > 3·1.4826·MAD, the normal-
    consistent robust z-score). The per-ENTITY grouping is the scale
    design: user_id is high-cardinality with bounded per-group size, so
    exact percentiles stay cheap per group — a 5-value key (event_type)
    would buffer a fifth of the corpus per group instead.

    Shape: two chained percentile windows (median, then MAD over the
    bound median) + the final per-user collapse, all sharing ONE user_id
    exchange — the funnel_stages pattern."""
    from pyspark.sql import Window

    # non-finite measures normalize to NULL (missing) BEFORE the robust
    # stats: the engines disagree on where NaN sits inside a percentile
    # (Spark sorts it above +Inf, DuckDB's quantile interpolates), and
    # a NaN is a data error, not a sample
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.when(
            ~F.isnan("value") & (F.abs(F.col("value")) != float("inf")),
            F.col("value"),
        ).alias("value"),
    )
    w = Window.partitionBy("user_id")
    d1 = e.withColumn("med", F.expr("percentile(value, 0.5D)").over(w))
    d2 = d1.withColumn(
        "mad", F.expr("percentile(abs(value - med), 0.5D)").over(w)
    )
    return (
        d2.groupBy("user_id", "med", "mad")
        .agg(
            F.count("*").alias("n_events"),
            F.coalesce(
                F.sum(
                    (F.abs(F.col("value") - F.col("med"))
                     > 3 * 1.4826 * F.col("mad")).cast("long")
                ),
                F.lit(0).cast("long"),
            ).alias("n_outliers"),
        )
        .select(
            "user_id",
            "n_events",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n_outliers",
        )
    )


# Declarative DQ rules: (rule_id, column, op, threshold) — rules are
# DATA (a broadcast dim the ops team edits), not code, the Deequ-style
# contract. Applied to the melted numeric columns via one generic
# CASE-on-op evaluation.
DQ_RULES: tuple[tuple[str, str, str, float], ...] = (
    ("price_positive", "o_totalprice", ">", 0.0),
    ("price_below_cap", "o_totalprice", "<", 550_000.0),
    ("custkey_positive", "o_custkey", ">", 0.0),
    ("custkey_in_range", "o_custkey", "<=", 1_000_000_000.0),
)
_DQ_RULE_VALUES = ", ".join(
    f"('{r}', '{c}', '{op}', CAST('{thr!r}' AS DOUBLE))"
    for r, c, op, thr in DQ_RULES
)
_DQ_COLS = tuple(dict.fromkeys(c for _, c, _, _ in DQ_RULES))


def rules_report(orders_df: DataFrame) -> DataFrame:
    """The rules-engine CORE over any orders frame — shared verbatim
    by the batch query (``dq_rules_engine``) and the streaming
    ``dq-monitor`` (streaming/dq_monitor.py), so stream == batch is a
    theorem, not a test of two implementations (the
    ``batch_drift_scores`` pattern)."""
    o = orders_df
    spark = orders_df.sparkSession
    melted = o.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(c).cast("double").alias("value"),
                    )
                    for c in _DQ_COLS
                ]
            )
        ).alias("kv")
    ).select(F.col("kv.col").alias("col"), F.col("kv.value").alias("value"))
    rules = spark.sql(
        f"SELECT * FROM VALUES {_DQ_RULE_VALUES}"
        " AS t(rule_id, col, op, thr)"
    )
    from pyspark.sql.functions import broadcast

    passed = F.expr(
        "CASE WHEN value IS NULL THEN false"
        " WHEN op = '>' THEN value > thr"
        " WHEN op = '>=' THEN value >= thr"
        " WHEN op = '<' THEN value < thr"
        " WHEN op = '<=' THEN value <= thr"
        " ELSE false END"
    )
    return (
        melted.join(broadcast(rules), "col")
        .groupBy("rule_id", "col", "op", "thr")
        .agg(
            F.count("*").alias("n_checked"),
            F.sum((~passed).cast("long")).alias("n_violations"),
        )
        .select(
            "rule_id",
            "col",
            "op",
            "thr",
            "n_checked",
            "n_violations",
            F.round(
                F.col("n_violations") / F.col("n_checked"), 6
            ).alias("violation_rate"),
        )
    )


def dq_rules_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative rule engine: constraints live in a rules TABLE
    (rule_id, column, op, threshold), the engine melts the checked
    columns to (column, value) pairs, broadcast-joins the rules, and
    evaluates one generic CASE-on-op predicate — per-rule violation
    counts and rates, the Deequ/Great-Expectations contract shape where
    adding a rule is a row insert, not a code change.

    Scale: one scan of the fact table, a |cols|-way melt (Generate),
    a broadcast join against the ≤rules-row dim, one count aggregate.
    NULL values violate every rule on their column (explicit in the
    CASE), so the report never silently skips missing data. The core
    is :func:`rules_report` — the same function the streaming
    dq-monitor runs per micro-batch."""
    return rules_report(load_table(spark, sf_dir, "orders"))


# PSI drift bins: fixed width-20 value buckets clamped to [0, 9] — a
# STABLE bin definition (no data-dependent min/max job), +1/-10
# Laplace smoothing so empty bins stay finite.
PSI_BINS = 10
PSI_BIN_W = 20.0


def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: Population Stability Index between
    two deterministic halves of the event stream (event_id parity —
    stand-ins for yesterday/today), per value bucket: counts, smoothed
    shares, and the PSI term (p−q)·ln(p/q). The monitoring primitive
    that catches a upstream data change before it poisons a training
    run; Σ psi_term > 0.2 is the classic alarm line.

    Scale: one scan, map-side binning (fixed-width buckets — no global
    min/max dependency), a ≤2·bins-key aggregate, and a ≤bins-row
    join. The ln is floor-quantized at 1e-6 (tfidf idiom)."""
    e = load_table(spark, sf_dir, "events")
    # non-finite measures bin to NULL (missing), guarded BEFORE floor:
    # Spark's floor() coerces NaN to 0L on its internal double→long
    # conversion, so a post-floor try_cast would silently file NaN
    # under bin 0 (and Spark's NULL-skipping least() would drop a NULL
    # into the top bucket)
    finite = ~F.isnan("value") & (F.abs(F.col("value")) != float("inf"))
    binned = e.select(
        (F.col("event_id") % 2 == 0).alias("is_a"),
        F.when(
            finite,
            F.least(
                F.floor(F.col("value") / F.lit(PSI_BIN_W)),
                F.lit(PSI_BINS - 1).cast("long"),
            ).cast("int"),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.col("is_a").cast("long")).alias("n_a"),
        F.sum((~F.col("is_a")).cast("long")).alias("n_b"),
    )
    totals = counts.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    from pyspark.sql.functions import broadcast

    smoothed = counts.crossJoin(broadcast(totals)).select(
        "bin",
        "n_a",
        "n_b",
        (
            (F.col("n_a") + 1)
            / (F.col("t_a") + F.lit(PSI_BINS))
        ).alias("p"),
        (
            (F.col("n_b") + 1)
            / (F.col("t_b") + F.lit(PSI_BINS))
        ).alias("q"),
    )
    lnq = "floor(ln(p / q) * 1000000.0D) / 1000000.0D"
    return smoothed.select(
        "bin",
        "n_a",
        "n_b",
        F.round("p", 6).alias("share_a"),
        F.round("q", 6).alias("share_b"),
        F.round(F.expr(f"(p - q) * ({lnq})"), 6).alias("psi_term"),
    )


def _first_digit_sql(col: str, intdiv: str = "div") -> str:
    """First decimal digit of a POSITIVE bigint column, as one integer
    CASE ladder + division — branch count is fixed (bigint spans 19
    digits), every term is exact integer arithmetic, and the identical
    ladder runs in DuckDB with ``intdiv='//'`` (its integer-division
    spelling)."""
    ladder = " ".join(
        f"when {col} < {10 ** (k + 1)} then {10 ** k}"
        for k in range(18)
    )
    return (
        f"cast({col} {intdiv} (case {ladder}"
        " else 1000000000000000000 end) as int)"
    )


def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of ``l_extendedprice``: observed share of
    each first significant digit vs the log10(1 + 1/d) expectation —
    the classic fabricated-data / unit-mixup detector a DQ suite runs
    on monetary columns. (TPC-H-ish prices are NOT Benford-distributed;
    the deviation column IS the finding.)

    Exactness: the first digit comes from pure integer arithmetic over
    the exact cents BIGINT — a CASE ladder of magnitude tests and one
    integer division (never float log10, whose edge cases at exact
    powers of ten differ per engine; never a string cast, which was
    measured 2× the whole query); expected shares floor-quantize
    ln()/ln(10) at 1e-6 (the tfidf idiom). Shape: one map-side
    projection → 9-group agg with map-side combine → broadcast of the
    1-row total; linear scan cost, the cheapest audit in the suite.

    Domain guard: Benford's law is defined over nonzero magnitudes, so
    non-positive amounts are excluded from both the counts and the
    share denominator rather than producing ln(1+1/0) garbage rows —
    the audit degrades gracefully on generic monetary columns, not
    just the all-positive l_extendedprice. The guard is the numeric
    predicate cents >= 1 (exactly "first significant digit ∈ 1–9"),
    which also bounds the CASE ladder's domain from below."""
    li = load_table(spark, sf_dir, "lineitem")
    d = (
        li.select(
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents")
        )
        .filter(F.col("cents") >= 1)
        .select(F.expr(_first_digit_sql("cents")).alias("digit"))
    )
    counts = d.groupBy("digit").agg(F.count("*").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("n_total"))
    exp_share = F.expr(
        "floor(ln(1.0D + 1.0D / digit) / ln(10.0D) * 1000000.0D)"
        " / 1000000.0D"
    )
    obs_share = F.col("n_rows").cast("double") / F.col("n_total")
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n_rows",
        F.round(obs_share, 6).alias("obs_share"),
        F.round(exp_share, 6).alias("exp_share"),
        F.round(F.abs(obs_share - exp_share), 6).alias("abs_dev"),
    )


# Winsorization percentiles (nearest-rank, the agg_percentile_exact
# idiom so both engines pick the identical element).
_WINSOR_LO = 0.05
_WINSOR_HI = 0.95


def dq_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized-mean report per event_type: exact P05/P95 bounds,
    raw vs clamped mean, and how many rows each tail clipped — the
    outlier-robust aggregate a metrics pipeline publishes instead of
    a raw mean that one fat-fingered row can move.

    Exactness: value has 2 decimals → all sums run on exact cents
    BIGINTs; the percentile is nearest-rank (rank == ceil(p·n)) with
    an event_id tiebreak, so both engines pick the identical element;
    two float divisions at the end. Shape: ONE window exchange on
    event_type (rank + count share it), a broadcast join of the
    |groups|-row bounds table back onto the same already-partitioned
    scan, one final agg. The rank window concentrates each group in
    one task — the documented exact-percentile trade (cf.
    agg_percentile_exact); the unbounded-cardinality scale path is
    agg_percentile_approx."""
    # NULL measures are excluded up front: they cannot be clamped, and
    # leaving them in shifts every nearest-rank differently per engine
    # (Spark sorts NULLS FIRST, DuckDB NULLS LAST) — pinned by
    # tests/adversarial_sweep.py
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    d = ev.select(
        "event_type",
        F.round(F.col("value") * 100).try_cast("long").alias("v100"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )

    def at(p: float):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * F.lit(p)).cast("long"),
                F.col("v100"),
            )
        )

    bounds = d.groupBy("event_type").agg(
        at(_WINSOR_LO).alias("lo100"), at(_WINSOR_HI).alias("hi100")
    )
    clamped = d.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "n",
        "lo100",
        "hi100",
        "v100",
        F.greatest(
            F.col("lo100"), F.least(F.col("hi100"), F.col("v100"))
        ).alias("w100"),
    )
    return clamped.groupBy("event_type").agg(
        F.max("n").alias("n_rows"),
        F.round(F.max("lo100") / F.lit(100.0), 4).alias("p05"),
        F.round(F.max("hi100") / F.lit(100.0), 4).alias("p95"),
        F.round(
            F.sum("v100").cast("double") / F.max("n") / F.lit(100.0), 4
        ).alias("mean_raw"),
        F.round(
            F.sum("w100").cast("double") / F.max("n") / F.lit(100.0), 4
        ).alias("mean_winsor"),
        F.sum(F.when(F.col("v100") < F.col("lo100"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clip_lo"),
        F.sum(F.when(F.col("v100") > F.col("hi100"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clip_hi"),
    )


def dq_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial reconciliation: recompute each order's
    total from its line items (Σ extendedprice·(1−discount)·(1+tax))
    and bucket the orders by how far the stored ``o_totalprice``
    deviates — the sum-to-header consistency audit every
    finance/billing pipeline runs between a fact table and its
    rollup, and the cross-FIELD counterpart of
    ``dq_referential_integrity``'s cross-KEY check.

    Exactness: all three factors have 2 decimals, so the recomputed
    line value is the exact integer product e100·(100−d100)·(100+t100)
    in 1e-6-dollar units — order-free BIGINT sums, zero float drift;
    the stored total scales by 1e4 to the same units. Buckets: exact /
    under a cent / under a dollar / a dollar or more / no_lineitems.

    Shape: one l_orderkey-keyed partial-aggregated sum (map-side
    combine does most of the work), one equi-join to orders (at 100 TB
    both sides hash-shuffle on the same key, or co-located if the
    tables are bucketed by orderkey — no broadcast needed, no skew:
    orderkeys are unique on one side, ≤7 rows on the other), and a
    ≤5-row report aggregate."""
    return reconciliation_report_from(
        load_table(spark, sf_dir, "orders"),
        reconciliation_recomputed(load_table(spark, sf_dir, "lineitem")),
    )


def reconciliation_recomputed(lineitem_df: DataFrame) -> DataFrame:
    """(l_orderkey, recomputed6): each order's total recomputed from
    its line items in exact 1e-6-dollar integer units — the
    lineitem-side half of the reconciliation, split out so the
    streaming dq-monitor can compute it ONCE at monitor start instead
    of rescanning lineitem per micro-batch."""
    li = lineitem_df.select(
        "l_orderkey",
        F.expr(
            "cast(round(l_extendedprice * 100) as bigint)"
            " * (100L - cast(round(l_discount * 100) as bigint))"
            " * (100L + cast(round(l_tax * 100) as bigint))"
        ).alias("v6"),
    )
    return li.groupBy("l_orderkey").agg(F.sum("v6").alias("recomputed6"))


def reconciliation_report_from(
    orders_df: DataFrame, recomputed_df: DataFrame
) -> DataFrame:
    """The reconciliation CORE over any orders frame + a recomputed
    per-order totals frame — shared verbatim by the batch query and
    the streaming dq-monitor (stream == batch as a theorem, the
    ``batch_drift_scores`` pattern)."""
    o = orders_df.select(
        "o_orderkey",
        (F.expr("cast(round(o_totalprice * 100) as bigint)") * 10000)
        .alias("stored6"),
    )
    diffed = o.join(
        recomputed_df, o.o_orderkey == recomputed_df.l_orderkey, "left"
    ).select(
        F.when(F.col("recomputed6").isNull(), "no_lineitems")
        .when(F.col("recomputed6") == F.col("stored6"), "exact")
        .when(
            F.abs(F.col("recomputed6") - F.col("stored6")) < 10_000,
            "lt_1_cent",
        )
        .when(
            F.abs(F.col("recomputed6") - F.col("stored6")) < 1_000_000,
            "lt_1_dollar",
        )
        .otherwise("ge_1_dollar")
        .alias("bucket"),
        (F.col("recomputed6") - F.col("stored6")).alias("diff6"),
    )
    return diffed.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.min("diff6").alias("min_diff6"),
        F.max("diff6").alias("max_diff6"),
    )


# the completeness audit's column set: (table, column) pairs across the
# warehouse — adding a column is a tuple append, not a code change
COMPLETENESS_COLS: tuple[tuple[str, str], ...] = (
    ("orders", "o_orderkey"),
    ("orders", "o_custkey"),
    ("orders", "o_totalprice"),
    ("orders", "o_orderstatus"),
    ("customer", "c_custkey"),
    ("customer", "c_acctbal"),
    ("customer", "c_name"),
    ("events", "event_id"),
    ("events", "user_id"),
    ("events", "value"),
    ("events", "props"),
    ("documents", "doc_id"),
    ("documents", "text"),
    ("documents", "lang"),
)


def dq_completeness_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness matrix: per (table, column), row count, null
    count, blank count (empty/whitespace strings — the nulls that
    don't say so), and the combined missing rate. The first page of
    every data-quality report and the check that catches a loader
    silently writing empty strings where upstream had NULLs.

    Shape: one 1-row aggregate per audited TABLE (all its columns'
    null/blank counts in one map-side pass — never one scan per
    column), melted to (table, column) rows and unioned; the union is
    |tables| tiny frames. Exact integer counts, one division."""
    per_table: dict[str, list[str]] = {}
    for t, c in COMPLETENESS_COLS:
        per_table.setdefault(t, []).append(c)
    frames = []
    for t, cols in per_table.items():
        df = load_table(spark, sf_dir, t)
        aggs = [F.count("*").cast("bigint").alias("__n")]
        for c in cols:
            # coalesced: SUM over an empty table is NULL, but "how many
            # nulls/blanks in zero rows" is 0 (the audit must not report
            # unknown counts for an empty partition)
            aggs.append(
                F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0))
                .cast("bigint")
                .alias(f"__null_{c}")
            )
            is_str = dict(df.dtypes).get(c) == "string"
            blank = (
                F.col(c).isNotNull() & (F.trim(F.col(c)) == "")
                if is_str
                else F.lit(False)
            )
            aggs.append(
                F.coalesce(F.sum(blank.cast("long")), F.lit(0))
                .cast("bigint")
                .alias(f"__blank_{c}")
            )
        one = df.agg(*aggs)
        melted = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table_name"),
                            F.lit(c).alias("column_name"),
                            F.col("__n").alias("n_rows"),
                            F.col(f"__null_{c}").alias("n_null"),
                            F.col(f"__blank_{c}").alias("n_blank"),
                        )
                        for c in cols
                    ]
                )
            ).alias("kv")
        ).select("kv.*")
        frames.append(melted)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(
        "table_name",
        "column_name",
        "n_rows",
        "n_null",
        "n_blank",
        # empty table → NULL rate (0/0), never an ANSI divide error
        F.when(
            F.col("n_rows") > 0,
            F.round(
                (F.col("n_null") + F.col("n_blank")) / F.col("n_rows"), 6
            ),
        ).alias("missing_rate"),
    )


_COMPLETENESS_STRING_COLS = {
    "o_orderstatus", "c_name", "props", "text", "lang"
}


def _completeness_oracle() -> str:
    parts = []
    for t, c in COMPLETENESS_COLS:
        blank = (
            f"SUM(CASE WHEN {c} IS NOT NULL AND TRIM({c}) = ''"
            " THEN 1 ELSE 0 END)"
            if c in _COMPLETENESS_STRING_COLS
            else "0"
        )
        parts.append(
            f"""SELECT '{t}' AS table_name, '{c}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COALESCE(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END),
                             0) AS BIGINT) AS n_null,
               CAST(COALESCE({blank}, 0) AS BIGINT) AS n_blank,
               CASE WHEN COUNT(*) > 0 THEN
                   ROUND((COALESCE(SUM(CASE WHEN {c} IS NULL
                                        THEN 1 ELSE 0 END), 0)
                          + COALESCE({blank}, 0))
                         / CAST(COUNT(*) AS DOUBLE), 6)
               END AS missing_rate
        FROM {t}"""
        )
    return "\n        UNION ALL ".join(parts)



# the duplicate-key audit's (table, key column) pairs; lineitem's key
# is composite, expressed as a tuple of columns
DUPKEY_TABLES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("orders", ("o_orderkey",)),
    ("customer", ("c_custkey",)),
    ("events", ("event_id",)),
    ("documents", ("doc_id",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
)


def dq_duplicate_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit: per table, row count, distinct
    key count, number of DUPLICATED keys and the worst multiplicity —
    the load-level check that catches a double-applied batch or a
    broken MERGE before referential integrity even gets a say (a
    duplicated PK breaks every downstream join's cardinality
    assumptions silently).

    Shape: per table ONE key-grouped count aggregate (map-side
    combined — the partial agg absorbs the duplicates) folded into a
    1-row summary; the union is |tables| single-row frames. Exact
    integer counts only."""
    frames = []
    for t, keys in DUPKEY_TABLES:
        df = load_table(spark, sf_dir, t)
        per_key = df.groupBy(*keys).agg(F.count("*").alias("m"))
        frames.append(
            per_key.agg(
                F.lit(t).alias("table_name"),
                F.lit(",".join(keys)).alias("key_columns"),
                F.sum("m").cast("bigint").alias("n_rows"),
                F.count("*").cast("bigint").alias("n_keys"),
                F.sum((F.col("m") > 1).cast("long"))
                .cast("bigint")
                .alias("n_dup_keys"),
                F.sum(
                    F.when(F.col("m") > 1, F.col("m")).otherwise(0)
                )
                .cast("bigint")
                .alias("n_rows_in_dups"),
                F.max("m").cast("bigint").alias("max_multiplicity"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out



def _dupkey_oracle() -> str:
    parts = []
    for t, keys in DUPKEY_TABLES:
        kexpr = ", ".join(keys)
        parts.append(
            f"""SELECT '{t}' AS table_name,
               '{",".join(keys)}' AS key_columns,
               CAST(SUM(m) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_keys,
               CAST(SUM(CASE WHEN m > 1 THEN m ELSE 0 END) AS BIGINT)
                   AS n_rows_in_dups,
               CAST(MAX(m) AS BIGINT) AS max_multiplicity
        FROM (SELECT {kexpr}, COUNT(*) AS m FROM {t}
              GROUP BY {kexpr})"""
        )
    return "\n        UNION ALL ".join(parts)


# declared enum/pattern conformity rules: (table, column, regex).
# Adding a column is a tuple append, not a code change (the
# COMPLETENESS_COLS convention).
ENUM_CONFORMITY_RULES: tuple[tuple[str, str, str], ...] = (
    ("orders", "o_orderstatus", "^[OFP]$"),
    ("orders", "o_orderpriority", "^[1-5]-[A-Z]+$"),
    ("events", "event_type", "^[a-z_]+$"),
    ("documents", "lang", "^[a-z]{2}$"),
)


def dq_enum_conformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enum/pattern conformity audit: for each declared (table, column,
    pattern) rule, how many rows conform, how many violate, the
    violation rate, and how many DISTINCT bad values exist — the check
    that catches a producer shipping a new unexpected code (the
    completeness matrix sees nulls; this sees wrong non-nulls).

    Shape: one scan per audited table with all its rules' counts in
    one aggregate (regexps are map-side codegen); the union is
    ≤|rules| rows. Exact integers until the rate division."""
    from ..io import load_table

    parts = []
    by_table: dict[str, list[tuple[str, str]]] = {}
    for table, col, pat in ENUM_CONFORMITY_RULES:
        by_table.setdefault(table, []).append((col, pat))
    for table, rules in by_table.items():
        t = load_table(spark, sf_dir, table)
        aggs = []
        for col, pat in rules:
            ok = F.col(col).rlike(pat)
            aggs.extend(
                [
                    F.count(F.col(col)).cast("bigint").alias(
                        f"{col}__n"
                    ),
                    F.sum(ok.cast("bigint")).cast("bigint").alias(
                        f"{col}__ok"
                    ),
                    F.count_distinct(
                        F.when(~ok, F.col(col))
                    ).cast("bigint").alias(f"{col}__bad"),
                ]
            )
        wide = t.agg(*aggs)
        for col, pat in rules:
            parts.append(
                wide.select(
                    F.lit(table).alias("table_name"),
                    F.lit(col).alias("column_name"),
                    F.lit(pat).alias("pattern"),
                    F.col(f"{col}__n").alias("n_values"),
                    (F.col(f"{col}__n") - F.col(f"{col}__ok"))
                    .cast("bigint")
                    .alias("n_violations"),
                    F.round(
                        (F.col(f"{col}__n") - F.col(f"{col}__ok"))
                        .cast("double")
                        / F.col(f"{col}__n"),
                        6,
                    ).alias("violation_rate"),
                    F.col(f"{col}__bad").alias("n_distinct_bad"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# cross-FIELD consistency rules: (table, rule_id, violation predicate)
# — the predicate is shared VERBATIM between the Spark plan (F.expr)
# and the DuckDB oracle, so the contract is the rule text itself.
# The completeness matrix sees nulls, enum conformity sees wrong
# values; this sees rows whose fields disagree with EACH OTHER.
CROSS_FIELD_RULES: tuple[tuple[str, str, str], ...] = (
    ("lineitem", "nonpositive_charge",
     "l_extendedprice * (1 - l_discount) <= 0"),
    ("lineitem", "unit_price_implausible",
     "l_quantity > 0 AND l_extendedprice / l_quantity > 100000"),
    ("lineitem", "returned_but_open",
     "l_returnflag = 'R' AND l_linestatus = 'O'"),
    ("lineitem", "discount_out_of_range",
     "l_discount < 0 OR l_discount > 0.5"),
    ("documents", "n_chars_mismatch", "n_chars <> length(text)"),
    ("orders", "nonpositive_total", "o_totalprice <= 0"),
)


def dq_cross_field_consistency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-field consistency audit: for each declared (table, rule,
    violation-predicate) — fields that must agree WITHIN a row, like
    ship ≤ receipt or a stored length matching the payload — count the
    rows where they don't. The third leg of the declarative DQ
    battery next to :func:`dq_completeness_matrix` (nulls) and
    :func:`dq_enum_conformity` (bad values).

    Shape: ONE scan per audited table carrying all of that table's
    rule counts in a single conditional aggregate (predicates are
    map-side codegen); the report is ≤|rules| rows. The predicate
    string itself is the cross-engine contract — both engines compile
    the same expression text. Exact integers until the rate
    division."""
    parts = []
    by_table: dict[str, list[tuple[str, str]]] = {}
    for table, rule, pred in CROSS_FIELD_RULES:
        by_table.setdefault(table, []).append((rule, pred))
    for table, rules in by_table.items():
        t = load_table(spark, sf_dir, table)
        aggs = [F.count("*").cast("bigint").alias("__n")]
        for rule, pred in rules:
            aggs.append(
                F.sum(
                    F.when(F.expr(pred), 1).otherwise(0)
                )
                .cast("bigint")
                .alias(f"{rule}__bad")
            )
        wide = t.agg(*aggs)
        for rule, pred in rules:
            parts.append(
                wide.select(
                    F.lit(table).alias("table_name"),
                    F.lit(rule).alias("rule_id"),
                    F.lit(pred).alias("violation_predicate"),
                    F.col("__n").alias("n_rows"),
                    F.col(f"{rule}__bad").alias("n_violations"),
                    F.round(
                        F.col(f"{rule}__bad").cast("double")
                        / F.col("__n"),
                        6,
                    ).alias("violation_rate"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _cross_field_oracle() -> str:
    parts = []
    for table, rule, pred in CROSS_FIELD_RULES:
        pred_sql = pred.replace("'", "''")
        parts.append(f"""
        SELECT '{table}' AS table_name, '{rule}' AS rule_id,
               '{pred_sql}' AS violation_predicate,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violations,
               ROUND(CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END)
                     AS DOUBLE) / COUNT(*), 6) AS violation_rate
        FROM {table}""")
    return "\n        UNION ALL\n".join(parts)


QUERIES = {
    "dq_cross_field_consistency": dq_cross_field_consistency,
    "dq_enum_conformity": dq_enum_conformity,
    "dq_referential_integrity": dq_referential_integrity,
    "dq_duplicate_key_report": dq_duplicate_key_report,
    "dq_completeness_matrix": dq_completeness_matrix,
    "dq_benford": dq_benford,
    "dq_reconciliation": dq_reconciliation,
    "dq_winsorize": dq_winsorize,
    "dq_profile": dq_profile,
    "dq_outlier_mad": dq_outlier_mad,
    "dq_rules_engine": dq_rules_engine,
    "dq_distribution_drift": dq_distribution_drift,
}

def _enum_conformity_oracle() -> str:
    parts = []
    for table, col, pat in ENUM_CONFORMITY_RULES:
        parts.append(f"""
        SELECT '{table}' AS table_name, '{col}' AS column_name,
               '{pat}' AS pattern,
               CAST(COUNT({col}) AS BIGINT) AS n_values,
               CAST(COUNT({col})
                    - SUM(CASE WHEN regexp_matches({col}, '{pat}')
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
               ROUND(CAST(COUNT({col})
                     - SUM(CASE WHEN regexp_matches({col}, '{pat}')
                           THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT({col}), 6) AS violation_rate,
               CAST(COUNT(DISTINCT CASE WHEN NOT
                    regexp_matches({col}, '{pat}') THEN {col} END)
                    AS BIGINT) AS n_distinct_bad
        FROM {table}""")
    return "\n        UNION ALL\n".join(parts)


ORACLES = {
    "dq_cross_field_consistency": _cross_field_oracle(),
    "dq_enum_conformity": _enum_conformity_oracle(),
    "dq_completeness_matrix": _completeness_oracle(),
    "dq_duplicate_key_report": _dupkey_oracle(),
    "dq_reconciliation": """
        WITH li AS (
            SELECT l_orderkey,
                   CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))
                   * (100 + CAST(ROUND(l_tax * 100, 0) AS BIGINT)) AS v6
            FROM lineitem
        ),
        rec AS (
            SELECT l_orderkey, SUM(v6) AS recomputed6
            FROM li GROUP BY l_orderkey
        ),
        d AS (
            SELECT CASE
                     WHEN recomputed6 IS NULL THEN 'no_lineitems'
                     WHEN recomputed6 = stored6 THEN 'exact'
                     WHEN ABS(recomputed6 - stored6) < 10000
                         THEN 'lt_1_cent'
                     WHEN ABS(recomputed6 - stored6) < 1000000
                         THEN 'lt_1_dollar'
                     ELSE 'ge_1_dollar'
                   END AS bucket,
                   recomputed6 - stored6 AS diff6
            FROM (
                SELECT o_orderkey,
                       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                           * 10000 AS stored6
                FROM orders
            ) o
            LEFT JOIN rec ON rec.l_orderkey = o.o_orderkey
        )
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(diff6) AS BIGINT) AS min_diff6,
               CAST(MAX(diff6) AS BIGINT) AS max_diff6
        FROM d GROUP BY bucket
    """,
    "dq_benford": f"""
        WITH d AS (
            SELECT {_first_digit_sql("cents", intdiv="//")} AS digit
            FROM (SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                             AS cents
                  FROM lineitem)
            WHERE cents >= 1
        ),
        counts AS (
            SELECT digit, COUNT(*) AS n_rows FROM d GROUP BY digit
        ),
        total AS (SELECT SUM(n_rows) AS n_total FROM counts)
        SELECT digit, n_rows,
               ROUND(CAST(n_rows AS DOUBLE) / n_total, 6) AS obs_share,
               ROUND(FLOOR(LN(1.0 + 1.0 / digit) / LN(10.0) * 1000000.0)
                     / 1000000.0, 6) AS exp_share,
               ROUND(ABS(CAST(n_rows AS DOUBLE) / n_total
                         - FLOOR(LN(1.0 + 1.0 / digit) / LN(10.0)
                                 * 1000000.0) / 1000000.0), 6) AS abs_dev
        FROM counts, total
    """,
    "dq_winsorize": f"""
        WITH d AS (
            SELECT event_type,
                   TRY_CAST(ROUND(value * 100, 0) AS BIGINT) AS v100,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value ASC, event_id ASC)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events WHERE value IS NOT NULL
        ),
        bounds AS (
            SELECT event_type,
                   MAX(CASE WHEN rn = CAST(CEIL(n * {_WINSOR_LO})
                                           AS BIGINT)
                            THEN v100 END) AS lo100,
                   MAX(CASE WHEN rn = CAST(CEIL(n * {_WINSOR_HI})
                                           AS BIGINT)
                            THEN v100 END) AS hi100
            FROM d GROUP BY event_type
        ),
        clamped AS (
            SELECT d.event_type, d.n, b.lo100, b.hi100, d.v100,
                   GREATEST(b.lo100, LEAST(b.hi100, d.v100)) AS w100
            FROM d JOIN bounds b USING (event_type)
        )
        SELECT event_type,
               MAX(n) AS n_rows,
               ROUND(MAX(lo100) / 100.0, 4) AS p05,
               ROUND(MAX(hi100) / 100.0, 4) AS p95,
               ROUND(CAST(SUM(v100) AS DOUBLE) / MAX(n) / 100.0, 4)
                   AS mean_raw,
               ROUND(CAST(SUM(w100) AS DOUBLE) / MAX(n) / 100.0, 4)
                   AS mean_winsor,
               CAST(SUM(CASE WHEN v100 < lo100 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clip_lo,
               CAST(SUM(CASE WHEN v100 > hi100 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clip_hi
        FROM clamped GROUP BY event_type
    """,
    "dq_rules_engine": f"""
        WITH melted AS (
            {" UNION ALL ".join(
                f"SELECT '{c}' AS col, CAST({c} AS DOUBLE) AS value FROM orders"
                for c in _DQ_COLS)}
        ),
        rules AS (
            SELECT * FROM (VALUES {_DQ_RULE_VALUES})
                AS t(rule_id, col, op, thr)
        ),
        ev AS (
            SELECT r.rule_id, r.col, r.op, r.thr, m.value,
                   CASE WHEN m.value IS NULL THEN false
                        WHEN r.op = '>' THEN m.value > r.thr
                        WHEN r.op = '>=' THEN m.value >= r.thr
                        WHEN r.op = '<' THEN m.value < r.thr
                        WHEN r.op = '<=' THEN m.value <= r.thr
                        ELSE false END AS passed
            FROM melted m JOIN rules r USING (col)
        )
        SELECT rule_id, col, op, thr,
               COUNT(*) AS n_checked,
               CAST(SUM(CASE WHEN passed THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_violations,
               ROUND(CAST(SUM(CASE WHEN passed THEN 0 ELSE 1 END) AS DOUBLE)
                     / COUNT(*), 6) AS violation_rate
        FROM ev GROUP BY rule_id, col, op, thr
    """,
    "dq_distribution_drift": f"""
        WITH binned AS (
            -- non-finite measures bin to NULL (see the Spark twin)
            SELECT event_id % 2 = 0 AS is_a,
                   CASE WHEN isfinite(value) THEN
                       CAST(LEAST(FLOOR(value / {PSI_BIN_W}::DOUBLE),
                                  {PSI_BINS - 1}) AS INTEGER)
                   END AS bin
            FROM events
        ),
        counts AS (
            SELECT bin,
                   CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
            FROM binned GROUP BY bin
        ),
        totals AS (
            SELECT SUM(n_a) AS t_a, SUM(n_b) AS t_b FROM counts
        ),
        s AS (
            SELECT bin, n_a, n_b,
                   (n_a + 1) / (t_a + {PSI_BINS}) AS p,
                   (n_b + 1) / (t_b + {PSI_BINS}) AS q
            FROM counts, totals
        )
        SELECT bin, n_a, n_b,
               ROUND(p, 6) AS share_a,
               ROUND(q, 6) AS share_b,
               ROUND((p - q) * (FLOOR(LN(p / q) * 1000000.0::DOUBLE)
                                / 1000000.0::DOUBLE), 6) AS psi_term
        FROM s
    """,
    "dq_referential_integrity": """
        SELECT 'lineitem->orders' AS relationship,
               COUNT(*) AS n_orphans
        FROM lineitem l WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'lineitem->supplier', COUNT(*)
        FROM lineitem l WHERE NOT EXISTS (
            SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
        UNION ALL
        SELECT 'lineitem->part', COUNT(*)
        FROM lineitem l WHERE NOT EXISTS (
            SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        UNION ALL
        SELECT 'orders->customer', COUNT(*)
        FROM orders o WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
    "dq_profile": """
        WITH a AS (
            SELECT COUNT(*) AS n_rows,
                   SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nulls_custkey,
                   COUNT(DISTINCT o_custkey) AS distinct_custkey,
                   COUNT(DISTINCT o_orderstatus) AS distinct_status,
                   ROUND(MIN(o_totalprice), 4) AS min_price,
                   ROUND(MAX(o_totalprice), 4) AS max_price,
                   MIN(o_orderdate) AS min_date,
                   MAX(o_orderdate) AS max_date
            FROM orders
        )
        SELECT 'n_rows' AS metric, CAST(n_rows AS VARCHAR) AS value FROM a
        UNION ALL SELECT 'nulls_custkey', CAST(nulls_custkey AS VARCHAR) FROM a
        UNION ALL SELECT 'distinct_custkey', CAST(distinct_custkey AS VARCHAR) FROM a
        UNION ALL SELECT 'distinct_status', CAST(distinct_status AS VARCHAR) FROM a
        UNION ALL SELECT 'min_price', CAST(min_price AS VARCHAR) FROM a
        UNION ALL SELECT 'max_price', CAST(max_price AS VARCHAR) FROM a
        UNION ALL SELECT 'min_date', CAST(min_date AS VARCHAR) FROM a
        UNION ALL SELECT 'max_date', CAST(max_date AS VARCHAR) FROM a
    """,
    "dq_outlier_mad": """
        -- non-finite measures normalize to NULL first (Spark twin)
        WITH base AS (
            SELECT user_id,
                   CASE WHEN isfinite(value) THEN value END AS value
            FROM events
        ),
        m AS (
            SELECT user_id, value,
                   quantile_cont(value, 0.5)
                       OVER (PARTITION BY user_id) AS med
            FROM base
        ),
        d AS (
            SELECT user_id, value, med,
                   quantile_cont(abs(value - med), 0.5)
                       OVER (PARTITION BY user_id) AS mad
            FROM m
        )
        SELECT user_id,
               COUNT(*) AS n_events,
               ROUND(med, 4) AS med,
               ROUND(mad, 4) AS mad,
               CAST(SUM(CASE WHEN abs(value - med) > 3 * 1.4826 * mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM d
        GROUP BY user_id, med, mad
    """,
}

"""Scalar function coverage: string / date / math / JSON / array.

All JVM-side built-ins (whole-stage codegen), no Python UDFs. Integer
extracts are cast explicitly on the oracle side so dtypes line up
(DuckDB EXTRACT returns BIGINT, Spark year()/month() return INT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, trunc_ntz


def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_upper"),
        F.substring("text", 1, 20).alias("prefix20"),
        F.length("text").alias("text_len"),
        F.concat_ws(":", "source", "lang").alias("src_lang"),
        F.col("text").like("%spark%").alias("has_spark"),
    )


def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("hr"),
    ).agg(F.count("*").alias("n_events"))


def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 4).alias("sqrt_price"),
        F.round(F.log("l_extendedprice"), 4).alias("ln_price"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("abs_disc_delta"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
    )


def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the opaque payload — the Spark-native
    'schema-on-read' move the reference never implemented (its flink-json
    dependency is unused; reference pom.xml:62-66)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over the embedding column.

    The fold runs left-to-right in both engines, so the double sum is
    bit-identical before rounding.
    """
    e = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vec_sum = F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.round(vec_sum, 4).alias("vec_sum"),
        F.round(F.array_max(as_double), 4).alias("vec_max"),
    )


def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family: extract / replace / count (RE2-compatible patterns
    so Spark's java.util.regex and DuckDB's RE2 agree)."""
    d = load_table(spark, sf_dir, "documents")
    head = F.substring("text", 1, 60)
    return d.select(
        "doc_id",
        F.regexp_extract(F.col("text"), r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace(head, r"\d", "#").alias("head_masked"),
        F.regexp_count(head, F.lit("[aeiou]")).cast("long").alias("n_vowels"),
    )


def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE, NULLIF, COALESCE, GREATEST, LEAST."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "done")
        .otherwise("other")
        .alias("status_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending"))
        .alias("status_or_pending"),
        F.round(F.greatest(F.col("o_totalprice"), F.lit(100000.0)), 4)
        .alias("price_floor"),
        F.round(F.least(F.col("o_totalprice"), F.lit(400000.0)), 4)
        .alias("price_cap"),
    )


def fn_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map + struct construction and field access, JVM-side; the nested
    values are projected back to scalars so the oracle compares flat
    columns (map/struct wire equality across engines is not defined)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("uid")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    s = F.struct(F.col("event_id").alias("id"), F.col("value").alias("v"))
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "uid").cast("long").alias("m_uid"),
        F.size(m).alias("m_size"),
        s.getField("v").alias("s_value"),
    )


def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (filter / exists / transform+aggregate)
    projected to scalars — array-typed outputs don't compare stably
    across engines, scalar reductions do."""
    e = load_table(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(F.filter(vec, lambda x: x > 0.5)).alias("n_above_half"),
        F.exists(vec, lambda x: x < -0.99).alias("has_near_neg1"),
        F.round(
            F.aggregate(
                F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            ),
            4,
        ).alias("sq_norm"),
    )




def fn_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed schema-on-read: from_json with a DECLARED schema + struct
    field access + to_json round-trip (fn_json is the schemaless
    get_json_object path). The parse happens once per row; both
    projections read the same parsed struct."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k"),
        F.to_json(F.struct(parsed.getField("k").alias("k"))).alias("roundtrip"),
    )


def hist_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via the width_bucket built-in: 10 bins over
    [0, 500), under/overflow in buckets 0 and 11 — the corpus-stats
    binning primitive (token-length / score histograms at 100 TB are
    this exact one-shuffle aggregate)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.width_bucket("value", F.lit(0.0), F.lit(500.0), F.lit(10)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def hist_log_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-of-magnitude (decade) histogram of order totals: bucket =
    number of digits in the exact cent value — the log10 profile that
    diagnoses value skew (how many orders live at $10³ vs $10⁵) where
    the equi-width histogram (:func:`hist_value_buckets`) can't
    resolve both ends at once.

    The decade id is computed by STRING LENGTH of the integer cents,
    not floor(log10): the ln-based form sits one ulp from flipping a
    whole bucket at every power of ten, digit count is exact in both
    engines by construction. One map-side expression + one ≤10-key
    hash aggregate; exact cents for the per-bucket bounds."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    d = o.select(
        cents.alias("v100"),
        F.length(cents.cast("string")).cast("int").alias("decade"),
    )
    return d.groupBy("decade").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.min("v100").cast("double") / 100.0, 2).alias("min_total"),
        F.round(F.max("v100").cast("double") / 100.0, 2).alias("max_total"),
    )


def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance + padding/translate string functions — the fuzzy
    matching primitives (levenshtein is the exact-small-string
    complement to the LSH families)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.levenshtein("source", "lang").alias("lev_src_lang"),
        F.lpad("lang", 5, "*").alias("lang_padded"),
        F.reverse("source").alias("source_rev"),
        F.translate("source", "-", "_").alias("source_snake"),
    )


def upsert_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins upsert compaction: one surviving row per
    (user_id, event_type), carrying the values of the row with the
    highest event_id — the max_by aggregate form (single hash agg with
    map-side partials; the window/row_number form shuffles whole rows
    and sorts each group, this shuffles only the agg buffers)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.max("event_id").alias("latest_event_id"),
        F.max_by("ts", "event_id").alias("latest_ts"),
        F.round(F.max_by("value", "event_id"), 4).alias("latest_value"),
        F.count("*").alias("n_versions"),
    )


def fn_json_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-data tolerance for schema-on-read: parse a payload column
    where a third of the rows are deliberately truncated to invalid
    JSON. from_json yields NULL for bad rows (never a job kill — the
    one-bad-record-in-100TB property), counted per event_type."""
    ev = load_table(spark, sf_dir, "events")
    # event_id % 3 == 0 rows lose their closing brace → invalid JSON
    dirty = F.when(
        F.col("event_id") % 3 == 0,
        F.expr("substring(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    parsed = F.from_json(dirty, "k INT")
    return (
        ev.select("event_type", parsed.getField("k").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("k").alias("n_parsed"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_failed"),
        )
    )


def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: offsets, month boundaries, day-of-week, and day
    deltas (dayofweek is 1=Sunday in Spark; DuckDB's dow is 0=Sunday —
    the oracle shifts accordingly)."""
    li = load_table(spark, sf_dir, "lineitem")
    ship = F.to_date("l_shipdate")
    iso = "yyyy-MM-dd"
    # date outputs serialize as ISO strings: Spark DATE arrives in pandas
    # as datetime.date while DuckDB DATE arrives as datetime64 — strings
    # compare deterministically in the driver's hash
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.date_format(F.date_add(ship, 30), iso).alias("ship_plus_30"),
        F.date_format(F.last_day(ship), iso).alias("month_end"),
        F.dayofweek(ship).alias("dow"),
        F.datediff(F.lit("1998-01-01").cast("date"), ship).alias("days_to_98"),
        F.date_format(F.trunc(ship, "quarter"), iso).alias("quarter_start"),
    )


def fn_csv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed CSV parsing (from_csv with a declared schema) — the
    delimited-text sibling of fn_json_struct. The CSV line is
    synthesized from columns so the oracle can verify the round trip
    against ground truth rather than another parser."""
    ev = load_table(spark, sf_dir, "events")
    line = F.concat_ws(",", F.col("event_id"), F.col("event_type"), F.col("user_id"))
    parsed = F.from_csv(line, F.lit("id BIGINT, etype STRING, uid BIGINT"))
    return ev.select(
        "event_id",
        parsed.getField("id").alias("csv_id"),
        parsed.getField("etype").alias("csv_type"),
        parsed.getField("uid").alias("csv_uid"),
    )


def fn_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed XML parsing — Spark 4's built-in from_xml with a declared
    schema (the third schema-on-read modality after JSON and CSV). The
    document is synthesized from columns so the oracle verifies the
    round trip against ground truth."""
    ev = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit("<e><id>"), F.col("event_id"),
        F.lit("</id><t>"), F.col("event_type"),
        F.lit("</t></e>"),
    )
    parsed = F.from_xml(doc, F.lit("id BIGINT, t STRING"))
    return ev.select(
        "event_id",
        parsed.getField("id").alias("xml_id"),
        parsed.getField("t").alias("xml_type"),
    )


def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: a v1 extract (no discount column) and a
    v2 extract (with it) combine via unionByName(allowMissingColumns) —
    v1 rows null-pad the new column instead of failing the job, the
    ingestion property that lets a 100 TB corpus evolve in place."""
    li = load_table(spark, sf_dir, "lineitem")
    v1 = li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey", "l_linenumber", F.round("l_extendedprice", 4).alias("price")
    )
    v2 = li.filter(F.col("l_linenumber") == 2).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 4).alias("price"),
        F.round("l_discount", 4).alias("discount"),
    )
    return v1.unionByName(v2, allowMissingColumns=True)


def fn_timestamp_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-domain arithmetic: interval addition, hour
    truncation, ISO week/year, seconds-into-day, and linear month
    index — the sub-day API surface next to fn_date_arith's date-grain
    functions (ISO week semantics agree between the engines: week 1 =
    the week containing the year's first Thursday).

    Pure map-side column expressions — whole-stage codegen, no
    shuffle, no UDF."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("ts + INTERVAL 90 MINUTE").alias("ts_plus_90m"),
        trunc_ntz("hour", F.col("ts")).alias("hour_start"),
        F.weekofyear("ts").cast("int").alias("iso_week"),
        F.expr("extract(YEAROFWEEK FROM ts)").cast("int").alias("iso_year"),
        # positive-modulus form: a bare % on a pre-epoch timestamp's
        # negative micros yields a negative remainder (and DuckDB's
        # historical floor-// would then diverge from Spark's div) —
        # normalize so seconds-into-day is always in [0, 86400)
        # regardless of the epoch sign (ADVICE r12)
        F.expr(
            "((unix_micros(ts) % 86400000000L + 86400000000L)"
            " % 86400000000L) div 1000000L"
        )
        .cast("bigint")
        .alias("secs_into_day"),
        F.expr("year(ts) * 12 + month(ts) - 1")
        .cast("bigint")
        .alias("month_index"),
    )


_TIMESTAMP_ARITH_ORACLE = """
    SELECT event_id,
           ts + INTERVAL 90 MINUTE AS ts_plus_90m,
           date_trunc('hour', ts) AS hour_start,
           CAST(weekofyear(ts) AS INTEGER) AS iso_week,
           CAST(isoyear(ts) AS INTEGER) AS iso_year,
           CAST((epoch_us(ts) % 86400000000 + 86400000000)
                % 86400000000 // 1000000 AS BIGINT)
               AS secs_into_day,
           CAST(year(ts) * 12 + month(ts) - 1 AS BIGINT) AS month_index
    FROM events
"""


QUERIES = {
    "fn_timestamp_arith": fn_timestamp_arith,
    "fn_higher_order": fn_higher_order,
    "fn_regexp": fn_regexp,
    "fn_conditional": fn_conditional,
    "fn_map_struct": fn_map_struct,
    "fn_string": fn_string,
    "fn_date": fn_date,
    "fn_math": fn_math,
    "fn_json": fn_json,
    "fn_string_distance": fn_string_distance,
    "fn_json_malformed": fn_json_malformed,
    "fn_date_arith": fn_date_arith,
    "fn_csv_parse": fn_csv_parse,
    "fn_xml_parse": fn_xml_parse,
    "union_schema_evolution": union_schema_evolution,
    "upsert_latest_wins": upsert_latest_wins,
    "fn_json_struct": fn_json_struct,
    "hist_value_buckets": hist_value_buckets,
    "hist_log_buckets": hist_log_buckets,
    "fn_array": fn_array,
}

ORACLES = {
    "fn_timestamp_arith": _TIMESTAMP_ARITH_ORACLE,
    "fn_xml_parse": """
        SELECT event_id, event_id AS xml_id, event_type AS xml_type
        FROM events
    """,
    "union_schema_evolution": """
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice, 4) AS price,
               CAST(NULL AS DOUBLE) AS discount
        FROM lineitem WHERE l_linenumber = 1
        UNION ALL
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice, 4), ROUND(l_discount, 4)
        FROM lineitem WHERE l_linenumber = 2
    """,
    "fn_csv_parse": """
        SELECT event_id,
               event_id AS csv_id,
               event_type AS csv_type,
               user_id AS csv_uid
        FROM events
    """,
    "fn_date_arith": """
        SELECT l_orderkey, l_linenumber,
               strftime(CAST(l_shipdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS ship_plus_30,
               strftime(last_day(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS month_end,
               CAST(dayofweek(l_shipdate) + 1 AS INTEGER) AS dow,
               CAST(datediff('day', CAST(l_shipdate AS DATE), DATE '1998-01-01') AS INTEGER)
                   AS days_to_98,
               strftime(date_trunc('quarter', CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS quarter_start
        FROM lineitem
    """,
    "fn_json_malformed": """
        WITH dirty AS (
            SELECT event_type,
                   CASE WHEN event_id % 3 = 0
                        THEN substring(props, 1, length(props) - 1)
                        ELSE props END AS p
            FROM events
        ), parsed AS (
            SELECT event_type,
                   CASE WHEN json_valid(p)
                        THEN CAST(json_extract_string(p, '$.k') AS INTEGER)
                        ELSE NULL END AS k
            FROM dirty
        )
        SELECT event_type,
               COUNT(*) AS n_rows,
               COUNT(k) AS n_parsed,
               CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
        FROM parsed
        GROUP BY event_type
    """,
    "fn_string_distance": """
        SELECT doc_id,
               CAST(levenshtein(source, lang) AS INTEGER) AS lev_src_lang,
               lpad(lang, 5, '*') AS lang_padded,
               reverse(source) AS source_rev,
               replace(source, '-', '_') AS source_snake
        FROM documents
    """,
    "upsert_latest_wins": """
        -- latest_value rides inside a never-NULL struct: DuckDB's bare
        -- MAX_BY skips NULL args (falling back to an older version's
        -- value) while the upsert contract - and Spark's max_by - carry
        -- the latest ROW's value even when that write was NULL
        SELECT user_id, event_type,
               MAX(event_id) AS latest_event_id,
               MAX_BY(ts, event_id) AS latest_ts,
               ROUND((MAX_BY(struct_pack(v := value), event_id)).v, 4)
                   AS latest_value,
               COUNT(*) AS n_versions
        FROM events
        GROUP BY user_id, event_type
    """,
    "fn_higher_order": """
        SELECT vec_id,
               CAST(LEN(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0.5))
                    AS INTEGER) AS n_above_half,
               LEN(list_filter(CAST(embedding AS DOUBLE[]), x -> x < -0.99)) > 0
                   AS has_near_neg1,
               ROUND(LIST_AGGREGATE(
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
                   'sum'), 4) AS sq_norm
        FROM embeddings
    """,
    "fn_regexp": r"""
        SELECT doc_id,
               regexp_extract(text, '^(\w+)', 1) AS first_word,
               regexp_replace(SUBSTRING(text, 1, 60), '\d', '#', 'g') AS head_masked,
               LENGTH(regexp_replace(SUBSTRING(text, 1, 60), '[^aeiou]', '', 'g'))
                   AS n_vowels
        FROM documents
    """,
    "fn_conditional": """
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'O' THEN 'open'
                    WHEN o_orderstatus = 'F' THEN 'done'
                    ELSE 'other' END AS status_class,
               COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_or_pending,
               ROUND(GREATEST(o_totalprice, 100000.0), 4) AS price_floor,
               ROUND(LEAST(o_totalprice, 400000.0), 4) AS price_cap
        FROM orders
    """,
    "fn_map_struct": """
        SELECT event_id,
               event_type AS m_type,
               user_id AS m_uid,
               2 AS m_size,
               value AS s_value
        FROM events
    """,
    "fn_string": """
        SELECT doc_id,
               UPPER(lang)                AS lang_upper,
               SUBSTRING(text, 1, 20)     AS prefix20,
               CAST(LENGTH(text) AS INTEGER) AS text_len,
               -- concat_ws, not CONCAT: Spark's concat_ws skips NULL
               -- args AND their separators, CONCAT coerces NULL to ''
               concat_ws(':', source, lang) AS src_lang,
               text LIKE '%spark%'        AS has_spark
        FROM documents
    """,
    "fn_date": """
        SELECT CAST(YEAR(ts) AS INTEGER)   AS y,
               CAST(MONTH(ts) AS INTEGER)  AS m,
               CAST(DAY(ts) AS INTEGER)    AS d,
               CAST(HOUR(ts) AS INTEGER)   AS hr,
               COUNT(*)                    AS n_events
        FROM events
        GROUP BY 1, 2, 3, 4
    """,
    "fn_math": """
        SELECT l_orderkey,
               l_linenumber,
               ROUND(SQRT(l_extendedprice), 4) AS sqrt_price,
               ROUND(LN(l_extendedprice), 4)   AS ln_price,
               ROUND(ABS(l_discount - 0.05), 4) AS abs_disc_delta,
               CAST(CEIL(l_quantity) AS BIGINT)  AS qty_ceil,
               CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor
        FROM lineitem
    """,
    "fn_json_struct": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               CASE WHEN json_extract_string(props, '$.k') IS NULL THEN '{}'
                    ELSE '{"k":' || CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS VARCHAR) || '}'
               END AS roundtrip
        FROM events
    """,
    "hist_log_buckets": """
        WITH d AS (
            SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v100,
                   CAST(LENGTH(CAST(CAST(ROUND(o_totalprice * 100, 0)
                        AS BIGINT) AS VARCHAR)) AS INTEGER) AS decade
            FROM orders
        )
        SELECT decade,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(CAST(MIN(v100) AS DOUBLE) / 100.0, 2) AS min_total,
               ROUND(CAST(MAX(v100) AS DOUBLE) / 100.0, 2) AS max_total
        FROM d GROUP BY decade
    """,
    "hist_value_buckets": """
        SELECT bucket, COUNT(*) AS n FROM (
            -- explicit NaN arm: DuckDB's total order puts NaN above
            -- +Inf so NaN >= 500 is TRUE here, while Spark's
            -- width_bucket(NaN) is NULL - a NaN measure is MISSING,
            -- not an overflow-bucket member
            SELECT CASE WHEN isnan(value) THEN NULL
                        WHEN value < 0 THEN 0
                        WHEN value >= 500 THEN 11
                        ELSE CAST(FLOOR(value / 50.0) AS INTEGER) + 1
                   END AS bucket
            FROM events)
        GROUP BY bucket
    """,
    "fn_json": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events
    """,
    "fn_array": """
        SELECT vec_id,
               CAST(LEN(embedding) AS INTEGER)       AS dim,
               CAST(embedding[1] AS DOUBLE)          AS first_val,
               ROUND(LIST_AGGREGATE(CAST(embedding AS DOUBLE[]), 'sum'), 4) AS vec_sum,
               ROUND(LIST_AGGREGATE(CAST(embedding AS DOUBLE[]), 'max'), 4) AS vec_max
        FROM embeddings
    """,
}

"""Scalar function coverage: string / date / math / JSON / array.

All JVM-side built-ins (whole-stage codegen), no Python UDFs. Integer
extracts are cast explicitly on the oracle side so dtypes line up
(DuckDB EXTRACT returns BIGINT, Spark year()/month() return INT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


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


QUERIES = {
    "fn_string": fn_string,
    "fn_date": fn_date,
    "fn_math": fn_math,
    "fn_json": fn_json,
    "fn_array": fn_array,
}

ORACLES = {
    "fn_string": """
        SELECT doc_id,
               UPPER(lang)                AS lang_upper,
               SUBSTRING(text, 1, 20)     AS prefix20,
               CAST(LENGTH(text) AS INTEGER) AS text_len,
               CONCAT(source, ':', lang)  AS src_lang,
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

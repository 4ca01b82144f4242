"""SQL-API surface: queries expressed as ANSI SQL via spark.sql.

Demonstrates the engine's full SQL layer (temp views + Catalyst SQL
parsing) — the reference has no SQL surface at all (SURVEY.md §2.4);
this is part of the declared analytics extension. Also carries the
operators most naturally written in SQL: correlated subqueries, CTEs,
HAVING, CASE pivots, and lateral explodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def _register(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def sql_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (customer ⋈ orders ⋈ lineitem, filtered, grouped,
    top-10) through the SQL parser end-to-end."""
    _register(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               o.o_orderdate,
               o.o_orderpriority
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
        """
    )


def sql_having_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + HAVING: high-volume customers."""
    _register(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH per_cust AS (
            SELECT o_custkey,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 4) AS total_spend
            FROM orders
            GROUP BY o_custkey
        )
        SELECT o_custkey, n_orders, total_spend
        FROM per_cust
        WHERE n_orders >= 5
        """
    )


def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Catalyst decorrelates it to a join)."""
    _register(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey,
               c_name,
               (SELECT ROUND(MAX(o_totalprice), 4) FROM orders
                WHERE o_custkey = c_custkey) AS max_order
        FROM customer
        """
    )


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over two dimensions."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total_price"),
    )


def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns per priority (fixed pivot values →
    no extra discovery pass; the oracle is the equivalent CASE pivot)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 4))
        .select(
            "o_orderpriority",
            F.col("F").alias("total_f"),
            F.col("O").alias("total_o"),
            F.col("P").alias("total_p"),
        )
    )


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.count("*").alias("n_items"),
    )


def explode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode (UDTF-shaped 1→N): per-dimension stats across all
    vectors via posexplode. The mean is a floor-quantized (1e-6) exact
    BIGINT sum before ONE division — a double AVG over billions of
    components is merge-order-dependent in its last ulp (the round-13
    skew-audit class); max is an exact selection."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.round(
                F.sum(
                    F.expr(
                        "cast(floor(cast(v as double) * 1000000.0D) as bigint)"
                    )
                )
                / F.count("*")
                / F.lit(1_000_000.0),
                4,
            ).alias("avg_v"),
            F.round(F.max(F.col("v").cast("double")), 4).alias("max_v"),
            F.count("*").alias("n"),
        )
    )


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id disambiguation (rollup and
    cube are the sugared forms; this is the general one)."""
    _register(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               GROUPING__ID AS gid,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def sql_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-way join (customer ⋈ orders ⋈ lineitem ⋈
    supplier ⋈ nation ⋈ region) with the local-supplier correlation
    (c_nationkey = s_nationkey). The join-reorder stress test: Catalyst
    + AQE must broadcast the three dimension tables and keep the two
    fact joins key-partitioned."""
    _register(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier",
        "nation", "region",
    )
    return spark.sql(
        """
        SELECT n.n_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               COUNT(*) AS n_items
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
"""
    )


def sql_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations per
    ship year — a six-way join where AQE broadcasts every dim and the
    fact tables meet in one shuffled equi-join; YEAR() grouping."""
    _register(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    return spark.sql("""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               YEAR(l.l_shipdate) AS l_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_nationkey, n2.n_nationkey) IN ((0, 1), (1, 0))
        GROUP BY n1.n_name, n2.n_name, YEAR(l.l_shipdate)
""")


def sql_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer in a
    quarter, top-20 — date-window pushdown + selective flag filter
    before the join, TakeOrderedAndProject for the top-k."""
    _register(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql("""
        SELECT c.c_custkey,
               c.c_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               ROUND(c.c_acctbal, 4) AS c_acctbal,
               n.n_name
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
""")


def sql_q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with few
    orders — an uncorrelated scalar subquery (global average) plus a
    CORRELATED scalar COUNT subquery in one query, both decorrelated by
    Catalyst into joins (no per-row subquery loops). The synthetic data
    gives every customer orders, so the reference's NOT EXISTS becomes
    a count threshold to keep the result non-trivial."""
    _register(spark, sf_dir, "customer", "orders")
    return spark.sql("""
        SELECT c.c_mktsegment,
               COUNT(*) AS n_custs,
               ROUND(SUM(c.c_acctbal), 4) AS total_bal
        FROM customer c
        WHERE c.c_acctbal > (
                SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
              )
          AND (
                SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey
              ) < 8
        GROUP BY c.c_mktsegment
""")


def sql_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders via IN over a HAVING
    subquery — Catalyst rewrites the IN to a left-semi join against the
    aggregated subquery (no correlated re-evaluation)."""
    _register(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql("""
        SELECT c.c_custkey,
               o.o_orderkey,
               o.o_orderdate,
               ROUND(o.o_totalprice, 4) AS o_totalprice,
               ROUND(SUM(l.l_quantity), 4) AS total_qty
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 300
        )
        GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey ASC
""")


def explode_outer_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer explode: rows whose filtered array is EMPTY still survive
    with a NULL element (explode would silently drop them — the classic
    row-loss bug in 1→N fan-outs). Filters each embedding to its
    strongly-positive components; vectors with none keep one null row."""
    e = load_table(spark, sf_dir, "embeddings")
    strong = F.filter(
        F.col("embedding"), lambda x: x.cast("double") > F.lit(2.5)
    )
    return e.select(
        "vec_id",
        F.explode_outer(strong).alias("strong_component"),
    ).select(
        "vec_id", F.round(F.col("strong_component").cast("double"), 4).alias("strong_component")
    )


QUERIES = {
    "agg_grouping_sets": agg_grouping_sets,
    "sql_q7_volume_shipping": sql_q7_volume_shipping,
    "sql_q10_returned_items": sql_q10_returned_items,
    "sql_q18_large_orders": sql_q18_large_orders,
    "sql_q22_idle_rich_customers": sql_q22_idle_rich_customers,
    "sql_q3_shipping_priority": sql_q3_shipping_priority,
    "sql_q5_local_supplier": sql_q5_local_supplier,
    "sql_having_cte": sql_having_cte,
    "sql_correlated_subquery": sql_correlated_subquery,
    "agg_cube": agg_cube,
    "pivot_status": pivot_status,
    "agg_percentiles": agg_percentiles,
    "explode_embeddings": explode_embeddings,
    "explode_outer_embeddings": explode_outer_embeddings,
}

ORACLES = {
    "explode_outer_embeddings": """
        WITH f AS (
            SELECT vec_id,
                   list_filter(CAST(embedding AS DOUBLE[]), x -> x > 2.5) AS strong
            FROM embeddings
        )
        SELECT vec_id,
               CASE WHEN len(strong) = 0 THEN NULL
                    ELSE ROUND(u.x, 4) END AS strong_component
        FROM f LEFT JOIN LATERAL (SELECT unnest(strong) AS x) u ON TRUE
    """,
    "sql_q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_nationkey, n2.n_nationkey) IN ((0, 1), (1, 0))
        GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l.l_shipdate) AS INT)
""",
    "sql_q22_idle_rich_customers": """
        SELECT c.c_mktsegment,
               COUNT(*) AS n_custs,
               ROUND(SUM(c.c_acctbal), 4) AS total_bal
        FROM customer c
        WHERE c.c_acctbal > (
                SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
              )
          AND (
                SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey
              ) < 8
        GROUP BY c.c_mktsegment
""",
    "sql_q10_returned_items": """
        SELECT c.c_custkey,
               c.c_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               ROUND(c.c_acctbal, 4) AS c_acctbal,
               n.n_name
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
""",
    "sql_q18_large_orders": """
        SELECT c.c_custkey,
               o.o_orderkey,
               o.o_orderdate,
               ROUND(o.o_totalprice, 4) AS o_totalprice,
               ROUND(SUM(l.l_quantity), 4) AS total_qty
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 300
        )
        GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey ASC
""",
    "sql_q5_local_supplier": """
        SELECT n.n_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               COUNT(*) AS n_items
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
""",
    "agg_grouping_sets": """
        SELECT o_orderstatus,
               o_orderpriority,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        -- vacuous on non-empty data; pins Spark's no-rows-on-empty
        -- grouping-set semantics (see agg_rollup)
        HAVING COUNT(*) > 0
    """,
    "sql_q3_shipping_priority": """
        SELECT o.o_orderkey,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
               o.o_orderdate,
               o.o_orderpriority
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "sql_having_cte": """
        WITH per_cust AS (
            SELECT o_custkey,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 4) AS total_spend
            FROM orders
            GROUP BY o_custkey
        )
        SELECT o_custkey, n_orders, total_spend
        FROM per_cust
        WHERE n_orders >= 5
    """,
    "sql_correlated_subquery": """
        SELECT c_custkey,
               c_name,
               (SELECT ROUND(MAX(o_totalprice), 4) FROM orders
                WHERE o_custkey = c_custkey) AS max_order
        FROM customer
    """,
    "agg_cube": """
        SELECT o_orderstatus,
               o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        -- vacuous on non-empty data; pins Spark's no-rows-on-empty
        -- CUBE semantics (see agg_rollup)
        HAVING COUNT(*) > 0
    """,
    "pivot_status": """
        SELECT o_orderpriority,
               ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 4) AS total_f,
               ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 4) AS total_o,
               ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 4) AS total_p
        FROM orders
        GROUP BY o_orderpriority
    """,
    "agg_percentiles": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
               ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "explode_embeddings": """
        SELECT u.dim,
               ROUND(CAST(SUM(CAST(FLOOR(u.v * 1000000.0) AS BIGINT))
                          AS DOUBLE) / COUNT(*) / 1000000.0, 4) AS avg_v,
               ROUND(MAX(u.v), 4) AS max_v,
               COUNT(*) AS n
        FROM (
            SELECT vec_id,
                   generate_subscripts(embedding, 1) - 1 AS dim,
                   CAST(UNNEST(embedding) AS DOUBLE) AS v
            FROM embeddings
        ) u
        GROUP BY u.dim
    """,
}

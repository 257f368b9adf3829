"""Relational surface, batch 3: remaining join types and scalar families."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import t
from .registry import register


@register(
    "join_full_outer",
    oracle="""
    SELECT c.c_custkey, big.o_custkey AS big_custkey, big.n_big
    FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) c
    FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_big FROM orders
                     WHERE o_totalprice > 400000 GROUP BY o_custkey) big
    ON c.c_custkey = big.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: rich customers x customers with big orders — rows
    survive from either side."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    big = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big"))
    )
    return c.join(big, c.c_custkey == big.o_custkey, "full_outer").select(
        "c_custkey", F.col("o_custkey").alias("big_custkey"), "n_big"
    )


@register(
    "join_cross_small",
    oracle="""
    SELECT r.r_name, s.seg
    FROM region r CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) s
    """,
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny sets (5 x 5) — legitimate only when at least
    one side is provably small; both sides broadcast here."""
    r = t(spark, sf_dir, "region").select("r_name")
    s = t(spark, sf_dir, "customer").select(F.col("c_mktsegment").alias("seg")).distinct()
    return r.crossJoin(F.broadcast(s))


@register(
    "scalar_string_funcs2",
    oracle="""
    SELECT p_partkey,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           reverse(p_brand) AS brand_rev,
           repeat('-', p_size % 5) AS dashes,
           strpos(p_name, 'a') AS first_a,
           left(p_type, 5) AS type_left,
           right(p_type, 4) AS type_right,
           split_part(p_type, ' ', 1) AS type_word1
    FROM part WHERE p_partkey <= 250
    """,
)
def scalar_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: pad/reverse/repeat/locate/left/right/split_part."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 250)
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5).cast("int")).alias("dashes"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.left(F.col("p_type"), F.lit(5)).alias("type_left"),
        F.right(F.col("p_type"), F.lit(4)).alias("type_right"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_word1"),
    )


@register(
    "scalar_date_funcs2",
    oracle="""
    SELECT o_orderkey,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch95,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(weekofyear(o_orderdate) AS INT) AS week_iso
    FROM orders WHERE o_orderkey <= 800
    """,
)
def scalar_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date family: last_day/add_months/datediff/quarter/ISO week."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 800)
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus_3m"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch95"
        ),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekofyear("o_orderdate").alias("week_iso"),
    )


@register(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, o_custkey) AS keys_xor,
           o_orderkey << 2 AS shifted_l,
           o_orderkey >> 3 AS shifted_r
    FROM orders WHERE o_orderkey <= 1500
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts (exact integer ops)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1500)
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("low_byte"),
        F.expr("o_orderkey | 4096").alias("with_flag"),
        F.expr("o_orderkey ^ o_custkey").alias("keys_xor"),
        F.expr("shiftleft(o_orderkey, 2)").alias("shifted_l"),
        F.expr("shiftright(o_orderkey, 3)").alias("shifted_r"),
    )


@register(
    "scalar_greatest_least",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           greatest(l_quantity, l_discount * 100, l_tax * 100) AS g,
           least(l_quantity, l_extendedprice / 1000) AS l
    FROM lineitem WHERE l_orderkey <= 400
    """,
)
def scalar_greatest_least(spark: SparkSession, sf_dir: str) -> DataFrame:
    """greatest/least over mixed expressions (IEEE-deterministic ops only)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(
            F.col("l_quantity"), F.col("l_discount") * 100, F.col("l_tax") * 100
        ).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_extendedprice") / 1000).alias("l"),
    )


_Q1_PORTABLE_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(16,4)) AS DOUBLE) AS sum_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


@register("sql_interface_q1", oracle=_Q1_PORTABLE_SQL)
def sql_interface_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front-end surface: Spark executes the IDENTICAL ANSI SQL text
    the oracle runs (dialect-portable subset) over registered views —
    demonstrating spark.sql() parity with the DataFrame plans."""
    from .catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q1_PORTABLE_SQL)

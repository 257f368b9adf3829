"""TPC-H-shape batch 4 (round 5): the remaining classic plan patterns —
national market share as a two-lane conditional ratio per group (q8), the
multi-way profit mart (q9), a group filter against a global scalar aggregate
(q11), conditional priority counting over a fact-fact join (q12), the
argmax-by-scalar-subquery shape (q15), anti-joined distinct counting (q16),
and a HAVING-gated semi-join into a three-way join (q18). Adapted to the
synthetic schema: there is no ``partsupp``, so ``lineitem`` serves as the
part-supplier relation, and q9's supply cost is ``0.1 * p_retailprice`` —
the SHAPE (how each subquery decorrelates, what broadcasts, where the
partial aggregation happens) is what each query pins, not TPC-H constants.

Numeric convention follows registry.py: decimal-exact sums cast to
DECIMAL(16,4) then DOUBLE; ratios/differences are single IEEE operations
over identical operands in both engines.

Reference has no relational surface (SURVEY §2.4); shapes per TPC-H spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import t
from .registry import register

_D18 = "decimal(18,6)"


def _disc_rev():
    """Discounted-revenue lane: exact decimal product, identical in DuckDB."""
    return F.col("l_extendedprice").cast(_D18) * (
        F.lit(1) - F.col("l_discount").cast(_D18)
    )


def _to_dbl(c):
    return c.cast("decimal(16,4)").cast("double")


@register(
    "q8_national_market_share",
    oracle="""
    WITH vol AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,6))
               * (1 - CAST(l_discount AS DECIMAL(18,6))) AS v,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01')
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v
                              ELSE CAST(0 AS DECIMAL(18,6)) END)
                AS DECIMAL(16,4)) AS DOUBLE)
           / CAST(CAST(SUM(v) AS DECIMAL(16,4)) AS DOUBLE) AS mkt_share
    FROM vol
    GROUP BY o_year
    """,
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a regional market by year. The
    eight-way join resolves as ONE fact scan (lineitem) with every dimension
    broadcast — part filtered to a type, orders date-windowed (pushed to the
    scan), customer->nation->region restricting the market, supplier->nation
    naming the share side. Both ratio lanes are exact decimal sums of ONE
    aggregation pass; the share is a single double division of identical
    operands. Nothing shuffles except the per-year partial aggregates."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    r = (
        t(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    v = _disc_rev()
    joined = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            _to_dbl(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", v).otherwise(
                        F.lit(0).cast(_D18)
                    )
                )
            ).alias("_nation"),
            _to_dbl(F.sum(v)).alias("_total"),
        )
        .select("o_year", (F.col("_nation") / F.col("_total")).alias("mkt_share"))
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation,
           EXTRACT(YEAR FROM o_orderdate) AS o_year,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                  * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(16,4))
                AS DOUBLE)
           - 0.1 * CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))
                  * CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(16,4))
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: the profit mart — every dimension of a product-line
    (name-filtered parts) rolled up by supplier nation and order year.
    Supply cost stands in as 0.1 x retail price x quantity (no partsupp in
    the synthetic schema). Revenue and cost are SEPARATE exact decimal lanes
    of one aggregation pass; profit is computed from the two double lane
    results with two IEEE ops (scale + subtract) on identical operands —
    never a decimal-width-sensitive three-factor product. part/supplier/
    nation broadcast; orders joins on the order key."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    cost = F.col("p_retailprice").cast(_D18) * F.col("l_quantity").cast(_D18)
    joined = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            _to_dbl(F.sum(_disc_rev())).alias("_rev"),
            _to_dbl(F.sum(cost)).alias("_cost"),
        )
        .select(
            "nation",
            "o_year",
            (F.col("_rev") - 0.1 * F.col("_cost")).alias("profit"),
        )
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH asian AS (
      SELECT l_partkey, l_extendedprice
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'),
    pv AS (
      SELECT l_partkey,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                  AS DECIMAL(16,4)) AS DOUBLE) AS stock_value
      FROM asian GROUP BY l_partkey),
    total AS (
      SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                  AS DECIMAL(16,4)) AS DOUBLE) AS tv
      FROM asian)
    SELECT l_partkey, stock_value
    FROM pv, total
    WHERE stock_value > 0.001 * tv
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups filtered against a GLOBAL scalar aggregate —
    parts whose regional stock value exceeds a fraction of the region total.
    Decorrelated to: one per-part hash aggregate, one 1-row total aggregate
    over the SAME filtered join (both decimal-exact so the doubles are
    bit-identical in both engines), a broadcast nested-loop join of the
    1-row total, and the threshold filter. The 0.001 x tv product is one
    IEEE multiply of identical operands. Never a per-group subquery."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = (
        t(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    asian = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "l_extendedprice")
    )
    pv = asian.groupBy("l_partkey").agg(
        _to_dbl(F.sum(F.col("l_extendedprice").cast(_D18))).alias("stock_value")
    )
    total = asian.agg(
        _to_dbl(F.sum(F.col("l_extendedprice").cast(_D18))).alias("tv")
    )
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("stock_value") > 0.001 * F.col("tv"))
        .select("l_partkey", "stock_value")
    )


@register(
    "q12_late_priority_lines",
    oracle="""
    SELECT l_linestatus,
           -- BIGINT cast: DuckDB SUM over INT promotes to HUGEINT, which the
           -- driver surfaces as float64 and hash-mismatches Spark's bigint.
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_shipdate > o_orderdate
    GROUP BY l_linestatus
    """,
)
def q12_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional priority counting over a fact-fact join
    (l_linestatus stands in for shipmode; ship-after-order stands in for the
    commit/receipt lateness chain). The date window pushes to the lineitem
    scan; the cross-table predicate l_shipdate > o_orderdate evaluates
    post-join; both priority counts are lanes of ONE aggregation pass.
    Pure counts — no floating point anywhere. At scale the join shuffles on
    the order key; pre-bucketing both facts on it makes it shuffle-free."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(16,4))
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM revenue
    JOIN supplier ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax against a scalar subquery over an aggregate
    view — the supplier(s) with the quarter's maximum revenue. The revenue
    view is computed ONCE; its max is a 1-row aggregate (MAX over doubles is
    order-independent, and the doubles themselves are decimal-exact casts,
    so the equality compare is bit-safe in both engines); Catalyst extracts
    the equality filter into an equi-condition, so the 1-row max joins as a
    broadcast HASH join (gated — no nested loop), as does the supplier
    lookup. Never a re-evaluated subquery per row."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _to_dbl(F.sum(_disc_rev())).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_relation_counts",
    oracle="""
    WITH excluded AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name LIKE 'NATION_1%')
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (5, 10, 15, 20, 25, 30)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_relation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counting per part class with a
    NOT-IN supplier exclusion. The NOT IN decorrelates to a LEFT ANTI hash
    join against the (tiny, broadcast) excluded-supplier set — never a
    per-row membership subquery; the part filters (two inequalities + an IN
    list) push into the broadcast dim; COUNT(DISTINCT) plans as the standard
    two-level expand/aggregate. Pure counts, no floating point."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(5, 10, 15, 20, 25, 30))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excluded = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(F.col("n_name").like("NATION_1%"))
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey AS bok,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(16,4))
                  AS DOUBLE) AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(16,4))
                  AS DOUBLE) > 300)
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big
    JOIN orders   ON o_orderkey = bok
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a threshold
    (a HAVING over a per-order aggregate), then enriched through orders and
    customer. The IN-subquery of the spec decorrelates to computing the
    per-order aggregate ONCE and joining it in — the aggregate output is
    tiny after the HAVING cut, so AQE turns both enrichment joins into
    broadcasts at runtime. Quantity sums are decimal-exact before the
    threshold compare."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bok"))
        .agg(_to_dbl(F.sum(F.col("l_quantity").cast(_D18))).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("o_orderkey") == F.col("bok"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
    )

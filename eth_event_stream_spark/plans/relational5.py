"""TPC-H-shape batch 3 (round 5): the decorrelation patterns the earlier
batches lacked — a correlated scalar-MIN subquery against a join tree (q2),
an outer-join count distribution (q13), a nested semi-join gated by a
correlated aggregate threshold (q20), and the multi-EXISTS / NOT-EXISTS
late-line shape (q21). Adapted to the synthetic schema: there is no
``partsupp`` table, so ``lineitem`` serves as the part-supplier relation
(the SHAPE — how the subquery decorrelates and what broadcasts — is what
each query pins, not TPC-H constants).

Numeric convention follows registry.py: decimal-exact sums, one double
division of identical operands, top-k ordered by a full deterministic key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.decode import sum_uint256
from .catalog import t
from .registry import register

_D18 = "decimal(18,6)"


def _dsum(col, alias):
    return F.sum(F.col(col).cast(_D18)).cast("decimal(16,4)").cast("double").alias(alias)


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             MIN(l_extendedprice) AS best_price
      FROM lineitem
      GROUP BY l_partkey, l_suppkey),
    regional AS (
      SELECT o.pk, o.sk, o.best_price, s.s_name, s.s_acctbal, n.n_name
      FROM offers o
      JOIN supplier s ON o.sk = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'REGION_1'),
    best AS (
      SELECT pk, MIN(best_price) AS min_price FROM regional GROUP BY pk)
    SELECT p.p_partkey, p.p_name, rg.s_name, rg.n_name, rg.s_acctbal,
           rg.best_price AS price
    FROM regional rg
    JOIN best b ON rg.pk = b.pk AND rg.best_price = b.min_price
    JOIN part p ON rg.pk = p.p_partkey
    WHERE p.p_size BETWEEN 10 AND 20
    ORDER BY rg.s_acctbal DESC, rg.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part, the cheapest supplier WITHIN A REGION —
    a correlated scalar-MIN subquery whose inner query is itself a join tree
    (supplier -> nation -> region). Decorrelated the classic way: compute the
    regional offer table ONCE (dims broadcast), take the per-part MIN as one
    hash aggregate, and join it back on (part, price) — never a per-part
    subquery execution. Final top-100 is heap+merge (TakeOrderedAndProject)
    over a fully deterministic key.

    Reference has no relational surface (SURVEY §2.4); shape per TPC-H spec.
    """
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    offers = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min("l_extendedprice").alias("best_price"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "REGION_1").select("r_regionkey")
    regional = (
        offers.join(F.broadcast(s), F.col("sk") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("pk", "sk", "best_price", "s_name", "s_acctbal", "n_name")
    )
    best = regional.groupBy("pk").agg(F.min("best_price").alias("min_price")).withColumnRenamed("pk", "bpk")
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 20))
        .select("p_partkey", "p_name")
    )
    out = (
        regional.join(
            best,
            (F.col("pk") == F.col("bpk")) & (F.col("best_price") == F.col("min_price")),
        )
        .join(F.broadcast(p), F.col("pk") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            "s_acctbal",
            F.col("best_price").alias("price"),
        )
    )
    return out.orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey").limit(100)


@register(
    "q13_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the outer-join count distribution. Customers LEFT
    JOIN their (non-urgent) orders — customers with no orders MUST survive
    with count 0, which is why this cannot be an inner join + fill — then a
    second aggregation folds the per-customer counts into a histogram. Two
    hash aggregates; the join shuffles on the customer key (both sides are
    facts at scale — pre-bucketing on custkey makes it shuffle-free, see
    README); the histogram's second shuffle moves only (count, 1) pairs."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q20_excess_shippers",
    oracle="""
    WITH win AS (
      SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'),
    per_ps AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(16,4)) AS DOUBLE)
               AS supp_qty
      FROM win GROUP BY l_partkey, l_suppkey),
    per_p AS (
      SELECT l_partkey AS pk2,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(16,4)) AS DOUBLE)
               AS part_qty
      FROM win GROUP BY l_partkey)
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
      AND EXISTS (
        SELECT 1
        FROM per_ps ps
        JOIN per_p p2 ON ps.pk = p2.pk2
        JOIN part p ON ps.pk = p.p_partkey
        WHERE ps.sk = s.s_suppkey
          AND p.p_type = 'PROMO'
          AND ps.supp_qty > 0.3 * p2.part_qty)
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: a nested semi-join gated by a CORRELATED AGGREGATE
    threshold — suppliers in one nation who, for some PROMO part, shipped
    more than 30% of that part's total 1996 volume. Decorrelated into two
    window-filtered aggregates over the same scan (per part-supplier, per
    part), a broadcast part filter, the threshold compare, then ONE distinct
    supplier-key set driving a LEFT SEMI into the supplier dim — never a
    per-supplier subquery. Both quantity sums are decimal-exact, so the
    0.3x threshold compares identical doubles in both engines."""
    win = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    per_ps = win.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(_dsum("l_quantity", "supp_qty"))
    per_p = win.groupBy(F.col("l_partkey").alias("pk2")).agg(
        _dsum("l_quantity", "part_qty")
    )
    promo = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    excess_sks = (
        per_ps.join(per_p, F.col("pk") == F.col("pk2"))
        .join(F.broadcast(promo), F.col("pk") == F.col("p_partkey"))
        .filter(F.col("supp_qty") > 0.3 * F.col("part_qty"))
        .select("sk")
    )
    s = t(spark, sf_dir, "supplier")
    n = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess_sks, F.col("s_suppkey") == F.col("sk"), "left_semi")
        .select("s_name", "s_acctbal")
    )


# distinct-name buckets above this size are dropped before pair generation
# (hot-key guard, part of the query semantics — the oracle applies the
# identical HAVING cut, so it is never a silent truncation)
LEV_BUCKET_CAP = 20


@register(
    "dedup_levenshtein_nominated",
    oracle=f"""
    WITH names AS (
      SELECT p_name, MIN(p_partkey) AS rep_key FROM part GROUP BY p_name),
    tagged AS (
      SELECT p_name, rep_key,
             string_split(p_name, ' ')[-1] AS noun,
             CAST(FLOOR(LEN(p_name) / 4) AS BIGINT) AS lb
      FROM names),
    ok AS (SELECT noun, lb FROM tagged
           GROUP BY noun, lb HAVING COUNT(*) <= {LEV_BUCKET_CAP}),
    cand AS (
      SELECT a.rep_key AS key_a, b.rep_key AS key_b,
             a.p_name AS name_a, b.p_name AS name_b
      FROM tagged a
      JOIN tagged b ON a.noun = b.noun AND a.lb = b.lb
                   AND a.rep_key < b.rep_key
      JOIN ok ON ok.noun = a.noun AND ok.lb = a.lb)
    SELECT key_a, key_b, levenshtein(name_a, name_b) AS edit_dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 3
    """,
)
def dedup_levenshtein_nominated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance dedup as a PRODUCTION composition (the shape
    text_levenshtein_pairs' docstring promises): exact-collapse first
    (distinct names with a min-key representative — kills the duplicate-
    clique k-squared blowup exactly like dedup_collapse_then_lsh_verify),
    nominate pairs only within (last-token, length-bucket) buckets, drop
    buckets above LEV_BUCKET_CAP (hot-key guard in oracle semantics), and
    run the Wagner-Fischer verify ONLY on nominated pairs. At 100 TB the
    quadratic stage is bounded by cap^2 per bucket; the all-pairs scan
    exists only in the key-filtered text_levenshtein_pairs baseline."""
    names = (
        t(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("rep_key"))
    )
    tagged = names.select(
        "p_name",
        "rep_key",
        F.element_at(F.split("p_name", " "), -1).alias("noun"),
        F.floor(F.length("p_name") / 4).cast("long").alias("lb"),
    )
    ok = (
        tagged.groupBy("noun", "lb")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") <= LEV_BUCKET_CAP)
        .select("noun", "lb")
    )
    bounded = tagged.join(F.broadcast(ok), ["noun", "lb"])
    a = bounded.select(
        "noun", "lb", F.col("rep_key").alias("key_a"), F.col("p_name").alias("name_a")
    )
    b = bounded.select(
        "noun", "lb", F.col("rep_key").alias("key_b"), F.col("p_name").alias("name_b")
    )
    return (
        a.join(b, ["noun", "lb"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 3)
        .select("key_a", "key_b", "edit_dist")
    )


@register(
    "sum_uint256_exact",
    oracle="""
    WITH vals AS (
      SELECT concat(repeat('0', 32), '8000000000000000',
                    lpad(lower(to_hex(l_orderkey)), 16, '0')) AS h
      FROM lineitem WHERE l_orderkey < 400),
    lanes AS (
      SELECT
        CAST(CAST(concat('0x', substr(h, 49, 16)) AS UBIGINT) AS HUGEINT)
          + CAST(CAST(concat('0x', substr(h, 41, 8)) AS UBIGINT) AS HUGEINT)
            * CAST('18446744073709551616' AS HUGEINT) AS l0,
        CAST(CAST(concat('0x', substr(h, 25, 16)) AS UBIGINT) AS HUGEINT)
          + CAST(CAST(concat('0x', substr(h, 17, 8)) AS UBIGINT) AS HUGEINT)
            * CAST('18446744073709551616' AS HUGEINT) AS l1,
        CAST(CAST(concat('0x', substr(h, 1, 16)) AS UBIGINT) AS HUGEINT) AS l2
      FROM vals),
    s AS (SELECT COUNT(*) AS n, SUM(l0) AS s0, SUM(l1) AS s1, SUM(l2) AS s2
          FROM lanes),
    carry0 AS (
      SELECT n, s0 % CAST('79228162514264337593543950336' AS HUGEINT) AS r0,
             s0 // CAST('79228162514264337593543950336' AS HUGEINT) AS c0,
             s1, s2
      FROM s),
    carry1 AS (
      SELECT n, r0,
             (s1 + c0) % CAST('79228162514264337593543950336' AS HUGEINT) AS r1,
             (s1 + c0) // CAST('79228162514264337593543950336' AS HUGEINT) AS c1,
             s2
      FROM carry0)
    SELECT n AS n_values,
           CAST(s2 + c1 AS DECIMAL(38,0)) AS sum_top,
           CAST(r1 AS DECIMAL(38,0)) AS sum_hi,
           CAST(r0 AS DECIMAL(38,0)) AS sum_lo
    FROM carry1
    """,
)
def sum_uint256_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-limb EXACT uint256 aggregation (SURVEY §7.4.1 close-out): every
    summed value here is 2^127 + l_orderkey — ABOVE both the reference's
    silent i128 wrap point (examples/stream_multi.rs:59) and our decode
    surface's DECIMAL(38,0) NULL threshold — yet the sum is exact:
    per-row 96/96/64-bit hex lanes, three partial-aggregated decimal lane
    sums, one carry pass, result as (sum_top, sum_hi, sum_lo) with
    total = sum_top * 2^192 + sum_hi * 2^96 + sum_lo. The oracle replays
    the identical limb algebra in DuckDB HUGEINT. No shuffle moves values —
    only the three lane partials."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    hx = F.concat(
        F.lit("0x" + "0" * 32 + "8000000000000000"),
        F.lpad(F.lower(F.conv(F.col("l_orderkey").cast("string"), 10, 16)), 16, "0"),
    )
    return sum_uint256(li.select(hx.alias("value_hex")), "value_hex")


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who kept multi-supplier orders waiting —
    per late line of a finished order: EXISTS another supplier's line in the
    same order AND NOT EXISTS another supplier's LATE line in it. The
    correlated EXISTS pair must plan as one LEFT SEMI plus one LEFT ANTI
    hash join on the order key carrying the supplier-inequality predicate —
    never per-row subquery execution. ``late`` is computed once and reused
    for both the driving rows and the anti side (same filtered join, no
    second orders scan thanks to plan reuse under AQE; semantically one
    definition either way)."""
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")

    def late_lines():
        return (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .select("l_orderkey", "l_suppkey")
        )

    l1 = late_lines()
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = late_lines().select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_7")
        .select("n_nationkey")
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )

"""Relational surface, batch 2: the long tail of operator coverage.

Everything here is still stock Catalyst; the interesting bits are the
determinism rewrites that keep an exact DuckDB oracle possible:

- stddev/variance via integer/decimal moments (sqrt of exact sums — one
  deterministic IEEE op) instead of the engines' own accumulators;
- ordered collect (sort_array(collect_list)) so set-valued outputs compare;
- RANGE window frames, first/last/nth values, max_by/min_by, range join,
  unpivot, regexp family, map/json surface, width_bucket histograms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import t
from .registry import register

D = "decimal(18,6)"


@register(
    "agg_stddev_via_moments",
    oracle="""
    SELECT event_type,
           n0 AS n,
           SQRT((CAST(n2 AS DOUBLE) * n0 - CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
                / (CAST(n0 AS DOUBLE) * (n0 - 1))) AS stddev_cents
    FROM (
      SELECT event_type, COUNT(*) AS n0,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS n1,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
                 * CAST(ROUND(value * 100, 0) AS BIGINT)) AS n2
      FROM events GROUP BY event_type) m
    """,
)
def agg_stddev_via_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev from exact integer moments (sum, sum of squares in
    cents): order-independent, overflow-safe at this scale, one sqrt at the
    end. The engines' native stddev accumulators are order-dependent in
    floating point — this is the distributed-deterministic rewrite."""
    ev = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n0"),
        F.sum(cents).alias("n1"),
        F.sum(cents * cents).alias("n2"),
    )
    return m.select(
        "event_type",
        F.col("n0").alias("n"),
        F.sqrt(
            (F.col("n2").cast("double") * F.col("n0") - F.col("n1").cast("double") * F.col("n1").cast("double"))
            / (F.col("n0").cast("double") * (F.col("n0") - 1))
        ).alias("stddev_cents"),
    )


@register(
    "agg_max_by",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey DESC) AS best_order,
           FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice ASC, o_orderkey DESC) AS worst_order,
           CAST(MAX(o_totalprice) OVER (PARTITION BY o_custkey) AS DOUBLE) AS best_price
    FROM orders
    """,
)
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) with deterministic tie-breaks: the
    comparison key includes the unique orderkey, so ties can't flap between
    partial-aggregation orders."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias("best_order"),
        F.min_by("o_orderkey", F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("neg"))).alias("worst_order"),
        F.max("o_totalprice").cast("double").alias("best_price"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT c_nationkey, list_sort(list(c_custkey)) AS members
    FROM customer WHERE c_acctbal > 9500 GROUP BY c_nationkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-valued aggregation made deterministic: sort_array(collect_list).
    (Raw collect_list order is partition-arrival order — never comparable.)"""
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .groupBy("c_nationkey")
        .agg(F.sort_array(F.collect_list("c_custkey")).alias("members"))
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT user_id, event_id, ts,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS events_last_hour
    FROM events WHERE user_id < 25
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time: trailing 1-hour count per user (the
    sliding-window-per-row shape; state is the frame, not a shuffle).

    Ordered by MICROsecond epoch, not seconds: the oracle's RANGE INTERVAL
    runs at full timestamp precision, and second-truncated ordering would
    make same-second events frame-peers on one side only.

    The cast to TIMESTAMP makes the epoch extraction storage-tolerant:
    parquet without timezone metadata loads as TIMESTAMP_NTZ (which
    unix_micros rejects), and with the session pinned to UTC the cast maps
    NTZ wall-clock to exactly the naive-as-UTC epoch the oracle computes."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id", "event_id", "ts", F.count("*").over(w).alias("events_last_hour")
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER w AS latest_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over the whole partition (explicit full frame —
    the default frame would make last_value degenerate)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("latest_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@register(
    "join_range_interval",
    oracle="""
    SELECT p.p_partkey, b.bucket_id
    FROM part p
    JOIN (SELECT UNNEST(generate_series(0, 9)) AS bucket_id) b
      ON p.p_retailprice >= b.bucket_id * 200.0
     AND p.p_retailprice <  (b.bucket_id + 1) * 200.0
    """,
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: price bands x parts. The band side is generated
    + broadcast, so the non-equi condition evaluates map-side (BroadcastNestedLoop
    on a 10-row build — fine); the equi-rewrite (band = floor(price/width))
    is the degenerate fast path when bands are uniform."""
    p = t(spark, sf_dir, "part")
    buckets = spark.range(0, 10).withColumnRenamed("id", "bucket_id")
    return (
        p.join(
            F.broadcast(buckets),
            (p.p_retailprice >= buckets.bucket_id * 200.0)
            & (p.p_retailprice < (buckets.bucket_id + 1) * 200.0),
        )
        .select("p_partkey", "bucket_id")
    )


@register(
    "scalar_regexp_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS first_word,
           regexp_matches(p_name, '[aeiou]{2}') AS has_double_vowel,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           LEN(regexp_extract_all(p_type, '[A-Z]+')) AS n_words
    FROM part WHERE p_partkey <= 300
    """,
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family (extract / test / replace / extract_all) — patterns kept
    in the POSIX-compatible subset both engines agree on."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("first_word"),
        F.col("p_name").rlike("[aeiou]{2}").alias("has_double_vowel"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.size(F.regexp_extract_all(F.col("p_type"), F.lit("[A-Z]+"), 0)).alias("n_words"),
    )


@register(
    "scalar_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           LEN(json_keys(props)) AS n_keys,
           json_keys(props)[1] AS first_key
    FROM events WHERE event_id < 2000
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON -> map surface: parse props into map<string,string>, read keys/
    values (from_json + map_keys; DuckDB mirrors via json_keys)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").cast("bigint").alias("k_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
    )


@register(
    "scalar_null_funcs",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS pos_bal,
           IFNULL(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS pos_bal_filled
    FROM customer WHERE c_custkey <= 500
    """,
)
def scalar_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling family: nullif / coalesce / ifnull."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    pos = F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias("seg_or_other"),
        pos.alias("pos_bal"),
        F.coalesce(pos, F.lit(0.0)).alias("pos_bal_filled"),
    )


@register(
    "unpivot_measures",
    oracle="""
    SELECT s_suppkey, measure, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT s_suppkey, 'acctbal' AS measure, s_acctbal AS val FROM supplier
      UNION ALL
      SELECT s_suppkey, 'nationkey', CAST(s_nationkey AS DOUBLE) FROM supplier
    ) u
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide measures -> long (id, measure, value)."""
    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").cast("double").alias("nationkey"),
    )
    return s.unpivot("s_suppkey", ["acctbal", "nationkey"], "measure", "val")


@register(
    "histogram_width_bucket",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 500000 THEN 21
                     ELSE FLOOR(o_totalprice / 25000) + 1 END AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders GROUP BY 1
    """,
)
def histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — single pass, algebraic."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(500000), F.lit(20)).alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )


@register(
    "explode_posexplode",
    oracle="""
    SELECT vec_id, (i - 1) AS pos, CAST(embedding[i] AS DOUBLE) AS component
    FROM embeddings, UNNEST(generate_series(1, 8)) AS t(i)
    WHERE vec_id < 50
    """,
)
def explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode over array slices (first 8 components per vector)."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return e.select(
        "vec_id",
        F.posexplode(F.slice(F.col("embedding").cast("array<double>"), 1, 8)),
    ).withColumnsRenamed({"col": "component"})


@register(
    "percentile_disc_via_rank",
    oracle="""
    SELECT event_type,
           CAST(MAX(CASE WHEN rn * 2 <= n THEN value END) AS DOUBLE) AS median_lo,
           CAST(MAX(CASE WHEN rn * 10 <= n * 9 THEN value END) AS DOUBLE) AS p90_lo
    FROM (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
             COUNT(*)    OVER (PARTITION BY event_type) AS n
      FROM events) x
    GROUP BY event_type
    """,
)
def percentile_disc_via_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles via rank — deterministic (value, unique-id)
    ordering; engines' native percentile interpolation rules differ, rank
    arithmetic doesn't. This is also the shuffle-once distributed shape."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    x = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    return x.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") * 2 <= F.col("n"), F.col("value"))).cast("double").alias("median_lo"),
        F.max(F.when(F.col("rn") * 10 <= F.col("n") * 9, F.col("value"))).cast("double").alias("p90_lo"),
    )

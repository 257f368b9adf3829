"""Relational batch 4: multiset set ops, right-outer join, edit-distance
fuzzy matching, corpus term statistics, and correlation via exact moments.

Determinism notes follow the registry convention: counts and edit distances
are exact integers in both engines; the one floating-point result (corr) is
derived from exact bigint moments with a fixed double expression tree, so
every IEEE operation sees identical operands in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import t
from .registry import register


@register(
    "set_except_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'click'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL (bag difference — each occurrence cancels one
    matching occurrence). The distinct twin is ``set_except``; Spark's
    ``exceptAll`` == SQL EXCEPT ALL, while ``subtract`` is ANSI EXCEPT."""
    ev = t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "click").select("user_id")
    return a.exceptAll(b)


@register(
    "set_intersect_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'click'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL (bag intersection: min of per-side counts)."""
    ev = t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "click").select("user_id")
    return a.intersectAll(b)


@register(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal < -900
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-outer join: every qualifying customer survives, order columns
    NULL where no big order matches. The preserved (right) side can't be
    broadcast — Spark must keep it streamable; the filtered left side can."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") < -900)
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@register(
    "text_levenshtein_pairs",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a JOIN part b ON a.p_partkey < b.p_partkey
    WHERE a.p_partkey < 120 AND b.p_partkey < 120
      AND levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def text_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching — the classic dedup for short keys
    (names, titles) where token shingles are useless. Both engines run the
    exact Wagner-Fischer DP, so distances are identical integers.

    Scale shape: all-pairs is bounded here by the key filter; at corpus
    scale the pair generation upstream is an LSH/length-bucket nomination
    (same shape as dedup_lsh_then_verify) and this operator is the verify
    stage only."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 120)
    a = p.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"))
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 4)
        .select("key_a", "key_b", "edit_dist")
    )


@register(
    "corpus_top_terms",
    oracle="""
    SELECT w AS token, COUNT(*) AS n
    FROM (SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents)
    WHERE w != ''
    GROUP BY w
    ORDER BY n DESC, token ASC
    LIMIT 50
    """,
)
def corpus_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token frequency top-k (the vocabulary head — the first
    statistic any corpus audit computes). Explode -> partial-aggregated
    count -> heap top-k; one shuffle keyed by token, counts combine
    map-side so the shuffle carries one row per distinct token per task,
    not one per occurrence."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(50)
    )


@register(
    "doc_term_freq",
    oracle="""
    WITH tf AS (
      SELECT doc_id, w AS token, COUNT(*) AS cnt
      FROM (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w
            FROM documents WHERE doc_id < 100)
      WHERE w != ''
      GROUP BY doc_id, w),
    tot AS (SELECT doc_id, SUM(cnt) AS n_tokens FROM tf GROUP BY doc_id),
    ranked AS (
      SELECT doc_id, token, cnt,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, token ASC) AS rn
      FROM tf)
    SELECT r.doc_id, r.token AS top_token, r.cnt AS n_occurrences,
           CAST(r.cnt AS DOUBLE) / t.n_tokens AS tf_ratio
    FROM ranked r JOIN tot t ON r.doc_id = t.doc_id
    WHERE r.rn = 1
    """,
)
def doc_term_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document dominant term + its term-frequency ratio (the TF side
    of TF-IDF; the IDF log is left out deliberately — libm log is not
    bit-portable across engines, integer counts and one exact division
    are). Tie-break on token keeps the argmax deterministic."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tf = (
        d.select("doc_id", F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
    )
    tot = tf.groupBy("doc_id").agg(F.sum("cnt").alias("n_tokens"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("token"))
    top = tf.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return top.join(tot, "doc_id").select(
        "doc_id",
        F.col("token").alias("top_token"),
        F.col("cnt").alias("n_occurrences"),
        (F.col("cnt").cast("double") / F.col("n_tokens")).alias("tf_ratio"),
    )


@register(
    "corpus_tfidf",
    oracle="""
    WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
    tf AS (
      SELECT doc_id, w AS token, COUNT(*) AS cnt
      FROM (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w FROM docs)
      WHERE w != ''
      GROUP BY doc_id, w),
    tot AS (SELECT doc_id, SUM(cnt) AS n_tokens FROM tf GROUP BY doc_id),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    nd AS (SELECT COUNT(*) AS n_docs FROM docs),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.cnt, dfreq.df,
             ROUND((CAST(tf.cnt AS DOUBLE) / CAST(tot.n_tokens AS DOUBLE))
                   * LN((1.0 + CAST(nd.n_docs AS DOUBLE))
                        / (1.0 + CAST(dfreq.df AS DOUBLE))), 4) AS tfidf
      FROM tf JOIN tot ON tot.doc_id = tf.doc_id
              JOIN dfreq ON dfreq.token = tf.token
              CROSS JOIN nd),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY tfidf DESC, token ASC) AS rn
      FROM scored)
    SELECT doc_id, token, cnt, df, tfidf FROM ranked WHERE rn <= 3
    """,
)
def corpus_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the corpus statistic completing
    doc_term_freq (TF) and corpus_top_terms (global counts).

    Cross-engine determinism: counts are exact integers; tf is one IEEE
    division of identical operands; the smoothed idf ln((1+N)/(1+df)) is
    the one transcendental — JVM Math.log and libm disagree by 1 ulp on
    ~4% of arguments (measured), so the SCORE IS DEFINED as rounded to 4
    decimals in both engines, collapsing ulp noise (a value would need to
    sit within ~1e-15 of a 5e-5 rounding boundary to differ). Ranking uses
    the rounded score with a token tiebreak, so row selection is stable.

    Scale shape: tf is one partial-aggregated shuffle on (doc_id, token);
    df reuses tf (one more shuffle on token, carrying one row per distinct
    (doc, term)); N broadcasts as a 1-row cross join; top-3 per doc is a
    WindowGroupLimit, so only ~3 rows per doc survive the rank shuffle."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tf = (
        d.select("doc_id", F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
    )
    tot = tf.groupBy("doc_id").agg(F.sum("cnt").alias("n_tokens"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    nd = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(tot, "doc_id")
        .join(dfreq, "token")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "token",
            "cnt",
            "df",
            F.round(
                (F.col("cnt").cast("double") / F.col("n_tokens").cast("double"))
                * F.log(
                    (F.lit(1.0) + F.col("n_docs").cast("double"))
                    / (F.lit(1.0) + F.col("df").cast("double"))
                ),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "cnt", "df", "tfidf")
    )


@register(
    "agg_corr_via_moments",
    oracle="""
    SELECT event_type, n,
           CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_num,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS corr_cents_hour
    FROM (
      SELECT event_type, COUNT(*) AS n,
             SUM(cents) AS sx, SUM(hr) AS sy,
             SUM(cents * cents) AS sxx, SUM(hr * hr) AS syy,
             SUM(cents * hr) AS sxy
      FROM (SELECT event_type,
                   CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
                   CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr
            FROM events) v
      GROUP BY event_type) m
    """,
)
def agg_corr_via_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact integer moments (cents x hour-of-day
    per event type). The engines' native ``corr`` accumulators are
    order-dependent in floating point; summing bigint moments is exact and
    order-free, and the final expression applies IEEE ops to identical
    operands in both engines — same rewrite as agg_stddev_via_moments."""
    ev = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    hr = F.hour("ts").cast("bigint")
    v = ev.select("event_type", cents.alias("cents"), hr.alias("hr"))
    m = v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sx"),
        F.sum("hr").alias("sy"),
        F.sum(F.col("cents") * F.col("cents")).alias("sxx"),
        F.sum(F.col("hr") * F.col("hr")).alias("syy"),
        F.sum(F.col("cents") * F.col("hr")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov_num = nd * F.col("sxy") - sx * sy
    return m.select(
        "event_type",
        "n",
        cov_num.alias("cov_num"),
        (
            cov_num
            / (
                F.sqrt(nd * F.col("sxx") - sx * sx)
                * F.sqrt(nd * F.col("syy") - sy * sy)
            )
        ).alias("corr_cents_hour"),
    )


_LATERAL_TOPN_SQL = """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c
    JOIN LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) o ON TRUE
    WHERE c.c_custkey <= 200
"""


@register("join_lateral_topn", oracle=_LATERAL_TOPN_SQL)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join: per-customer top-2 orders, the SAME ANSI
    text executed by spark.sql and the DuckDB oracle. Catalyst decorrelates
    the per-row subquery into a window-rank + filter (check .explain:
    WindowGroupLimit pushes the limit below the shuffle) — the user writes
    the correlated form, the engine runs the distributed one."""
    from .catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPN_SQL)


_FILTER_AGG_SQL = """
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           COUNT(*) FILTER (WHERE event_type = 'view') AS n_views,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase_cents
    FROM events
    GROUP BY user_id
"""


@register("agg_filter_clause", oracle=_FILTER_AGG_SQL)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation with the ANSI FILTER clause — the IDENTICAL
    text runs through spark.sql and the DuckDB oracle. Catalyst compiles
    each FILTER into a conditional partial aggregate (one pass, map-side
    combined), not one scan per condition."""
    from .catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_FILTER_AGG_SQL)


@register(
    "agg_string_concat_ordered",
    oracle="""
    SELECT c_mktsegment,
           string_agg(c_name, '|' ORDER BY c_name) AS names
    FROM customer WHERE c_custkey <= 60
    GROUP BY c_mktsegment
    """,
)
def agg_string_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg / string_agg): deterministic via
    the explicit WITHIN GROUP order — an UNORDERED listagg would hash-vary
    with partitioning and could never pass a cross-engine value check."""
    from .catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT c_mktsegment,
               listagg(c_name, '|') WITHIN GROUP (ORDER BY c_name) AS names
        FROM customer WHERE c_custkey <= 60
        GROUP BY c_mktsegment
    """)


_RANGE_INTERVAL_SQL = """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
             AS DECIMAL(16,4)) AS DOUBLE) AS trailing_7d_spend
    FROM orders WHERE o_custkey <= 300
"""


@register("window_range_interval_7d", oracle=_RANGE_INTERVAL_SQL)
def window_range_interval_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval RANGE frame: per-customer trailing-7-day spend,
    the IDENTICAL text in both engines. RANGE frames are tie-insensitive
    (all peers of the current order date are always in the frame), so the
    decimal-funneled sum is deterministic even though (custkey, date) is
    not a unique key — a ROWS frame here would be order-dependent and
    unverifiable."""
    from .catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RANGE_INTERVAL_SQL)


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(16,4))
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1993-10-01'
      AND o_orderdate <  TIMESTAMP '1994-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer — fact-fact join
    (orders x lineitem, shuffle on orderkey) with a date-windowed orders
    filter PUSHED to the scan, the nation dim broadcast, decimal-funneled
    revenue, heap top-20."""
    from pyspark.sql import functions as F

    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1993-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1994-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,6)")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("decimal(16,4)").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "asof_enrich_operator",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, MAX(value) AS last_view_value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
    p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
    SELECT p.user_id, p.event_id,
           (SELECT v.last_view_value FROM v
            WHERE v.user_id = p.user_id AND v.ts <= p.ts
            ORDER BY v.ts DESC LIMIT 1) AS last_view_value
    FROM p
    """,
)
def asof_enrich_operator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic as-of join OPERATOR (operators.asof) under the gate:
    enrich each purchase with the value of the user's latest prior (or
    simultaneous) view. One shuffle + one window pass; the oracle is the
    correlated point-in-time subquery (right side pre-deduped per (user,
    ts) so the pick is unambiguous in both engines)."""
    from ..operators.asof import asof_join_backward

    ev = t(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_view_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    return asof_join_backward(
        purchases, views, by=["user_id"], left_on="ts", right_on="ts"
    ).select("user_id", "event_id", "last_view_value")


@register(
    "asof_nearest_tolerance",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, MAX(value) AS nearest_view_value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
    p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
    SELECT p.user_id, p.event_id,
           (SELECT v.nearest_view_value FROM v
            WHERE v.user_id = p.user_id
              AND abs(date_diff('second', v.ts, p.ts)) <= 1800
            ORDER BY abs(date_diff('second', v.ts, p.ts)),
                     CASE WHEN v.ts <= p.ts THEN 0 ELSE 1 END
            LIMIT 1) AS nearest_view_value
    FROM p
    """,
)
def asof_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of operator's NEAREST + tolerance mode under the driver
    gate: each purchase enriched with the view value closest in time
    within 30 minutes, either side, ties going backward — pandas
    merge_asof(direction='nearest', tolerance=...) semantics (parity
    with pandas itself is pinned in tests/test_scale_ops.py).

    Same single-shuffle shape as the backward form: both directions'
    picks are frames of ONE window sort, so nearest costs no extra pass;
    the oracle is the correlated minimum-gap subquery with the identical
    tie rule. A side outside tolerance is disqualified BEFORE choosing,
    so the other side can still match."""
    from ..operators.asof import asof_join_backward

    ev = t(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("nearest_view_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    return asof_join_backward(
        purchases,
        views,
        by=["user_id"],
        left_on="ts",
        right_on="ts",
        direction="nearest",
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    ).select("user_id", "event_id", "nearest_view_value")


@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 212)
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(16,4))
                AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 25
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: self-referential HAVING subquery (orders whose line
    quantity sum exceeds a threshold) semi-joined back into the fact, then
    re-aggregated with dims and top-k'd. The 'big' keys are few — Spark
    broadcasts the semi-join side after the first aggregation."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 212)
        .select("l_orderkey")
    )
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("decimal(16,4)")
            .cast("double")
            .alias("total_qty")
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "scalar_json_typed",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) // 10 AS k_bucket,
           COUNT(*) AS n,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_min,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_max
    FROM events
    GROUP BY 1
    """,
)
def scalar_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: from_json with an explicit schema (vs the
    stringly get_json_object in scalar_json_funcs) — parse ONCE into a
    struct, then aggregate on the typed field. At scale the parse cost is
    paid once per row instead of once per extraction."""
    ev = t(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        ev.select(k.alias("k"))
        # floor(), not a bare int cast: cast truncates toward zero and would
        # disagree with the oracle's // (floor division) for negative k
        .groupBy(F.floor(F.col("k") / 10).cast("int").alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H-shape batch 2 (round 4): the plan shapes the first batch lacked —
# correlated-EXISTS semi-join with a non-equi predicate (q4), pure
# filter-pushdown aggregation (q6), conditional-ratio aggregation over a
# broadcast dim join (q14), disjunctive multi-bracket predicates (q19), and
# a scalar-subquery threshold + anti-join (q22). Adapted to the synthetic
# schema (no partsupp/commitdate columns); the SHAPE, not the constants, is
# what each one pins.
# ---------------------------------------------------------------------------


@register(
    "q4_priority_semijoin",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one late-shipped line (> 60 days
    after the order date), counted per priority. The correlated EXISTS must
    plan as ONE left-semi hash join carrying the non-equi date predicate —
    never a per-order subquery execution; the semi join also deduplicates
    multi-line matches for free (no DISTINCT pass)."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                 * CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(16,4)) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 30
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate — the query that lives
    or dies on predicate pushdown. All four predicates must reach the
    parquet scan (row-group pruning on the shipdate range); the aggregate is
    a single partial-agg lane with no shuffle of data rows at all."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.04, 0.08)
        & (F.col("l_quantity") < 30)
    )
    rev = (
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)") * F.col("l_discount").cast("decimal(18,6)"))
        .cast("decimal(16,4)")
        .cast("double")
        .alias("revenue")
    )
    return li.agg(rev, F.count("*").alias("n_lines"))


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,6))
                        * (1 - CAST(l_discount AS DECIMAL(18,6)))
                   ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(16,4)) AS DOUBLE)
           * 100.0
           / CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(16,4)) AS DOUBLE)
             AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-07-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-ratio aggregation over a dim join — the
    promo share of discounted revenue in a date window. The part table
    broadcasts; both sums are exact decimal lanes of ONE aggregation pass
    (no second scan for the denominator); the final percentage is a single
    double division of identical operands in both engines."""
    d18 = "decimal(18,6)"
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice").cast(d18) * (F.lit(1) - F.col("l_discount").cast(d18))
    joined = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast(d18)))
        .cast("decimal(16,4)")
        .cast("double")
        .alias("_promo"),
        F.sum(disc).cast("decimal(16,4)").cast("double").alias("_total"),
    )
    return agg.select(
        (F.col("_promo") * 100.0 / F.col("_total")).alias("promo_revenue_pct")
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                 * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(16,4)) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 5 AND 30)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 10 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-bracket predicates spanning both
    join sides. Catalyst cannot push the OR across the join as-is, but it
    CAN derive the per-side implied filters (brand/size union on part,
    quantity union on lineitem) and evaluate the residual OR post-join on a
    broadcast hash join — the shape this pins via the oracle equality."""
    d18 = "decimal(18,6)"
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    bracket = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(5, 30)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(10, 40)
        )
    )
    disc = F.col("l_extendedprice").cast(d18) * (F.lit(1) - F.col("l_discount").cast(d18))
    return j.filter(bracket).agg(
        F.sum(disc).cast("decimal(16,4)").cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q22_idle_balances",
    oracle="""
    WITH cutoff AS (
      SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(16,4)) AS DOUBLE)
             / COUNT(*) AS m
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c_nationkey,
           COUNT(*) AS n_cust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(16,4)) AS DOUBLE)
             AS total_bal
    FROM customer c, cutoff
    WHERE c.c_acctbal > cutoff.m
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: a scalar-subquery threshold (mean positive balance,
    exact decimal sum -> one double division) gating an ANTI join (customers
    with no urgent orders), then a per-nation aggregate. The one-row cutoff
    must broadcast (never shuffle the customer table against it) and the
    NOT EXISTS must plan as a left-anti hash join, not a per-row probe."""
    c = t(spark, sf_dir, "customer")
    cutoff = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
                .cast("decimal(16,4)")
                .cast("double")
                / F.count("*")
            ).alias("m")
        )
    )
    urgent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    kept = (
        c.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("m"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return kept.groupBy("c_nationkey").agg(
        F.count("*").alias("n_cust"),
        F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
        .cast("decimal(16,4)")
        .cast("double")
        .alias("total_bal"),
    )


@register(
    "q7_bilateral_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           EXTRACT(YEAR FROM l_shipdate) AS ship_year,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(16,4)) AS DOUBLE)
             AS volume,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o   ON l_orderkey = o_orderkey
    JOIN customer c ON o_custkey = c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l_suppkey = s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE (cn.n_name = 'NATION_11' AND sn.n_name = 'NATION_20')
       OR (cn.n_name = 'NATION_19' AND sn.n_name = 'NATION_18')
    GROUP BY cn.n_name, sn.n_name, EXTRACT(YEAR FROM l_shipdate)
    """,
)
def q7_bilateral_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between nation PAIRS — a
    five-way join where the selective predicate spans TWO dimension chains
    (customer-side nation x supplier-side nation), grouped by shipping
    year. Every dimension (customer, supplier, both nation aliases)
    broadcasts; lineitem-orders is the one fact-fact join (shuffled on the
    order key — or shuffle-free when both sides are pre-bucketed on it, the
    repeated-join story in README); the pair disjunction evaluates after
    both chains resolve."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    d18 = "decimal(18,6)"
    j = (
        # no broadcast hint on orders: it is a FACT table — at scale this
        # join shuffles on the order key (Catalyst may still broadcast it
        # at test sf, which is fine; forcing it would be wrong at 100 TB)
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .filter(
            ((F.col("cust_nation") == "NATION_11") & (F.col("supp_nation") == "NATION_20"))
            | ((F.col("cust_nation") == "NATION_19") & (F.col("supp_nation") == "NATION_18"))
        )
    )
    disc = F.col("l_extendedprice").cast(d18) * (F.lit(1) - F.col("l_discount").cast(d18))
    return j.groupBy(
        "cust_nation", "supp_nation", F.year("l_shipdate").cast("long").alias("ship_year")
    ).agg(
        F.sum(disc).cast("decimal(16,4)").cast("double").alias("volume"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey AS pk,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(16,4)) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT COUNT(*) AS n_lines,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(16,4)) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem l JOIN pa ON l.l_partkey = pa.pk
    WHERE l.l_quantity < 0.5 * pa.avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the correlated scalar-AVG subquery ("lines below
    half their part's average quantity"), decorrelated into ONE per-part
    aggregate joined back to the fact — the classic rewrite that turns a
    per-row subquery into a single shuffle on the correlation key. The
    per-part average uses the exact decimal sum -> one double division, so
    the 0.5x threshold compares identical doubles in both engines."""
    li = t(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("decimal(16,4)")
            .cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    j = li.join(pa, F.col("l_partkey") == F.col("pk")).filter(
        F.col("l_quantity") < 0.5 * F.col("avg_qty")
    )
    return j.agg(
        F.count("*").alias("n_lines"),
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("decimal(16,4)")
            .cast("double")
            / 7.0
        ).alias("avg_yearly"),
    )

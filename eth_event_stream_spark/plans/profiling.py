"""Catalog profiling / data-quality operators (round 6).

The reference has no statistics of any kind (SURVEY §4: "no statistics");
a queryable engine at 100 TB needs them twice over — once for humans
(data-quality dashboards, ingest acceptance checks) and once for the
optimizer (ndv/min/max feed join ordering and broadcast decisions; Spark's
own `ANALYZE TABLE` collects exactly these). Both operators here produce
the numbers in ONE scan shapes:

- ``profile_table_stats``: per-column row/null/ndv/min/max over ``orders``
  in a single pass — every aggregate computed in one partial-combining
  HashAggregate reduction, unpivoted to long form afterward (constant-size
  frame), not one scan per column.
- ``profile_fk_orphans``: referential-integrity audit of the star schema's
  FK edges (lineitem→orders, orders→customer, customer→nation) — orphan
  counts via anti-joins, the acceptance gate an ingest pipeline runs
  before publishing a snapshot.

String-normalization note: min/max are surfaced as strings to fit mixed
column types in one result; doubles go through DECIMAL(18,2) and
timestamps through an explicit format so both engines render identical
text (raw double→string formatting differs across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import t, t_parallel
from .registry import register

# column -> SQL fragment rendering min/max as engine-identical text;
# {v} is the aggregated value expression
_ORDERS_COLS: dict[str, tuple[str, str]] = {
    # (spark render, duckdb render)
    "o_orderkey": ("CAST({v} AS STRING)", "CAST({v} AS VARCHAR)"),
    "o_custkey": ("CAST({v} AS STRING)", "CAST({v} AS VARCHAR)"),
    "o_orderstatus": ("{v}", "{v}"),
    "o_totalprice": (
        "CAST(CAST(ROUND({v}, 2) AS DECIMAL(18,2)) AS STRING)",
        "CAST(CAST(ROUND({v}, 2) AS DECIMAL(18,2)) AS VARCHAR)",
    ),
    "o_orderdate": (
        "date_format({v}, 'yyyy-MM-dd HH:mm:ss')",
        "strftime({v}, '%Y-%m-%d %H:%M:%S')",
    ),
    "o_orderpriority": ("{v}", "{v}"),
}


def _sql_profile_oracle() -> str:
    parts = []
    for c, (_, duck) in _ORDERS_COLS.items():
        parts.append(f"""
    SELECT '{c}' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {duck.format(v=f"MIN({c})")} AS min_value,
           {duck.format(v=f"MAX({c})")} AS max_value
    FROM orders""")
        # one UNION ALL per column is fine for the ORACLE (DuckDB rescans a
        # 500-row view); the Spark plan is the one-scan version
    return " UNION ALL ".join(parts)


@register("profile_table_stats", oracle=_sql_profile_oracle())
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics of ``orders`` — rows, nulls,
    exact ndv, min, max — in ONE scan: all 6 columns' aggregates sit in a
    single HashAggregate (the multi-count-distinct plans as one Expand +
    two-level aggregate, still one pass over the data), then the 1-row
    wide result unpivots to long form with ``stack`` on a constant-size
    frame. The oracle computes identical numbers column-by-column — same
    values, opposite plan shape, which is the point of the check.

    These are the statistics Catalyst's CBO consumes (`ANALYZE TABLE ...
    COMPUTE STATISTICS FOR COLUMNS`); surfacing them as a query makes the
    engine's stats story auditable on any table snapshot."""
    o = t_parallel(spark, sf_dir, "orders")
    aggs = []
    for c, (spark_r, _) in _ORDERS_COLS.items():
        aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"{c}__ndv"),
            F.expr(spark_r.format(v=f"MIN({c})")).alias(f"{c}__min"),
            F.expr(spark_r.format(v=f"MAX({c})")).alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__ndv, {c}__min, {c}__max"
        for c in _ORDERS_COLS
    )
    return wide.selectExpr(
        f"stack({len(_ORDERS_COLS)}, {stack_args}) AS "
        "(col, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )


def _sql_profile_approx_oracle() -> str:
    # contract oracle: exact lanes recomputed, within_bound pinned TRUE —
    # the driver hash fails iff Spark's HLL estimate leaves the 4-sigma band
    parts = []
    for c in _ORDERS_COLS:
        parts.append(f"""
    SELECT '{c}' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv_exact,
           TRUE AS within_bound
    FROM orders""")
    return " UNION ALL ".join(parts)


@register("profile_table_stats_approx", oracle=_sql_profile_approx_oracle())
def profile_table_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of ``profile_table_stats``: ndv via
    ``approx_count_distinct`` (HyperLogLog++, rsd 0.05) instead of the
    exact multi-count-distinct. The exact ndv RIDES ALONG so the published
    guarantee is auditable (``within_bound``: |approx - exact| <= 4*rsd
    relative, the same regeneration-robust band as ``agg_approx_distinct``
    — per-round testdata redraws the deterministic sketch error, and 3
    sigma leaves compounding tail risk) —
    at production scale you drop the exact lane and this becomes a single
    partial-combining HashAggregate with CONSTANT per-column state (one
    HLL sketch each), no Expand, no shuffle of distinct values; the exact
    lane is precisely the already-oracled ``profile_table_stats``.

    Oracled as a CONTRACT, not a value (the pattern of
    ``agg_approx_distinct``): the raw HLL estimate is engine-specific
    (DuckDB's approx_count_distinct uses a different sketch), so the
    hashed output carries the exact lanes plus ``within_bound``, which
    the oracle pins TRUE — the driver hash fails iff the estimate ever
    leaves the band. The raw estimate + error pct stay visible in
    tests/test_scale_ops.py, which asserts the tighter empirical band on
    the current data.

    Plan note (caught by the 10x rehearsal): the exact and approx lanes
    run as TWO aggregation passes joined on their 1-row outputs. Mixing
    them in one agg puts the HLL buffers through the multi-distinct
    Expand (one expanded row per distinct lane per input row, each
    carrying every partial-agg buffer) — measured 25 s vs 3 s at 10x.
    Separated, the approx pass is the Expand-free constant-state
    aggregate that IS the production profiler; the exact Expand pass is
    the test-scale audit lane."""
    o = t_parallel(spark, sf_dir, "orders")
    exact_aggs = []
    approx_aggs = []
    for c in _ORDERS_COLS:
        exact_aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"{c}__ndv"),
        ]
        approx_aggs.append(
            F.approx_count_distinct(c, rsd=0.05).cast("bigint").alias(f"{c}__andv")
        )
    wide = o.agg(*exact_aggs).crossJoin(F.broadcast(o.agg(*approx_aggs)))
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__ndv, {c}__andv" for c in _ORDERS_COLS
    )
    long = wide.selectExpr(
        f"stack({len(_ORDERS_COLS)}, {stack_args}) AS "
        "(col, n_rows, n_nulls, ndv_exact, ndv_approx)"
    )
    err = F.abs(F.col("ndv_approx") - F.col("ndv_exact")).cast("double") / F.greatest(
        F.col("ndv_exact"), F.lit(1)
    )
    return long.select(
        "col",
        "n_rows",
        "n_nulls",
        "ndv_exact",
        (err <= 4 * 0.05).alias("within_bound"),
    )


_FK_EDGES = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
]


def _sql_fk_oracle() -> str:
    parts = []
    for name, child, ck, parent, pk in _FK_EDGES:
        parts.append(f"""
    SELECT '{name}' AS fk,
           CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child,
           CAST((SELECT COUNT(*) FROM {child} c
                 WHERE c.{ck} IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM {parent} p
                                   WHERE p.{pk} = c.{ck})) AS BIGINT)
             AS n_orphans""")
    return " UNION ALL ".join(parts)


@register("profile_fk_orphans", oracle=_sql_fk_oracle())
def profile_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: for each FK edge of the star schema,
    the number of child rows whose key has no parent — the acceptance
    check an ingest pipeline runs before publishing (a nonzero count
    means a partial load or a reorg-style retraction left danglers).

    Plan per edge: LEFT ANTI join of the child's key column against the
    parent key (parent side broadcast for dims; same-key shuffle for the
    fact-fact edge) + a count — no row ever carries more than the key.
    The three one-row results union into the report frame."""
    out = None
    for name, child, ck, parent, pk in _FK_EDGES:
        c = t(spark, sf_dir, child)
        p = t(spark, sf_dir, parent).select(F.col(pk).alias(ck))
        orphans = (
            c.select(ck)
            .filter(F.col(ck).isNotNull())
            .join(p, ck, "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
        )
        row = (
            c.agg(F.count(F.lit(1)).cast("bigint").alias("n_child"))
            .crossJoin(F.broadcast(orphans))
            .select(F.lit(name).alias("fk"), "n_child", "n_orphans")
        )
        out = row if out is None else out.unionByName(row)
    return out


N_TASKS = 32  # the cluster-parallelism the salt recommendation targets


@register(
    "profile_key_skew",
    oracle=f"""
    WITH k AS (
      SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM events GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
             CAST((SUM(n_rows) + {N_TASKS - 1}) // {N_TASKS} AS BIGINT) AS target
      FROM k)
    SELECT key, n_rows,
           CAST(n_rows * 1000000 // total AS BIGINT) AS share_ppm,
           n_rows * {N_TASKS} > total * 2 AS hot,
           CAST((n_rows + target - 1) // target AS BIGINT) AS recommended_salt
    FROM k, tot
    """,
    doc="Join-key skew audit: per-key share and the salt factor to flatten it.",
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The diagnostic that feeds the salted-join path (`join_salted_equivalence`):
    per-key row counts, parts-per-million share, a `hot` flag (key exceeds 2x
    the uniform per-task share at N_TASKS-way parallelism), and the integer
    salt factor that splits the key across ~target-sized tasks. All integer
    math (ppm, ceil-div) so the oracle hash covers the recommendation, not
    just the counts. One scan + a 1-row broadcast total — at 100 TB this is
    the cheap pre-flight a pipeline runs before choosing its join strategy
    (AQE's skew handling fixes sort-merge joins at runtime; the salt
    recommendation covers the shapes AQE can't rewrite, e.g. aggregations
    or as-of buckets on the hot key). The df-level body lives in
    ``operators.skew.key_skew_profile`` (one definition), and
    ``operators.skew.profile_guided_join`` consumes the recommendation
    end-to-end (driver-oracled by ``join_salt_guided``)."""
    from ..operators.skew import key_skew_profile

    return key_skew_profile(t(spark, sf_dir, "events"), "event_type", N_TASKS)


@register(
    "join_salt_guided",
    oracle="""
    WITH dim AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS type_total
      FROM events GROUP BY 1)
    SELECT e.event_id, e.event_type, d.type_total
    FROM events e JOIN dim d USING (event_type)
    WHERE e.user_id < 50
    """,
    doc="Profiler-guided salted join == the plain join, end to end.",
)
def join_salt_guided(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``profile_key_skew``'s recommendation consumed end-to-end: the probe
    (a user slice of ``events``) is key-skew-profiled on ``event_type``
    (every type holds ~20% share — far past the 2x-uniform hot line at
    N_TASKS=32), and ``profile_guided_join`` salts the dim join at the max
    recommended factor. The oracle is the PLAIN SQL join — the whole
    point: the strategy changes the shuffle layout, never the answer.
    Plan-gated: the exploded build side must appear in the physical plan
    (tests/test_plan_quality.py)."""
    from ..operators.skew import profile_guided_join

    e = t(spark, sf_dir, "events")
    dim = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("type_total")
    )
    probe = e.filter(F.col("user_id") < 50).select("event_id", "event_type")
    return profile_guided_join(probe, dim, "event_type", n_tasks=N_TASKS).select(
        "event_id", "event_type", "type_total"
    )


@register(
    "aqp_sum_sampled",
    oracle="""
    WITH s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
             SUM(CAST(value AS DECIMAL(18,6))) AS s_sum,
             SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
               AS s_sumsq
      FROM events WHERE event_id % 100 < 1),
    a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             SUM(CAST(value AS DECIMAL(18,6))) AS t_sum
      FROM events)
    SELECT a.n_rows, s.n_sampled,
           CAST(CAST(a.t_sum AS DECIMAL(16,4)) AS DOUBLE) AS exact_total,
           CAST(CAST(s.s_sum * 100 AS DECIMAL(16,4)) AS DOUBLE) AS est_total,
           ABS(CAST(s.s_sum * 100 AS DOUBLE) - CAST(a.t_sum AS DOUBLE))
             <= 4.0 * (CAST(a.n_rows AS DOUBLE) / sqrt(CAST(s.n_sampled AS DOUBLE)))
                * sqrt((CAST(s.n_sampled AS DOUBLE) * CAST(s.s_sumsq AS DOUBLE)
                        - CAST(s.s_sum AS DOUBLE) * CAST(s.s_sum AS DOUBLE))
                       / (CAST(s.n_sampled AS DOUBLE)
                          * (CAST(s.n_sampled AS DOUBLE) - 1.0)))
             AS within_bound
    FROM a, s
    """,
    doc="AQP: sampled SUM estimate with a CLT 4-sigma bound contract.",
)
def aqp_sum_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing (the BlinkDB idea, sampling-not-sketch):
    estimate SUM(value) from a DETERMINISTIC 1% sample (event_id % 100 < 1 —
    both engines draw the identical sample, so the estimate itself
    hash-matches, not just the contract) and bound the error by CLT:
    |est − exact| <= 4 · (N/√n) · s_sample. At 100 TB the sample is the only
    thing scanned for the estimate — here the exact lane rides along (as in
    every sketch contract) purely to make the driver hash meaningful. Sums
    and sums-of-squares stay DECIMAL (exact, order-free); the bound math is
    one IEEE expression over identical exact operands, so within_bound is
    engine-deterministic. 4 sigma for the same regeneration reason as the
    HLL band (relational.py:agg_approx_distinct)."""
    D = "decimal(18,6)"
    events = t(spark, sf_dir, "events")
    s = events.filter(F.col("event_id") % 100 < 1).agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.col("value").cast(D)).alias("s_sum"),
        F.sum(F.col("value").cast(D) * F.col("value").cast(D)).alias("s_sumsq"),
    )
    a = events.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("value").cast(D)).alias("t_sum"),
    )
    j = a.crossJoin(F.broadcast(s))
    nd = F.col("n_sampled").cast("double")
    est_d = (F.col("s_sum") * 100).cast("double")
    exact_d = F.col("t_sum").cast("double")
    bound = (
        F.lit(4.0)
        * (F.col("n_rows").cast("double") / F.sqrt(nd))
        * F.sqrt(
            (nd * F.col("s_sumsq").cast("double")
             - F.col("s_sum").cast("double") * F.col("s_sum").cast("double"))
            / (nd * (nd - F.lit(1.0)))
        )
    )
    return j.select(
        "n_rows",
        "n_sampled",
        F.col("t_sum").cast("decimal(16,4)").cast("double").alias("exact_total"),
        (F.col("s_sum") * 100).cast("decimal(16,4)").cast("double").alias("est_total"),
        (F.abs(est_d - exact_d) <= bound).alias("within_bound"),
    )


@register(
    "analytics_regression_by_type",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS x,
             CAST(ROUND(value * 1000) AS BIGINT) AS y
      FROM events),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             CAST(SUM(y * y) AS HUGEINT) AS syy,
             CAST(SUM(x * y) AS HUGEINT) AS sxy
      FROM pts GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_milli,
           CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) AS DOUBLE)
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
    FROM s
    """,
    doc="OLS slope/r2 per group from exact integer sufficient statistics.",
)
def analytics_regression_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine OLS (value vs hour-of-day, per event type) the way a
    distributed engine should fit it: the ONLY thing aggregated is the six
    sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) over INTEGER-quantized
    points (y in milli-units), so partial aggregation is exact and
    order-free, and slope/r² are IEEE expressions over integers that cast
    to double with a SINGLE rounding — bit-identical across engines.
    (First cut used DECIMAL(_,12) sums: values matched exactly, but
    DuckDB's high-scale decimal→double cast rounds twice — int128/10^scale
    in floating point — and drifted 1 ulp from Spark/Python; integer
    moments eliminate the class.) This is the closed-form-ML recipe at
    100 TB: one map-side-combining pass, O(groups) driver state;
    multivariate fits aggregate X'X / X'y the same way. ``slope_milli``
    is per milli-unit y; the cross-product terms sit far inside
    DECIMAL(38,0) (~1e21 at 10^7 rows/group)."""
    DI = "decimal(38,0)"
    pts = t(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("bigint").alias("x"),
        F.round(F.col("value") * 1000).cast("bigint").alias("y"),
    )
    s = pts.groupBy("event_type").agg(
        F.count("*").cast(DI).alias("n"),
        F.sum(F.col("x").cast(DI)).alias("sx"),
        F.sum(F.col("y").cast(DI)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(DI)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(DI)).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(DI)).alias("sxy"),
    )
    cov_n = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(DI)
    var_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(DI)
    var_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(DI)
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        (cov_n.cast("double") / var_x.cast("double")).alias("slope_milli"),
        (
            (cov_n * cov_n).cast("double")
            / (var_x.cast("double") * var_y.cast("double"))
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# dataset release card
# ---------------------------------------------------------------------------

_SQL_DATA_CARD = """
WITH s AS (
  SELECT doc_id, lang, source, text,
         CAST(LENGTH(text) AS BIGINT) AS n_chars,
         CAST(LEN(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
wide AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS docs_total,
         CAST(SUM(n_chars) AS BIGINT) AS chars_total,
         CAST(SUM(n_tokens) AS BIGINT) AS ws_tokens_total,
         CAST(SUM(n_tokens) // COUNT(*) AS BIGINT) AS tokens_avg_per_doc,
         CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS text_distinct,
         CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS docs_exact_dup,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS sources_distinct,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS langs_distinct
  FROM s
)
SELECT m.metric, m.value FROM wide, LATERAL (VALUES
  ('docs_total', docs_total), ('chars_total', chars_total),
  ('ws_tokens_total', ws_tokens_total),
  ('tokens_avg_per_doc', tokens_avg_per_doc),
  ('text_distinct', text_distinct), ('docs_exact_dup', docs_exact_dup),
  ('sources_distinct', sources_distinct), ('langs_distinct', langs_distinct)
) AS m(metric, value)
UNION ALL
SELECT 'docs_lang_' || lang AS metric, CAST(COUNT(*) AS BIGINT) AS value
FROM documents GROUP BY lang
UNION ALL
SELECT 'tokens_lang_' || lang AS metric, CAST(SUM(n_tokens) AS BIGINT) AS value
FROM s GROUP BY lang
"""


@register(
    "profile_data_card",
    oracle=_SQL_DATA_CARD,
    doc="Dataset release card: corpus-wide and per-language statistics as "
    "(metric, value) rows — the numbers a data card publishes.",
)
def profile_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-release statistics card — document/char/token totals,
    exact-duplicate count, source/language diversity, and per-language doc
    and token counts, emitted as long-form ``(metric, value)`` rows (the
    table a dataset card or release-gate dashboard publishes).

    100 TB shape: TWO corpus scans total — one wide aggregation computes
    every corpus-level metric in a single HashAggregate (the three
    count-distincts plan as one Expand + two-level aggregate, the
    ``profile_table_stats`` pattern; dedup detection hashes ``md5(text)``
    so full document text never shuffles) and unpivots with ``stack``;
    the per-language lanes share one more scan (two aggregates of one
    ``lang``-grouped projection).  All values are BIGINT — the card is
    bit-reproducible.
    """
    d = t_parallel(spark, sf_dir, "documents")
    s = d.select(
        "lang",
        "source",
        F.md5("text").alias("h"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.split(F.lower(F.col("text")), " ", -1)).cast("long").alias("n_tokens"),
    )
    wide = s.agg(
        F.count(F.lit(1)).cast("long").alias("docs_total"),
        F.sum("n_chars").cast("long").alias("chars_total"),
        F.sum("n_tokens").cast("long").alias("ws_tokens_total"),
        F.expr("CAST(sum(n_tokens) DIV count(1) AS BIGINT)").alias("tokens_avg_per_doc"),
        F.count_distinct("h").cast("long").alias("text_distinct"),
        (F.count(F.lit(1)) - F.count_distinct("h")).cast("long").alias("docs_exact_dup"),
        F.count_distinct("source").cast("long").alias("sources_distinct"),
        F.count_distinct("lang").cast("long").alias("langs_distinct"),
    )
    metrics = [
        "docs_total", "chars_total", "ws_tokens_total", "tokens_avg_per_doc",
        "text_distinct", "docs_exact_dup", "sources_distinct", "langs_distinct",
    ]
    stack_args = ", ".join(f"'{m}', {m}" for m in metrics)
    corpus_lane = wide.selectExpr(
        f"stack({len(metrics)}, {stack_args}) AS (metric, value)"
    )
    lang_lane = (
        s.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("n_tokens").cast("long").alias("toks"),
        )
        .localCheckpoint()
    )
    per_lang = lang_lane.select(
        F.concat(F.lit("docs_lang_"), F.col("lang")).alias("metric"),
        F.col("docs").alias("value"),
    ).unionByName(
        lang_lane.select(
            F.concat(F.lit("tokens_lang_"), F.col("lang")).alias("metric"),
            F.col("toks").alias("value"),
        )
    )
    return corpus_lane.unionByName(per_lang)

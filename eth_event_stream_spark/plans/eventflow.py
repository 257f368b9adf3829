"""The reference's event-stream semantics over the driver's ``events`` table.

The reference (see SURVEY §2.2) synchronizes N log sources into dense,
totally-ordered, per-block batches and folds reducers over them. The driver's
testdata has no blockchain, so this module maps the semantics onto ``events``:

- block        := minute bucket of ``ts`` (monotone event-time -> block height)
- source       := ``event_type`` (N synchronized sources)
- log_index    := ``event_id``  (global unique -> total order within block)

Each query is the batch form of a sink behavior, oracle-checked:

- ``flagship_user_netflow``  — B11 netflow fold as an algebraic aggregation.
- ``sync_watermark``         — B2 min of per-source maxima.
- ``sync_dense_flush``       — B6 dense per-block emission incl. empty blocks.
- ``sync_block_batches``     — B7 tumbling count-windows over block height.
- ``sync_total_order``       — B9 N-way merge to total order.
- time windows (tumbling / sliding / session) and as-of — the streaming
  surface's event-time semantics in batch form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import t
from .registry import register

D = "decimal(18,6)"

# events span 2024-01-01 .. 2024-01-30; minute-bucket "block height"
SQL_BLOCK = "CAST(FLOOR(epoch(ts) / 60) AS BIGINT)"
BLOCK0 = 28401120  # floor(epoch('2024-01-01') / 60)


def _block():
    return (F.unix_timestamp("ts") / 60).cast("long")


def events_as_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events reinterpreted as a multi-source log stream."""
    return t(spark, sf_dir, "events").select(
        F.col("event_type").alias("source"),
        _block().alias("block"),
        F.col("event_id").alias("log_index"),
        F.col("user_id"),
        F.col("value"),
    )


# ---------------------------------------------------------------------------
# Flagship: netflow (B11)
# ---------------------------------------------------------------------------


@register(
    "flagship_user_netflow",
    oracle="""
    SELECT user_id,
           CAST(CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN -CAST(value AS DECIMAL(18,6))
                         ELSE  CAST(value AS DECIMAL(18,6)) END) AS DECIMAL(16,4)) AS DOUBLE) AS netflow,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def flagship_user_netflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (reference examples/stream_multi.rs netflow reducer, B11):
    per-entity signed value flow as a pure algebraic aggregation.

    The stateful fold degenerates to groupBy+sum (SURVEY §7.4.3), which Spark
    executes with map-side partial aggregation — the 100 TB-safe shape.
    """
    ev = t(spark, sf_dir, "events")
    signed = F.when(
        F.col("event_type") == "purchase", -F.col("value").cast(D)
    ).otherwise(F.col("value").cast(D))
    return ev.groupBy("user_id").agg(
        F.sum(signed).cast("decimal(16,4)").cast("double").alias("netflow"),
        F.count("*").alias("n_events"),
    )


@register(
    "flagship_netflow_counters",
    oracle="""
    SELECT COUNT(*) AS n_users,
           COUNT(*) FILTER (WHERE netflow > 0) AS n_positive,
           COUNT(*) FILTER (WHERE netflow < 0) AS n_negative
    FROM (
      SELECT user_id,
             CAST(CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN -CAST(value AS DECIMAL(18,6))
                           ELSE  CAST(value AS DECIMAL(18,6)) END) AS DECIMAL(16,4)) AS DOUBLE) AS netflow
      FROM events GROUP BY user_id) x
    """,
)
def flagship_netflow_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live monitor counters (examples/stream_multi.rs:118-142)."""
    nf = flagship_user_netflow(spark, sf_dir)
    return nf.agg(
        F.count("*").alias("n_users"),
        F.count_if(F.col("netflow") > 0).alias("n_positive"),
        F.count_if(F.col("netflow") < 0).alias("n_negative"),
    )


# ---------------------------------------------------------------------------
# Sink semantics (B2, B6, B7, B9)
# ---------------------------------------------------------------------------


@register(
    "sync_watermark",
    oracle=f"""
    SELECT MIN(mx) AS watermark, COUNT(*) AS n_sources
    FROM (SELECT event_type, MAX({SQL_BLOCK}) AS mx
          FROM events GROUP BY event_type) per_source
    """,
)
def sync_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: synced frontier = min over sources of per-source max block
    (sink.rs:187-197). Two-level aggregation, both algebraic."""
    ev = events_as_stream(spark, sf_dir)
    per_source = ev.groupBy("source").agg(F.max("block").alias("mx"))
    return per_source.agg(
        F.min("mx").alias("watermark"), F.count("*").alias("n_sources")
    )


@register(
    "sync_dense_flush",
    oracle=f"""
    SELECT spine.block, COALESCE(g.n_events, 0) AS n_events,
           COALESCE(g.sum_value, CAST(0.0 AS DOUBLE)) AS sum_value
    FROM (SELECT UNNEST(generate_series({BLOCK0}, {BLOCK0 + 599})) AS block) spine
    LEFT JOIN (
      SELECT {SQL_BLOCK} AS block, COUNT(*) AS n_events,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(16,4)) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1) g
    ON spine.block = g.block
    """,
)
def sync_dense_flush(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 dense flush: every block in [bottom, target] emits a row — empty
    blocks included (sink.rs:237-241) — via the block-spine left join
    (SURVEY §7.4.2). Spine is generated, tiny, and broadcast."""
    ev = events_as_stream(spark, sf_dir)
    grouped = ev.groupBy("block").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(D)).cast("decimal(16,4)").cast("double").alias("sum_value"),
    )
    spine = spark.range(BLOCK0, BLOCK0 + 600).withColumnRenamed("id", "block")
    return (
        spine.join(grouped, "block", "left")
        .select(
            "block",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


@register(
    "sync_block_batches",
    oracle=f"""
    SELECT CAST(FLOOR(({SQL_BLOCK} - {BLOCK0}) / 1000) AS BIGINT) AS batch_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_sources
    FROM events GROUP BY 1
    """,
)
def sync_block_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: tumbling count-window over block height (step=1000 blocks, the
    reference's default block_step)."""
    ev = events_as_stream(spark, sf_dir)
    return (
        ev.withColumn(
            "batch_id", F.floor((F.col("block") - F.lit(BLOCK0)) / 1000).cast("long")
        )
        .groupBy("batch_id")
        .agg(F.count("*").alias("n_events"), F.countDistinct("source").alias("n_sources"))
    )


@register(
    "sync_total_order",
    oracle=f"""
    SELECT {SQL_BLOCK} AS block, event_id AS log_index, event_type AS source, user_id
    FROM events
    ORDER BY block, log_index
    LIMIT 500
    """,
)
def sync_total_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: N-way merge to total (block, log_index) order (sink.rs:117-119).
    Bounded output -> TakeOrderedAndProject; unbounded consumers use
    repartitionByRange + sortWithinPartitions (operators.sync.synced_events)."""
    ev = events_as_stream(spark, sf_dir)
    return (
        ev.select("block", "log_index", "source", "user_id")
        .orderBy("block", "log_index")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# Event-time windows (tumbling / sliding / session) + as-of
# ---------------------------------------------------------------------------


@register(
    "tumbling_window_1h",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS hour_start,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(16,4)) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
)
def tumbling_window_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window — identical code under readStream
    with a watermark (the batch/stream unification the reference sells)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(D)).cast("decimal(16,4)").cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "n_events", "sum_value")
    )


@register(
    "sliding_window_1h_30m",
    oracle="""
    WITH starts AS (
      SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 1800) * 1800) AS TIMESTAMP) AS win_start,
             value FROM events
      UNION ALL
      SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 1800) * 1800 - 1800) AS TIMESTAMP),
             value FROM events
    )
    SELECT win_start, COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(16,4)) AS DOUBLE) AS sum_value
    FROM starts GROUP BY win_start
    """,
)
def sliding_window_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30m slide): each event lands in exactly two
    windows; Spark expands this without self-joining."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(D)).cast("decimal(16,4)").cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n_events", "sum_value")
    )


@register(
    "session_window_30m",
    oracle="""
    WITH e AS (SELECT user_id, ts FROM events WHERE user_id < 30),
    marked AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM e),
    sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked)
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_event,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def session_window_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) via the native session_window operator;
    the oracle is the classic gaps-and-islands rewrite."""
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 30)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "last_event", "n_events")
    )


@register(
    "asof_last_click_before_purchase",
    oracle="""
    SELECT p.user_id, p.event_id, p.ts,
           (SELECT MAX(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
                  AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id)))
             AS last_click_ts
    FROM events p
    WHERE p.event_type = 'purchase' AND p.user_id < 50
    """,
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): each purchase gets the user's most recent prior
    click. Expressed as a last-value window over the unioned timeline — one
    shuffle on user_id, NO range-join row explosion (SURVEY §2.4 as-of)."""
    ev = t(spark, sf_dir, "events").filter(
        (F.col("user_id") < 50) & F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_click = ev.withColumn(
        "last_click_ts",
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
        ).over(w),
    )
    return with_click.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "last_click_ts"
    )


# ---------------------------------------------------------------------------
# Event-analytics classics: ordered funnel and retention cohorts
# ---------------------------------------------------------------------------


@register(
    "event_funnel_stages",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t_view
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
      GROUP BY e.user_id)
    SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase,
           CASE WHEN s3.t_purchase IS NOT NULL THEN 3
                WHEN s2.t_click IS NOT NULL THEN 2
                ELSE 1 END AS stage
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def event_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase, each step strictly after
    the previous): per user, the earliest time each stage was reached IN
    ORDER, and the furthest stage. The canonical product-analytics query.

    100 TB shape: one cascade of three keyed aggregations, each a partial-
    aggregable MIN shuffled on user_id — the same key every time, so AQE
    reuses the partitioning; no window over a user's full history, no
    per-user array materialization. Strictly-after semantics come from the
    previous stage's min riding along the join, a filter, never a
    correlated subquery."""
    e = t(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .otherwise(1)
            .alias("stage"),
        )
    )


@register(
    "event_retention_cohorts",
    oracle="""
    WITH first_day AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id),
    active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT f.cohort_day,
           datediff('day', f.cohort_day, a.day) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM active a JOIN first_day f USING (user_id)
    GROUP BY f.cohort_day, day_offset
    """,
)
def event_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention by signup cohort: users bucketed by their first active
    day, counted on each later day offset — the other canonical
    product-analytics query (the triangle retention matrix).

    100 TB shape: first-activity is a MIN per user (partial agg); the
    distinct (user, day) activity set collapses before the join (dedup at
    source granularity, not event granularity); both shuffles key on
    user_id, then one count-distinct per (cohort, offset) cell."""
    e = t(spark, sf_dir, "events")
    day = F.to_date(F.col("ts"))
    first_day = e.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    active = e.select("user_id", day.alias("day")).distinct()
    return (
        active.join(first_day, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "events_value_outliers",
    oracle="""
    WITH st AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS s,
             SUM(CAST(ROUND(value * 100, 0) AS HUGEINT)
                 * CAST(ROUND(value * 100, 0) AS HUGEINT)) AS q
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           CAST(ROUND(e.value * 100, 0) AS BIGINT) AS cents,
           st.n
    FROM events e JOIN st USING (event_type)
    WHERE CAST(CAST(ROUND(e.value * 100, 0) AS HUGEINT) * st.n - st.s AS HUGEINT)
          * CAST(CAST(ROUND(e.value * 100, 0) AS HUGEINT) * st.n - st.s AS HUGEINT)
          * (st.n - 1)
          > 9 * st.n * (st.n * q - CAST(s AS HUGEINT) * CAST(s AS HUGEINT))
    """,
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type 3-sigma outlier flags on event values — the monitoring
    query every event engine runs — computed ENTIRELY in exact integer
    arithmetic: the z-score test |x - mean| > 3*stddev is cross-multiplied
    into (c*n - S)^2 * (n-1) > 9 * n * (n*Q - S^2) over integer cents
    (c = value cents, S/Q = per-type sum and sum of squares), so no
    float division or sqrt ever crosses engines.

    100 TB shape: one partial-agg pass builds the 5-row (type, n, S, Q)
    stats table, which BROADCASTS back onto the event scan; the flag is a
    map-side predicate. Wide products run in DECIMAL(38,0) (HUGEINT in
    the oracle) — bounded well under 10^38 for any realistic n."""
    e = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    st = (
        e.select("event_type", cents.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").alias("s"),
            F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("q"),
        )
    )
    joined = e.select("event_id", "event_type", cents.alias("cents")).join(
        F.broadcast(st), "event_type"
    )
    dev = "CAST(cents AS DECIMAL(38,0)) * n - s"
    cond = (
        f"({dev}) * ({dev}) * (n - 1) > "
        "9 * n * (n * q - CAST(s AS DECIMAL(38,0)) * s)"
    )
    return joined.filter(F.expr(cond)).select(
        "event_id", "event_type", "cents", "n"
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS next_type
      FROM events)
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM ordered
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition counts between consecutive event types per
    user — the empirical Markov matrix behind journey analysis / anomaly
    scoring (a purchase->purchase edge that never occurs in production is
    a bot signature). Order within a user is (ts, event_id), the same
    total-order contract the funnel fold uses.

    Plan: one user-partitioned lead() window (hash partition by user_id —
    never SinglePartition) + one hash aggregate on the (from, to) pair.
    Two shuffles, both on uniform keys; at 100 TB the second aggregates
    into at most |event_types|^2 rows."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts").cast("timestamp")), "event_id"
    )
    return (
        e.select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )


@register(
    "event_top_paths",
    oracle="""
    WITH seq AS (
      SELECT event_type AS s1,
             LEAD(event_type, 1) OVER w AS s2,
             LEAD(event_type, 2) OVER w AS s3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT s1, s2, s3, CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM seq WHERE s3 IS NOT NULL
    GROUP BY s1, s2, s3
    ORDER BY n_paths DESC, s1, s2, s3
    LIMIT 10
    """,
    doc="Top 10 three-step event paths (per-user order), deterministic ties.",
)
def event_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the 10 most common 3-step event sequences across all
    user journeys. One window pass (two LEADs share the user partition and
    sort), one hash agg over at most |event_type|^3 path keys, and a
    TakeOrdered heap for the cut — the n-gram shape on the event dimension
    (the token n-gram twin lives in the dedup family). Ties broken by the
    full path so the result is engine-deterministic."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("s1"),
        F.lead("event_type", 1).over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
    )
    return (
        seq.filter(F.col("s3").isNotNull())
        .groupBy("s1", "s2", "s3")
        .agg(F.count("*").alias("n_paths"))
        .orderBy(F.desc("n_paths"), "s1", "s2", "s3")
        .limit(10)
    )


@register(
    "prepare_next_event_pairs",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type AS label,
             LAG(event_type, 3) OVER w AS c3,
             LAG(event_type, 2) OVER w AS c2,
             LAG(event_type, 1) OVER w AS c1
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, event_id, ts,
           concat_ws('>', c3, c2, c1) AS context, label
    FROM seq WHERE c1 IS NOT NULL
    """,
    doc="Next-event-prediction training pairs: per-user sliding context of "
    "up to 3 prior events and the event that followed.",
)
def prepare_next_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-model data prep: (context, label) pairs for next-event
    prediction, one pair per event that has at least one predecessor in the
    user's timeline. The context is the up-to-3 previous event types joined
    with '>' — three LAGs sharing ONE window pass on the user partition (the
    same single-shuffle shape as ``event_top_paths``; both engines skip
    NULL lags in concat_ws, so warm-up rows carry a shorter context instead
    of being padded). At 100 TB this is one shuffle by user_id and a
    codegen'd projection — no self-join of the event log against itself,
    which is the naive formulation's cost."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.col("event_type").alias("label"),
        F.lag("event_type", 3).over(w).alias("c3"),
        F.lag("event_type", 2).over(w).alias("c2"),
        F.lag("event_type", 1).over(w).alias("c1"),
    )
    return seq.filter(F.col("c1").isNotNull()).select(
        "user_id",
        "event_id",
        "ts",
        F.concat_ws(">", "c3", "c2", "c1").alias("context"),
        "label",
    )

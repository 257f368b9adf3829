"""Incremental materialized-view maintenance: dirty-bucket rollup refresh.

The reference keeps per-block running aggregates alive across a stream and
patches them as new blocks land (`eth_event_stream/src/sink.rs` fold-state
update; SURVEY §2.2 B10/B11) — the batch-side analog at 100 TB is a rollup
materialized view that is refreshed *incrementally*: a new/late batch touches
only the time buckets it contains, and the refresh recomputes exactly those
buckets from mergeable partial aggregates instead of rescanning the corpus.

Design (Spark-first):

- the MV stores MERGEABLE partials — ``(n, sum DECIMAL, min, max)`` — so a
  refresh is partial ⊕ partial, never a raw-data rescan. DECIMAL addition is
  exact and order-independent, which makes the incremental result
  bit-identical to a full recompute (the oracle below IS the full recompute).
- dirty buckets come from the delta itself: aggregate the delta, take its
  distinct bucket keys (tiny — hours, not rows), and ``broadcast`` them to
  split the MV into a clean slice (passes through untouched, zero compute)
  and a dirty slice (merged with the delta partials). At 100 TB the clean
  slice is ~all of the MV, and with the MV stored partitioned by bucket date
  the dirty split is *partition pruning*, not a scan (see
  ``write_rollup_mv`` / ``refresh_rollup_mv`` + ``tests/test_matview.py``,
  which proves only dirty date partitions are rewritten on disk).
- the daily rollup cascades from the HOURLY partials (a rollup lattice):
  day = merge(hours), never a second pass over raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import t
from .registry import register

D = "decimal(18,6)"
D_WIDE = "decimal(38,6)"  # the MV's stable partial-sum type (exact, mergeable)

# The "late/new batch": everything from the final ingest day plus a scatter of
# late-arriving rows across the month (event_id % 97). Deterministic, so the
# DuckDB oracle can replay the same split.
_DELTA_COND = "(ts >= TIMESTAMP '2024-01-29 00:00:00' OR event_id % 97 = 0)"


def _delta_pred():
    return (F.col("ts") >= F.lit("2024-01-29 00:00:00").cast("timestamp")) | (
        F.col("event_id") % 97 == 0
    )


def hourly_partials(events: DataFrame) -> DataFrame:
    """Mergeable hourly partials: (bucket_hour, event_type, n, sum_dec, mn, mx).

    ``sum_dec`` stays DECIMAL so partial ⊕ partial is exact; finalization
    (``_finalize``) is the only place the value becomes DOUBLE.
    """
    return events.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_hour"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        # pinned to DECIMAL(38,6): partials and merged partials share one
        # on-disk schema, so refreshed partitions coexist with original ones
        F.sum(F.col("value").cast(D)).cast(D_WIDE).alias("sum_dec"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )


def merge_partials(parts: DataFrame, keys: list[str]) -> DataFrame:
    """partial ⊕ partial: the only algebra a refresh ever runs."""
    return parts.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_dec").cast(D_WIDE).alias("sum_dec"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def _finalize(parts: DataFrame, bucket_col: str) -> DataFrame:
    return parts.select(
        F.col(bucket_col),
        "event_type",
        F.col("n").alias("n_events"),
        F.col("sum_dec").cast("decimal(16,4)").cast("double").alias("sum_value"),
        F.col("mn").alias("min_value"),
        F.col("mx").alias("max_value"),
    )


@register(
    "rollup_incremental_refresh",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_hour, event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(16,4)) AS DOUBLE)
             AS sum_value,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY 1, 2
    """,
    doc="Incrementally refreshed hourly rollup == full recompute (oracle).",
)
def rollup_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup MV maintained incrementally and proven equal to a full
    recompute: base partials (pre-delta corpus) are patched with delta
    partials on the dirty hours only; clean hours pass through with zero
    compute. The broadcast dirty-key semi/anti split is the partition-pruning
    shape of the on-disk refresh (``refresh_rollup_mv``)."""
    events = t(spark, sf_dir, "events")
    base_mv = hourly_partials(events.filter(~_delta_pred()))
    delta = hourly_partials(events.filter(_delta_pred()))

    dirty = delta.select("bucket_hour").distinct()
    clean_rows = base_mv.join(F.broadcast(dirty), "bucket_hour", "left_anti")
    dirty_rows = base_mv.join(F.broadcast(dirty), "bucket_hour", "left_semi")
    patched = merge_partials(
        dirty_rows.unionByName(delta), ["bucket_hour", "event_type"]
    )
    return _finalize(clean_rows, "bucket_hour").unionByName(
        _finalize(patched, "bucket_hour")
    )


@register(
    "rollup_cascade_daily",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket_hour, event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS sum_dec,
             MIN(value) AS mn, MAX(value) AS mx
      FROM events GROUP BY 1, 2)
    SELECT CAST(date_trunc('day', bucket_hour) AS TIMESTAMP) AS bucket_day,
           event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(CAST(SUM(sum_dec) AS DECIMAL(16,4)) AS DOUBLE) AS sum_value,
           MIN(mn) AS min_value, MAX(mx) AS max_value,
           CAST(COUNT(*) AS BIGINT) AS n_active_hours
    FROM hourly GROUP BY 1, 2
    """,
    doc="Daily rollup cascaded from hourly partials (rollup lattice reuse).",
)
def rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup derived from the HOURLY partials, never from raw events —
    the rollup-lattice reuse that makes hierarchical dashboards O(buckets)
    instead of O(rows) at every level. ``n_active_hours`` is only computable
    from the hourly layer, making the cascade visible in the answer."""
    hourly = hourly_partials(t(spark, sf_dir, "events"))
    daily = (
        hourly.withColumn("bucket_day", F.date_trunc("day", "bucket_hour"))
        .groupBy("bucket_day", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_dec").alias("sum_dec"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
            F.count("*").alias("n_active_hours"),
        )
    )
    return daily.select(
        "bucket_day",
        "event_type",
        F.col("n").alias("n_events"),
        F.col("sum_dec").cast("decimal(16,4)").cast("double").alias("sum_value"),
        F.col("mn").alias("min_value"),
        F.col("mx").alias("max_value"),
        "n_active_hours",
    )


# ---------------------------------------------------------------------------
# On-disk MV cycle: write partitioned by bucket date, refresh rewrites ONLY
# dirty date partitions (dynamic partition overwrite). This is the artifact
# twin of ``rollup_incremental_refresh`` — same algebra, persisted state.
# ---------------------------------------------------------------------------


def write_rollup_mv(events: DataFrame, out_dir: str) -> None:
    """Materialize the hourly-partials MV partitioned by ``bucket_date`` so a
    refresh (and any time-ranged read) prunes to the touched dates."""
    (
        hourly_partials(events)
        .withColumn("bucket_date", F.to_date("bucket_hour"))
        .repartition("bucket_date")
        .write.mode("overwrite")
        .partitionBy("bucket_date")
        .parquet(out_dir)
    )


def refresh_rollup_mv(spark: SparkSession, delta_events: DataFrame, mv_dir: str) -> list[str]:
    """Patch the on-disk MV in place with a delta batch, rewriting ONLY the
    date partitions the delta touches (``partitionOverwriteMode=dynamic``).
    Returns the dirty partition names for test/audit visibility.

    Reads back exclusively the dirty dates (partition pruning on
    ``bucket_date``), merges with the delta partials, and overwrites those
    partitions; every clean partition's files are untouched on disk.
    """
    delta = hourly_partials(delta_events).withColumn(
        "bucket_date", F.to_date("bucket_hour")
    )
    dirty = [r.bucket_date for r in delta.select("bucket_date").distinct().collect()]
    if not dirty:  # empty micro-batch: nothing to patch
        return []

    mv = spark.read.parquet(mv_dir)
    dirty_rows = mv.filter(F.col("bucket_date").isin(dirty))
    patched = merge_partials(
        dirty_rows.unionByName(delta),
        ["bucket_date", "bucket_hour", "event_type"],
    ).select("bucket_hour", "event_type", "n", "sum_dec", "mn", "mx", "bucket_date")

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patched.write.mode("overwrite").partitionBy("bucket_date").parquet(mv_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return [str(d) for d in sorted(dirty)]


def stream_rollup_refresh(spark: SparkSession, delta_stream: DataFrame, mv_dir: str):
    """Maintain the on-disk MV from a STREAM of delta events: a
    ``foreachBatch`` sink that patches dirty date partitions per micro-batch.

    Replay safety: Structured Streaming re-delivers a micro-batch (same
    ``batch_id``) after a failure, and the partial-sum patch is NOT naturally
    idempotent — re-applying a batch would double-count. An applied-batch
    journal (``_applied.json``, swapped atomically with ``os.replace``) makes
    replays no-ops. The journal is written AFTER the partition overwrite, so
    a crash between the two re-applies the batch on restart — the same
    at-least-once window every non-transactional parquet sink has; closing
    it fully needs a transactional table format (or the versioned-pointer
    publication ``KeywordTopKServer`` uses for its O(k) state, which is
    practical there but would mean rewriting clean partitions here).
    """
    import json
    import os

    journal = os.path.join(mv_dir, "_applied.json")

    def _applied() -> list[int]:
        if not os.path.exists(journal):
            return []
        with open(journal) as f:
            return json.load(f)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        seen = _applied()
        if batch_id in seen:
            return  # epoch replay — already folded in
        refresh_rollup_mv(spark, batch_df, mv_dir)
        tmp = journal + ".tmp"
        with open(tmp, "w") as f:
            json.dump(seen + [batch_id], f)
        os.replace(tmp, journal)

    return _apply


def read_rollup_mv(spark: SparkSession, mv_dir: str) -> DataFrame:
    """Finalized view of the on-disk MV (what a dashboard reads)."""
    return _finalize(
        spark.read.parquet(mv_dir).drop("bucket_date"), "bucket_hour"
    )


def split_base_delta(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The deterministic (base, delta) split both query and tests use."""
    return events.filter(~_delta_pred()), events.filter(_delta_pred())


__all__ = [
    "hourly_partials",
    "merge_partials",
    "rollup_incremental_refresh",
    "rollup_cascade_daily",
    "write_rollup_mv",
    "refresh_rollup_mv",
    "read_rollup_mv",
    "split_base_delta",
    "_DELTA_COND",
]


# HLL lgConfigK=12 (Spark/Datasketches default): rsd = 1.04/sqrt(2^12)
_HLL_RSD = 0.01625


@register(
    "rollup_daily_users_hll",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bound
    FROM events GROUP BY 1
    """,
    doc="Mergeable HLL-sketch distinct-user rollup, day from hourly unions.",
)
def rollup_daily_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per day computed the way a 100 TB rollup must: the
    hourly MV layer stores a MERGEABLE HLL sketch column
    (``hll_sketch_agg``, a Datasketches binary — constant size per bucket),
    and the day layer is ``hll_union_agg`` over 24 sketches — no raw rescan
    and, unlike exact COUNT(DISTINCT), no shuffle of every distinct value:
    the exact form moves every (bucket, user) pair; the sketch moves 24
    fixed-size buffers per day, which is what survives a billion-user day.
    The same contract-oracle discipline as ``agg_approx_distinct``: the
    hashed output carries the exact count (audit lane, rescans raw — only
    to make the driver hash meaningful) and ``within_bound`` =
    |estimate − exact| <= 4·rsd·exact, pinned TRUE by the oracle; 4 sigma
    because the driver regenerates testdata each round (see the HLL band
    rationale at relational.py:agg_approx_distinct)."""
    events = t(spark, sf_dir, "events")
    hourly = events.groupBy(F.date_trunc("hour", "ts").alias("bucket_hour")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    daily_est = (
        hourly.groupBy(F.date_trunc("day", "bucket_hour").alias("bucket_day"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    daily_exact = events.groupBy(
        F.date_trunc("day", "ts").alias("bucket_day")
    ).agg(F.count_distinct("user_id").alias("exact_users"))
    return daily_est.join(F.broadcast(daily_exact), "bucket_day").select(
        "bucket_day",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users")).cast("double")
            <= 4 * _HLL_RSD * F.col("exact_users").cast("double")
        ).alias("within_bound"),
    )


@register(
    "rollup_anomalous_hours",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket_hour, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    trail AS (
      SELECT bucket_hour, event_type, n,
             CAST(SUM(n) OVER w AS BIGINT) AS s,
             CAST(SUM(n * n) OVER w AS BIGINT) AS q,
             CAST(COUNT(n) OVER w AS BIGINT) AS c
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_hour
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
    SELECT bucket_hour, event_type, n AS n_events,
           CAST((24 * n - s) * (24 * n - s) AS BIGINT) AS dev2,
           CAST(9 * (24 * q - s * s) AS BIGINT) AS bound,
           (24 * n - s) * (24 * n - s) > 9 * (24 * q - s * s) AS is_anomalous
    FROM trail WHERE c = 24
    """,
    doc="3-sigma trailing-24h anomaly flags over the hourly MV, all-integer.",
)
def rollup_anomalous_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly scan over the MV LAYER (never raw events): each hour's event
    count vs its trailing-24h baseline, flagged at 3 sigma — but in PURE
    INTEGER arithmetic: |n − S/24| > 3·σ with σ² = (24Q − S²)/576 rewrites
    to (24n − S)² > 9·(24Q − S²), so the oracle hashes the exact decision
    and both deviation terms, no float drift possible. The trailing window
    partitions by event_type and orders by bucket — it runs over the
    bucket-count-bound MV (720 rows/month regardless of corpus size), which
    is why dashboard-style sliding baselines are free once the MV exists.
    At extreme per-hour counts promote the squares to DECIMAL(38,0)
    (documented; BIGINT holds to ~6×10^8 events/hour/type)."""
    from pyspark.sql import Window as W

    hourly = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("bucket_hour"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket_hour")
        .rowsBetween(-24, -1)
    )
    trail = hourly.select(
        "bucket_hour",
        "event_type",
        "n",
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("q"),
        F.count("n").over(w).alias("c"),
    ).filter(F.col("c") == 24)
    dev = 24 * F.col("n") - F.col("s")
    bound = 9 * (24 * F.col("q") - F.col("s") * F.col("s"))
    return trail.select(
        "bucket_hour",
        "event_type",
        F.col("n").alias("n_events"),
        (dev * dev).alias("dev2"),
        bound.alias("bound"),
        (dev * dev > bound).alias("is_anomalous"),
    )

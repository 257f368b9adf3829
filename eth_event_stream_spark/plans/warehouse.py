"""Dimension maintenance: SCD2 history build and changelog MERGE apply.

The reference folds a totally-ordered event stream into evolving per-key
state (`eth_event_stream/src/sink.rs` reducer fold; SURVEY §2.2 B10) — the
warehouse-side twins of that fold are:

- **SCD2 history**: turn the ordered event log into slowly-changing-dimension
  type-2 validity intervals (one row per consecutive run of a key's state,
  with ``valid_from`` / ``valid_to`` / ``is_current``) — the gaps-and-islands
  rewrite, one shuffle on the key, two window passes over it.
- **MERGE apply**: apply an ordered changelog of full-row upserts and deletes
  onto a base snapshot (the ``MERGE INTO`` shape every lakehouse table format
  executes). The scale-relevant property: the base is touched only by a
  broadcast anti-join on the (small) set of changed keys — untouched base
  rows are never shuffled, deleted keys drop out, and the latest change wins
  per key, so applying a changelog is O(base scan + |changes|), not a
  base-sized shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import t
from .registry import register

_CUTOFF = "2024-01-20 00:00:00"


class OutOfOrderBatchError(RuntimeError):
    """A streaming maintainer received a micro-batch whose minimum order key
    is not past the frontier already folded into the published table.

    Both ``SnapshotMaintainer`` (latest-wins CDC) and ``SCD2Maintainer``
    (interval history) fold associatively only over ORDERED chunks — a late
    batch would silently let an older row overwrite a newer snapshot row, or
    fabricate a bogus open run for a user whose interval is already closed.
    The reference enforces its ordering contract with a panic
    (`eth_event_stream/src/sink.rs:13-21`, re-publish of a finalized block);
    this is the same fail-loud semantic, keyed on the max order-key frontier
    recorded in the versioned pointer (the pattern of ``FunnelReducer``'s
    max-block lane)."""


@register(
    "scd2_state_history",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, ts, event_id FROM events WHERE user_id < 60),
    marked AS (
      SELECT *, CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                     THEN 1 ELSE 0 END AS chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    islands AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM marked),
    runs AS (
      SELECT user_id, island, MIN(event_type) AS state,
             MIN(ts) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM islands GROUP BY user_id, island)
    SELECT user_id, state, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY island)
             AS valid_to,
           n_events,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY island) IS NULL
             AS is_current
    FROM runs
    """,
    doc="SCD2 validity intervals from the ordered event log.",
)
def scd2_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 type-2 history: one row per consecutive run of a user's
    event_type, with [valid_from, valid_to) intervals and an ``is_current``
    flag on the open run. Gaps-and-islands: change flag (lag) → island id
    (running sum) → per-island collapse → interval close (lead). Both window
    passes share the one hash-partition on user_id; no second shuffle.
    ``SCD2Maintainer`` is the incremental streaming twin; this full rebuild
    is its parity oracle."""
    return collapse_runs(
        event_runs(t(spark, sf_dir, "events").filter(F.col("user_id") < 60))
    )


def event_runs(events: DataFrame) -> DataFrame:
    """Collapse an event set to per-user RUNS (consecutive same-state spans):
    (user_id, state, valid_from, n_events), one row per island. The event-
    level half of the SCD2 build; ``collapse_runs`` closes the intervals."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    islands = events.select(
        "user_id", "event_type", "ts", "event_id"
    ).withColumn(
        "chg",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    ).withColumn(
        "island", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return islands.groupBy("user_id", "island").agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    ).drop("island")


def collapse_runs(runs: DataFrame) -> DataFrame:
    """Merge consecutive SAME-STATE runs per user and close the intervals —
    the same gaps-and-islands algebra as ``event_runs``, but over runs: this
    is what makes SCD2 maintenance INCREMENTAL (``SCD2Maintainer``): a new
    batch's runs concatenate with the user's open run and re-collapse in
    O(runs of touched users), never re-reading the closed history."""
    w = Window.partitionBy("user_id").orderBy("valid_from")
    marked = runs.withColumn(
        "chg",
        F.when(~F.lag("state").over(w).eqNullSafe(F.col("state")), 1).otherwise(0),
    ).withColumn(
        "island", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    merged = marked.groupBy("user_id", "island").agg(
        F.min("state").alias("state"),
        F.min("valid_from").alias("valid_from"),
        F.sum("n_events").alias("n_events"),
    )
    w_close = Window.partitionBy("user_id").orderBy("island")
    return merged.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w_close).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(w_close).isNull().alias("is_current"),
    )


def merge_apply(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply an ordered changelog onto a base snapshot (MERGE INTO):

    - the LATEST change per key wins (ordered by ``order_cols``);
    - latest op ``'D'`` deletes the key; any other op upserts the full row;
    - base rows whose key never appears in the changelog pass through via a
      broadcast ANTI join on the changed-key set — the base is scanned once
      and never shuffled, which is what makes a 100 TB snapshot mergeable
      with a GB-sized changelog.

    ``changes`` must carry the base columns plus ``op_col``; the result has
    exactly the base schema.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    touched = latest.select(*key_cols)
    untouched = base.join(F.broadcast(touched), key_cols, "left_anti")
    upserts = latest.filter(F.col(op_col) != F.lit("D")).select(*base.columns)
    return untouched.unionByName(upserts)


@register(
    "merge_changelog_upsert",
    oracle=f"""
    WITH base AS (
      SELECT user_id, event_type AS state, ts AS state_ts
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '{_CUTOFF}')
      WHERE rn = 1),
    chg AS (
      SELECT user_id, event_type AS state, ts AS state_ts,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             event_id
      FROM events WHERE ts >= TIMESTAMP '{_CUTOFF}'),
    latest AS (
      SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                                  ORDER BY state_ts DESC,
                                                           event_id DESC) AS rn
                     FROM chg) WHERE rn = 1)
    SELECT user_id, state, state_ts FROM base
    WHERE user_id NOT IN (SELECT user_id FROM latest)
    UNION ALL
    SELECT user_id, state, state_ts FROM latest WHERE op <> 'D'
    """,
    doc="MERGE INTO: ordered changelog of upserts/deletes onto a snapshot.",
)
def merge_changelog_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE shape end-to-end on the driver's data: base snapshot =
    each user's last state before the cutoff; changelog = the events after
    it, ``'error'`` mapped to a delete, everything else a full-row upsert.
    Latest change wins; deleted users drop out; untouched users pass through
    the broadcast anti-join (`merge_apply`)."""
    events = t(spark, sf_dir, "events")
    cutoff = F.lit(_CUTOFF).cast("timestamp")

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    base = (
        events.filter(F.col("ts") < cutoff)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("state_ts"),
        )
    )
    changes = events.filter(F.col("ts") >= cutoff).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("state_ts"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "event_id",
    )
    return merge_apply(
        base,
        changes,
        key_cols=["user_id"],
        order_cols=["state_ts", "event_id"],
    )


def _encode_frontier(values: tuple) -> str:
    """Type-tagged JSON for an order-key tuple, round-trippable through the
    one-line pointer file (timestamps as ISO text, ints/strs native)."""
    import datetime
    import json

    out = []
    for v in values:
        if isinstance(v, datetime.datetime):
            out.append(["ts", v.isoformat()])
        elif isinstance(v, datetime.date):
            out.append(["date", v.isoformat()])
        elif isinstance(v, (int, float, str)) and not isinstance(v, bool):
            out.append([type(v).__name__, v])
        else:
            raise TypeError(f"unsupported order-key type {type(v).__name__}")
    return json.dumps(out, separators=(",", ":"))


def _decode_frontier(s: str) -> tuple:
    import datetime
    import json

    out = []
    for kind, v in json.loads(s):
        if kind == "ts":
            out.append(datetime.datetime.fromisoformat(v))
        elif kind == "date":
            out.append(datetime.date.fromisoformat(v))
        else:
            out.append(v)
    return tuple(out)


def _check_order_frontier(
    table: "_VersionedTable", batch_df: DataFrame, order_cols: list[str]
) -> tuple | None:
    """Enforce the in-order delivery contract: the batch's MIN order-key
    tuple must be strictly past the published frontier (order keys are
    unique per event, so a tie means a replayed/duplicated row — fail
    loud, matching the reference sink's panic on re-publish). Returns the
    new frontier to record (the old one for an empty batch). One 1-row
    bounded agg on the micro-batch; the base table is never touched."""
    bounds = batch_df.agg(
        F.min(F.struct(*order_cols)).alias("lo"),
        F.max(F.struct(*order_cols)).alias("hi"),
    ).collect()[0]
    frontier = table._read_frontier()
    if bounds["lo"] is None:
        return frontier  # empty batch: publish advances the id, not the frontier
    lo, hi = tuple(bounds["lo"]), tuple(bounds["hi"])
    if frontier is not None and lo <= frontier:
        raise OutOfOrderBatchError(
            f"out-of-order micro-batch at {table.path}: batch min order key "
            f"{lo} is not past the published frontier {frontier} "
            f"(order cols {order_cols}); a late batch would silently "
            f"corrupt the maintained state — re-deliver in order"
        )
    return hi


class _VersionedTable:
    """Copy-on-write table with atomic versioned-pointer publication (the
    same swap discipline as ``KeywordTopKServer``): each update writes the
    FULL new table to a fresh version directory, then swaps the one-line
    ``CURRENT`` pointer (``os.replace``, atomic on POSIX) recording the
    applied batch id IN the pointer. That makes any foreachBatch sink built
    on it EXACTLY-ONCE: a replayed epoch sees its id already applied and
    no-ops, and a crash between version write and swap leaves the old
    pointer live, so the replay recomputes from the old table — no journal
    window (contrast ``stream_rollup_refresh``, which patches partitions in
    place and accepts an at-least-once window to avoid rewriting a
    fact-sized MV).

    ``retain`` keeps the last N superseded versions on disk (default 1 —
    the reader-in-flight grace copy), which doubles as TIME TRAVEL: every
    retained version is a consistent snapshot named by the batch id that
    produced it (``versions()`` lists them, ``as_of(batch_id)`` reads one) —
    the audit/debug/reproducibility read a lakehouse table format sells,
    here from nothing but directories and one pointer file."""

    _POINTER = "CURRENT"

    def __init__(self, path: str, retain: int = 1):
        self.path = path
        self.retain = retain

    def _read_pointer(self) -> tuple[str, int] | None:
        import os

        pointer = os.path.join(self.path, self._POINTER)
        if not os.path.exists(pointer):
            return None
        with open(pointer) as f:
            version, batch = f.read().strip().split("\t")[:2]
        return version, int(batch)

    def _read_frontier(self) -> tuple | None:
        """Max order-key tuple folded into the published table, or None for
        an unpublished table / a pre-frontier (2-field, legacy) pointer —
        legacy pointers stay readable and simply start unenforced, the same
        back-compat discipline as FunnelReducer's 3-column checkpoints."""
        import os

        pointer = os.path.join(self.path, self._POINTER)
        if not os.path.exists(pointer):
            return None
        with open(pointer) as f:
            fields = f.read().strip().split("\t")
        if len(fields) < 3:
            return None
        return _decode_frontier(fields[2])

    @staticmethod
    def _batch_of(version: str) -> int:
        return int(version[2:].rsplit("-", 1)[0])

    def _publish(
        self, df: DataFrame, batch_id: int, frontier: tuple | None = None
    ) -> None:
        import os
        import shutil

        os.makedirs(self.path, exist_ok=True)
        # MONOTONIC version suffix (max existing + 1), never the directory
        # entry COUNT (count-derived names collide after GC shrinks the
        # count — the bug family the composed crash soak exposed in
        # KeywordTopKServer and the r9 ANN fix removed from
        # AnnIndexManager). A mid-publish crash leaves an UNPOINTED
        # version dir for the same batch id: scrub it here — no reader
        # ever resolved it, and left in place it would outrank the genuine
        # previous version in the GC's grace-copy retention below.
        live = self._read_pointer()
        highest = -1
        for entry in os.listdir(self.path):
            if not entry.startswith("v-"):
                continue
            try:
                highest = max(highest, int(entry.rsplit("-", 1)[1]))
            except ValueError:
                continue
            if entry.startswith(f"v-{batch_id}-") and (
                live is None or entry != live[0]
            ):
                shutil.rmtree(os.path.join(self.path, entry), ignore_errors=True)
        version = f"v-{batch_id}-{highest + 1}"
        if os.path.exists(os.path.join(self.path, version)):
            raise FileExistsError(f"refusing to overwrite existing version {version}")
        df.write.parquet(os.path.join(self.path, version))
        tmp = os.path.join(self.path, self._POINTER + ".tmp")
        with open(tmp, "w") as f:
            f.write(f"{version}\t{batch_id}")
            if frontier is not None:
                f.write(f"\t{_encode_frontier(frontier)}")
        os.replace(tmp, os.path.join(self.path, self._POINTER))
        # GC: keep the live version plus the `retain` most recent superseded
        # ones (>=1 so an in-flight reader of the old pointer survives)
        keep = {version, self._POINTER}
        superseded = sorted(
            (e for e in os.listdir(self.path) if e not in keep),
            key=self._batch_of,
        )
        keep.update(superseded[-max(1, self.retain):])
        for entry in os.listdir(self.path):
            if entry not in keep:
                shutil.rmtree(os.path.join(self.path, entry), ignore_errors=True)

    def current(self, spark: SparkSession) -> DataFrame:
        ptr = self._read_pointer()
        if ptr is None:
            raise FileNotFoundError(f"no table published yet at {self.path}")
        import os

        return spark.read.parquet(os.path.join(self.path, ptr[0]))

    def versions(self) -> list[int]:
        """Batch ids of every readable snapshot, oldest first (the live
        version last) — the time-travel catalog."""
        import os

        if not os.path.isdir(self.path):
            return []
        return sorted(
            self._batch_of(e)
            for e in os.listdir(self.path)
            if e.startswith("v-")
        )

    def as_of(self, spark: SparkSession, batch_id: int) -> DataFrame:
        """Read the table exactly as published by ``batch_id`` (must be
        retained; see ``versions()``)."""
        import os

        for e in os.listdir(self.path):
            if e.startswith("v-") and self._batch_of(e) == batch_id:
                return spark.read.parquet(os.path.join(self.path, e))
        raise FileNotFoundError(
            f"version {batch_id} not retained at {self.path}; "
            f"available: {self.versions()}"
        )


class SnapshotMaintainer(_VersionedTable):
    """Streaming CDC apply: a ``foreachBatch`` sink that maintains a keyed
    snapshot table on disk by ``merge_apply``-ing each micro-batch of the
    changelog stream, published exactly-once via ``_VersionedTable``.

    The O(snapshot) rewrite per batch is the standard CDC trade for a
    DIMENSION table (small next to the facts); fact-sized state takes the
    dirty-partition patch path instead. Micro-batch boundaries must respect
    the changelog order (true of any append-ordered log source), since
    latest-wins folds associatively only over ordered chunks — and that
    contract is ENFORCED, not just documented: the max order-key frontier
    rides in the versioned pointer and a batch whose min order key is not
    past it raises ``OutOfOrderBatchError`` before anything is written
    (reference semantic: the sink's panic-on-republish,
    `eth_event_stream/src/sink.rs:13-21`).
    """

    def __init__(
        self,
        path: str,
        key_cols: list[str],
        order_cols: list[str],
        op_col: str = "op",
        retain: int = 1,
    ):
        super().__init__(path, retain=retain)
        self.key_cols = key_cols
        self.order_cols = order_cols
        self.op_col = op_col

    def bootstrap(self, base: DataFrame) -> None:
        """Seed the snapshot from an existing base table (batch id -1)."""
        self._publish(base, -1)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ptr = self._read_pointer()
        if ptr is not None and batch_id <= ptr[1]:
            return  # epoch replay: this batch is already in the snapshot
        new_frontier = _check_order_frontier(self, batch_df, self.order_cols)
        if ptr is not None:
            import os

            base = spark.read.parquet(os.path.join(self.path, ptr[0]))
        else:
            base = batch_df.drop(self.op_col).limit(0)
        snap = merge_apply(
            base, batch_df, self.key_cols, self.order_cols, self.op_col
        )
        self._publish(snap, batch_id, frontier=new_frontier)


class SCD2Maintainer(_VersionedTable):
    """Streaming SCD2: a ``foreachBatch`` sink that maintains the type-2
    history table incrementally as event batches arrive in time order.

    Per micro-batch (all DataFrame ops, O(touched users)):

    1. collapse the batch's events to runs (``event_runs``);
    2. CLOSED history rows pass through untouched — closed intervals are
       immutable, the defining SCD2 property;
    3. open rows of users NOT in the batch pass through untouched (broadcast
       ANTI join on the batch's user set);
    4. open rows of touched users re-enter as runs, concatenate with the
       batch runs, and re-collapse (``collapse_runs``) — a same-state batch
       extends the open run (n_events accumulates, valid_from survives), a
       changed state closes it at the new run's valid_from.

    The run-level re-collapse is the whole trick: SCD2 maintenance reduces
    to the SAME gaps-and-islands algebra applied to runs instead of events,
    so history never gets rebuilt and the per-batch cost is the batch plus
    one open row per touched user. Requires in-order event delivery — and
    ENFORCES it: the max (ts, event_id) frontier rides in the versioned
    pointer, and a batch whose earliest event is not past it raises
    ``OutOfOrderBatchError`` before anything is written (a late event for
    a user whose interval is already closed would otherwise fabricate a
    bogus open run; reference semantic: the ordered sink's panic,
    `eth_event_stream/src/sink.rs:13-21`). The batch twin
    `scd2_state_history` is the full-rebuild oracle."""

    ORDER_COLS = ["ts", "event_id"]

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ptr = self._read_pointer()
        if ptr is not None and batch_id <= ptr[1]:
            return  # epoch replay
        new_frontier = _check_order_frontier(self, batch_df, self.ORDER_COLS)
        batch_runs = event_runs(batch_df)
        if ptr is None:
            hist = collapse_runs(batch_runs)
        else:
            import os

            prev = spark.read.parquet(os.path.join(self.path, ptr[0]))
            touched = batch_runs.select("user_id").distinct()
            closed = prev.filter(~F.col("is_current"))
            open_rows = prev.filter(F.col("is_current"))
            open_untouched = open_rows.join(
                F.broadcast(touched), "user_id", "left_anti"
            )
            open_touched = open_rows.join(
                F.broadcast(touched), "user_id", "left_semi"
            ).select("user_id", "state", "valid_from", "n_events")
            merged = collapse_runs(open_touched.unionByName(batch_runs))
            hist = closed.unionByName(open_untouched).unionByName(merged)
        self._publish(hist, batch_id, frontier=new_frontier)


def scrub_keys(
    spark: SparkSession,
    table_dir: str,
    key_col: str,
    keys: list,
    partition_col: str,
) -> dict:
    """Targeted hard delete (the right-to-be-forgotten job): remove every
    row whose ``key_col`` is in ``keys`` from a ``partition_col``-partitioned
    parquet table, rewriting ONLY the partitions that contain those keys.

    Two-phase, both declarative:

    1. LOCATE — one scan, filter pushed to parquet (key-in-set predicate
       prunes on row-group stats), projecting just the partition values the
       keys live in. At 100 TB this is the cheap pass: column-pruned,
       predicate-pushed, and nothing is rewritten for partitions that come
       back empty.
    2. REWRITE — read back only the dirty partitions (directory pruning on
       ``partition_col``), drop the keys' rows, dynamic-partition-overwrite
       them in place. Clean partitions are untouched on disk — same
       discipline as the MV refresh (`matview.refresh_rollup_mv`), pointed
       at deletion instead of aggregation.

    Returns {"dirty_partitions": [...], "n_rows_scrubbed": int} for the
    audit trail a compliance job must leave.
    """
    df = spark.read.parquet(table_dir)
    hit = df.filter(F.col(key_col).isin(keys))
    dirty_rows = hit.groupBy(partition_col).count().collect()
    dirty = sorted(str(r[partition_col]) for r in dirty_rows)
    n_scrubbed = sum(r["count"] for r in dirty_rows)
    if not dirty:
        return {"dirty_partitions": [], "n_rows_scrubbed": 0}

    kept = (
        df.filter(F.col(partition_col).cast("string").isin(dirty))
        .filter(~F.col(key_col).isin(keys))
    )
    # dynamic overwrite only touches partitions PRESENT in the written data —
    # a partition whose every row is scrubbed must be removed explicitly
    kept_parts = {
        str(r[partition_col])
        for r in kept.select(partition_col).distinct().collect()
    }
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        kept.write.mode("overwrite").partitionBy(partition_col).parquet(table_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    import os
    import shutil

    for val in dirty:
        if val not in kept_parts:
            shutil.rmtree(
                os.path.join(table_dir, f"{partition_col}={val}"),
                ignore_errors=True,
            )
    return {"dirty_partitions": dirty, "n_rows_scrubbed": n_scrubbed}


__all__ = [
    "scd2_state_history",
    "event_runs",
    "collapse_runs",
    "merge_apply",
    "merge_changelog_upsert",
    "SnapshotMaintainer",
    "SCD2Maintainer",
    "scrub_keys",
]


@register(
    "pit_enrich_purchases",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, ts, event_id FROM events WHERE user_id < 60),
    marked AS (
      SELECT *, CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                     THEN 1 ELSE 0 END AS chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    islands AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM marked),
    hist AS (
      SELECT user_id, island, MIN(event_type) AS state, MIN(ts) AS valid_from,
             LEAD(MIN(ts)) OVER (PARTITION BY user_id ORDER BY island) AS valid_to
      FROM islands GROUP BY user_id, island),
    p AS (
      SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'purchase' AND user_id < 60
            AND ts >= TIMESTAMP '2024-01-25 00:00:00')
    SELECT p.user_id, p.event_id, p.ts, h.state AS state_at_purchase,
           h.valid_from AS state_since
    FROM p JOIN hist h
      ON h.user_id = p.user_id
     AND h.valid_from <= p.ts
     AND (h.valid_to IS NULL OR p.ts < h.valid_to)
    """,
    doc="Point-in-time enrichment: events joined to their SCD2 interval.",
)
def pit_enrich_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The point-in-time join feature stores exist for: each purchase is
    enriched with the user's SCD2 state AS OF the purchase instant —
    ``valid_from <= ts < valid_to`` — never a later state (training-serving
    skew / label leakage is exactly this join done wrong). Equi key on
    user_id with the interval predicate as a post-join filter, so Spark
    runs a plain hash join on the key and the range check costs nothing
    extra; the history side is the run-collapsed SCD2 table (one row per
    state span), not the raw log. A purchase's own event contributes the
    interval it opens (valid_from == ts when the purchase changes state),
    matching the reference's fold-then-read ordering within a block."""
    hist = scd2_state_history(spark, sf_dir)
    p = (
        t(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("user_id") < 60)
            & (F.col("ts") >= F.lit("2024-01-25 00:00:00").cast("timestamp"))
        )
        .select("user_id", "event_id", "ts")
    )
    h = hist.select(
        "user_id",
        F.col("state").alias("state_at_purchase"),
        F.col("valid_from").alias("state_since"),
        "valid_to",
    )
    return (
        p.join(h, "user_id")
        .filter(
            (F.col("state_since") <= F.col("ts"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
        )
        .select("user_id", "event_id", "ts", "state_at_purchase", "state_since")
    )


# --- release diff ------------------------------------------------------------
# The QA gate every dataset release runs before publication: WHAT changed
# between release N-1 and release N, by how much, and where. The reference's
# analog is the sink's exactly-once republish guard (`sink.rs:13-21`) — a
# release that silently differs from what its changelog implies is the batch-
# side version of a block republished with different contents.


def _release_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulated PREVIOUS release: a deterministic subset of ``documents``
    (doc_id % 17 == 3 absent — those become 'added'), with a deterministic
    content perturbation (doc_id % 13 == 5 carries reversed text — those
    become 'changed'). Derived, not stored: both engines rebuild it bit-
    identically from the same parquet."""
    d = t(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % 17 != 3).select(
        "doc_id",
        "lang",
        F.when(F.col("doc_id") % 13 == 5, F.reverse(F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def _release_curr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulated CURRENT release: ``documents`` minus doc_id % 19 == 7
    (those become 'removed')."""
    return t(spark, sf_dir, "documents").filter(F.col("doc_id") % 19 != 7).select(
        "doc_id", "lang", "text"
    )


def diff_release_rows(prev: DataFrame, curr: DataFrame) -> DataFrame:
    """Row-level diff of two releases keyed by doc_id: one row per doc that
    is 'added' (current only), 'removed' (previous only), 'changed' (both,
    content hash differs), or 'unchanged'. Content comparison is by md5 of
    the text so the join carries a 32-byte digest, never the document body —
    at 100 TB the shuffle moves (doc_id, hash, lang), not the corpus. One
    shuffle per side on doc_id; with both releases bucketed by doc_id the
    diff is shuffle-free (`test_plan_quality.py` pins the bucketed-join
    pattern elsewhere); ``diff_releases_pruned`` shows the fingerprint
    short-circuit that avoids even reading clean buckets."""
    p = prev.select(
        F.col("doc_id"),
        F.col("lang").alias("lang_p"),
        F.md5(F.col("text")).alias("h_p"),
    )
    c = curr.select(
        F.col("doc_id"),
        F.col("lang").alias("lang_c"),
        F.md5(F.col("text")).alias("h_c"),
    )
    return p.join(c, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("lang_c", "lang_p").alias("lang"),
        F.when(F.col("h_p").isNull(), F.lit("added"))
        .when(F.col("h_c").isNull(), F.lit("removed"))
        .when(F.col("h_p") != F.col("h_c"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


_DIFF_ORACLE = """
    WITH prev AS (
      SELECT doc_id, lang,
             md5(CASE WHEN doc_id % 13 = 5 THEN reverse(text) ELSE text END)
               AS h
      FROM documents WHERE doc_id % 17 != 3),
    curr AS (
      SELECT doc_id, lang, md5(text) AS h
      FROM documents WHERE doc_id % 19 != 7),
    d AS (
      SELECT COALESCE(c.doc_id, p.doc_id) AS doc_id,
             COALESCE(c.lang, p.lang) AS lang,
             CASE WHEN p.h IS NULL THEN 'added'
                  WHEN c.h IS NULL THEN 'removed'
                  WHEN p.h != c.h THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM prev p FULL OUTER JOIN curr c ON p.doc_id = c.doc_id)
    SELECT lang, status, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM d GROUP BY lang, status
"""


@register(
    "diff_releases",
    oracle=_DIFF_ORACLE,
    doc="Release-over-release diff: added/removed/changed/unchanged doc "
    "counts per language from a hash-only full-outer join of two releases.",
)
def diff_releases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release QA diff: (lang, status) doc counts between the previous and
    current release. The full-outer join compares md5 digests, so at scale
    the wide text column is pruned at the scan (only doc_id/lang/text-
    digest flow) and the aggregate is a map-side-combining count over the
    diff rows."""
    rows = diff_release_rows(
        _release_prev(spark, sf_dir), _release_curr(spark, sf_dir)
    )
    return rows.groupBy("lang", "status").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


@register(
    "diff_releases_pruned",
    oracle=_DIFF_ORACLE,
    doc="Fingerprint-pruned release diff: bucket fingerprints prove clean "
    "buckets identical so only dirty buckets are row-diffed; same answer "
    "(and oracle) as diff_releases.",
)
def diff_releases_pruned(spark: SparkSession, sf_dir: str, n_buckets: int = 32) -> DataFrame:
    """Fingerprint-short-circuited diff: the 100 TB answer path.

    Pass 1 computes one order-independent FINGERPRINT per doc_id bucket and
    side (sum of a 56-bit slice of each row's md5(doc_id || hash) — an
    order- and partition-independent fold, and counts so add/remove can't
    cancel). The per-row signature is DECIMAL(38,0) so the per-bucket sum
    cannot overflow: 56-bit values summed as int64 blow past 2^63 at a few
    hundred rows per bucket, and under Spark's default ANSI mode that is an
    ArithmeticException at exactly the scale this path exists for; a
    decimal(38,0) sum stays exact to ~1.4e21 rows/bucket. Buckets whose
    (fingerprint, count) match on both sides are
    proven identical and are NEVER row-diffed. Pass 2 runs the row diff of
    ``diff_release_rows`` only over the dirty buckets (predicate pushed to
    both scans), then the clean buckets contribute their 'unchanged' counts
    from the pass-1 aggregates — so a release where 1% of buckets changed
    reads 1% of the rows twice and 99% once, instead of full-outer-joining
    two whole releases. Equivalence with the direct diff is pinned in
    ``tests/test_warehouse.py``."""
    return diff_releases_pruned_of(
        _release_prev(spark, sf_dir), _release_curr(spark, sf_dir), n_buckets
    )


def release_bucket_fingerprints(df: DataFrame, n_buckets: int = 32) -> DataFrame:
    """The ``n_buckets``-row fingerprint table a release SHIPS beside its
    data (the integrity-manifest pattern): one order- and
    partition-independent fingerprint per doc_id bucket — the decimal(38,0)
    sum of a 56-bit slice of each row's md5(doc_id || content-hash), plus
    the row count so add/remove cannot cancel. Written once at release
    time, it lets every later diff prove clean buckets identical from two
    tiny tables WITHOUT rescanning either release — the O(dirty fraction)
    diff the pruned path exists for."""
    return (
        df.select(
            (F.col("doc_id") % n_buckets).alias("bucket"),
            F.conv(
                F.substring(F.md5(F.concat_ws("|", "doc_id", F.md5("text"))), 1, 14),
                16,
                10,
            )
            .cast("decimal(38,0)")
            .alias("sig"),
        )
        .groupBy("bucket")
        .agg(F.sum("sig").alias("fp"), F.count("*").alias("n"))
    )


def diff_releases_pruned_of(
    prev: DataFrame,
    curr: DataFrame,
    n_buckets: int = 32,
    fp_prev: DataFrame | None = None,
    fp_curr: DataFrame | None = None,
    bucket_col: str | None = None,
) -> DataFrame:
    """df-level core of ``diff_releases_pruned`` — diff ANY two releases
    (columns ``doc_id, lang, text``) with the fingerprint short-circuit.
    The registered query wires it to the synthetic release pair; production
    calls this directly with its own releases.

    ``fp_prev`` / ``fp_curr`` accept PERSISTED fingerprint tables
    (``release_bucket_fingerprints`` schema) shipped with each release —
    then the diff never scans clean data at all: two n_buckets-row reads
    pick the dirty buckets and only those buckets' rows are read and
    row-diffed (with a bucket-partitioned release layout the clean files
    are partition-pruned, not just filter-skipped). Without persisted
    fingerprints the fingerprint pass itself scans both releases once, so
    pruning only repays its overhead when row-diff work (shuffle + join)
    dominates scan cost; the synthetic registered pair is the worst case —
    UNIFORM changes dirty every bucket and pruning pays pure overhead
    (both regimes measured in BENCH_SF1.md)."""
    fp_p = (
        fp_prev
        if fp_prev is not None
        else release_bucket_fingerprints(prev, n_buckets)
    ).select("bucket", F.col("fp").alias("fp_p"), F.col("n").alias("n_p"))
    fp_c = (
        fp_curr
        if fp_curr is not None
        else release_bucket_fingerprints(curr, n_buckets)
    ).select("bucket", F.col("fp").alias("fp_c"), F.col("n").alias("n_c"))
    marks = fp_p.join(fp_c, "bucket", "full_outer")
    dirty = [
        r["bucket"]
        for r in marks.filter(
            ~(F.col("fp_p").eqNullSafe(F.col("fp_c")) & F.col("n_p").eqNullSafe(F.col("n_c")))
        )
        .select("bucket")
        .collect()
    ]
    # With a bucket-PARTITIONED release layout, ``bucket_col`` names the
    # materialized partition column (== doc_id % n_buckets by layout
    # construction) so the dirty/clean predicates become PartitionFilters —
    # clean buckets' files are never listed, let alone read. Deriving the
    # bucket from doc_id is semantically identical but only filter-skips.
    bucket = (
        F.col(bucket_col) if bucket_col is not None else F.col("doc_id") % n_buckets
    )
    dirty_rows = diff_release_rows(
        prev.filter(bucket.isin(dirty)),
        curr.filter(bucket.isin(dirty)),
    ).groupBy("lang", "status").agg(F.count("*").cast("bigint").alias("n_docs"))
    clean_rows = (
        curr.filter(~bucket.isin(dirty))
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .select("lang", F.lit("unchanged").alias("status"), "n_docs")
    )
    return (
        dirty_rows.unionByName(clean_rows)
        .groupBy("lang", "status")
        .agg(F.sum("n_docs").cast("bigint").alias("n_docs"))
    )

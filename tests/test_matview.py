"""Incremental materialized-view maintenance (plans/matview.py).

Proves the three claims the module makes:

1. the incremental refresh is bit-identical to a full recompute (the query
   registry's oracle covers the in-memory form; here the PERSISTED cycle —
   write base MV, patch with a delta, read back — is checked too);
2. a refresh rewrites ONLY the dirty date partitions on disk (clean
   partitions' files are byte-for-byte untouched: same names, sizes, mtimes);
3. the daily cascade from hourly partials equals a direct daily aggregate.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eth_event_stream_spark.plans.catalog import t
from eth_event_stream_spark.plans.matview import (
    hourly_partials,
    read_rollup_mv,
    refresh_rollup_mv,
    rollup_incremental_refresh,
    split_base_delta,
    write_rollup_mv,
    _finalize,
)


def _rows(df, keys):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda r: tuple(str(x) for x in r[: len(keys)]),
    )


def _partition_files(mv_dir: str) -> dict[str, dict[str, tuple[int, float]]]:
    """{partition_dir: {file: (size, mtime)}} for every bucket_date partition."""
    out = {}
    for d in sorted(os.listdir(mv_dir)):
        if not d.startswith("bucket_date="):
            continue
        pdir = os.path.join(mv_dir, d)
        out[d] = {
            f: (os.path.getsize(os.path.join(pdir, f)), os.path.getmtime(os.path.join(pdir, f)))
            for f in sorted(os.listdir(pdir))
            if f.endswith(".parquet")
        }
    return out


def test_refresh_cycle_equals_full_recompute(spark, sf_dir, tmp_path):
    events = t(spark, sf_dir, "events")
    base, delta = split_base_delta(events)

    mv_dir = str(tmp_path / "rollup_mv")
    write_rollup_mv(base, mv_dir)
    refresh_rollup_mv(spark, delta, mv_dir)

    got = read_rollup_mv(spark, mv_dir)
    want = _finalize(hourly_partials(events), "bucket_hour")
    keys = ["bucket_hour", "event_type"]
    assert _rows(got, keys) == _rows(want, keys)

    # and the in-memory query form agrees with the persisted cycle
    q = rollup_incremental_refresh(spark, sf_dir)
    assert _rows(q, keys) == _rows(want, keys)


def test_refresh_touches_only_dirty_partitions(spark, sf_dir, tmp_path):
    events = t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-29 00:00:00").cast("timestamp")
    base = events.filter(F.col("ts") < cutoff)
    delta = events.filter(F.col("ts") >= cutoff)  # a 2-day ingest batch

    mv_dir = str(tmp_path / "rollup_mv_dirty")
    write_rollup_mv(base, mv_dir)
    before = _partition_files(mv_dir)

    dirty = refresh_rollup_mv(spark, delta, mv_dir)
    after = _partition_files(mv_dir)

    assert dirty == ["2024-01-29", "2024-01-30"]
    dirty_parts = {f"bucket_date={d}" for d in dirty}
    clean_before = {k: v for k, v in before.items() if k not in dirty_parts}
    clean_after = {k: v for k, v in after.items() if k not in dirty_parts}
    # every pre-existing clean partition survives byte-identical
    assert clean_before == clean_after and len(clean_before) == 28
    # the dirty dates exist after the refresh and carry the merged content
    assert dirty_parts <= set(after)

    got = read_rollup_mv(spark, mv_dir)
    want = _finalize(hourly_partials(events), "bucket_hour")
    keys = ["bucket_hour", "event_type"]
    assert _rows(got, keys) == _rows(want, keys)


def test_streaming_ingest_refreshes_mv_with_parity(spark, sf_dir, tmp_path):
    """Stream==batch for the MV: base MV on disk, delta events streamed
    file-by-file through the foreachBatch refresher; the final MV equals a
    full recompute, and replaying an already-journaled batch is a no-op."""
    from eth_event_stream_spark.plans.matview import stream_rollup_refresh

    events = t(spark, sf_dir, "events")
    base, delta = split_base_delta(events)

    mv_dir = str(tmp_path / "rollup_mv_stream")
    write_rollup_mv(base, mv_dir)

    src = tmp_path / "delta_src"
    delta.repartition(4).write.parquet(str(src))

    sdf = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    apply_batch = stream_rollup_refresh(spark, sdf, mv_dir)
    q = (
        sdf.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ck_mv"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    keys = ["bucket_hour", "event_type"]
    want = _rows(_finalize(hourly_partials(events), "bucket_hour"), keys)
    assert _rows(read_rollup_mv(spark, mv_dir), keys) == want

    # epoch replay: re-applying a journaled batch id must not double-count
    apply_batch(spark.read.parquet(str(src)), 0)
    assert _rows(read_rollup_mv(spark, mv_dir), keys) == want


def test_refresh_dirty_split_is_broadcast(spark, sf_dir):
    """The clean/dirty MV split must be two broadcast joins on the dirty-key
    set (semi + anti), never a sort-merge shuffle of the MV."""
    plan = (
        rollup_incremental_refresh(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") == 2
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_hll_union_of_hours_equals_direct_daily_sketch(spark, sf_dir):
    """The property the sketch MV rests on: unioning the 24 hourly sketches
    gives the SAME estimate as sketching the day directly (Datasketches HLL
    union is lossless over sketches of the same config) — so the day layer
    never needs the raw data."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    via_hours = (
        events.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy(F.date_trunc("day", "h").alias("d"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    direct = events.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    )
    a = {r.d: r.est for r in via_hours.collect()}
    b = {r.d: r.est for r in direct.collect()}
    assert a == b and len(a) == 30


def test_daily_cascade_equals_direct_daily(spark, sf_dir):
    from eth_event_stream_spark.plans.matview import rollup_cascade_daily

    got = rollup_cascade_daily(spark, sf_dir).drop("n_active_hours")
    events = t(spark, sf_dir, "events")
    want = (
        events.groupBy(
            F.date_trunc("day", "ts").alias("bucket_day"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(16,4)")
            .cast("double")
            .alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    keys = ["bucket_day", "event_type"]
    assert _rows(got, keys) == _rows(want, keys)

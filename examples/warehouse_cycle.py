#!/usr/bin/env python
"""Warehouse maintenance cycle example: the round-7 state-keeping surface
end to end on one SparkSession.

1. LOAD (once): build the hourly rollup MV from the historical base and
   persist it partitioned by bucket date (plans/matview.py); seed the user
   dimension snapshot and the SCD2 history from the same base
   (plans/warehouse.py).
2. INGEST (per cycle): a late/new event batch arrives —
   - the MV refresh patches ONLY the dirty date partitions (dynamic
     partition overwrite; clean partitions stay byte-identical on disk);
   - the CDC apply merges the batch's latest-wins changelog into the
     snapshot (broadcast anti join on changed keys, exactly-once
     versioned-pointer publish);
   - the SCD2 maintainer extends/closes open intervals by re-collapsing
     runs for the touched users only.
3. AUDIT + OPTIMIZE (per release): key-skew report (salt recommendations),
   table stats, and small-file compaction of the fragmented event log into
   range-clustered, footer-prunable files (plans/layout.py).

Run: python examples/warehouse_cycle.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from eth_event_stream_spark.plans.contracts import EVENT_CONTRACT, contract_split
from eth_event_stream_spark.plans.layout import compact_parquet_dir
from eth_event_stream_spark.plans.matview import (
    hourly_partials,
    read_rollup_mv,
    refresh_rollup_mv,
    write_rollup_mv,
    _finalize,
)
from eth_event_stream_spark.plans.profiling import profile_key_skew
from eth_event_stream_spark.plans.warehouse import (
    SCD2Maintainer,
    SnapshotMaintainer,
    event_runs,
    collapse_runs,
)
from eth_event_stream_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="warehouse_cycle", shuffle_partitions=16)
    work = tempfile.mkdtemp(prefix="warehouse_cycle_")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    # time-cutoff split: the state-keeping ops (CDC snapshot, SCD2) require
    # IN-ORDER delivery — a new batch's events must postdate the applied
    # history (the same contract the reference's ordered sink enforces).
    # The MV partial-sum algebra is commutative, so it would tolerate the
    # out-of-order split_base_delta scatter too; the cutoff keeps one batch
    # serving all three consumers.
    cutoff = F.lit("2024-01-29 00:00:00").cast("timestamp")
    base = events.filter(F.col("ts") < cutoff)
    delta = events.filter(F.col("ts") >= cutoff)

    # -- 1. LOAD ------------------------------------------------------------
    mv_dir = os.path.join(work, "rollup_mv")
    write_rollup_mv(base, mv_dir)
    print(f"MV loaded: {spark.read.parquet(mv_dir).count()} hourly partials")

    snap = SnapshotMaintainer(
        os.path.join(work, "user_snapshot"),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
    )
    base_users = base.select(
        "user_id", F.col("event_type").alias("state"), "ts", "event_id"
    ).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        ),
    ).filter("_rn = 1").drop("_rn")
    snap.bootstrap(base_users)

    scd2 = SCD2Maintainer(os.path.join(work, "scd2_history"))
    scd2(base.select("user_id", "event_type", "ts", "event_id"), 0)
    print(f"SCD2 seeded: {scd2.current(spark).count()} intervals")

    # -- 2. INGEST the delta batch ------------------------------------------
    # acceptance gate first: quarantine contract violations, ingest the rest
    clean_delta, quarantined = contract_split(delta, EVENT_CONTRACT)
    n_q = quarantined.count()
    print(f"contract gate: {n_q} rows quarantined "
          f"({delta.count()} arrived)")
    delta = clean_delta

    dirty = refresh_rollup_mv(spark, delta, mv_dir)
    print(f"MV refresh touched {len(dirty)} dirty dates (of 30)")
    full = _finalize(hourly_partials(events), "bucket_hour")
    assert read_rollup_mv(spark, mv_dir).count() == full.count()

    changelog = delta.select(
        "user_id", F.col("event_type").alias("state"), "ts", "event_id"
    ).withColumn("op", F.lit("U"))
    snap(changelog, 1)
    print(f"snapshot upserted: {snap.current(spark).count()} users")

    scd2(delta.select("user_id", "event_type", "ts", "event_id"), 1)
    hist = scd2.current(spark)
    rebuilt = collapse_runs(event_runs(events.select("user_id", "event_type", "ts", "event_id")))
    assert hist.count() == rebuilt.count(), "incremental SCD2 != rebuild"
    print(f"SCD2 maintained: {hist.count()} intervals == full rebuild")

    # -- 3. AUDIT + OPTIMIZE ------------------------------------------------
    print("key skew (salt recommendations):")
    for r in profile_key_skew(spark, sf_dir).orderBy(F.desc("n_rows")).collect():
        print(f"  {r.key:10s} rows={r.n_rows:<7d} share_ppm={r.share_ppm:<7d} "
              f"hot={r.hot} salt={r.recommended_salt}")

    frag = os.path.join(work, "fragmented_events")
    events.repartition(48).write.parquet(frag)
    stats = compact_parquet_dir(
        spark, frag, os.path.join(work, "compacted_events"),
        target_bytes=1 << 20, sort_cols=["ts"],
    )
    print(f"compacted {stats['n_files_in']} files "
          f"({stats['bytes_in']} B) -> {stats['n_files_out']} range-clustered files")

    spark.stop()
    print("warehouse cycle complete")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")

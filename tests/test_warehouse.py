"""Dimension maintenance (plans/warehouse.py): MERGE semantics + SCD2 shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_event_stream_spark.plans.warehouse import (
    merge_apply,
    merge_changelog_upsert,
    scd2_state_history,
)


def test_merge_apply_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    # key 1: updated twice (latest wins); key 2: deleted; key 3: untouched;
    # key 4: inserted then deleted (never lands); key 5: deleted then
    # re-inserted (lands — latest wins over the delete)
    changes = spark.createDataFrame(
        [
            (1, "a1", 10, "U"),
            (1, "a2", 20, "U"),
            (2, "b", 11, "D"),
            (4, "d", 12, "U"),
            (4, "d", 13, "D"),
            (5, "e", 14, "D"),
            (5, "e2", 15, "U"),
        ],
        ["k", "v", "seq", "op"],
    )
    got = sorted(
        tuple(r)
        for r in merge_apply(
            base, changes, key_cols=["k"], order_cols=["seq"]
        ).collect()
    )
    assert got == [(1, "a2"), (3, "c"), (5, "e2")]


def test_merge_untouched_base_path_is_broadcast_anti(spark, sf_dir):
    plan = merge_changelog_upsert(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_scd2_intervals_tile_each_users_timeline(spark, sf_dir):
    hist = scd2_state_history(spark, sf_dir).cache()
    try:
        rows = hist.collect()
        by_user: dict[int, list] = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        events = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .filter(F.col("user_id") < 60)
            .groupBy("user_id")
            .count()
            .collect()
        )
        n_events = {r.user_id: r["count"] for r in events}
        assert set(by_user) == set(n_events)
        for uid, ivs in by_user.items():
            ivs.sort(key=lambda r: r.valid_from)
            # exactly one open (current) interval, and it is the last one
            assert [r.is_current for r in ivs].count(True) == 1
            assert ivs[-1].is_current and ivs[-1].valid_to is None
            # intervals tile: each valid_to equals the next valid_from
            for a, b in zip(ivs, ivs[1:]):
                assert a.valid_to == b.valid_from
            # consecutive runs actually changed state
            for a, b in zip(ivs, ivs[1:]):
                assert a.state != b.state
            # run lengths account for every event of the user
            assert sum(r.n_events for r in ivs) == n_events[uid]
    finally:
        hist.unpersist()

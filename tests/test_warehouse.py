"""Dimension maintenance (plans/warehouse.py): MERGE semantics + SCD2 shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_event_stream_spark.plans.warehouse import (
    merge_apply,
    merge_changelog_upsert,
    scd2_state_history,
)


def _rows(df, keys=None):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda r: tuple(str(x) for x in r),
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


def test_snapshot_maintainer_streaming_cdc(spark, tmp_path):
    """Stream a 3-chunk ordered changelog through SnapshotMaintainer: the
    published snapshot equals a one-shot merge_apply of the whole log onto
    the bootstrap base, and replaying an applied epoch is a no-op."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from eth_event_stream_spark.plans.warehouse import SnapshotMaintainer

    chunks = [
        [(1, "a1", 10, "U"), (2, "b", 11, "U"), (5, "e", 12, "U")],
        [(2, "b", 20, "D"), (4, "d", 21, "U"), (1, "a2", 22, "U")],
        [(5, "e", 30, "D"), (5, "e2", 31, "U"), (6, "f", 32, "U")],
    ]
    cols = ["k", "v", "seq", "op"]
    arrow_schema = pa.schema(
        [("k", pa.int64()), ("v", pa.string()), ("seq", pa.int64()), ("op", pa.string())]
    )
    src = tmp_path / "cdc_log"
    src.mkdir()
    # one file per chunk, mtimes ascending so the file source delivers the
    # chunks in changelog order (the ordered-log contract)
    now = time.time()
    for i, rows in enumerate(chunks):
        f = src / f"chunk-{i}.parquet"
        pq.write_table(
            pa.Table.from_pylist([dict(zip(cols, r)) for r in rows], schema=arrow_schema),
            str(f),
        )
        os.utime(f, (now - 30 + i * 10, now - 30 + i * 10))

    snap_dir = str(tmp_path / "dim_snapshot")
    maintainer = SnapshotMaintainer(
        snap_dir, key_cols=["k"], order_cols=["seq"], op_col="op"
    )
    base = spark.createDataFrame([(3, "c", 0)], ["k", "v", "seq"])
    maintainer.bootstrap(base)

    changelog_schema = spark.createDataFrame(
        [(1, "x", 1, "U")], cols
    ).schema
    sdf = (
        spark.readStream.schema(changelog_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        sdf.writeStream.foreachBatch(maintainer)
        .option("checkpointLocation", str(tmp_path / "ck_cdc"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    def _snap_rows():
        return sorted(
            (r.k, r.v) for r in maintainer.current(spark).select("k", "v").collect()
        )

    want_df = merge_apply(
        base,
        spark.read.parquet(str(src)),
        key_cols=["k"],
        order_cols=["seq"],
    )
    want = sorted((r.k, r.v) for r in want_df.select("k", "v").collect())
    assert _snap_rows() == want == [(1, "a2"), (3, "c"), (4, "d"), (5, "e2"), (6, "f")]

    # epoch replay: re-delivering an already-applied batch id must no-op
    replay = spark.createDataFrame(
        [(1, "GHOST", 99, "U")], cols
    )
    maintainer(replay, 0)
    assert _snap_rows() == want


def test_versioned_table_time_travel(spark, tmp_path):
    """retain=N keeps the last N superseded snapshots readable: versions()
    lists them and as_of(batch_id) reproduces each publish exactly; beyond
    the retention depth, GC drops them and as_of raises."""
    from eth_event_stream_spark.plans.warehouse import SnapshotMaintainer

    m = SnapshotMaintainer(
        str(tmp_path / "tt_snap"), key_cols=["k"], order_cols=["seq"], retain=2
    )
    cols = ["k", "v", "seq", "op"]
    m(spark.createDataFrame([(1, "a", 1, "U")], cols), 0)
    m(spark.createDataFrame([(2, "b", 2, "U")], cols), 1)
    m(spark.createDataFrame([(1, "a2", 3, "U"), (3, "c", 4, "U")], cols), 2)
    assert m.versions() == [0, 1, 2]

    def rows(df):
        return sorted((r.k, r.v) for r in df.select("k", "v").collect())

    assert rows(m.as_of(spark, 0)) == [(1, "a")]
    assert rows(m.as_of(spark, 1)) == [(1, "a"), (2, "b")]
    assert rows(m.as_of(spark, 2)) == rows(m.current(spark)) == [
        (1, "a2"), (2, "b"), (3, "c"),
    ]

    m(spark.createDataFrame([(4, "d", 5, "U")], cols), 3)
    assert m.versions() == [1, 2, 3]  # version 0 aged out (retain=2)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        m.as_of(spark, 0)


def test_scd2_maintainer_streaming_parity(spark, sf_dir, tmp_path):
    """Incremental SCD2 == full rebuild: stream the (user_id < 60) events in
    three time-ordered chunks through SCD2Maintainer; the maintained history
    must equal scd2_state_history's one-shot build, and a replayed epoch is
    a no-op. Also pins the incremental invariant directly: closed rows of
    the earlier publishes survive byte-identical in the final history."""
    import os
    import time

    from eth_event_stream_spark.plans.warehouse import SCD2Maintainer

    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") < 60)
        .select("user_id", "event_type", "ts", "event_id")
    )
    cut1, cut2 = "2024-01-11 00:00:00", "2024-01-21 00:00:00"
    chunks = [
        events.filter(F.col("ts") < cut1),
        events.filter((F.col("ts") >= cut1) & (F.col("ts") < cut2)),
        events.filter(F.col("ts") >= cut2),
    ]
    src = tmp_path / "scd2_log"
    src.mkdir()
    now = time.time()
    for i, chunk in enumerate(chunks):
        cdir = tmp_path / f"chunk{i}"
        chunk.coalesce(1).write.parquet(str(cdir))
        part = next(p for p in os.listdir(cdir) if p.endswith(".parquet"))
        dst = src / f"chunk-{i}.parquet"
        os.rename(cdir / part, dst)
        os.utime(dst, (now - 30 + i * 10, now - 30 + i * 10))

    hist_dir = str(tmp_path / "scd2_hist")
    maintainer = SCD2Maintainer(hist_dir)
    sdf = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        sdf.writeStream.foreachBatch(maintainer)
        .option("checkpointLocation", str(tmp_path / "ck_scd2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    keys = ["user_id", "valid_from"]
    got = _rows(maintainer.current(spark), keys)
    want = _rows(scd2_state_history(spark, sf_dir), keys)
    assert got == want

    # epoch replay must not mutate the history
    maintainer(chunks[0], 0)
    assert _rows(maintainer.current(spark), keys) == want


def test_snapshot_maintainer_rejects_out_of_order_batch(spark, tmp_path):
    """The in-order contract is ENFORCED, not documented: a batch whose min
    order key is not past the published frontier raises OutOfOrderBatchError
    BEFORE anything is written — the snapshot, pointer, and version list are
    untouched (reference semantic: sink.rs:13-21 panic-on-republish)."""
    import pytest

    from eth_event_stream_spark.plans.warehouse import (
        OutOfOrderBatchError,
        SnapshotMaintainer,
    )

    cols = ["k", "v", "seq", "op"]
    m = SnapshotMaintainer(
        str(tmp_path / "ooo_snap"), key_cols=["k"], order_cols=["seq"]
    )
    m(spark.createDataFrame([(1, "a", 10, "U"), (2, "b", 11, "U")], cols), 0)

    def rows():
        return sorted((r.k, r.v) for r in m.current(spark).select("k", "v").collect())

    want = [(1, "a"), (2, "b")]
    assert rows() == want

    # late batch: seq 5 < frontier 11 — the stale row would roll k=1 BACK
    with pytest.raises(OutOfOrderBatchError, match="not past the published frontier"):
        m(spark.createDataFrame([(1, "STALE", 5, "U")], cols), 1)
    assert rows() == want and m.versions() == [0]

    # tie on the full order key is also a violation (keys are unique per event)
    with pytest.raises(OutOfOrderBatchError):
        m(spark.createDataFrame([(3, "tie", 11, "U")], cols), 1)
    assert rows() == want and m.versions() == [0]

    # an in-order batch then proceeds normally; empty batch keeps the frontier
    m(spark.createDataFrame([(1, "a2", 12, "U")], cols), 1)
    assert rows() == [(1, "a2"), (2, "b")]
    empty = spark.createDataFrame([(0, "", 0, "")], cols).limit(0)
    m(empty, 2)
    with pytest.raises(OutOfOrderBatchError):
        m(spark.createDataFrame([(9, "z", 12, "U")], cols), 3)  # still <= 12
    m(spark.createDataFrame([(9, "z", 13, "U")], cols), 3)
    assert rows() == [(1, "a2"), (2, "b"), (9, "z")]


def test_scd2_maintainer_rejects_out_of_order_batch(spark, tmp_path):
    """A late event batch for SCD2 raises instead of fabricating a bogus
    open run for a user whose interval is already closed."""
    import datetime

    import pytest

    from eth_event_stream_spark.plans.warehouse import (
        OutOfOrderBatchError,
        SCD2Maintainer,
    )

    cols = ["user_id", "event_type", "ts", "event_id"]

    def ev(uid, st, day, eid):
        return (uid, st, datetime.datetime(2024, 1, day), eid)

    m = SCD2Maintainer(str(tmp_path / "ooo_scd2"))
    m(spark.createDataFrame([ev(1, "view", 1, 100), ev(1, "cart", 3, 101)], cols), 0)
    hist0 = _rows(m.current(spark))

    # late batch: day 2 sits INSIDE the already-built history — would
    # fabricate a bogus open "view" run after the closed one
    with pytest.raises(OutOfOrderBatchError, match="not past the published frontier"):
        m(spark.createDataFrame([ev(1, "view", 2, 99)], cols), 1)
    assert _rows(m.current(spark)) == hist0 and m.versions() == [0]

    # same ts but HIGHER event_id is in order (the tuple is the key)
    m(spark.createDataFrame([ev(1, "cart", 3, 102), ev(2, "buy", 4, 103)], cols), 1)
    cur = m.current(spark)
    assert cur.filter((F.col("user_id") == 1) & F.col("is_current")).count() == 1
    # the same-state late-day-3 event EXTENDED the open cart run
    assert (
        cur.filter((F.col("user_id") == 1) & F.col("is_current")).collect()[0].n_events
        == 2
    )


def test_frontier_pointer_back_compat(spark, tmp_path):
    """A pre-frontier (2-field, legacy) pointer stays readable: the frontier
    reads as None, the first new batch is accepted unenforced and records
    the frontier going forward."""
    import os

    from eth_event_stream_spark.plans.warehouse import SnapshotMaintainer

    cols = ["k", "v", "seq", "op"]
    m = SnapshotMaintainer(
        str(tmp_path / "legacy_snap"), key_cols=["k"], order_cols=["seq"]
    )
    m(spark.createDataFrame([(1, "a", 10, "U")], cols), 0)
    # rewrite the pointer in the legacy 2-field format
    ptr = os.path.join(m.path, m._POINTER)
    with open(ptr) as f:
        version, batch = f.read().strip().split("\t")[:2]
    with open(ptr, "w") as f:
        f.write(f"{version}\t{batch}")
    assert m._read_frontier() is None

    # a batch that WOULD violate the lost frontier is accepted (unenforced)
    m(spark.createDataFrame([(2, "b", 5, "U")], cols), 1)
    # ...and enforcement resumes from the new frontier
    assert m._read_frontier() == (5,)
    import pytest

    from eth_event_stream_spark.plans.warehouse import OutOfOrderBatchError

    with pytest.raises(OutOfOrderBatchError):
        m(spark.createDataFrame([(3, "c", 4, "U")], cols), 2)


def test_scrub_keys_rewrites_only_dirty_partitions(spark, sf_dir, tmp_path):
    """Targeted delete: scrubbing a key set rewrites only the partitions
    containing it (clean partitions byte-identical), removes a partition
    whose rows are ALL scrubbed, and leaves exactly the non-key rows."""
    import os

    from eth_event_stream_spark.plans.warehouse import scrub_keys

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    table = str(tmp_path / "events_by_day")
    (
        events.withColumn("day", F.to_date("ts"))
        .repartition("day")
        .write.partitionBy("day")
        .parquet(table)
    )

    def part_files(d):
        out = {}
        for p in os.listdir(d):
            if p.startswith("day="):
                pd = os.path.join(d, p)
                out[p] = {
                    f: os.path.getmtime(os.path.join(pd, f))
                    for f in os.listdir(pd)
                    if f.endswith(".parquet")
                }
        return out

    # keys: a handful of specific events (sparse — few dirty days) plus
    # EVERY event of one day (that partition must vanish entirely)
    full_day = "2024-01-15"
    day_ids = [
        r.event_id
        for r in events.filter(F.to_date("ts") == full_day)
        .select("event_id")
        .collect()
    ]
    sparse_ids = [5, 17]
    keys = day_ids + sparse_ids

    before = part_files(table)
    total_before = spark.read.parquet(table).count()
    stats = scrub_keys(spark, table, "event_id", keys, "day")
    after = part_files(table)

    assert stats["n_rows_scrubbed"] == len(keys)
    assert full_day in stats["dirty_partitions"]
    # the fully-scrubbed day is gone from disk
    assert f"day={full_day}" not in after
    # clean partitions untouched byte-for-byte (same files, same mtimes)
    clean = {
        p: v for p, v in before.items() if p[4:] not in stats["dirty_partitions"]
    }
    for p, files in clean.items():
        assert after[p] == files, p
    # content: exactly the non-key rows survive
    left = spark.read.parquet(table)
    assert left.count() == total_before - len(keys)
    assert left.filter(F.col("event_id").isin(keys)).count() == 0


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


def test_diff_pruned_equals_direct(spark, sf_dir):
    """The fingerprint-short-circuited diff answers bit-identically to the
    direct full-outer row diff — the 100 TB path is a pure optimization."""
    from eth_event_stream_spark.plans.warehouse import (
        diff_releases,
        diff_releases_pruned,
    )

    direct = _rows(diff_releases(spark, sf_dir))
    pruned = _rows(diff_releases_pruned(spark, sf_dir))
    assert pruned == direct


def test_diff_identical_releases_short_circuits(spark, sf_dir):
    """Identical releases → every bucket fingerprint matches, the dirty set
    is empty, and the pruned diff reports only 'unchanged' rows whose count
    equals the release size — the whole row-diff phase is skipped."""
    from eth_event_stream_spark.plans.warehouse import (
        _release_curr,
        diff_release_rows,
        diff_releases_pruned,
    )
    import eth_event_stream_spark.plans.warehouse as wh

    # monkeypatch-free: identical releases via the public row-diff helper
    curr = _release_curr(spark, sf_dir)
    rows = diff_release_rows(curr, curr)
    statuses = {r["status"] for r in rows.select("status").distinct().collect()}
    assert statuses == {"unchanged"}

    orig_prev = wh._release_prev
    wh._release_prev = wh._release_curr
    try:
        out = diff_releases_pruned(spark, sf_dir)
        got = {(r["lang"], r["status"]): r["n_docs"] for r in out.collect()}
    finally:
        wh._release_prev = orig_prev
    assert all(k[1] == "unchanged" for k in got)
    per_lang = {
        r["lang"]: r["n"]
        for r in curr.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert {k[0]: v for k, v in got.items()} == per_lang


def test_diff_pruned_bucket_count_invariant(spark, sf_dir):
    """The fingerprint prune is a pure optimization at ANY bucketing: the
    pruned diff equals the direct diff for coarse and fine bucket counts."""
    from eth_event_stream_spark.plans.warehouse import (
        diff_releases,
        diff_releases_pruned,
    )

    direct = _rows(diff_releases(spark, sf_dir))
    for n in (4, 128):
        assert _rows(diff_releases_pruned(spark, sf_dir, n_buckets=n)) == direct, n


def test_diff_pruned_fingerprint_sum_survives_int64_overflow(spark, sf_dir):
    """Regression: the per-bucket fingerprint is a sum of 56-bit signatures
    (values to ~7.2e16). Summed as int64 that overflows at a few hundred
    rows per bucket — under Spark's default ANSI mode, an
    ArithmeticException on the exact 100 TB path. n_buckets=1 forces every
    release row into ONE bucket (~500 rows at sf0.01, avg sig ~3.6e16 →
    sum ~1.8e19 > 2^63), so this case throws before the decimal(38,0) fix
    and must both run clean and still equal the direct diff."""
    from eth_event_stream_spark.plans.warehouse import (
        diff_releases,
        diff_releases_pruned,
    )

    direct = _rows(diff_releases(spark, sf_dir))
    assert _rows(diff_releases_pruned(spark, sf_dir, n_buckets=1)) == direct


def test_diff_pruned_shipped_fingerprints_and_partition_pruning(
    spark, sf_dir, tmp_path
):
    """The 100 TB diff shape: each release ships its bucket-fingerprint
    table (release_bucket_fingerprints) and lives bucket-PARTITIONED. The
    diff must (a) return the exact same answer as the direct row diff,
    (b) consume the SHIPPED fingerprints instead of rescanning, and
    (c) push the dirty-bucket predicate as a PartitionFilter so clean
    buckets' files are pruned, not just filter-skipped."""
    import re

    from pyspark.sql import functions as F

    from eth_event_stream_spark.plans.warehouse import (
        diff_release_rows,
        diff_releases_pruned_of,
        release_bucket_fingerprints,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    prev = docs.withColumn("bucket", F.col("doc_id") % 32)
    # localized change: ONE dirty bucket (half of bucket 5's texts flip)
    curr = prev.withColumn(
        "text",
        F.when(
            (F.col("doc_id") % 32 == 5) & (F.col("doc_id") % 64 == 5),
            F.reverse(F.col("text")),
        ).otherwise(F.col("text")),
    )
    prev.write.partitionBy("bucket").parquet(str(tmp_path / "prev"))
    curr.write.partitionBy("bucket").parquet(str(tmp_path / "curr"))
    p = spark.read.parquet(str(tmp_path / "prev"))
    c = spark.read.parquet(str(tmp_path / "curr"))
    release_bucket_fingerprints(p).write.parquet(str(tmp_path / "fp_p"))
    release_bucket_fingerprints(c).write.parquet(str(tmp_path / "fp_c"))
    fp_p = spark.read.parquet(str(tmp_path / "fp_p"))
    fp_c = spark.read.parquet(str(tmp_path / "fp_c"))

    direct = sorted(
        map(
            tuple,
            diff_release_rows(p, c)
            .groupBy("lang", "status")
            .agg(F.count("*").cast("bigint").alias("n_docs"))
            .collect(),
        )
    )
    pruned = diff_releases_pruned_of(
        p, c, fp_prev=fp_p, fp_curr=fp_c, bucket_col="bucket"
    )
    assert sorted(map(tuple, pruned.collect())) == direct
    # exactly one bucket was dirty, and the dirty-row scan partition-prunes
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    pfs = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("bucket" in pf and "5" in pf for pf in pfs), plan[:3000]

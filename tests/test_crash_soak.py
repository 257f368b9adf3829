"""Randomized multi-crash soak of the COMPOSED streaming lifecycle.

Each maintainer (CCMaintainer, KeywordTopKServer, AnnIndexManager) has
pointwise crash/replay tests; this drives N micro-batches through the
COMPOSED serving+incremental cycle (the examples/serving_cycle.py +
examples/incremental_cycle.py shape) and kills it at random points —
between steps, INSIDE a publish (post-version-write, pre-pointer-swap),
mid-append (partial batch files on disk), and mid-rebuild — then restarts
from fresh maintainer objects and REPLAYS the batch, exactly as a
foreachBatch source would. End state must equal the uninterrupted run:
the ported semantic is the sink's exactly-once contract
(sink.rs:13-21, sink.rs:216-249).

The crash schedule is drawn from a seeded RNG; the seed is printed and
carried in every assertion message so any failure replays exactly
(SOAK_SEED=<n> pins it).
"""

from __future__ import annotations

import os
import random
import unittest.mock as mock

from pyspark.sql import functions as F


class Injected(RuntimeError):
    """The planted crash — never caught by the engine code under test."""


# every way this test knows how to kill the cycle; 'none' = clean batch
CRASH_POINTS = [
    "none",
    "after_cc",
    "after_kw",
    "mid_cc_publish",
    "mid_kw_publish",
    "mid_snap_publish",
    "mid_scd2_publish",
    "after_scd2",
    "mid_append",
    "mid_rebuild",
]


def _raise_on_pointer_swap(target_root):
    """os.replace wrapper that injects a crash at the WORST moment of a
    versioned publish into ``target_root``: the version directory is fully
    written, the pointer swap never happens."""
    real = os.replace

    def flaky(src, dst):
        if target_root in str(dst) and str(dst).endswith("CURRENT"):
            raise Injected(f"killed mid-publish: {dst}")
        return real(src, dst)

    return flaky


def _raise_on_batch_move(batch_id):
    """os.replace wrapper that kills an ANN append after SOME of the
    batch's files moved into the live store."""
    real = os.replace
    seen = {"n": 0}
    needle = f"batch-{batch_id:09d}-"

    def flaky(src, dst):
        if needle in str(dst) and not str(dst).endswith(".crc"):
            seen["n"] += 1
            if seen["n"] >= 2:
                raise Injected(f"killed mid-append: {dst}")
        return real(src, dst)

    return flaky


def _make(root):
    """Fresh maintainer objects over the same state dirs — a process
    restart. All four maintainer families ride the soak: CC (commutative,
    id-guarded), keyword top-k (idempotent monoid, NO guard), snapshot +
    SCD2 (order-frontier-enforcing _VersionedTable sinks), and the ANN
    manager (epoch-guarded mutating appends + copy-on-write rebuilds)."""
    from eth_event_stream_spark.plans.ann_index import AnnIndexManager
    from eth_event_stream_spark.plans.incremental import CCMaintainer
    from eth_event_stream_spark.plans.retrieval import KeywordTopKServer
    from eth_event_stream_spark.plans.warehouse import (
        SCD2Maintainer,
        SnapshotMaintainer,
    )

    return (
        CCMaintainer(os.path.join(root, "cc")),
        KeywordTopKServer(os.path.join(root, "kw")),
        AnnIndexManager(os.path.join(root, "ann"), retain=1),
        SnapshotMaintainer(
            os.path.join(root, "snap"),
            key_cols=["k"],
            order_cols=["seq"],
            op_col="op",
        ),
        SCD2Maintainer(os.path.join(root, "scd2")),
    )


N_BATCHES = 4
REBUILD_AT = 2  # the cycle that also rotates the ANN index


def _batch_inputs(spark, sf_dir, i):
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = docs.filter(F.col("doc_id") % N_BATCHES == i)
    edges = d.select(
        F.col("doc_id").alias("src"), (F.col("doc_id") % 40).alias("dst")
    )
    scores = d.select(
        "doc_id", (F.col("doc_id") % 97).cast("bigint").alias("score")
    )
    vecs = embs.filter(
        (F.col("vec_id") % (N_BATCHES + 1) == i) & (F.col("vec_id") != 0)
    )
    # the ORDERED lanes: contiguous time slice i of the event stream (the
    # snapshot/SCD2 maintainers ENFORCE in-order delivery via the pointer
    # frontier, so batches must partition the (ts, event_id) order)
    w = Window.orderBy("ts", "event_id")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "seq", F.row_number().over(w)
    )
    n_ev = ev.count()
    lo, hi = i * n_ev // N_BATCHES, (i + 1) * n_ev // N_BATCHES
    ev_slice = ev.filter((F.col("seq") > lo) & (F.col("seq") <= hi))
    changelog = ev_slice.select(
        F.col("user_id").alias("k"),
        F.col("event_type").alias("v"),
        F.col("seq"),
        F.when(F.col("user_id") % 11 == 3, "D").otherwise("U").alias("op"),
    )
    scd2_events = ev_slice.select("user_id", "event_type", "ts", "event_id")
    return edges, scores, vecs, changelog, scd2_events


def _bootstrap(spark, sf_dir, root):
    cc, kw, ann, snap, scd2 = _make(root)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cc.bootstrap(
        docs.select(F.col("doc_id").alias("id"), F.col("doc_id").alias("label"))
    )
    corpus = embs.filter(
        (F.col("vec_id") % (N_BATCHES + 1) == N_BATCHES) | (F.col("vec_id") == 0)
    )
    ann.build(spark, sf_dir, e=corpus)
    snap.bootstrap(
        spark.createDataFrame([(-1, "seed", 0)], ["k", "v", "seq"])
    )


def _run_batch(spark, sf_dir, root, i, crash_point):
    """One composed cycle, with a crash ARMED at ``crash_point``. Fresh
    maintainer objects every attempt (the restart semantics). An armed
    crash may never fire: if the targeted step already committed in an
    earlier attempt, its exactly-once guard no-ops it and the trap sees
    no publish — the batch then simply completes (that IS the contract
    under test)."""
    cc, kw, ann, snap, scd2 = _make(root)
    edges, scores, vecs, changelog, scd2_events = _batch_inputs(spark, sf_dir, i)

    if crash_point == "mid_cc_publish":
        with mock.patch("os.replace", _raise_on_pointer_swap(os.path.join(root, "cc"))):
            cc(edges, batch_id=i)
    else:
        cc(edges, batch_id=i)
    if crash_point == "after_cc":
        raise Injected("killed between cc and kw")

    if crash_point == "mid_kw_publish":
        with mock.patch("os.replace", _raise_on_pointer_swap(os.path.join(root, "kw"))):
            kw(scores, epoch_id=i)
    else:
        kw(scores, epoch_id=i)
    if crash_point == "after_kw":
        raise Injected("killed between kw and snap")

    if crash_point == "mid_snap_publish":
        with mock.patch(
            "os.replace", _raise_on_pointer_swap(os.path.join(root, "snap"))
        ):
            snap(changelog, batch_id=i)
    else:
        snap(changelog, batch_id=i)

    if crash_point == "mid_scd2_publish":
        with mock.patch(
            "os.replace", _raise_on_pointer_swap(os.path.join(root, "scd2"))
        ):
            scd2(scd2_events, batch_id=i)
    else:
        scd2(scd2_events, batch_id=i)
    if crash_point == "after_scd2":
        raise Injected("killed between scd2 and append")

    if crash_point == "mid_append":
        with mock.patch("os.replace", _raise_on_batch_move(i)):
            ann.append(spark, vecs, batch_id=i)
    else:
        ann.append(spark, vecs, batch_id=i)

    if i == REBUILD_AT:
        if crash_point == "mid_rebuild":
            with mock.patch(
                "eth_event_stream_spark.plans.ann_index.persist_ann_index",
                side_effect=Injected("killed mid-rebuild"),
            ):
                ann.rebuild(spark)
        else:
            ann.rebuild(spark)


def _end_state(spark, root):
    from eth_event_stream_spark.plans.ann_index import _CELL_STORE

    cc, kw, ann, snap, scd2 = _make(root)
    labels = sorted(map(tuple, cc.current(spark).collect()))
    topk = sorted(map(tuple, kw.current(spark).collect()))
    snapshot = sorted(map(tuple, snap.current(spark).collect()))
    history = sorted(map(tuple, scd2.current(spark).collect()))
    store_dir = os.path.join(ann.current_dir(), _CELL_STORE)
    spark.catalog.refreshByPath(store_dir)
    store = sorted(
        (r["vec_id"], r["cell"]) for r in spark.read.parquet(store_dir).collect()
    )
    applied = ""
    applied_path = os.path.join(ann.current_dir(), ann._APPLIED)
    if os.path.exists(applied_path):
        with open(applied_path) as f:
            applied = f.read()
    return labels, topk, store, applied, snapshot, history


def test_composed_lifecycle_survives_random_multi_crash(spark, sf_dir, tmp_path):
    seed = int(os.environ.get("SOAK_SEED", "0")) or random.SystemRandom().randrange(
        1 << 30
    )
    rng = random.Random(seed)
    print(f"SOAK_SEED={seed}")

    # reference: the uninterrupted run
    ref_root = str(tmp_path / "ref")
    _bootstrap(spark, sf_dir, ref_root)
    for i in range(N_BATCHES):
        _run_batch(spark, sf_dir, ref_root, i, "none")
    want = _end_state(spark, ref_root)

    # soak: every batch dies 0..3 times at random points, then replays
    soak_root = str(tmp_path / "soak")
    _bootstrap(spark, sf_dir, soak_root)
    schedule = []
    n_fired = 0
    for i in range(N_BATCHES):
        # batch 0 always crashes at least once so no seed makes the soak
        # vacuous; later batches draw 0..3 kills
        n_kills = rng.randrange(1, 4) if i == 0 else rng.randrange(4)
        crashes = [rng.choice(CRASH_POINTS[1:]) for _ in range(n_kills)]
        schedule.append(crashes)
        done = False
        for point in crashes:
            try:
                _run_batch(spark, sf_dir, soak_root, i, point)
                done = True  # the armed crash never fired (step had already
                break  # committed and no-op'd) — the batch completed
            except Injected:
                n_fired += 1  # killed; restart and replay
        if not done:
            _run_batch(spark, sf_dir, soak_root, i, "none")  # the clean replay

    got = _end_state(spark, soak_root)
    ctx = f"SOAK_SEED={seed} schedule={schedule}"
    assert got[0] == want[0], f"cc labels diverged: {ctx}"
    assert got[1] == want[1], f"keyword top-k diverged: {ctx}"
    assert got[2] == want[2], f"ann store diverged: {ctx}"
    assert got[3] == want[3], f"applied-batch record diverged: {ctx}"
    assert got[4] == want[4], f"cdc snapshot diverged: {ctx}"
    assert got[5] == want[5], f"scd2 history diverged: {ctx}"


def test_kw_server_replayed_epoch_never_collides_with_gc(spark, tmp_path):
    """Pointwise reproduction of the naming bug the soak found: the top-k
    server has no epoch guard (the max-merge is an idempotent monoid), so a
    replayed epoch RE-publishes — and a count-derived version name could
    equal an entry that GC had since removed, failing PATH_ALREADY_EXISTS.
    Names are now monotonic; every replay must succeed and leave the served
    rows unchanged."""
    from eth_event_stream_spark.plans.retrieval import KeywordTopKServer

    kw = KeywordTopKServer(str(tmp_path / "kw"))

    def scores(lo):
        return spark.range(lo, lo + 30).select(
            F.col("id").alias("doc_id"), (F.col("id") % 97).alias("score")
        )

    kw(scores(0), epoch_id=0)
    kw(scores(0), epoch_id=0)  # replay grows the dir
    kw(scores(100), epoch_id=1)
    served = sorted(map(tuple, kw.current(spark).collect()))
    kw(scores(100), epoch_id=1)  # replay AFTER GC shrank the dir: the
    # count-derived name collided here before the fix
    assert sorted(map(tuple, kw.current(spark).collect())) == served


def test_versioned_table_crash_leftover_never_outranks_real_grace_copy(
    spark, tmp_path
):
    """A mid-publish crash leaves an UNPOINTED version dir; before the fix
    the next successful publish's GC retained that garbage as the grace
    copy (it sorts as the highest superseded batch) while deleting the
    GENUINE previous version that in-flight readers may still hold. The
    replay must scrub the leftover and keep the real predecessor readable."""
    from eth_event_stream_spark.plans.warehouse import _VersionedTable

    vt = _VersionedTable(str(tmp_path / "vt"), retain=1)
    vt._publish(spark.range(10), batch_id=0)
    vt._publish(spark.range(20), batch_id=1)

    with mock.patch("os.replace", _raise_on_pointer_swap(str(tmp_path / "vt"))):
        try:
            vt._publish(spark.range(30), batch_id=2)
        except Injected:
            pass
    assert vt._read_pointer()[1] == 1  # crash left the old pointer live

    vt._publish(spark.range(30), batch_id=2)  # the replay
    assert vt._read_pointer()[1] == 2
    # the grace copy is the REAL batch-1 snapshot, not the crash leftover
    assert vt.versions() == [1, 2]
    assert vt.as_of(spark, 1).count() == 20

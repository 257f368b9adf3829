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

import pytest
from pyspark.sql import functions as F

# Randomized crash/soak sweeps (~70 s) — slow tier (conftest), run with
# SPARK_GRAFT_FULL_TESTS=1.
pytestmark = pytest.mark.slow


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


# ---------------------------------------------------------------------------
# Release-lane soak: curate -> compact -> fingerprint table -> manifest
# publish -> pruned diff (the examples/release_cycle.py composition).
# The manifest IS the publish point — until it lands atomically,
# verify_release must refuse the directory, so a consumer can never train
# on a half-committed release; the ported semantic is the same sink
# exactly-once contract (sink.rs:13-21). The card step is read-only
# (no state to corrupt), so it carries no kill point.
# ---------------------------------------------------------------------------

RELEASE_CRASH_POINTS = [
    "mid_compact",        # some compacted shards on disk, _SUCCESS gone
    "after_compact",      # between compaction and the fingerprint table
    "mid_fp_write",       # partial shipped-fingerprint table
    "after_fp",           # between fingerprint-table write and the publish
    "mid_manifest_swap",  # manifest fully computed, atomic rename killed
]

N_RELEASES = 3


def _curated(spark, sf_dir, i):
    """Deterministic curated corpus for release ``i``: a shrinking doc set
    with an i-dependent perturbed slice, so consecutive releases genuinely
    differ (added/removed/changed rows all occur in the diffs)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.filter(F.col("doc_id") % 10 >= i).select(
        "doc_id",
        "lang",
        F.when(F.col("doc_id") % 7 == i, F.reverse(F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def _mangle_spark_dir_and_raise(d, msg):
    """Simulate a kill DURING a Spark parquet write's commit: some task
    outputs already renamed into place, the _SUCCESS marker and the rest
    never landed."""
    import glob

    for p in glob.glob(os.path.join(d, "_SUCCESS")) + glob.glob(
        os.path.join(d, "._SUCCESS.crc")
    ):
        os.remove(p)
    parts = sorted(glob.glob(os.path.join(d, "*.parquet")))
    for p in parts[:: 2] or parts[:1]:
        os.remove(p)
        crc = os.path.join(d, "." + os.path.basename(p) + ".crc")
        if os.path.exists(crc):
            os.remove(crc)
    raise Injected(msg)


def _raise_on_manifest_swap():
    from eth_event_stream_spark.plans.layout import MANIFEST_NAME

    real = os.replace

    def flaky(src, dst):
        if str(dst).endswith(MANIFEST_NAME):
            raise Injected(f"killed mid-manifest-swap: {dst}")
        return real(src, dst)

    return flaky


def _publish_release(spark, sf_dir, work, i, crash_point):
    """One attempt at publishing release ``i``; a crash may be armed at any
    step. Replay = rerun from the top (every step overwrites), exactly what
    a restarted publish job does."""
    from eth_event_stream_spark.plans.layout import compact_parquet_dir, write_manifest
    from eth_event_stream_spark.plans.warehouse import release_bucket_fingerprints

    raw = os.path.join(work, f"raw_{i}")
    rel = os.path.join(work, f"release_{i}")
    fpd = os.path.join(work, f"fp_{i}")

    _curated(spark, sf_dir, i).write.mode("overwrite").parquet(raw)

    compact_parquet_dir(spark, raw, rel, target_bytes=64 * 1024, sort_cols=["doc_id"])
    if crash_point == "mid_compact":
        _mangle_spark_dir_and_raise(rel, f"killed mid-compaction of release {i}")
    if crash_point == "after_compact":
        raise Injected(f"killed between compaction and fingerprints of {i}")

    spark.catalog.refreshByPath(rel)
    release_bucket_fingerprints(spark.read.parquet(rel)).write.mode(
        "overwrite"
    ).parquet(fpd)
    if crash_point == "mid_fp_write":
        _mangle_spark_dir_and_raise(fpd, f"killed mid-fingerprint-write of {i}")
    if crash_point == "after_fp":
        raise Injected(f"killed between fingerprint table and publish of {i}")

    if crash_point == "mid_manifest_swap":
        with mock.patch("os.replace", _raise_on_manifest_swap()):
            write_manifest(spark, rel)
    else:
        write_manifest(spark, rel)


def _release_end_state(spark, work):
    """Everything a consumer sees: per-release verified manifests (counts,
    not md5s/filenames — part-file UUIDs differ run to run), released rows,
    and the persisted-fingerprint pruned diff of each consecutive pair."""
    from eth_event_stream_spark.plans.layout import verify_release
    from eth_event_stream_spark.plans.warehouse import diff_releases_pruned_of

    state = []
    for i in range(N_RELEASES):
        rel = os.path.join(work, f"release_{i}")
        spark.catalog.refreshByPath(rel)
        m = verify_release(spark, rel)  # must pass: the release is published
        rows = sorted(
            map(tuple, spark.read.parquet(rel).select("doc_id", "lang", "text").collect())
        )
        state.append((m["n_files"], m["total_rows"], rows))
    for i in range(1, N_RELEASES):
        prev = spark.read.parquet(os.path.join(work, f"release_{i-1}"))
        curr = spark.read.parquet(os.path.join(work, f"release_{i}"))
        fp_p = spark.read.parquet(os.path.join(work, f"fp_{i-1}"))
        fp_c = spark.read.parquet(os.path.join(work, f"fp_{i}"))
        diff = sorted(
            map(
                tuple,
                diff_releases_pruned_of(
                    prev, curr, fp_prev=fp_p, fp_curr=fp_c
                ).collect(),
            )
        )
        state.append(("diff", i, diff))
    return state


def test_release_cycle_soak_converges(spark, sf_dir, tmp_path):
    """Seed-logged random kills across the release publish chain: after
    EVERY kill the half-published release must refuse verification (the
    manifest is the atomic publish point), and replaying from the top must
    converge to the uninterrupted run's end state — releases, manifests,
    and persisted-fingerprint pruned diffs all equal."""
    import pytest

    from eth_event_stream_spark.plans.layout import (
        ReleaseIntegrityError,
        verify_release,
    )

    seed = int(os.environ.get("SOAK_SEED", "0")) or random.SystemRandom().randrange(
        1 << 30
    )
    rng = random.Random(seed)
    print(f"SOAK_SEED={seed}")

    ref = str(tmp_path / "ref_rel")
    os.makedirs(ref)
    for i in range(N_RELEASES):
        _publish_release(spark, sf_dir, ref, i, "none")
    want = _release_end_state(spark, ref)

    soak = str(tmp_path / "soak_rel")
    os.makedirs(soak)
    schedule = []
    for i in range(N_RELEASES):
        # release 0 always dies at least once so no seed is vacuous
        n_kills = rng.randrange(1, 3) if i == 0 else rng.randrange(3)
        crashes = [rng.choice(RELEASE_CRASH_POINTS) for _ in range(n_kills)]
        schedule.append(crashes)
        for point in crashes:
            with pytest.raises(Injected):
                _publish_release(spark, sf_dir, soak, i, point)
            # the half-published release must never verify clean
            rel = os.path.join(soak, f"release_{i}")
            spark.catalog.refreshByPath(rel)
            with pytest.raises(ReleaseIntegrityError):
                verify_release(spark, rel)
        _publish_release(spark, sf_dir, soak, i, "none")  # the clean replay

    got = _release_end_state(spark, soak)
    assert got == want, f"SOAK_SEED={seed} schedule={schedule}"


def test_torn_manifest_mirror_refuses_typed(spark, sf_dir, tmp_path):
    """A published release whose manifest was torn IN TRANSIT (non-atomic
    mirror copy / partial download) must refuse with the typed
    ReleaseIntegrityError — never verify clean, never surface as a bare
    JSON parse error. (Our own writer can no longer produce this state:
    write_manifest goes through tmp + os.replace.)"""
    import pytest

    from eth_event_stream_spark.plans.layout import (
        MANIFEST_NAME,
        ReleaseIntegrityError,
        verify_release,
        write_manifest,
    )

    rel = str(tmp_path / "rel")
    _curated(spark, sf_dir, 0).write.mode("overwrite").parquet(rel)
    write_manifest(spark, rel)
    verify_release(spark, rel)  # intact: verifies clean

    path = os.path.join(rel, MANIFEST_NAME)
    blob = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(blob[: len(blob) // 2])  # torn mid-byte
    with pytest.raises(ReleaseIntegrityError, match="torn/unparseable"):
        verify_release(spark, rel)

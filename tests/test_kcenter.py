"""Greedy k-center diversity sampling (plans/assembly.py, round 8)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from eth_event_stream_spark.plans import QUERIES
from eth_event_stream_spark.plans.assembly import KCENTER_K


def _emb_dir(tmp_path_factory, vecs: dict[int, list[float]]) -> str:
    d = str(tmp_path_factory.mktemp("kcemb"))
    pd.DataFrame(
        [
            {"vec_id": vid, "embedding": np.array(v, dtype=np.float32), "label": "l"}
            for vid, v in vecs.items()
        ]
    ).to_parquet(f"{d}/embeddings.parquet")
    return d


def test_kcenter_picks_the_far_corners_first(spark, tmp_path_factory):
    """Clustered 2-D layout: a clump near the origin plus three far
    corners. Greedy farthest-point must pick the three corners (in
    farthest-first order) before any second clump point."""
    d = _emb_dir(
        tmp_path_factory,
        {
            0: [0.0, 0.0],       # seed (min vec_id)
            1: [0.1, 0.0],       # clump
            2: [0.0, 0.1],       # clump
            3: [10.0, 10.0],     # far corner, d2=200 from seed
            4: [-9.0, 9.0],      # corner, d2=162
            5: [8.0, -8.0],      # corner, d2=128
        },
    )
    out = QUERIES["sample_kcenter_diverse"].fn(spark, d).orderBy("sel_rank").collect()
    assert [r.vec_id for r in out[:4]] == [0, 3, 4, 5]
    # min-distance of each later pick never exceeds the previous pick's
    # (greedy k-center invariant: the cover radius is non-increasing)
    dists = [r.min_d2 for r in out[1:]]
    assert dists == sorted(dists, reverse=True)


@pytest.mark.slow  # ~150 s multi-k property sweep; the per-row oracle parity
# tests and the functional kcenter tests below stay in the default tier
def test_kcenter_matches_oracle_and_cover_radius_shrinks(spark, sf_dir):
    q = QUERIES["sample_kcenter_diverse"]
    sdf = q.fn(spark, sf_dir).toPandas().sort_values("sel_rank").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    odf = con.execute(q.oracle).df().sort_values("sel_rank").reset_index(drop=True)
    assert sdf.astype(str).equals(odf[sdf.columns].astype(str))
    assert len(sdf) == KCENTER_K
    dists = sdf["min_d2"].tolist()[1:]
    assert dists == sorted(dists, reverse=True)


def test_kcenter_batched_with_batch_1_is_exact_gonzalez(spark, sf_dir):
    """batch=1 degenerates to exact greedy: each pass's single pick is the
    global argmax, so the batched path must equal sample_kcenter_diverse
    row-for-row (rank, id, AND recorded min_d2)."""
    from eth_event_stream_spark.plans.assembly import sample_kcenter_batched

    exact = [
        tuple(r)
        for r in QUERIES["sample_kcenter_diverse"].fn(spark, sf_dir)
        .orderBy("sel_rank")
        .collect()
    ]
    batched = [
        tuple(r)
        for r in sample_kcenter_batched(spark, sf_dir, k=KCENTER_K, batch=1)
        .orderBy("sel_rank")
        .collect()
    ]
    assert batched == exact


def test_kcenter_batched_large_batch_cuts_passes_and_stays_near_exact(spark, sf_dir):
    """batch=4 over k=8 runs 2 passes instead of 7 and the selection keeps
    the k-center character: k distinct rows, seed + global-farthest first
    two (always exact), and the cover objective (max over the corpus of
    min-d2 to the selected set) within 2x of exact greedy's — the
    approximation the over-sampled batching trades for the pass count."""
    import numpy as np

    from eth_event_stream_spark.plans.assembly import sample_kcenter_batched

    exact = (
        QUERIES["sample_kcenter_diverse"].fn(spark, sf_dir)
        .orderBy("sel_rank")
        .collect()
    )
    batched = (
        sample_kcenter_batched(spark, sf_dir, k=KCENTER_K, batch=4)
        .orderBy("sel_rank")
        .collect()
    )
    assert len(batched) == KCENTER_K
    assert len({r.vec_id for r in batched}) == KCENTER_K
    # pass 1's first pick is the true global argmax regardless of batching
    assert [r.vec_id for r in batched[:2]] == [r.vec_id for r in exact[:2]]

    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }

    def cover(sel_ids):
        centers = [emb[i] for i in sel_ids]
        return max(
            min(float(((v - c) ** 2).sum()) for c in centers)
            for vid, v in emb.items()
        )

    r_exact = cover([r.vec_id for r in exact])
    r_batched = cover([r.vec_id for r in batched])
    assert r_batched <= 2.0 * r_exact, (r_batched, r_exact)


def test_kcenter_batched_truncates_on_tiny_corpus(spark, tmp_path_factory):
    """Corpus smaller than k: the batched path returns every vector once
    and stops — same truncation contract as the exact path."""
    from eth_event_stream_spark.plans.assembly import sample_kcenter_batched

    d = _emb_dir(tmp_path_factory, {0: [0.0, 0.0], 1: [1.0, 0.0], 2: [0.0, 2.0]})
    out = sample_kcenter_batched(spark, d, k=10, batch=4).collect()
    assert sorted(r.vec_id for r in out) == [0, 1, 2]


def test_kcenter_batched_stats_out_counts_passes(spark, sf_dir):
    """stats_out reports the actual corpus-pass count and the selected
    embeddings: ceil((k-1)/batch) passes, one embedding per selection."""
    import math

    from eth_event_stream_spark.plans.assembly import sample_kcenter_batched

    for k, batch in [(9, 4), (8, 1), (5, 8)]:
        stats: dict = {}
        sel = sample_kcenter_batched(
            spark, sf_dir, k=k, batch=batch, stats_out=stats
        ).collect()
        assert stats["passes"] == math.ceil((k - 1) / batch), (k, batch)
        assert len(stats["sel_embs"]) == len(sel) == k


def test_kcenter_cover_certificate_rejects_clustered_selection(
    spark, tmp_path_factory
):
    """Negative control for the 4x-OPT certificate: on a line of far-apart
    points, a deliberately CLUSTERED 'selection' (two adjacent points at
    one end) has cover radius >> its pigeonhole lower bound and must FAIL
    the certificate; the genuine spread selection must pass it."""
    from pyspark.sql import functions as F

    from eth_event_stream_spark.plans.assembly import kcenter_cover_certificate

    # points at 0, 1, 100, 200 on a line
    vecs = {0: [0.0], 1: [1.0], 2: [100.0], 3: [200.0]}
    d = _emb_dir(tmp_path_factory, vecs)
    emb = spark.read.parquet(f"{d}/embeddings.parquet").select(
        "vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("e")
    )
    # clustered: S = {0, 1} -> R = 199, minpair = 1, lower = 0.5 -> 199 > 4*0.5
    assert not kcenter_cover_certificate(emb, [0, 1], [[0.0], [1.0]], factor=4.0)
    # spread: S = {0, 3} -> R = 100 (point at 100), minpair = 200,
    # lower = min(200, 100)/2 = 50 -> 100 <= 4*50
    assert kcenter_cover_certificate(emb, [0, 3], [[0.0], [200.0]], factor=4.0)


def test_kcenter_batched_exact_mode_equals_gonzalez(spark, sf_dir):
    """exact=True with batch > 1 must reproduce Gonzalez ROW-FOR-ROW
    (ids, ranks, AND min_d2 values): the cutoff rule only permits a
    within-pass pick while it is provably the global argmax. Fewer corpus
    passes than k-1 must still be achieved on spread data."""
    from eth_event_stream_spark.plans.assembly import sample_kcenter_batched

    st1: dict = {}
    exact_rows = sorted(
        tuple(r)
        for r in sample_kcenter_batched(
            spark, sf_dir, k=12, batch=1, stats_out=st1
        ).collect()
    )
    st2: dict = {}
    got = sorted(
        tuple(r)
        for r in sample_kcenter_batched(
            spark, sf_dir, k=12, batch=4, exact=True, stats_out=st2
        ).collect()
    )
    assert got == exact_rows
    assert st1["passes"] == 11
    assert st2["passes"] < 11  # batching actually saved corpus passes


def test_kcenter_certificate_from_r2_matches_standalone(spark, sf_dir):
    """The state-derived certificate (R^2 = max of the selection loop's
    final `mind`, exported via stats_out) must reach the same verdict as
    the standalone corpus-pass certificate on the same selection — the
    redundant second broadcast pass is gone, not the semantics."""
    from pyspark.sql import functions as F

    from eth_event_stream_spark.plans.assembly import (
        kcenter_certificate_from_r2,
        kcenter_cover_certificate,
        sample_kcenter_batched,
    )

    stats: dict = {}
    sel = sample_kcenter_batched(
        spark, sf_dir, k=16, batch=4, stats_out=stats
    ).collect()
    assert stats["r2"] is not None and stats["r2"] > 0.0
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("e")
    )
    ids = [r.vec_id for r in sel]
    standalone = kcenter_cover_certificate(emb, ids, stats["sel_embs"], factor=4.0)
    from_state = kcenter_certificate_from_r2(stats["r2"], stats["sel_embs"], factor=4.0)
    assert from_state == standalone


def test_kcenter_contract_escalates_to_exact_on_failed_certificate(
    spark, tmp_path_factory
):
    """Self-healing certificate (the BENCH_SF1 sf1 failure shape, scaled
    down): a tight near-duplicate cluster far from the seed fills the
    ENTIRE oversampled fetch, so the approx batched pass must take a
    second within-pass pick from the cluster — two near-dup centers
    collapse minpair(S) while a moderately-far spread point keeps the
    cover radius large, and the approx draw's empirical certificate
    FAILS. The registered contract entry must then escalate to exact=True
    (whose certificate is structural: Gonzalez center pairs are >= R
    apart) and still return cover_certificate_4x = TRUE, with `passes`
    still reporting the approx draw's deterministic ceil((k-1)/batch)."""
    from eth_event_stream_spark.plans.assembly import (
        _kcenter_contract_row,
        kcenter_certificate_from_r2,
        sample_kcenter_batched,
    )

    d = _emb_dir(
        tmp_path_factory,
        {
            # seed (min vec_id)
            0: [0.0, 0.0],
            # near-dup cluster at x=100, jittered: 8 points fill the WHOLE
            # oversample*batch = 4*2 = 8 fetch of pass 1, so the approx
            # pass's second pick has only near-dups to choose from
            **{i: [100.0 + (i - 1) * 0.001, (i % 2) * 0.001] for i in range(1, 9)},
            # spread points the approx draw leaves uncovered at R^2 = 2500
            9: [50.0, 0.0],
            10: [-50.0, 0.0],
        },
    )
    # the approx draw's certificate genuinely fails on this corpus
    stats: dict = {}
    sample_kcenter_batched(spark, d, k=4, batch=2, stats_out=stats).collect()
    assert not kcenter_certificate_from_r2(stats["r2"], stats["sel_embs"], 4.0)
    # ... but the contract entry self-heals via the exact escalation,
    # and the self-heal is OBSERVABLE in production: the process-lifetime
    # counter (bench.py records it in the detail sidecar) and one stderr
    # line, not just the tests-only escalation_out hook
    from eth_event_stream_spark.plans import assembly

    out: dict = {}
    n_before = assembly.KCENTER_ESCALATIONS["count"]
    row = _kcenter_contract_row(
        spark, d, k=4, batch=2, escalation_out=out
    ).collect()[0]
    assert assembly.KCENTER_ESCALATIONS["count"] == n_before + 1
    assert out["escalated"] is True
    assert row.cover_certificate_4x is True
    assert row.passes == 2  # ceil((4-1)/2): the approx draw's pass count
    assert row.n_selected == row.n_distinct_vec == 4
    assert row.dense_ranks is True


def test_kcenter_contract_does_not_escalate_on_spread_corpus(spark, sf_dir):
    """On the real corpus the approx certificate passes and NO exact
    re-draw runs — escalation is the exception path, not a second pass
    paid on every call."""
    from eth_event_stream_spark.plans import assembly
    from eth_event_stream_spark.plans.assembly import _kcenter_contract_row

    out: dict = {}
    n_before = assembly.KCENTER_ESCALATIONS["count"]
    row = _kcenter_contract_row(
        spark, sf_dir, k=16, batch=4, escalation_out=out
    ).collect()[0]
    assert out["escalated"] is False
    assert assembly.KCENTER_ESCALATIONS["count"] == n_before  # no silent 2x
    assert row.cover_certificate_4x is True


def test_kcenter_batched_runs_one_job_per_pass(spark):
    """Round-17 plan-shape gate: the per-pass state checkpoint is LAZY, so
    the pass's candidate fetch is the materializing action — distance
    fold + cache write + top-k run as ONE job per pass, and the final
    pass's state (never read without stats_out) costs no job at all.
    Measured on this driver (k=9, batch=4 -> seed + 2 passes): lazy =
    5 jobs / 160 tasks (seed, 2 fused fetches, plus AQE's per-broadcast
    stage jobs); flipping the checkpoints back to eager = 8 jobs /
    256 tasks (an extra full-state write job per pass incl. the
    never-read final one). The bound pins the fused shape with one job
    of headroom for AQE stage-accounting drift across Spark versions."""
    from eth_event_stream_spark.plans.assembly import sample_kcenter_batched

    e = spark.createDataFrame(
        [(i, [float(i), float(i % 3)]) for i in range(1, 30)],
        "vec_id long, e array<double>",
    )
    sc = spark.sparkContext
    sc.setJobGroup("kcenter-job-count", "round-17 gate")
    try:
        # the loop executes during the call (driver-side greedy), so no
        # action on the returned frame is needed
        sample_kcenter_batched(spark, "", k=9, batch=4, e=e)
    finally:
        sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup("kcenter-job-count")
    assert len(jobs) <= 6, f"expected <=6 jobs (eager form ran 8), got {len(jobs)}"

"""Property tests for the warehouse maintenance algebra.

Two layers, mirroring the repo's other property suites:

1. PURE-PYTHON models of the SCD2 run-collapse fold and the MERGE
   latest-wins fold, with hypothesis driving the property that actually
   carries the incremental maintainers: folding over ANY ordered split of
   the input equals the one-shot computation (split-point invariance).
   Hundreds of examples, no Spark in the loop.
2. Spark conformance: the DataFrame implementations agree with the models
   on seeded random logs (few examples — each is a Spark job; the
   streaming maintainers' end-to-end parity lives in test_warehouse.py).
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from eth_event_stream_spark.plans.warehouse import collapse_runs, event_runs

# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------


def scd2_model(events):
    """events: list of (user, state, ts) with unique increasing ts per user.
    Returns {user: [(state, valid_from, n_events), ...]} maximal runs."""
    out: dict = {}
    for user, state, ts in sorted(events, key=lambda e: (e[0], e[2])):
        runs = out.setdefault(user, [])
        if runs and runs[-1][0] == state:
            s, vf, n = runs[-1]
            runs[-1] = (s, vf, n + 1)
        else:
            runs.append((state, ts, 1))
    return out


def scd2_fold(chunks):
    """Fold chunks (each a list of events, globally ordered across chunks)
    through the run-level algebra: collapse each chunk, concatenate with the
    carried open run, re-collapse — the SCD2Maintainer recipe."""
    hist: dict = {}
    for chunk in chunks:
        batch = scd2_model(chunk)
        for user, new_runs in batch.items():
            runs = hist.setdefault(user, [])
            for state, vf, n in new_runs:
                if runs and runs[-1][0] == state:
                    s, pvf, pn = runs[-1]
                    runs[-1] = (s, pvf, pn + n)
                else:
                    runs.append((state, vf, n))
    return hist


def merge_model(base, chunks):
    """base: {k: v}; chunks: ordered lists of (k, v, op). Latest-wins fold."""
    snap = dict(base)
    for chunk in chunks:
        latest: dict = {}
        for k, v, op in chunk:  # within a chunk, later entries win
            latest[k] = (v, op)
        for k, (v, op) in latest.items():
            if op == "D":
                snap.pop(k, None)
            else:
                snap[k] = v
    return snap


# ---------------------------------------------------------------------------
# the split-invariance properties (pure python, many examples)
# ---------------------------------------------------------------------------


@st.composite
def event_log(draw):
    n_users = draw(st.integers(1, 4))
    n_events = draw(st.integers(1, 40))
    states = ["a", "b", "c"]
    events = []
    for ts in range(n_events):
        user = draw(st.integers(0, n_users - 1))
        state = draw(st.sampled_from(states))
        events.append((user, state, ts))
    return events


@st.composite
def log_and_split(draw):
    events = draw(event_log())
    n_cuts = draw(st.integers(0, 4))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(0, len(events)), min_size=n_cuts, max_size=n_cuts
            )
        )
    )
    bounds = [0] + cuts + [len(events)]
    chunks = [events[a:b] for a, b in zip(bounds, bounds[1:])]
    return events, chunks


@given(log_and_split())
@settings(max_examples=300, deadline=None)
def test_scd2_fold_is_split_invariant(data):
    events, chunks = data
    assert scd2_fold(chunks) == scd2_model(events)


@st.composite
def changelog_and_split(draw):
    n_keys = draw(st.integers(1, 5))
    n_changes = draw(st.integers(0, 30))
    log = []
    for seq in range(n_changes):
        k = draw(st.integers(0, n_keys - 1))
        op = draw(st.sampled_from(["U", "U", "D"]))
        log.append((k, f"v{seq}", op))
    base = {k: f"base{k}" for k in range(draw(st.integers(0, n_keys)))}
    n_cuts = draw(st.integers(0, 3))
    cuts = sorted(
        draw(st.lists(st.integers(0, len(log)), min_size=n_cuts, max_size=n_cuts))
    )
    bounds = [0] + cuts + [len(log)]
    chunks = [log[a:b] for a, b in zip(bounds, bounds[1:])]
    return base, log, chunks


@given(changelog_and_split())
@settings(max_examples=300, deadline=None)
def test_merge_fold_is_split_invariant(data):
    base, log, chunks = data
    assert merge_model(base, chunks) == merge_model(base, [log])


# ---------------------------------------------------------------------------
# Spark conformance against the model (seeded, few examples)
# ---------------------------------------------------------------------------


def test_spark_scd2_matches_model_on_random_logs(spark):
    for seed in (7, 23, 99):
        rng = random.Random(seed)
        events = [
            (rng.randrange(5), rng.choice("abc"), ts) for ts in range(120)
        ]
        df = spark.createDataFrame(
            [
                (u, s, f"2024-01-01 00:{ts // 60:02d}:{ts % 60:02d}", ts)
                for u, s, ts in events
            ],
            ["user_id", "event_type", "ts", "event_id"],
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {}
        for r in collapse_runs(event_runs(df)).collect():
            got.setdefault(r.user_id, []).append(
                (r.state, r.valid_from.minute * 60 + r.valid_from.second, r.n_events)
            )
        for runs in got.values():
            runs.sort(key=lambda x: x[1])
        want = {
            u: [(s, vf, n) for s, vf, n in runs]
            for u, runs in scd2_model(events).items()
        }
        assert got == want, f"seed {seed}"

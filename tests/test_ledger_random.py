"""Randomized cross-checks for the ledger analytics.

The DuckDB oracles in ``plans/ledger.py`` share the *query structure* with
the Spark plans (window + lead for TWAB, join + group-by rounds for
PageRank), so a structural misconception would hit both sides identically.
These tests check the Spark cores against brute-force Python simulations
that share NO structure: TWAB by literally walking every block of the
range, PageRank by dict-based dense iteration.
"""

from __future__ import annotations

import random
from decimal import Decimal
from fractions import Fraction

from eth_event_stream_spark.plans.ledger import (
    _PR_BASE,
    _PR_SCALE,
    pagerank_of,
    pagerank_weighted_of,
    twab_of,
)


def _sim_twab(flows, block_end):
    """Brute force: walk EVERY block from the entity's first event to
    block_end, accumulating the running balance — O(range), no windows."""
    by_user = {}
    for uid, blk, delta in flows:
        by_user.setdefault(uid, {}).setdefault(blk, Decimal(0))
        by_user[uid][blk] += delta
    out = {}
    for uid, deltas in by_user.items():
        first = min(deltas)
        bal, num = Decimal(0), Decimal(0)
        for blk in range(first, block_end):
            bal += deltas.get(blk, Decimal(0))
            num += bal
        span = block_end - first
        out[uid] = (num, span, float(num) / float(span))
    return out


def test_twab_matches_blockwise_simulation(spark):
    rng = random.Random(20240814)
    flows = []
    block_end = 250
    for uid in range(1, 13):
        first = rng.randint(0, 200)
        for _ in range(rng.randint(1, 15)):
            blk = rng.randint(first, 240)
            # scale(6) decimals, signed
            delta = Decimal(rng.randint(-500_000_000, 500_000_000)) / Decimal(10**6)
            flows.append((uid, blk, delta))
    df = spark.createDataFrame(
        flows, "user_id bigint, block bigint, delta decimal(18,6)"
    ).groupBy("user_id", "block").agg({"delta": "sum"}).withColumnRenamed(
        "sum(delta)", "delta"
    )
    got = {
        r["user_id"]: (r["twab_num"], r["span_blocks"], r["twab"])
        for r in twab_of(df, block_end).collect()
    }
    want = _sim_twab(flows, block_end)
    assert set(got) == set(want)
    for uid in want:
        num, span, twab = want[uid]
        assert got[uid][0] == float(num), (uid, got[uid], want[uid])
        assert got[uid][1] == span
        assert got[uid][2] == twab


def _sim_pagerank(edges, rounds):
    """Dense dict iteration with the same integer contract (floor division,
    scale 1e12) but none of the join/group-by structure."""
    out_nbrs = {}
    for s, d in edges:
        out_nbrs.setdefault(s, []).append(d)
    ranks = {n: _PR_SCALE for n in out_nbrs}
    for _ in range(rounds):
        mass = {n: 0 for n in out_nbrs}
        for s, nbrs in out_nbrs.items():
            share = ranks[s] // len(nbrs)
            for d in nbrs:
                mass[d] += share
        ranks = {n: _PR_BASE + (85 * mass[n]) // 100 for n in out_nbrs}
    return ranks


def test_pagerank_matches_dense_simulation(spark):
    rng = random.Random(77)
    # random undirected bipartite-ish graph, some multi-edges collapsed
    pairs = {
        (f"a{rng.randint(0, 15)}", f"b{rng.randint(0, 9)}") for _ in range(60)
    }
    edges = [(s, d) for s, d in pairs] + [(d, s) for s, d in pairs]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank_scaled"] for r in pagerank_of(df, rounds=4).collect()}
    want = _sim_pagerank(edges, rounds=4)
    assert got == want


def test_pagerank_reliable_checkpoint_matches_local(spark, tmp_path):
    """The cluster-mode materialization (reliable checkpoint() into a
    checkpoint dir — survives executor loss) must produce bit-identical
    ranks to the local-mode default (localCheckpoint), and must actually
    write recovery state into the directory."""
    rng = random.Random(78)
    pairs = {
        (f"a{rng.randint(0, 15)}", f"b{rng.randint(0, 9)}") for _ in range(60)
    }
    edges = [(s, d) for s, d in pairs] + [(d, s) for s, d in pairs]
    df = spark.createDataFrame(edges, "src string, dst string")
    local = {r["node"]: r["rank_scaled"] for r in pagerank_of(df, rounds=4).collect()}
    ckdir = str(tmp_path / "pr_ck")
    reliable = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_of(df, rounds=4, checkpoint_dir=ckdir).collect()
    }
    assert reliable == local
    import pathlib

    written = list(pathlib.Path(ckdir).rglob("*"))
    assert any(p.is_file() for p in written), "no reliable checkpoint files"


def _sim_pagerank_weighted(edges, rounds):
    """Dense dict iteration of the weighted contract: contribution u->v is
    (rank_u * w_uv) // W_u."""
    out_edges = {}
    for s, d, w in edges:
        out_edges.setdefault(s, []).append((d, w))
    wout = {s: sum(w for _, w in nbrs) for s, nbrs in out_edges.items()}
    ranks = {n: _PR_SCALE for n in out_edges}
    for _ in range(rounds):
        mass = {n: 0 for n in out_edges}
        for s, nbrs in out_edges.items():
            for d, w in nbrs:
                mass[d] += (ranks[s] * w) // wout[s]
        ranks = {n: _PR_BASE + (85 * mass[n]) // 100 for n in out_edges}
    return ranks


def test_pagerank_weighted_matches_dense_simulation(spark):
    rng = random.Random(1234)
    pairs = {}
    for _ in range(70):
        key = (f"a{rng.randint(0, 12)}", f"b{rng.randint(0, 7)}")
        pairs[key] = rng.randint(1, 9)
    edges = [(s, d, w) for (s, d), w in pairs.items()] + [
        (d, s, w) for (s, d), w in pairs.items()
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w bigint")
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_weighted_of(df, rounds=4).collect()
    }
    want = _sim_pagerank_weighted(edges, rounds=4)
    assert got == want


def test_pagerank_weighted_uniform_weights_equal_unweighted(spark):
    """With every edge weight equal, the weighted fold must reproduce the
    unweighted ranks EXACTLY: (rank * w) // (deg * w) == rank // deg only
    when w divides evenly — which uniform w=1 guarantees."""
    rng = random.Random(9)
    pairs = {(f"x{rng.randint(0, 10)}", f"y{rng.randint(0, 6)}") for _ in range(40)}
    plain = [(s, d) for s, d in pairs] + [(d, s) for s, d in pairs]
    weighted = [(s, d, 1) for s, d in plain]
    a = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_of(
            spark.createDataFrame(plain, "src string, dst string")
        ).collect()
    }
    b = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_weighted_of(
            spark.createDataFrame(weighted, "src string, dst string, w bigint")
        ).collect()
    }
    assert a == b


def test_pagerank_ranks_degree_monotone_on_star(spark):
    """On a star graph the hub must outrank every leaf, and all leaves tie
    — the qualitative property PageRank exists to deliver."""
    leaves = [f"leaf{i}" for i in range(8)]
    edges = [("hub", l) for l in leaves] + [(l, "hub") for l in leaves]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank_scaled"] for r in pagerank_of(df).collect()}
    hub = got.pop("hub")
    assert len(set(got.values())) == 1  # leaves tie exactly
    assert hub > max(got.values())
    # and the exact-arithmetic fixpoint bound: total mass never exceeds N
    assert sum([hub, *got.values()]) <= 9 * _PR_SCALE


def test_twab_constant_balance_is_exact(spark):
    """One deposit at block 0, nothing after: TWAB == the deposit (the
    integral of a constant), bit-for-bit down to the documented rounding:
    the exact decimal numerator rounds to double ONCE, then one IEEE
    division — no accumulated float error, no tolerance needed."""
    df = spark.createDataFrame(
        [(1, 0, Decimal("123.456789"))], "user_id bigint, block bigint, delta decimal(18,6)"
    )
    row = twab_of(df, 1000).collect()[0]
    exact_num = Decimal("123.456789") * 1000
    assert Fraction(row["twab_num"]) == Fraction(float(exact_num))
    assert row["span_blocks"] == 1000
    assert Fraction(row["twab"]) == Fraction(float(exact_num) / 1000.0)


def test_recursive_ancestors_matches_python_walk(spark, sf_dir):
    """Structure-free check for the WITH RECURSIVE query: recompute every
    seed's ancestor chain with a plain Python while-loop over the same
    parquet keys and compare all four aggregates."""
    import duckdb

    keys = {
        r[0]
        for r in duckdb.sql(
            f"SELECT o_orderkey FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
    }
    want = {}
    for root in sorted(k for k in keys if k <= 200):
        node, depth, chain = root, 0, [root]
        while node // 2 >= 1:
            node //= 2
            depth += 1
            chain.append(node)
        want[root] = (
            depth,
            sum(chain),
            sum(1 for n in chain[1:] if n in keys),
        )

    from eth_event_stream_spark.plans import QUERIES

    got = {
        r["root"]: (r["chain_len"], r["key_path_sum"], r["n_real_ancestors"])
        for r in QUERIES["sql_recursive_ancestors"].fn(spark, sf_dir).collect()
    }
    assert got == want


def _sim_pagerank_directed(nodes, edges, rounds):
    """Dense dict iteration of the DIRECTED contract with dangling-mass
    redistribution: contribution u->v = (rank_u * w_uv) // W_u, plus every
    node receives dangling_total // N, all through the damping factor."""
    out_edges = {}
    for s, d, w in edges:
        out_edges.setdefault(s, []).append((d, w))
    wout = {s: sum(w for _, w in nbrs) for s, nbrs in out_edges.items()}
    ranks = {n: _PR_SCALE for n in nodes}
    n = len(nodes)
    for _ in range(rounds):
        dang = sum(ranks[v] for v in nodes if v not in wout)
        mass = {v: 0 for v in nodes}
        for s, nbrs in out_edges.items():
            for d, w in nbrs:
                mass[d] += (ranks[s] * w) // wout[s]
        ranks = {
            v: _PR_BASE + (85 * (mass[v] + dang // n)) // 100 for v in nodes
        }
    return ranks


def test_pagerank_directed_matches_dense_simulation(spark):
    """Random DIRECTED graph with genuine dangling nodes (sinks) and
    zero-in-degree nodes — the regimes the undirected forms exclude by
    contract. The Spark fixed-point must match the dense simulation bit
    for bit, dangling mass must not vanish (total mass sanity), and the
    reliable-checkpoint mode must be bit-identical."""
    from eth_event_stream_spark.plans.ledger import pagerank_directed_of

    rng = random.Random(416)
    edges_d = {}
    for _ in range(80):
        s, d = rng.randint(0, 11), rng.randint(0, 17)
        if s != d:
            # nodes n12..n17 never appear as src -> dangling sinks
            edges_d[(f"n{s}", f"n{d}")] = rng.randint(1, 9)
    edges = [(s, d, w) for (s, d), w in edges_d.items()]
    nodes = sorted({x for e in edges for x in e[:2]})
    assert any(v not in {s for s, _, _ in edges} for v in nodes)  # dangling

    ndf = spark.createDataFrame([(n,) for n in nodes], "node string")
    edf = spark.createDataFrame(edges, "src string, dst string, w bigint")
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_directed_of(ndf, edf, rounds=4).collect()
    }
    want = _sim_pagerank_directed(nodes, edges, rounds=4)
    assert got == want
    # dangling mass is redistributed, not leaked: every node's rank sits
    # strictly above the bare base (it received at least the dang share)
    assert all(v > _PR_BASE for v in got.values())


def test_pagerank_directed_reliable_checkpoint_matches_local(spark, tmp_path):
    from eth_event_stream_spark.plans.ledger import pagerank_directed_of

    rng = random.Random(417)
    edges_d = {}
    for _ in range(60):
        s, d = rng.randint(0, 9), rng.randint(0, 14)
        if s != d:
            edges_d[(f"n{s}", f"n{d}")] = rng.randint(1, 5)
    edges = [(s, d, w) for (s, d), w in edges_d.items()]
    nodes = sorted({x for e in edges for x in e[:2]})
    ndf = spark.createDataFrame([(n,) for n in nodes], "node string")
    edf = spark.createDataFrame(edges, "src string, dst string, w bigint")
    local = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_directed_of(ndf, edf, rounds=4).collect()
    }
    reliable = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_directed_of(
            ndf, edf, rounds=4, checkpoint_dir=str(tmp_path / "prd_ck")
        ).collect()
    }
    assert reliable == local


def _sim_harmonic_kmv(nodes, edges, rounds, k):
    """Dense dict simulation of the KMV-HyperBall contract: md5-prefix
    hashes, k-min set merges over in-neighbors, integer KMV estimate,
    fixed-point 1/t accumulation."""
    import hashlib

    M = 16 ** 13
    hv = {
        v: int(hashlib.md5(v.encode()).hexdigest()[:13], 16) for v in nodes
    }
    in_nbrs = {}
    for s, d in edges:
        in_nbrs.setdefault(d, []).append(s)

    def est(s):
        ss = sorted(s)
        return len(ss) if len(ss) < k else (k - 1) * M // ss[k - 1]

    sk = {v: {hv[v]} for v in nodes}
    prev = {v: 1 for v in nodes}
    harm = {v: 0 for v in nodes}
    for t in range(1, rounds + 1):
        new = {}
        for v in nodes:
            u = set(sk[v])
            for w in in_nbrs.get(v, []):
                u |= sk[w]
            new[v] = set(sorted(u)[:k])
        sk = new
        for v in nodes:
            e = est(sk[v])
            harm[v] += max(0, e - prev[v]) * 1_000_000 // t
            prev[v] = e
    return {v: (harm[v], est(sk[v])) for v in nodes}


def test_harmonic_kmv_matches_dense_simulation(spark):
    """Random directed graph with multi-hop chains, sinks, and enough
    density that balls EXCEED the sketch capacity (k=4) — both the
    exact-count regime and the KMV-estimator regime must match the
    dense simulation bit for bit, including the capped-sketch kth-min
    arithmetic and the per-round 1/t accumulation."""
    from eth_event_stream_spark.plans.ledger import harmonic_centrality_of

    rng = random.Random(1618)
    edges = sorted(
        {
            (f"n{rng.randint(0, 19)}", f"n{rng.randint(0, 19)}")
            for _ in range(70)
        }
    )
    edges = [(s, d) for s, d in edges if s != d]
    # a near-isolated appendage keeps the exact-count (< k) regime in
    # play: z1 has no in-edges, so its ball stays {z1} forever
    edges.append(("z1", "z2"))
    nodes = sorted({x for e in edges for x in e})
    k = 4
    ndf = spark.createDataFrame([(n,) for n in nodes], "node string")
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: (r["harmonic_fp"], r["ball_est"])
        for r in harmonic_centrality_of(ndf, edf, rounds=3, k=k).collect()
    }
    want = _sim_harmonic_kmv(nodes, edges, rounds=3, k=k)
    assert got == want
    # both regimes were exercised: some ball still exact-counted under
    # capacity, some capped into the KMV-estimator arithmetic
    assert any(b < k for _, b in want.values())
    assert any(b >= k for _, b in want.values())

"""Randomized cross-checks for the round-6 assembly/curation operators.

The DuckDB oracles in ``plans/assembly.py`` / ``plans/curation.py`` share
query STRUCTURE with the Spark plans (same closed-form waterfill, same
prefix+verify shape), so a structural misconception would hit both sides
identically. These tests check the df-level cores against brute-force
Python implementations that share no structure: waterfill by literally
raising an integer water level one unit at a time, prefix-filter pairs by
all-pairs exact Jaccard over every document pair, KMV by sorting the full
hash universe in Python.
"""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Waterfill vs unit-step simulation
# ---------------------------------------------------------------------------


def _sim_waterfill(avails: dict[str, int], budget: int) -> dict[str, int]:
    """Brute force: raise an integer level L until the next unit would
    exceed the budget; alloc = min(avail, L). O(max_avail) — shares nothing
    with the closed form."""
    level = 0
    while True:
        nxt = sum(min(a, level + 1) for a in avails.values())
        if nxt > budget:
            break
        level += 1
        if level > max(avails.values()):
            break
    return {k: min(a, level) for k, a in avails.items()}


def _spark_waterfill(spark, avails: dict[str, int], budget: int) -> dict[str, int]:
    """Run the closed-form plan body on an arbitrary (lang, avail) frame.

    Mirrors mix_waterfill_allocation's post-aggregation logic exactly (the
    registered query derives `per` from documents and budget from a ratio;
    here both are injected, which is the production interface anyway)."""
    per = spark.createDataFrame(
        [(k, v) for k, v in avails.items()], "lang string, avail long"
    )
    n = len(avails)
    other = per.select(F.col("lang").alias("lang2"), F.col("avail").alias("avail2"))
    before = (F.col("avail2") < F.col("avail")) | (
        (F.col("avail2") == F.col("avail")) & (F.col("lang2") < F.col("lang"))
    )
    ranked = (
        per.join(F.broadcast(other), before, "left")
        .groupBy("lang", "avail")
        .agg(
            (F.count("lang2") + 1).alias("i"),
            F.coalesce(F.sum("avail2"), F.lit(0)).cast("bigint").alias("cum_before"),
        )
    )
    flagged = ranked.withColumn(
        "fully",
        F.when(
            F.col("cum_before") + F.col("avail") * (n - F.col("i") + 1) <= budget,
            1,
        ).otherwise(0),
    )
    full_tot = flagged.agg(
        F.coalesce(F.sum(F.when(F.col("fully") == 1, F.col("avail"))), F.lit(0))
        .cast("bigint")
        .alias("sum_full"),
        F.coalesce(F.sum("fully"), F.lit(0)).alias("n_full"),
    )
    rows = (
        flagged.crossJoin(F.broadcast(full_tot))
        .select(
            "lang",
            F.when(F.col("fully") == 1, F.col("avail"))
            .otherwise(F.expr(f"({budget} - sum_full) div ({n} - n_full)"))
            .cast("bigint")
            .alias("alloc"),
        )
        .collect()
    )
    return {r["lang"]: r["alloc"] for r in rows}


@pytest.mark.slow  # 12-trial random simulation grid (~13 s) — full tier;
# test_waterfill_degenerate_budgets keeps the operator in the default tier
def test_waterfill_matches_unit_step_simulation(spark):
    rng = random.Random(6)
    for trial in range(12):
        n = rng.randint(1, 8)
        avails = {f"l{i}": rng.randint(1, 500) for i in range(n)}
        total = sum(avails.values())
        budget = rng.randint(1, total)
        got = _spark_waterfill(spark, avails, budget)
        want = _sim_waterfill(avails, budget)
        # the closed form spends budget - sum(want) < n_capped extra units
        # NEVER: both definitions allocate min(avail, L) for an integer L;
        # they must agree exactly
        assert got == want, (trial, avails, budget, got, want)
        assert sum(got.values()) <= budget


def test_waterfill_degenerate_budgets(spark):
    avails = {"a": 10, "b": 20, "c": 300}
    # budget >= total: everything fully allocated
    assert _spark_waterfill(spark, avails, 1000) == avails
    assert _spark_waterfill(spark, avails, 330) == avails
    # budget below n * min(avail): nobody full, uniform level
    assert _spark_waterfill(spark, avails, 9) == {"a": 3, "b": 3, "c": 3}


# ---------------------------------------------------------------------------
# Prefix-filter pairs vs all-pairs brute force
# ---------------------------------------------------------------------------


def _shingles(text: str) -> set[str]:
    toks = text.lower().split(" ")
    if len(toks) < 3:
        return set()
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def _brute_pairs(docs: dict[int, str]) -> set[tuple[int, int]]:
    out = set()
    ids = sorted(docs)
    for i, a in enumerate(ids):
        sa = _shingles(docs[a])
        if not sa:
            continue
        for b in ids[i + 1 :]:
            sb = _shingles(docs[b])
            if not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.8:
                out.add((a, b))
    return out


@pytest.mark.slow  # random-corpus completeness grid — full tier
def test_prefix_filter_pairs_complete_on_random_corpora(spark):
    """Losslessness on data the oracle never sees: random near-dup corpora
    (mutated copies of base docs) — the prefix join must find EXACTLY the
    all-pairs ground truth, including chains the LSH bands could miss."""
    from eth_event_stream_spark.plans.curation import prefix_filter_pairs

    rng = random.Random(66)
    words = [f"w{i}" for i in range(40)]
    for trial in range(4):
        docs: dict[int, str] = {}
        did = 0
        for base in range(6):
            base_toks = [rng.choice(words) for _ in range(rng.randint(8, 20))]
            for copy in range(rng.randint(1, 4)):
                toks = list(base_toks)
                if copy and rng.random() < 0.8:
                    # light mutation: tweak one token (often stays >= 0.8)
                    toks[rng.randrange(len(toks))] = rng.choice(words)
                docs[did] = " ".join(toks)
                did += 1
        df = spark.createDataFrame(
            [(k, v) for k, v in docs.items()], "doc_id long, text string"
        )
        got = {
            (r["doc_a"], r["doc_b"]) for r in prefix_filter_pairs(df).collect()
        }
        want = _brute_pairs(docs)
        assert got == want, (trial, got ^ want)


# ---------------------------------------------------------------------------
# KMV estimate vs Python order statistics
# ---------------------------------------------------------------------------


def test_kmv_formula_matches_python(spark, sf_dir):
    """The registered query's (k_actual, kth_hash, est) must equal a
    from-scratch Python computation over the same md5 hash universe."""
    from eth_event_stream_spark.plans.assembly import KMV_K, _KMV_H, sketch_kmv_distinct

    row = sketch_kmv_distinct(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    toks = {t for r in docs for t in r["text"].lower().split(" ")}
    hashes = sorted({int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks})
    k = min(KMV_K, len(hashes))
    kth = hashes[k - 1]
    est = len(hashes) if k < KMV_K else (k - 1) * _KMV_H // kth
    assert row["k_actual"] == k
    assert row["kth_hash"] == kth
    assert row["est_distinct"] == est
    assert row["exact_distinct"] == len(toks)


# ---------------------------------------------------------------------------
# Histogram quantiles vs Python
# ---------------------------------------------------------------------------


def test_histogram_quantiles_match_python(spark, sf_dir):
    from eth_event_stream_spark.plans.curation import (
        HIST_BUCKET_TOKENS,
        HIST_QS,
        sketch_histogram_quantiles,
    )

    rows = {r["q"]: r for r in sketch_histogram_quantiles(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    lens = sorted(len(r["text"].lower().split(" ")) for r in docs)
    n = len(lens)
    for q in HIST_QS:
        k = -(-q * n // 100)  # ceil
        exact = lens[k - 1]
        est = rows[q]["est_tokens_le"]
        # estimate = upper edge of the bucket holding the exact quantile
        assert est == (exact // HIST_BUCKET_TOKENS + 1) * HIST_BUCKET_TOKENS - 1
        assert rows[q]["n_docs"] == n


# ---------------------------------------------------------------------------
# Hybrid RRF vs from-scratch Python (both lanes + fusion)
# ---------------------------------------------------------------------------


def test_hybrid_rrf_matches_python(spark, sf_dir):
    """Recompute both retrieval lanes and the fusion from raw parquet in
    plain Python (no SQL, no windows) and compare with the registered
    query — the oracle shares the window-rank shape with the Spark plan,
    this check shares nothing."""
    import math

    from eth_event_stream_spark.plans.retrieval import (
        IDF_SCALE,
        QUERY_TERMS,
        RRF_K,
        RRF_SCALE,
        TOPK_FUSED,
        TOPK_LANE,
        search_hybrid_rrf,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    embs = {
        r["vec_id"]: list(r["embedding"])
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    # keyword lane
    tf = {
        d: {t: text.lower().split(" ").count(t) for t in QUERY_TERMS}
        for d, text in docs.items()
    }
    df = {t: sum(1 for d in tf if tf[d][t] > 0) for t in QUERY_TERMS}
    n = len(docs)
    scores = {
        d: sum(tf[d][t] * ((n * IDF_SCALE) // df[t]) for t in QUERY_TERMS if df[t])
        for d in docs
    }
    scores = {d: s for d, s in scores.items() if s > 0}
    kw_rank = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:TOPK_LANE]
        )
    }

    # vector lane (same 6-decimal rounding as the query)
    q = embs[0]
    nq = math.sqrt(sum(x * x for x in q))

    def cos(v):
        dot = sum(float(a) * float(b) for a, b in zip(v, q))
        return round(dot / (math.sqrt(sum(float(a) ** 2 for a in v)) * nq), 6)

    cosines = {vid: cos(v) for vid, v in embs.items() if vid != 0}
    vec_rank = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(cosines.items(), key=lambda kv: (-kv[1], kv[0]))[:TOPK_LANE]
        )
    }

    fused = {}
    for d in set(kw_rank) | set(vec_rank):
        fused[d] = (
            (RRF_SCALE // (RRF_K + kw_rank[d]) if d in kw_rank else 0)
            + (RRF_SCALE // (RRF_K + vec_rank[d]) if d in vec_rank else 0)
        )
    want = {
        (d, kw_rank.get(d), vec_rank.get(d), s)
        for d, s in sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:TOPK_FUSED]
    }
    got = {
        (r["doc_id"], r["rank_kw"], r["rank_vec"], r["rrf_score"])
        for r in search_hybrid_rrf(spark, sf_dir).collect()
    }
    assert got == want, got ^ want


# ---------------------------------------------------------------------------
# Round-7 ops vs plain-Python recomputation (hashlib / math.isqrt — no SQL
# structure shared with either engine)
# ---------------------------------------------------------------------------


def test_temperature_allocation_matches_python(spark, sf_dir):
    """mix_temperature_allocation vs a dict-and-isqrt recomputation: token
    counts per lang, weight = isqrt(avail) (the INTEGER sqrt — proves
    floor(IEEE sqrt) lands on it for these magnitudes), budget and ppm
    shares by plain integer ops."""
    import math

    from eth_event_stream_spark.plans import QUERIES
    from eth_event_stream_spark.plans.assembly import (
        MIX_BUDGET_DEN,
        MIX_BUDGET_NUM,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    avail: dict[str, int] = {}
    for r in docs:
        avail[r["lang"]] = avail.get(r["lang"], 0) + len(
            r["text"].lower().split(" ")
        )
    weights = {k: math.isqrt(v) for k, v in avail.items()}
    total = sum(avail.values())
    budget = total * MIX_BUDGET_NUM // MIX_BUDGET_DEN
    sum_w = sum(weights.values())
    want = {
        (
            k,
            avail[k],
            weights[k],
            budget * weights[k] // sum_w,
            avail[k] * 1_000_000 // total,
            weights[k] * 1_000_000 // sum_w,
        )
        for k in avail
    }
    got = {
        (
            r["lang"],
            r["avail_tokens"],
            r["weight"],
            r["alloc_tokens"],
            r["prop_ppm"],
            r["temp_ppm"],
        )
        for r in QUERIES["mix_temperature_allocation"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_training_shuffle_matches_python(spark, sf_dir):
    """layout_training_shuffle vs hashlib: same md5 keys, shards = key
    prefix, positions = sort order within shard — and reading (shard, pos)
    in order is exactly the global key order (the one-permutation
    property)."""
    import hashlib

    from eth_event_stream_spark.plans import QUERIES
    from eth_event_stream_spark.plans.layout import SHUFFLE_EPOCH

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    keyed = [
        (hashlib.md5(f"{SHUFFLE_EPOCH}:{i}".encode()).hexdigest(), i) for i in ids
    ]
    by_shard: dict[str, list] = {}
    for k, i in keyed:
        by_shard.setdefault(k[:2], []).append((k, i))
    want = set()
    for shard, members in by_shard.items():
        for pos, (k, i) in enumerate(sorted(members), start=1):
            want.add((i, k, shard, pos))
    rows = QUERIES["layout_training_shuffle"].fn(spark, sf_dir).collect()
    got = {
        (r["doc_id"], r["shuffle_key"], r["shard"], r["pos_in_shard"])
        for r in rows
    }
    assert got == want
    # the permutation property: global key order == (shard, pos) order
    by_key = [i for _, i in sorted(keyed)]
    by_shard_pos = [
        t[0] for t in sorted(got, key=lambda t: (t[2], t[3]))
    ]
    assert by_key == by_shard_pos


def test_priority_sample_matches_python(spark, sf_dir):
    """sample_topk_priority vs hashlib: the N smallest md5 priorities,
    verbatim."""
    import hashlib

    from eth_event_stream_spark.plans import QUERIES
    from eth_event_stream_spark.plans.assembly import PRIORITY_SAMPLE_N

    rows = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    keyed = sorted(
        (hashlib.md5(f"prio:{r['doc_id']}".encode()).hexdigest(), r["doc_id"], r["lang"])
        for r in rows
    )[:PRIORITY_SAMPLE_N]
    want = [(d, lang, k) for k, d, lang in keyed]
    got = [
        (r["doc_id"], r["lang"], r["priority"])
        for r in QUERIES["sample_topk_priority"].fn(spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(want)


def test_cdc_chunks_match_python_and_survive_prefix_edits(spark):
    """Content-defined chunking, two properties on synthetic revisions:

    1. the Spark core equals a plain-Python (hashlib) recomputation of
       the same boundary rule — no SQL structure shared;
    2. the POINT of CDC: prepending an intro to a document leaves every
       chunk after the first post-edit boundary with an UNCHANGED hash,
       while fixed-size chunking shifts every chunk. Quantified: the
       revised doc must share all but O(1) of the original's chunk
       hashes; fixed chunking shares (almost) none."""
    import hashlib
    import random

    from eth_event_stream_spark.plans.pipeline import CHUNK_TOKENS, cdc_chunks_of

    rng = random.Random(41)
    words = [f"w{rng.randint(0, 300)}" for _ in range(600)]
    base = " ".join(words)
    revised = "a fresh intro sentence prepended here " + base

    def py_cdc(text):
        toks = text.lower().split(" ")
        chunks, cur = [], []
        for i, tok in enumerate(toks):
            if (
                i > 0
                and hashlib.md5(f"{toks[i - 1]} {tok}".encode()).hexdigest()[0]
                == "0"
            ):
                chunks.append(cur)
                cur = []
            cur.append(tok)
        chunks.append(cur)
        return {
            (ci, len(c), hashlib.md5(" ".join(c).encode()).hexdigest())
            for ci, c in enumerate(chunks)
        }

    df = spark.createDataFrame(
        [(1, base), (2, revised)], "doc_id long, text string"
    )
    got = {}
    for r in cdc_chunks_of(df).collect():
        got.setdefault(r["doc_id"], set()).add(
            (r["chunk_idx"], r["n_tokens"], r["chunk_hash"])
        )
    assert got[1] == py_cdc(base)
    assert got[2] == py_cdc(revised)

    # shift resistance: hash sets (position-independent) overlap almost
    # completely under a prefix edit...
    h1 = {h for _, _, h in got[1]}
    h2 = {h for _, _, h in got[2]}
    assert len(h1) > 10  # the corpus actually chunked
    assert len(h1 - h2) <= 1  # only the first chunk (pre-boundary) changed
    # ...while FIXED chunking loses essentially everything to the shift
    def fixed_hashes(text):
        toks = text.lower().split(" ")
        return {
            hashlib.md5(
                " ".join(toks[i : i + CHUNK_TOKENS]).encode()
            ).hexdigest()
            for i in range(0, len(toks), CHUNK_TOKENS)
        }

    f1, f2 = fixed_hashes(base), fixed_hashes(revised)
    assert len(f1 & f2) <= 1

    # regression: documents with fewer than two tokens must chunk to one
    # chunk, not crash (sequence(2, 1) is the DESCENDING [2, 1] in Spark,
    # which used to index element_at(toks, 2) out of bounds)
    short = spark.createDataFrame(
        [(10, "hello"), (11, ""), (12, "two tokens")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        for r in cdc_chunks_of(short).collect()
    }
    assert rows[10] == (0, 1, "hello")
    assert rows[11] == (0, 1, "")  # split('') tokenizes to ['']
    assert rows[12][1] == 2

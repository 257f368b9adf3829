#!/usr/bin/env python
"""Scale-rehearsal data generator: replicate the FACT tables of an sf dir
``factor``x with key-shifted copies, keeping dimension tables fixed — the
shape a real scale-up takes (facts dominate; dims grow slowly).

Key shifts preserve join semantics (lineitem.l_orderkey shifts with
orders.o_orderkey) and row identity (event/doc/vec ids stay unique).

Two replication modes:

* ``jitter`` (default) — replicated facts are DECORRELATED so marginal
  distributions scale realistically and density-sensitive operators
  (graph projections, token co-occurrence, near-dup pair mining) measure
  the ALGORITHM's slope, not a generator artifact:

  - ``part`` and ``supplier`` scale WITH the facts (TPC-H semantics:
    catalog size grows with volume; only region/nation/customer stay
    fixed): each replica gets a key-shifted dim copy and
    ``lineitem.l_partkey`` / ``l_suppkey`` shift into that replica's
    range. Joins stay valid, per-key local density is CONSTANT, and the
    part co-purchase graph grows exactly linearly in data. (A mod-N
    rotation inside the fixed key range was tried first and rejected:
    rotated support-1 pairs collide in the small key space and fabricate
    support-2 edges — 96x edge growth at 10x, worse than verbatim.)
    ``o_custkey`` stays verbatim: orders >> customers at any real scale,
    so per-customer fact densification is the realistic shape there.
  - ``documents.text`` tokens get a per-replica suffix (``tok`` →
    ``tok·rI``), so replica vocabularies are disjoint: shingle/token df
    and co-occurrence support stay at their base-scale values instead of
    multiplying ``factor``×, and no cross-replica near-dup cliques are
    fabricated. WITHIN-replica near-dup structure is preserved exactly
    (a uniform suffix is Jaccard-neutral), so dedup output scales
    linearly — the realistic shape.
  - ``embeddings.embedding`` components get a small deterministic
    perturbation (hash(vec_id, replica, idx)-seeded, |delta| <= 0.01) so
    ANN indexes see ``factor``× distinct vectors, not ``factor``-cliques
    of identical points collapsing into the same cells.

* ``--verbatim`` — the pre-round-8 behavior: document texts and
  embeddings replicated VERBATIM, which turns every document into a
  ``factor``-clique of near-duplicates. Deliberately adversarial: a
  duplicate-heavy corpus is exactly what the capped dedup paths must
  bound. Use this mode to stress the collapse shield / cap family.

Usage: python tools/gen_scale.py SRC_SF_DIR DST_DIR FACTOR [--verbatim]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from eth_event_stream_spark.session import get_spark  # noqa: E402

DIMS = ["region", "nation", "customer", "supplier", "part"]
# fact table -> columns to shift by replica * stride (stride = global max+1
# of the PRIMARY key so every replica's ids are disjoint)
FACTS: dict[str, tuple[str, list[str]]] = {
    "orders": ("o_orderkey", ["o_orderkey"]),
    "lineitem": ("l_orderkey", ["l_orderkey"]),  # same stride as orders
    "events": ("event_id", ["event_id"]),
    "documents": ("doc_id", ["doc_id"]),
    "embeddings": ("vec_id", ["vec_id"]),
}

# dims that scale WITH the facts in jitter mode (TPC-H semantics), with
# the lineitem FKs that shift into each replica's key range
SCALED_DIMS = {"part": "p_partkey", "supplier": "s_suppkey"}


def _jitter_replica(name: str, rep: DataFrame, i: int, dims: dict[str, int]) -> DataFrame:
    if name == "lineitem":
        rep = rep.withColumn("l_partkey", F.col("l_partkey") + F.lit(i * dims["part"]))
        rep = rep.withColumn("l_suppkey", F.col("l_suppkey") + F.lit(i * dims["supplier"]))
    elif name == "documents":
        # suffix every token: disjoint vocab per replica, Jaccard-neutral
        # within the replica (every token of every doc gets the suffix)
        rep = rep.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", rf"$1·r{i}")
        )
        if "n_chars" in rep.columns:
            rep = rep.withColumn("n_chars", F.length("text").cast("long"))
    elif name == "embeddings":
        # deterministic per-component perturbation, |delta| <= 0.01
        rep = rep.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, idx: (
                    x
                    + (
                        F.pmod(F.hash(F.col("vec_id"), F.lit(i), idx), F.lit(2001))
                        - F.lit(1000)
                    ).cast("float")
                    / F.lit(100000.0).cast("float")
                ).cast("float"),
            ),
        )
    return rep


def _replicate(
    name: str,
    df: DataFrame,
    shift_cols: list[str],
    stride: int,
    factor: int,
    jitter: bool,
    dims: dict[str, int],
) -> DataFrame:
    out = df
    for i in range(1, factor):
        rep = df
        for c in shift_cols:
            rep = rep.withColumn(c, F.col(c) + F.lit(i * stride))
        if jitter:
            rep = _jitter_replica(name, rep, i, dims)
        out = out.unionByName(rep)
    return out


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    jitter = "--verbatim" not in sys.argv[4:]
    spark = get_spark(app_name="gen_scale")
    os.makedirs(dst, exist_ok=True)

    dims: dict[str, int] = {}
    for name in DIMS:
        d = spark.read.parquet(f"{src}/{name}.parquet")
        dims[name] = d.count()
        if jitter and name in SCALED_DIMS:
            # catalog scales with volume: replica i's copy lives in the
            # key range [i*N, (i+1)*N) that its lineitem FKs point into
            _replicate(name, d, [SCALED_DIMS[name]], dims[name], factor, False, dims).write.mode(
                "overwrite"
            ).parquet(f"{dst}/{name}.parquet")
        else:
            d.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")

    # one stride shared by orders+lineitem so the join key stays aligned
    orders = spark.read.parquet(f"{src}/orders.parquet")
    order_stride = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    for name, (pk, shift_cols) in FACTS.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        stride = (
            order_stride
            if name in ("orders", "lineitem")
            else df.agg(F.max(pk)).collect()[0][0] + 1
        )
        _replicate(name, df, shift_cols, stride, factor, jitter, dims).write.mode(
            "overwrite"
        ).parquet(f"{dst}/{name}.parquet")
        print(f"{name}: x{factor} (stride {stride}, {'jitter' if jitter else 'verbatim'})")
    spark.stop()


if __name__ == "__main__":
    main()

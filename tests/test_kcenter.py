"""Greedy k-center diversity sampling (plans/assembly.py, round 8)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

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

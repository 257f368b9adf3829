#!/usr/bin/env python
"""Retrieval serving cycle example: index once, ingest incrementally,
serve hybrid queries — the round-7 production path, end to end.

1. BUILD (once per release): persist the ANN index (Lloyd centroids +
   cell-partitioned vector store, plans/ann_index.py) and pin the keyword
   idf weights (plans/retrieval.py).
2. INGEST (per cycle): append a new embedding batch against the frozen
   centroids — O(batch), the corpus store is never rewritten — and fold
   new documents' keyword scores into the k-row top-k serving table
   (KeywordTopKServer's monoid merge).
3. SERVE (per query): probe N_PROBE cells of the persisted index
   (partition-pruned scan) for the vector lane, read the k-row keyword
   serving table for the keyword lane, fuse with integer RRF.

Run: python examples/serving_cycle.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eth_event_stream_spark.plans.ann_index import (
    AnnIndexManager,
    ann_probe_topk,
    load_ann_index,
)
from eth_event_stream_spark.plans.retrieval import (
    RRF_K,
    RRF_SCALE,
    TOPK_FUSED,
    KeywordTopKServer,
    keyword_idf_weights,
    score_keywords_pinned,
    _rank_topk,
    _rrf_fuse,
)
from eth_event_stream_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="serving_cycle", shuffle_partitions=16)
    work = tempfile.mkdtemp(prefix="serving_cycle_")
    idx_dir = os.path.join(work, "ann_index")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # the "corpus at last release" vs "this cycle's batch"
    corpus_e = embs.filter((F.col("vec_id") % 5 != 0) | (F.col("vec_id") == 0))
    batch_e = embs.filter((F.col("vec_id") % 5 == 0) & (F.col("vec_id") != 0))

    # -- 1. build ------------------------------------------------------------
    # versioned rotation: readers probe whatever CURRENT points at; a
    # rebuild publishes a new version and swaps the pointer atomically
    mgr = AnnIndexManager(idx_dir, retain=1)
    mgr.build(spark, sf_dir, e=corpus_e)
    idf = keyword_idf_weights(docs)
    print(f"[build] ANN index v0 live at {mgr.current_dir()}; idf: {idf}")

    # -- 2. ingest -----------------------------------------------------------
    # batch_id makes the append EXACTLY-ONCE: a foreachBatch replay of this
    # epoch (crash before the source committed) no-ops instead of
    # double-ingesting — see tests/test_crash_soak.py for the full contract
    mgr.append(spark, batch_e, batch_id=0)
    mgr.append(spark, batch_e, batch_id=0)  # the replay: provably a no-op
    server = KeywordTopKServer(os.path.join(work, "kw_topk"))
    server(score_keywords_pinned(docs, idf), epoch_id=0)
    print(f"[ingest] appended {batch_e.count()} vectors (replay no-op'd); "
          "keyword top-k table up")
    if mgr.needs_rebuild(spark, max_skew=4.0):
        mgr.rebuild(spark)
        print(f"[ingest] occupancy skew tripped — rotated to {mgr.current_dir()}")
    else:
        print("[ingest] occupancy within bounds — no rebuild this cycle")

    # -- 3. serve ------------------------------------------------------------
    idx = load_ann_index(spark, mgr.current_dir())
    qv = embs.filter(F.col("vec_id") == 0).select("embedding")
    vec_scored = ann_probe_topk(spark, idx, qv, k=20).select(
        F.col("vec_id").alias("doc_id"), "cosine"
    )
    vec_lane = _rank_topk(vec_scored, "doc_id", "cosine", 20)
    kw_lane = server.current(spark)
    fused = _rrf_fuse(kw_lane, vec_lane)
    print(f"[serve] hybrid RRF top-{TOPK_FUSED} "
          f"(scale {RRF_SCALE}, k {RRF_K}):")
    for r in fused.collect():
        print(f"  doc {r['doc_id']:>6}  kw_rank={r['rank_kw']} "
              f"vec_rank={r['rank_vec']}  rrf={r['rrf_score']}")
    print("serving cycle complete")
    spark.stop()


if __name__ == "__main__":
    main()

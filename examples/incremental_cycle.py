#!/usr/bin/env python
"""Incremental ingest-cycle example: the steady-state regime of a 100 TB
corpus, end to end with PERSISTED artifacts.

Cycle N-1 (corpus release): curate the corpus, then persist its probe
artifacts — LSH band index, hot-shingle stats, capped shingle index, span
chunk index — to parquet alongside the corpus.

Cycle N (per ingest batch, O(batch) cost):
  1. reload the artifacts (parameter + schema validation refuses drift);
  2. near-dup probe: the new batch broadcasts into the corpus band index,
     verified pairs decide which new docs are corpus duplicates;
  3. accept the non-duplicates;
  4. span-scrub the accepted docs against the corpus chunk index
     (boilerplate the corpus already carries is stripped at ingest);
  5. fold the batch's verified near-dup edges into the PERSISTED canonical
     grouping via CCMaintainer (quotient-graph contraction, O(batch) —
     the corpus graph is never re-propagated);
  6. append the accepted, scrubbed docs — production would also fold their
     chunks/bands into the next release's artifacts.

Run: python examples/incremental_cycle.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eth_event_stream_spark.plans.curation import scrub_against_index
from eth_event_stream_spark.plans.incremental import (
    CCMaintainer,
    _split,
    incremental_pairs_from_artifacts,
    load_corpus_artifacts,
    persist_corpus_artifacts,
)
from eth_event_stream_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="incremental_cycle", shuffle_partitions=16)

    corpus, batch = _split(spark, sf_dir)
    n_corpus, n_batch = corpus.count(), batch.count()

    # --- cycle N-1: corpus release persists its artifacts ------------------
    work = tempfile.mkdtemp(prefix="cycle_")
    art_dir = os.path.join(work, "artifacts")
    persist_corpus_artifacts(corpus, art_dir)
    # the release also publishes its canonical grouping (here: corpus docs
    # start as singletons; a real release runs the full propagation)
    cc = CCMaintainer(os.path.join(work, "cc_labels"))
    cc.bootstrap(corpus.select(F.col("doc_id").alias("id"),
                               F.col("doc_id").alias("label")))
    print(f"release: corpus {n_corpus} docs -> artifacts at {art_dir}")

    # --- cycle N: the per-batch work --------------------------------------
    arts = load_corpus_artifacts(spark, art_dir)
    pairs = incremental_pairs_from_artifacts(batch, arts)
    rejected = pairs.select(F.col("doc_new").alias("doc_id")).distinct()
    accepted = batch.join(rejected, "doc_id", "left_anti")
    n_rej = rejected.count()

    scrubbed = scrub_against_index(accepted, arts["chunk_index"])
    stats = scrubbed.agg(
        F.count("*").alias("n"),
        F.sum("n_removed").alias("spans_removed"),
    ).collect()[0]

    # fold the batch's duplicate edges into the persisted grouping:
    # each rejected new doc joins its corpus twin's component — quotient-
    # graph contraction, O(batch); unseen endpoints are admitted
    # automatically and the publish is exactly-once via the pointer
    cc(
        pairs.select(
            F.col("doc_new").alias("src"), F.col("doc_corpus").alias("dst")
        ),
        batch_id=0,
    )
    labels = cc.current(spark)
    n_groups = labels.select("label").distinct().count()
    print(
        f"ingest: batch {n_batch} -> {n_rej} corpus-duplicates rejected -> "
        f"{stats['n']} accepted, {stats['spans_removed']} repeated spans "
        "scrubbed at ingest"
    )
    print(
        f"grouping: {labels.count()} labeled docs in {n_groups} components "
        "after the O(batch) fold"
    )
    print("incremental cycle complete")
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dataset release cycle example: the publish-side flow, end to end.

1. CURATE: run the composed corpus-prep pipeline (dedup + quality gate +
   decontamination) — `pipeline_prepare_corpus`.
2. LAYOUT: compact the curated output to ~target-sized, range-clustered
   shards (`compact_parquet_dir`).
3. MANIFEST: publish per-shard byte/md5/row-count integrity records
   (`write_manifest`) and prove the release verifies (`verify_release`).
4. CARD: publish the dataset card statistics (`profile_data_card`).
5. DIFF: QA-diff this release against the previous one from content
   hashes alone (`diff_release_rows`).

Run: python examples/release_cycle.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eth_event_stream_spark.plans.layout import (
    compact_parquet_dir,
    verify_release,
    write_manifest,
)
from eth_event_stream_spark.plans.registry import QUERIES
from eth_event_stream_spark.plans.warehouse import diff_release_rows
from eth_event_stream_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="release_cycle", shuffle_partitions=16)
    work = tempfile.mkdtemp(prefix="release_")

    # -- 1. curate -----------------------------------------------------------
    curated = QUERIES["pipeline_prepare_corpus"].fn(spark, sf_dir)
    raw_dir = os.path.join(work, "curated_raw")
    curated.write.mode("overwrite").parquet(raw_dir)
    n = spark.read.parquet(raw_dir).count()
    print(f"curate: {n} documents survive the composed pipeline")

    # -- 2. layout -----------------------------------------------------------
    rel_dir = os.path.join(work, "release")
    stats = compact_parquet_dir(
        spark, raw_dir, rel_dir, target_bytes=1 * 1024 * 1024,
        sort_cols=["doc_id"],
    )
    print(
        f"layout: {stats['n_files_in']} files / {stats['bytes_in']} B -> "
        f"{stats['n_files_out']} clustered shards"
    )

    # -- 3. manifest -----------------------------------------------------------
    m = write_manifest(spark, rel_dir)
    verify_release(spark, rel_dir)
    print(
        f"manifest: {m['n_files']} shards, {m['total_rows']} rows, "
        f"{m['total_bytes']} B — release verifies"
    )

    # -- 4. card ---------------------------------------------------------------
    card = QUERIES["profile_data_card"].fn(spark, sf_dir)
    print(f"card: {card.count()} (metric, value) rows published")

    # -- 5. diff vs previous release -------------------------------------------
    # the release table carries (doc_id, n_copies, split); diff on the id +
    # row-content hash — diff_release_rows only needs (doc_id, lang, text)
    # shaped columns, so serialize the row as the "text"
    released = spark.read.parquet(rel_dir).select(
        "doc_id",
        F.lit("all").alias("lang"),
        F.concat_ws("|", "doc_id", "n_copies", "split").alias("text"),
    )
    # previous release: simulate by dropping a slice and perturbing another
    prev = released.filter(F.col("doc_id") % 11 != 4).select(
        "doc_id",
        "lang",
        F.when(F.col("doc_id") % 9 == 2, F.reverse("text")).otherwise(F.col("text")).alias("text"),
    )
    d = (
        diff_release_rows(prev, released)
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )
    print("diff vs previous release:",
          {r["status"]: r["n"] for r in d.collect()})
    print("release cycle complete")
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Training-data pipeline example: the 100 TB curation flow, end to end.

documents -> quality filter -> exact dedup -> MinHash-LSH candidates ->
Jaccard verify -> clean corpus written bucket-partitioned; embeddings ->
LSH-bucketed ANN index + a sample query. Every stage is a plan from the
oracle-checked query registry — this script just composes them the way a
curation job would.

Run: python examples/training_pipeline.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eth_event_stream_spark.plans import QUERIES
from eth_event_stream_spark.plans.catalog import t
from eth_event_stream_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="training_pipeline", shuffle_partitions=16)
    run = lambda name: QUERIES[name].fn(spark, sf_dir)  # noqa: E731

    docs = t(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate
    quality = run("text_quality_score").filter(F.col("quality_pass") == 1)
    n1 = quality.count()

    # 2. exact dedup: survivors keep the smallest doc_id per content hash
    keep_exact = run("dedup_exact").select(F.col("keep_doc_id").alias("doc_id"))
    n2 = keep_exact.count()

    # 3. near-dup removal, cluster-correct: LSH candidates -> exact Jaccard
    #    verify -> connected components -> keep one canonical doc per cluster
    #    (pairwise doc_b-dropping would over-remove inside chained clusters)
    groups = run("dedup_groups_connected")
    survivors = groups.filter(F.col("doc_id") == F.col("canonical_id")).select("doc_id")
    n_near = groups.filter(F.col("doc_id") != F.col("canonical_id")).count()

    clean = (
        docs.join(quality.select("doc_id"), "doc_id", "left_semi")
        .join(keep_exact, "doc_id", "left_semi")
        .join(survivors, "doc_id", "left_semi")
    )
    n3 = clean.count()
    print(
        f"corpus: {n0} -> quality {n1} -> exact-dedup keepers {n2} "
        f"-> near-dups removed {n_near} -> clean {n3}"
    )

    # 3b. decontamination: drop the benchmark docs THEMSELVES (they must
    #     never train) plus any training doc that duplicates their content
    contaminated = (
        run("decontaminate_exact")
        .filter(F.col("contaminated") == 1)
        .select("doc_id")
    )
    clean = clean.filter(~F.expr("doc_id < 20")).join(
        contaminated, "doc_id", "left_anti"
    )

    # 3c. content-level curation (round-5 continuation): global-quantile
    #     length floor, then C4-style repeated-span scrub of what survives
    long_enough = run("quality_quantile_filter").select("doc_id")
    clean = clean.join(long_enough, "doc_id", "left_semi")
    scrubbed = run("dedup_chunk_scrub").join(clean.select("doc_id"), "doc_id", "left_semi")
    n_spans = scrubbed.agg(F.sum("n_removed").alias("s")).collect()[0]["s"]

    # 3c2. LM quality gate (round 8): score fluency under the bigram LM
    #      trained on the trusted 'en' slice, drop the worst-surprise
    #      decile (the CCNet perplexity filter, in integer surprise bits)
    #      quality_lm_surprise emits NO row for documents with fewer than
    #      two tokens (no bigrams to score), so gate via a LEFT join and
    #      pass unscored docs through — the fluency filter must only drop
    #      documents it actually scored, not every bigram-less one
    lm = run("quality_lm_surprise")
    lm_cut = (
        lm.approxQuantile("avg_centibits", [0.9], 0.0)[0]
    )
    clean = (
        clean.join(lm.select("doc_id", "avg_centibits"), "doc_id", "left")
        .filter(
            F.col("avg_centibits").isNull() | (F.col("avg_centibits") <= lm_cut)
        )
        .drop("avg_centibits")
    )

    # 3d. LEAKAGE-SAFE split: hash the near-dup group's canonical id, so no
    #     near-duplicate pair can straddle train/holdout
    splits = run("split_leakage_safe")
    split_counts = {
        r["split"]: r["n"]
        for r in clean.join(splits.select("doc_id", "split"), "doc_id")
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n3b = clean.count()
    print(
        f"decontaminated+length-floored: {n3b}; repeated spans scrubbed: "
        f"{n_spans}; leakage-safe splits: {split_counts}"
    )

    # 4. write the clean corpus partitioned by source (the lake layout)
    out = os.path.join(tempfile.mkdtemp(), "clean_corpus")
    clean.repartition("source").write.partitionBy("source").parquet(out)
    n_back = spark.read.parquet(out).count()
    print(f"written {n_back} rows to {out} ({len(os.listdir(out))} source partitions)")

    # 5. similarity: ANN over embeddings — multiprobe LSH and learned-centroid IVF
    topk = run("similarity_topk_multiprobe").collect()
    print("LSH ANN top-3 for vec_id=0:", [(r["vec_id"], r["cosine"]) for r in topk[:3]])
    topk_ivf = run("similarity_topk_ivf").collect()
    print("IVF ANN top-3 for vec_id=0:", [(r["vec_id"], r["cosine"]) for r in topk_ivf[:3]])
    topk_pq = run("similarity_topk_pq").collect()
    print("PQ ANN top-3 for vec_id=0:", [(r["vec_id"], r["cosine"]) for r in topk_pq[:3]])
    recall = {r["method"]: r["recall_at_10"] for r in run("similarity_ann_recall").collect()}
    print("ANN recall@10 vs brute force:", recall)

    # 6. round-8 additions: a diversity coreset over the embedding space
    #    (greedy k-center) and the first BPE merge rules for the tokenizer
    centers = run("sample_kcenter_diverse").collect()
    print("k-center coreset (rank, vec_id, min_d2):",
          [(r["sel_rank"], r["vec_id"], round(r["min_d2"], 3)) for r in centers])
    bpe = run("tokenizer_bpe_learn").orderBy("merge_rank").collect()
    print("BPE merge rules:", [(r["left_sym"], r["right_sym"]) for r in bpe])

    # 7. tokenize, gate, order, and transform — the release tail:
    #    token budgets from the learned tokenizer, the composed quality
    #    gate with attributable flags, substring-level duplication marking,
    #    curriculum sharding, and the denoising (input, target) pairs
    budgets = run("tokenizer_bpe_apply")
    total_tokens = budgets.agg(F.sum("n_tokens").alias("s")).collect()[0]["s"]
    gate = run("quality_ensemble_gate")
    gate_stats = gate.agg(
        F.sum("keep").alias("kept"),
        *[F.sum(c).alias(c) for c in
          ("len_pass", "stop_pass", "rep_pass", "digit_pass", "lm_pass")],
    ).collect()[0]
    spans = run("dedup_window_spans")
    n_span_drop = spans.filter(F.col("keep") == 0).count()
    print(
        f"token budget: {total_tokens} BPE tokens; ensemble gate keeps "
        f"{gate_stats['kept']} (flags {[gate_stats[c] for c in ('len_pass','stop_pass','rep_pass','digit_pass','lm_pass')]}); "
        f"substring-dup gate drops {n_span_drop}"
    )
    curr = run("layout_curriculum_order")
    stages = {r["stage"]: r["n"] for r in
              curr.groupBy("stage").agg(F.count("*").alias("n")).collect()}
    corrupted = run("prepare_span_corruption")
    ex = corrupted.orderBy("doc_id").first()
    print(f"curriculum stages: {stages}")
    print(f"denoising pair example: input='{ex['input_text'][:60]}...' "
          f"target='{ex['target_text'][:40]}...'")
    card = {r["metric"]: r["value"] for r in run("profile_data_card").collect()}
    print(f"data card: docs={card['docs_total']} tokens={card['ws_tokens_total']} "
          f"langs={card['langs_distinct']} exact_dups={card['docs_exact_dup']}")

    # 8. multimodal curation (round 12): the real-codec lanes — encode
    #    PNG/WebP/JPEG/GIF/MJPEG-AVI/WAV/FLAC payloads in executors,
    #    decode them back (multimodal_codec_roundtrip), slice the audio
    #    into fixed 32-sample segments with integer-exact stats, and
    #    resample the PNG-lane images with a verify-decode closing the loop
    media = {
        r["kind"]: r["n_media"] for r in run("multimodal_codec_roundtrip").collect()
    }
    segs = run("multimodal_audio_segments")
    n_segs = segs.count()
    peak = segs.agg(F.max("peak_abs").alias("m")).collect()[0]["m"]
    n_resampled = run("multimodal_resample_roundtrip").count()
    print(
        f"media lane: {media} decoded; {n_segs} audio segments "
        f"(peak |s| {peak}); {n_resampled} images resampled+verified"
    )

    # 9. web ingest (round 12): the Common Crawl shape — real .warc.gz
    #    archives parsed where they live, HTML -> visible text in pure
    #    Catalyst, robots.txt honored via the broadcast rules dim
    n_recs = run("ingest_warc_documents").count()
    wet = run("ingest_warc_html_text")
    n_chars = wet.agg(F.sum("n_chars").alias("s")).collect()[0]["s"]
    blocked = (
        run("web_robots_filter").filter("NOT allowed").count()
    )
    print(
        f"web lane: {n_recs} WARC records ingested; "
        f"{n_chars} chars of visible text extracted; "
        f"{blocked} pages robots-blocked for trainbot"
    )

    # 10. crawl frontier (round 13): sitemapindex recursion discovers the
    #     page URLs, the HTTP header layer types each fetched response,
    #     and the keep list consumes the discovery — URLs a sitemap never
    #     advertised would reach the robots stage but not the frontier
    frontier = run("web_sitemap_recursive")
    n_discovered = frontier.count()
    n_from_index = frontier.filter("level = 1").count()
    http = run("web_http_headers")
    n_ok = http.filter("status = 200 AND length_ok").count()
    keep = run("web_pipeline_keep_list")
    kept_discovered = (
        keep.filter("keep")
        .join(
            frontier.select(F.col("domain").alias("d")).distinct(),
            F.col("domain") == F.col("d"),
            "left_semi",
        )
        .count()
    )
    print(
        f"crawl frontier: {n_discovered} URLs discovered "
        f"({n_from_index} via sitemapindex recursion); "
        f"{n_ok} responses 200-with-exact-length; "
        f"{kept_discovered} kept pages on discovered domains"
    )

    # 11. crawl operations (round 13, continued): boilerplate blocks
    #     classified from real archive bytes, politeness schedule from
    #     Crawl-delay, churn-sized recrawl plan from the frontier diff
    blocks = run("web_content_extraction")
    n_blocks = blocks.count()
    n_content = blocks.filter("keep").count()
    horizon = (
        run("web_fetch_schedule")
        .agg(F.max("offset_seconds").alias("m"))
        .collect()[0]["m"]
    )
    churn = run("web_frontier_delta").groupBy("change").count().collect()
    churn_s = ", ".join(f"{r['change']}={r['count']}" for r in sorted(
        churn, key=lambda r: r["change"]))
    print(
        f"crawl ops: {n_content}/{n_blocks} blocks kept as content; "
        f"politeness horizon {horizon:.1f}s; recrawl churn: {churn_s}"
    )

    print("training pipeline complete")
    spark.stop()


if __name__ == "__main__":
    main()

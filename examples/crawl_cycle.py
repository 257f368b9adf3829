#!/usr/bin/env python
"""Crawl operations cycle example: the fetch-side flow, end to end.

1. ROBOTS: fetch-status semantics (RFC 9309 §2.3.1 — parse/allow-all/
   deny-all after redirect resolution) and the per-domain rules
   decision for the crawl agent (`web_robots_availability`,
   `web_robots_filter` components).
2. DISCOVER: robots-advertised sitemap roots -> recursive sitemap
   frontier, plus outlink harvest from already-fetched pages with
   RFC 3986 resolution honoring <base href> overrides.
3. DEDUP: canonicalize every discovered URL (RFC 3986 §6 + tracking
   params stripped from the rules dim) and diff against yesterday's
   frontier — only the churn refetches (`frontier_delta`).
4. SCHEDULE: Crawl-delay politeness budgets over the fetch list.
5. INGEST: parse the fetched archives' capture records and resolve
   revisit records to their stored payloads (`warc_captures` +
   `resolve_revisits`), then audit unique-payload accounting.
6. AUDIT: did the observed fetch cadence honor Crawl-delay?
   (`politeness_audit`).

Run: python examples/crawl_cycle.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eth_event_stream_spark.functions.html import html_base_href, html_links
from eth_event_stream_spark.functions.url import url_canonicalize, url_resolve
from eth_event_stream_spark.plans.registry import QUERIES
from eth_event_stream_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="crawl_cycle", shuffle_partitions=16)

    # -- 1. robots ---------------------------------------------------------
    modes = QUERIES["web_robots_availability"].fn(spark, sf_dir)
    by_mode = {
        r["mode"]: r["n"]
        for r in modes.groupBy("mode").agg(F.count("*").alias("n")).collect()
    }
    print(f"robots: fetch modes {by_mode}")

    # -- 2. discover ---------------------------------------------------------
    sitemap_urls = QUERIES["web_sitemap_recursive"].fn(spark, sf_dir)
    n_sitemap = sitemap_urls.count()
    # outlink harvest with a <base href> override on some pages: the
    # base element, when present, replaces the fetch URL as the
    # resolution base (HTML's one global RFC 3986 §5.1 override)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    d = F.col("doc_id").cast("string")
    page_url = F.concat(F.lit("https://site"), F.col("doc_id") % 20, F.lit(".example/dir/p"), d)
    html = F.concat(
        F.when(
            F.col("doc_id") % 5 == 3,
            F.concat(F.lit('<base href="https://based.example/x/">')),
        ).otherwise(F.lit("")),
        F.lit('<a href="g'), d, F.lit('">g</a><a href="../up">u</a>'),
    )
    pages = docs.select(page_url.alias("page_url"), html.alias("html"))
    outlinks = pages.select(
        F.explode(html_links("html")).alias("href"),
        F.coalesce(html_base_href("html"), F.col("page_url")).alias("base"),
    ).select(
        url_canonicalize(url_resolve("base", "href")).alias("outlink")
    ).filter(F.col("outlink").rlike("^https?://"))
    n_out = outlinks.count()
    n_based = outlinks.filter(
        F.col("outlink").startswith("https://based.example/")
    ).count()
    print(
        f"discover: {n_sitemap} sitemap urls, {n_out} outlinks "
        f"({n_based} resolved via <base href>)"
    )

    # -- 3. dedup ---------------------------------------------------------
    delta = QUERIES["web_frontier_delta_canonical"].fn(spark, sf_dir)
    churn = {
        r["change"]: r["n"]
        for r in delta.groupBy("change").agg(F.count("*").alias("n")).collect()
    }
    print(f"dedup: canonical-key churn {churn}")

    # -- 4. schedule ---------------------------------------------------------
    budget = QUERIES["web_crawl_budget"].fn(spark, sf_dir)
    total = budget.agg(F.sum("est_seconds").alias("s")).collect()[0]["s"]
    print(f"schedule: politeness budget {total:.0f} s across domains")

    # -- 5. ingest ---------------------------------------------------------
    served = QUERIES["ingest_warc_revisits"].fn(spark, sf_dir)
    n_caps = served.count()
    n_rev = served.filter(
        (F.col("rectype") == "revisit") & F.col("resolved")
    ).count()
    n_unres = served.filter(~F.col("resolved")).count()
    acct = QUERIES["ingest_warc_unique_payloads"].fn(spark, sf_dir)
    stored = acct.agg(F.sum("stored_bytes").alias("b")).collect()[0]["b"]
    logical = acct.agg(F.sum("logical_bytes").alias("b")).collect()[0]["b"]
    print(
        f"ingest: {n_caps} captures, {n_rev} revisits resolved, "
        f"{n_unres} unresolved; {stored} B stored vs {logical} B logical"
    )

    # -- 6. publish ------------------------------------------------------
    # derive the WAT metadata member of the WARC/WAT/WET triple from the
    # round's pages and read the linkage back from the published bytes
    wat = QUERIES["ingest_wat_roundtrip"].fn(spark, sf_dir)
    n_wat = wat.count()
    n_linked = wat.filter(F.col("refers_to").isNotNull()).count()
    links_total = wat.agg(F.sum("n_links").alias("n")).collect()[0]["n"]
    print(
        f"publish: {n_wat} WAT records, {n_linked} linked to their "
        f"source response, {links_total} outlinks recorded"
    )

    # -- 6b. rank --------------------------------------------------------
    # the canonical WAT consumers (round 16): host-level PageRank and
    # harmonic centrality built from the published metadata sidecars
    # only — the graph pass that never re-parses HTML
    rank = QUERIES["web_host_rank"].fn(spark, sf_dir)
    top = rank.orderBy(F.col("rank_scaled").desc()).first()
    harm = QUERIES["web_host_harmonic"].fn(spark, sf_dir)
    htop = harm.orderBy(F.col("harmonic_fp").desc()).first()
    n_hosts = rank.count()
    print(
        f"rank: {n_hosts} hosts; pagerank top {top['host']}, "
        f"harmonic top {htop['host']} (ball {htop['ball_est']})"
    )

    # -- 7. robots cache -------------------------------------------------
    # RFC 9309 §2.4: which domains' cached robots verdicts expired
    refetch = QUERIES["web_robots_refetch"].fn(spark, sf_dir)
    n_dom = refetch.count()
    n_refetch = refetch.filter(F.col("refetch")).count()
    print(f"robots cache: {n_refetch}/{n_dom} domains due for refetch")

    # -- 8. audit ---------------------------------------------------------
    audit = QUERIES["web_politeness_audit"].fn(spark, sf_dir)
    n_domains = audit.count()
    n_bad = audit.filter(~F.col("compliant")).count()
    print(f"audit: {n_domains} domains, {n_bad} violated their Crawl-delay")

    assert n_out > 0 and n_based > 0 and n_rev > 0 and logical > stored
    assert n_wat == n_linked and links_total > n_wat
    # the cross-host sink (every page links to the cdn) must top both
    # centralities, and its estimated ball must have grown beyond
    # itself (the KMV estimate at k=8 is approximate — no exact-count
    # claim against n_hosts)
    assert top["host"] == "cdn.example" == htop["host"]
    assert htop["ball_est"] > 1
    assert 0 < n_refetch < n_dom
    print("crawl cycle complete")
    spark.stop()


if __name__ == "__main__":
    main()

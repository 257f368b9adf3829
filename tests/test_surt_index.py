"""SURT as an access path (round 15): the site-partitioned, SURT-sorted
URL store — publish once, then per-site reads prune to one partition
directory (plans/web.py:persist_surt_index / surt_site_read)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _synth_urls(spark, n=200):
    d = F.col("doc_id")
    h = (d % 20).cast("string")
    url = F.concat(
        F.lit("https://WWW.Site"), h, F.lit(".EXAMPLE"),
        F.when(d % 5 == 1, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/a/"), d.cast("string"),
        F.when(d % 3 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), url.alias("url")
    )


def test_surt_index_pruned_site_read(spark, tmp_path):
    from eth_event_stream_spark.plans.web import (
        persist_surt_index,
        surt_site_read,
    )

    idx = str(tmp_path / "surt")
    persist_surt_index(_synth_urls(spark), idx)

    got = surt_site_read(spark, idx, "example,site3")
    rows = got.collect()
    # membership: exactly the doc_id % 20 == 3 rows, ports INCLUDED
    assert sorted(r["doc_id"] for r in rows) == sorted(
        d for d in range(200) if d % 20 == 3
    )
    assert {r["doc_id"] % 20 for r in rows} == {3}
    assert all(r["surt_key"].startswith("example,site3)") for r in rows)
    # ported rows (d % 5 == 1 -> sites h % 5 == 1, e.g. site6) group
    # under the HOST site_key while the full key keeps the port
    r6 = surt_site_read(spark, idx, "example,site6").collect()
    assert r6 and all(":8080)" in r["surt_key"] for r in r6)
    assert {r["doc_id"] % 20 for r in r6} == {6}

    # ACCESS-PATH claims:
    # (1) the prune happens at PLANNING time: the equality lands in
    #     PartitionFilters (directory listing, not a row filter over
    #     the data columns — DataFilters must not carry site_key)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "site_key" in pf and "example,site3" in pf
    # (2) the physical layout IS the index: site3's directory alone
    #     holds exactly the site's rows — a reader can range-scan the
    #     one directory without touching the store's other partitions
    import glob
    import os

    site_dir = os.path.join(idx, "site_key=example,site3")
    assert os.path.isdir(site_dir)
    direct = spark.read.parquet(site_dir)
    assert sorted(r["doc_id"] for r in direct.collect()) == sorted(
        r["doc_id"] for r in rows
    )
    assert len(glob.glob(os.path.join(idx, "site_key=*"))) == 20
    # (3) rows inside each site file are SURT-sorted (the range-probe
    #     contract: no sort needed at read time)
    for f in glob.glob(os.path.join(site_dir, "*.parquet")):
        keys = [r["surt_key"] for r in spark.read.parquet(f).collect()]
        assert keys == sorted(keys)


def test_surt_index_registered_query_matches_store(spark, sf_dir):
    """The registered query reads the per-process store; its rows equal
    a from-scratch computation of the same site's keys."""
    from eth_event_stream_spark.functions.url import (
        url_canonicalize,
        url_surt,
    )
    from eth_event_stream_spark.plans.web import web_surt_site_read

    got = {tuple(r) for r in web_surt_site_read(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    d = F.col("doc_id")
    h = (d % 20).cast("string")
    url = F.concat(
        F.lit("https://WWW.Site"), h, F.lit(".EXAMPLE"),
        F.when(d % 5 == 1, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/a/"), d.cast("string"),
        F.when(d % 3 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
    )
    fresh = (
        docs.filter(d % 20 == 3)
        .select("doc_id", url.alias("url"), url_canonicalize(url).alias("__c"))
        .select(
            "doc_id", "url", url_surt(F.col("__c")).alias("surt_key"),
            F.lit("example,site3").alias("site_key"),
        )
    )
    assert got == {tuple(r) for r in fresh.collect()}


def test_surt_batch_lookup_dynamic_prune(spark, tmp_path):
    """Round-16 gates for the batched CDX-style lookup: the broadcast
    query batch's site keys become the store scan's PartitionFilters
    (dynamicpruningexpression — the web_surt_site_read static gate
    generalized to a multi-site DYNAMIC prune), and at the file level
    only the probed directories are read — proven by corrupting an
    UNPROBED site's parquet after publish: the lookup still succeeds
    while a full store scan fails loudly."""
    import glob
    import os

    import pytest

    from eth_event_stream_spark.plans.web import (
        persist_surt_index,
        surt_batch_lookup,
    )

    idx = str(tmp_path / "surt")
    persist_surt_index(_synth_urls(spark), idx)

    # query batch: dirty spellings for sites 3 and 7 (hits), site 11
    # probes a path that exists nowhere (misses — directory still pruned
    # to, never an error)
    d = F.col("doc_id")
    ds = d.cast("string")
    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    qtail = F.when(d % 3 == 0, F.lit("?b=2&a=1")).otherwise(F.lit(""))
    qa = docs.filter(d % 20 == 3).select(
        F.concat(
            F.lit("HTTPS://Www.Site3.Example"),
            F.when(d % 5 == 1, F.lit(":8080")).otherwise(F.lit(":443")),
            F.lit("/a/"), ds, qtail,
        ).alias("url")
    )
    qb = docs.filter(d % 20 == 7).select(
        F.concat(
            F.lit("https://site7.example"),
            F.when(d % 5 == 1, F.lit(":8080")).otherwise(F.lit("")),
            F.lit("/a/../a/"), ds, qtail,
        ).alias("url")
    )
    qc = docs.filter(d % 20 == 11).select(
        F.concat(F.lit("https://www.site11.example/z/"), ds).alias("url")
    )
    queries = qa.unionByName(qb).unionByName(qc)

    out = surt_batch_lookup(spark, idx, queries)
    rows = out.collect()
    # hit set: every site3/site7 probe, no site11 probe
    assert sorted(r["doc_id"] for r in rows) == sorted(
        x for x in range(200) if x % 20 in (3, 7)
    )
    assert all(r["site_key"] in ("example,site3", "example,site7") for r in rows)
    # canonicalization did the matching: the query spelling differs from
    # the stored url on every hit
    assert all(r["query_url"] != r["url"] for r in rows)

    # (1) plan gate: the store scan's PartitionFilters carry a
    # dynamicpruningexpression on site_key (NOT a static literal — the
    # keys arrive from the broadcast query side at runtime)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "surt" in ln
    ]
    assert scan, plan
    pf = scan[0].split("PartitionFilters:", 1)[1]
    assert "dynamicpruningexpression" in pf and "site_key" in pf

    # (2) file gate: corrupt an UNPROBED site's parquet — the pruned
    # lookup never opens it, a full scan fails loudly on it
    victim = glob.glob(os.path.join(idx, "site_key=example,site5", "*.parquet"))
    assert victim
    for f in victim:
        with open(f, "wb") as fh:
            fh.write(b"not a parquet file")
    again = {tuple(r) for r in surt_batch_lookup(spark, idx, queries).collect()}
    assert again == {tuple(r) for r in rows}
    with pytest.raises(Exception):
        spark.read.parquet(idx).groupBy("site_key").count().collect()

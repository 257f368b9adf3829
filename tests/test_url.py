"""Pure-Catalyst URL features (functions/url.py, round 12). parse_url is
the JVM primitive for host/path/query; the derived features are regex
arithmetic; everything stays codegen (plan asserted)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_event_stream_spark.functions.url import (
    url_has_query,
    url_host,
    url_path_depth,
    url_registrable_domain,
    url_strip_query,
    url_tld,
)


def _rows(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return df.select(
        "url",
        url_host("url").alias("host"),
        url_tld("url").alias("tld"),
        url_registrable_domain("url").alias("dom"),
        url_path_depth("url").alias("depth"),
        url_has_query("url").alias("hq"),
        url_strip_query("url").alias("stripped"),
    ).collect()


def test_url_features(spark):
    rows = {r["url"]: r for r in _rows(spark, [
        "https://WWW.Site3.Example:8443/seg/seg?q=1",
        "https://user:pw@host.test/a/b/c/",
        "http://example/",
        "https://a.b.co.uk/x#frag",
        "https://nohost.example",
    ])}
    r = rows["https://WWW.Site3.Example:8443/seg/seg?q=1"]
    assert r["host"] == "www.site3.example"  # lowercased, port stripped
    assert r["tld"] == "example"
    assert r["dom"] == "site3.example"  # www. collapsed (last two labels)
    assert r["depth"] == 2
    assert r["hq"] is True
    assert r["stripped"] == "https://WWW.Site3.Example:8443/seg/seg"

    r = rows["https://user:pw@host.test/a/b/c/"]
    assert r["host"] == "host.test"  # userinfo stripped by the primitive
    assert r["depth"] == 3  # trailing slash adds no segment

    r = rows["http://example/"]
    assert r["host"] == "example"
    assert r["tld"] == ""  # bare label: no TLD
    assert r["dom"] == "example"  # single label is its own domain
    assert r["depth"] == 0

    r = rows["https://a.b.co.uk/x#frag"]
    assert r["dom"] == "co.uk"  # the DOCUMENTED eTLD+1 approximation
    assert r["stripped"] == "https://a.b.co.uk/x"

    assert rows["https://nohost.example"]["depth"] == 0  # no path at all


def test_url_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([("https://x.test/a",)], "url string").select(
        url_registrable_domain("url"), url_path_depth("url")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan

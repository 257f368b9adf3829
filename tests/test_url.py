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


def test_url_normalize_percent(spark):
    from eth_event_stream_spark.functions.url import url_normalize_percent

    cases = [
        # unreserved decodes; reserved stays (uppercased)
        ("http://x/%7Euser/%2Fp", "http://x/~user/%2Fp"),
        ("http://x/a%2fb", "http://x/a%2Fb"),
        ("http://x/%41%39%2d%5f", "http://x/A9-_"),
        # no escapes: untouched
        ("http://x/plain", "http://x/plain"),
        # nonconforming: bare % / short escape pass through
        ("http://x/100%", "http://x/100%"),
        ("http://x/a%zzb", "http://x/a%zzb"),
        ("http://x/a%2", "http://x/a%2"),
    ]
    df = spark.createDataFrame([(a,) for a, _ in cases], "u string")
    got = [r[0] for r in df.select(url_normalize_percent("u")).collect()]
    assert got == [b for _, b in cases]


def test_url_remove_dot_segments(spark):
    from eth_event_stream_spark.functions.url import url_remove_dot_segments

    cases = [
        ("/a/./b", "/a/b"),
        ("/a/b/../c", "/a/c"),
        ("/a/b/..", "/a/"),          # RFC 5.2.4: trailing slash survives
        ("/a/.", "/a/"),
        ("/../../x", "/x"),          # never pops past the root
        ("/a//b/./c", "/a//b/c"),    # empty segments preserved
        ("/", "/"),
        ("", ""),
        ("/a/b/c", "/a/b/c"),
    ]
    df = spark.createDataFrame([(a,) for a, _ in cases], "p string")
    got = [r[0] for r in df.select(url_remove_dot_segments("p")).collect()]
    assert got == [b for _, b in cases]


def test_url_canonicalize(spark):
    from eth_event_stream_spark.functions.url import url_canonicalize

    cases = [
        # scheme+host case, default port, fragment
        ("HTTP://WWW.Example.COM:80/a#f", "http://www.example.com/a"),
        ("https://Site.Example:443/p?q=1", "https://site.example/p?q=1"),
        # non-default / non-http ports survive
        ("http://h.example:8080/p", "http://h.example:8080/p"),
        ("ftp://h.example:21/p", "ftp://h.example:21/p"),
        # empty port drops
        ("http://h.example:/p", "http://h.example/p"),
        # empty path -> '/' for http(s)
        ("https://h.example", "https://h.example/"),
        ("https://h.example?a=1", "https://h.example/?a=1"),
        # dot segments + percent normalization compose
        ("http://h.example/a/./b/%7Ec/../d", "http://h.example/a/b/d"),
        # empty query drops (documented crawl choice)
        ("http://h.example/p?", "http://h.example/p"),
        # userinfo preserved, host after it lowercased
        ("http://u:pw@H.Example/p", "http://u:pw@h.example/p"),
        # non-hierarchical: fragment/percent pass only
        ("mailto:a@b.example#x", "mailto:a@b.example"),
    ]
    df = spark.createDataFrame([(a,) for a, _ in cases], "u string")
    got = [r[0] for r in df.select(url_canonicalize("u")).collect()]
    assert got == [b for _, b in cases]
    # sort_query: byte-wise param sort, the crawl-dedup strengthening
    df2 = spark.createDataFrame(
        [("http://h.example/p?b=2&a=1&a=0",)], "u string"
    )
    assert (
        df2.select(url_canonicalize("u", sort_query=True)).collect()[0][0]
        == "http://h.example/p?a=0&a=1&b=2"
    )


def test_url_canonicalize_is_pure_codegen(spark):
    from eth_event_stream_spark.functions.url import url_canonicalize

    df = spark.createDataFrame([("https://x.test/a",)], "url string").select(
        url_canonicalize("url")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan


def test_url_surt(spark):
    from eth_event_stream_spark.functions.url import url_surt

    cases = [
        ("https://www.example.com/a?b=2&a=1", "com,example)/a?a=1&b=2"),
        ("http://sub.site.co.uk:8080/p", "uk,co,site,sub:8080)/p"),
        ("https://example.com/", "com,example)/"),
        # empty query dropped; userinfo never leaks into the key
        ("https://u:p@example.com/x", "com,example)/x"),
    ]
    df = spark.createDataFrame([(a,) for a, _ in cases], "u string")
    got = [r[0] for r in df.select(url_surt("u")).collect()]
    assert got == [b for _, b in cases]
    # strict transform keeps www
    df2 = spark.createDataFrame([("https://www.example.com/a",)], "u string")
    assert (
        df2.select(url_surt("u", strip_www=False)).collect()[0][0]
        == "com,example,www)/a"
    )


def test_url_resolve_rfc3986_vectors(spark):
    """RFC 3986 §5.4 normal-example vectors (base
    http://a/b/c/d;p?q), fragments dropped by contract, plus the
    authority/scheme cases and the non-hierarchical passthrough."""
    from eth_event_stream_spark.functions.url import url_resolve

    base = "http://a/b/c/d;p?q"
    cases = [
        ("g", "http://a/b/c/g"),
        ("./g", "http://a/b/c/g"),
        ("g/", "http://a/b/c/g/"),
        ("/g", "http://a/g"),
        ("//g", "http://g"),
        ("?y", "http://a/b/c/d;p?y"),
        ("g?y", "http://a/b/c/g?y"),
        (";x", "http://a/b/c/;x"),
        ("g;x", "http://a/b/c/g;x"),
        ("", "http://a/b/c/d;p"),        # RFC keeps ?q; we key on the PAGE
        (".", "http://a/b/c/"),
        ("./", "http://a/b/c/"),
        ("..", "http://a/b/"),
        ("../", "http://a/b/"),
        ("../g", "http://a/b/g"),
        ("../..", "http://a/"),
        ("../../", "http://a/"),
        ("../../g", "http://a/g"),
        # abnormal: never pop past the root (§5.4.2)
        ("../../../g", "http://a/g"),
        ("/./g", "http://a/g"),
        ("/../g", "http://a/g"),
        ("g.", "http://a/b/c/g."),
        (".g", "http://a/b/c/.g"),
        ("g..", "http://a/b/c/g.."),
        ("..g", "http://a/b/c/..g"),
        ("./../g", "http://a/b/g"),
        ("./g/.", "http://a/b/c/g/"),
        ("g/./h", "http://a/b/c/g/h"),
        ("g/../h", "http://a/b/c/h"),
        # fragments dropped everywhere (crawl keys never carry them)
        ("g#s", "http://a/b/c/g"),
        ("#s", "http://a/b/c/d;p"),
        # full absolute ref passes through, own path normalized
        ("https://x.test/a/../b", "https://x.test/b"),
        # non-hierarchical passthrough for the caller's scheme filter
        ("mailto:u@x.test", "mailto:u@x.test"),
    ]
    df = spark.createDataFrame([(base, r) for r, _ in cases], "b string, r string")
    got = [x[0] for x in df.select(url_resolve("b", "r")).collect()]
    want = [w for _, w in cases]
    assert got == want, [
        (cases[i][0], got[i], want[i])
        for i in range(len(cases))
        if got[i] != want[i]
    ]

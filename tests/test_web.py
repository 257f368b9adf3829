"""robots.txt as a relational program (plans/web.py, round 12): the
Catalyst parse (posexplode + gaps-and-islands groups), the documented
matching contract (RFC 9309 patterns incl. '*'/'$' since round 13,
longest written pattern wins, Allow wins ties, empty value matches
nothing, specific group shadows '*'), and the plan shape
(broadcast rules dim, windowed winner)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_event_stream_spark.plans.web import (
    parse_robots_groups,
    parse_robots_rules,
    robots_allowed,
)

ROBOTS = (
    "# comment only line\r\n"
    "User-agent: GoodBot   # inline comment\r\n"
    "User-agent: OtherBot\r\n"
    "Disallow: /a/b\r\n"
    "Allow: /a/b/c\r\n"
    "Crawl-delay: 10\r\n"
    "\r\n"
    "User-agent: *\r\n"
    "Disallow: /a\r\n"
    "Disallow:\r\n"
    "Sitemap: https://example.invalid/map.xml\r\n"
)


def _robots_df(spark, text=ROBOTS, domain="d.example"):
    return spark.createDataFrame([(domain, text)], "domain string, text string")


def test_parse_rules_and_groups(spark):
    """CRLF + comments stripped; two UA lines share one group; unknown
    directives ignored; empty Disallow dropped; rules duplicate per UA."""
    robots = _robots_df(spark)
    rules = {
        (r["ua"], r["prefix"], r["allow"])
        for r in parse_robots_rules(robots).collect()
    }
    assert rules == {
        ("goodbot", "/a/b", False),
        ("goodbot", "/a/b/c", True),
        ("otherbot", "/a/b", False),
        ("otherbot", "/a/b/c", True),
        ("*", "/a", False),
    }
    groups = {
        (r["grp"], r["ua"]) for r in parse_robots_groups(robots).collect()
    }
    assert groups == {(1, "goodbot"), (1, "otherbot"), (2, "*")}


def _decide(spark, agent, paths, text=ROBOTS):
    robots = _robots_df(spark, text)
    urls = spark.createDataFrame(
        [(i, "d.example", p) for i, p in enumerate(paths)],
        "doc_id long, domain string, path string",
    )
    out = robots_allowed(
        urls, parse_robots_rules(robots), parse_robots_groups(robots), agent
    )
    return {r["path"]: (r["allowed"], r["matched_rule"]) for r in out.collect()}

def test_matching_contract(spark):
    """Longest match wins; Allow beats Disallow on the longer match; a
    URL matching nothing is allowed; '*' applies to unknown agents."""
    got = _decide(spark, "GoodBot", ["/a/b/c/d", "/a/b/x", "/a", "/zzz"])
    assert got["/a/b/c/d"] == (True, "/a/b/c")  # longer Allow overrides
    assert got["/a/b/x"] == (False, "/a/b")
    assert got["/a"] == (True, None)  # GoodBot group has no /a rule
    assert got["/zzz"] == (True, None)
    # unknown agent falls through to '*'
    got = _decide(spark, "randombot", ["/a/b/c/d", "/zzz"])
    assert got["/a/b/c/d"] == (False, "/a")  # '*' group: Disallow /a only
    assert got["/zzz"] == (True, None)


def test_empty_specific_group_shadows_star(spark):
    """A group naming the agent with NO effective rules still shadows
    '*': everything is allowed even though '*' would deny it."""
    text = (
        "User-agent: trainbot\r\nDisallow:\r\n\r\n"
        "User-agent: *\r\nDisallow: /\r\n"
    )
    got = _decide(spark, "trainbot", ["/", "/a/b"], text=text)
    assert got["/"] == (True, None)
    assert got["/a/b"] == (True, None)
    # while any other agent is fully blocked
    got = _decide(spark, "elsebot", ["/", "/a/b"], text=text)
    assert got["/"] == (False, "/")
    assert got["/a/b"] == (False, "/")


def test_tie_break_allow_wins(spark):
    """Same-length Allow and Disallow prefixes: Allow wins (the REP's
    least-restrictive tie-break)."""
    text = "User-agent: *\r\nDisallow: /dir\r\nAllow: /dia\r\n"
    got = _decide(spark, "x", ["/dir/p", "/dia/p"], text=text)
    assert got["/dir/p"] == (False, "/dir")
    assert got["/dia/p"] == (True, "/dia")
    # true equal-length tie on the SAME path needs equal prefixes of both
    # kinds — /same allowed and disallowed at once: Allow wins
    text = "User-agent: *\r\nDisallow: /same\r\nAllow: /same\r\n"
    got = _decide(spark, "x", ["/same/p"], text=text)
    assert got["/same/p"] == (True, "/same")


def test_rfc9309_wildcards_and_anchor(spark):
    """The RFC 9309 special characters: '*' spans any octets, a trailing
    '$' anchors the end, a mid-pattern '$' is literal, regex metachars in
    paths stay literal, and specificity is the WRITTEN pattern length."""
    text = (
        "User-agent: *\r\n"
        "Disallow: /*.pdf$\r\n"          # any .pdf, anchored
        "Allow: /pub/*.pdf$\r\n"         # longer written pattern wins
        "Disallow: /a*e\r\n"
        "Disallow: /lit$eral\r\n"        # mid-pattern $ is literal
        "Disallow: /dot.d\r\n"           # '.' must not act as regex dot
    )
    got = _decide(
        spark,
        "anybot",
        [
            "/x/report.pdf",        # blocked by /*.pdf$
            "/pub/report.pdf",      # allowed: /pub/*.pdf$ is longer
            "/x/report.pdfx",       # NOT anchored-match -> no rule -> allowed
            "/apple",               # /a*e matches a..e prefix
            "/lit$eral/page",       # literal mid-$ matches
            "/literal/page",        # and without the $ it must NOT
            "/dot.d/x",             # literal dot matches
            "/dotXd/x",             # regex-dot behavior would wrongly match
        ],
        text=text,
    )
    assert got["/x/report.pdf"] == (False, "/*.pdf$")
    assert got["/pub/report.pdf"] == (True, "/pub/*.pdf$")
    assert got["/x/report.pdfx"] == (True, None)
    assert got["/apple"] == (False, "/a*e")
    assert got["/lit$eral/page"] == (False, "/lit$eral")
    assert got["/literal/page"] == (True, None)
    assert got["/dot.d/x"] == (False, "/dot.d")
    assert got["/dotXd/x"] == (True, None)


def test_plan_broadcasts_rules_dim(spark):
    """The decision plan must broadcast the rules dim into the URL fact
    table — no shuffle of the facts for the join."""
    robots = _robots_df(spark)
    urls = spark.createDataFrame(
        [(i, "d.example", "/a/b") for i in range(10)],
        "doc_id long, domain string, path string",
    )
    out = robots_allowed(
        urls,
        parse_robots_rules(robots),
        parse_robots_groups(robots),
        "goodbot",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_robots_differential_vs_reference(spark):
    """Differential verification: 60 random robots files x 6 paths decided
    by the relational pipeline must match an independent straight-Python
    reference implementation of the documented contract (RFC 9309
    patterns — '*' spans octets, trailing '$' anchors — longest written
    pattern wins, Allow wins ties, empty value matches nothing, specific
    group shadows '*', no match allows)."""
    import random

    import re

    rnd = random.Random(20260816)
    prefixes = [
        "/", "/a", "/a/b", "/a/b/c", "/ax", "/b", "/b/c",
        # RFC 9309 special characters (round 13): '*' spans octets, a
        # trailing '$' anchors — the differential must cover them too
        "/a/*", "/*.d$", "/a*d", "/b$", "/*/c",
    ]
    paths = ["/", "/a", "/a/b/c/d", "/ax/y", "/b/c", "/zz", "/a/x.d"]
    agents_pool = ["bot", "*", "other"]

    def rule_match(path, pat):
        anchored = pat.endswith("$") and len(pat) > 1
        body = pat[:-1] if anchored else pat
        rx = "^" + re.escape(body).replace(r"\*", ".*") + ("$" if anchored else "")
        return re.match(rx, path) is not None

    def ref_decide(text, agent):
        """Straight-Python implementation of the documented contract,
        over the raw TEXT (independent of the tuple structure used to
        generate it): per RFC 9309 blank lines are insignificant and
        CONSECUTIVE User-agent directive lines merge into one group —
        the first version of this reference modeled blank-line-separated
        UA runs as separate groups and the differential flagged the
        implementation; the implementation was right."""
        groups = []  # (ua_set, rules)
        prev_ua = False
        for line in text.split("\n"):
            line = line.split("#")[0].strip()
            if not line or ":" not in line:
                continue
            name, _, value = line.partition(":")
            name, value = name.strip().lower(), value.strip()
            if name == "user-agent":
                if not prev_ua:
                    groups.append((set(), []))
                groups[-1][0].add(value.lower())
                prev_ua = True
            else:
                prev_ua = False
                if name in ("allow", "disallow") and value and groups:
                    groups[-1][1].append((name == "allow", value))
        named = [g for g in groups if agent in g[0]]
        chosen = named if named else [g for g in groups if "*" in g[0]]
        rules = [r for g in chosen for r in g[1]]
        out = {}
        for p in paths:
            hits = [(len(pfx), allow) for allow, pfx in rules if rule_match(p, pfx)]
            if not hits:
                out[p] = True
            else:
                out[p] = sorted(hits, key=lambda h: (-h[0], not h[1]))[0][1]
        return out

    cases = []
    for case in range(60):
        n_groups = rnd.randint(1, 3)
        groups = []
        for _ in range(n_groups):
            uas = rnd.sample(agents_pool, rnd.randint(1, 2))
            rules = [
                (rnd.random() < 0.4, rnd.choice(prefixes + [""]))
                for _ in range(rnd.randint(0, 4))
            ]
            groups.append((uas, rules))
        text = ""
        for uas, rules in groups:
            for ua in uas:
                text += f"User-agent: {ua}\n"
            for allow, pfx in rules:
                text += f"{'Allow' if allow else 'Disallow'}: {pfx}\n"
            text += "\n"
        cases.append((f"d{case}.example", text, groups))

    robots = spark.createDataFrame(
        [(d, t) for d, t, _ in cases], "domain string, text string"
    )
    urls = spark.createDataFrame(
        [
            (i * 10 + j, d, p)
            for i, (d, _, _) in enumerate(cases)
            for j, p in enumerate(paths)
        ],
        "doc_id long, domain string, path string",
    )
    got = {
        (r["domain"], r["path"]): r["allowed"]
        for r in robots_allowed(
            urls,
            parse_robots_rules(robots),
            parse_robots_groups(robots),
            "bot",
        ).collect()
    }
    mismatches = []
    for d, text, groups in cases:
        want = ref_decide(text, "bot")
        for p in paths:
            if got[(d, p)] != want[p]:
                mismatches.append((d, p, got[(d, p)], want[p], groups))
    assert not mismatches, mismatches[:3]


def test_parse_sitemap_urls(spark):
    """Sitemap parsing edges: urlset entries in order, XML entities in
    loc decode, missing lastmod is NULL, whitespace inside loc trims,
    sitemapindex files flag is_index and surface child locs, an empty
    file yields zero rows."""
    from eth_event_stream_spark.plans.web import parse_sitemap_urls

    urlset = (
        '<?xml version="1.0"?>\n<urlset>\n'
        "  <url><loc> https://d.example/a?x=1&amp;y=2 </loc>"
        "<lastmod>2026-01-02</lastmod></url>\n"
        "  <url>\n    <loc>https://d.example/b</loc>\n  </url>\n"
        "</urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>https://d.example/s1.xml</loc>"
        "</sitemap><sitemap><loc>https://d.example/s2.xml</loc>"
        "<lastmod>2026-02-03</lastmod></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [("a.example", urlset), ("b.example", index), ("c.example", "<urlset></urlset>")],
        "domain string, xml string",
    )
    rows = {(r["domain"], r["url_idx"]): r for r in parse_sitemap_urls(df).collect()}
    assert len(rows) == 4  # 2 urls + 2 child sitemaps; empty file: none
    a0 = rows[("a.example", 0)]
    assert a0["loc"] == "https://d.example/a?x=1&y=2"  # trimmed + decoded
    assert a0["lastmod"] == "2026-01-02"
    assert a0["is_index"] is False
    a1 = rows[("a.example", 1)]
    assert a1["loc"] == "https://d.example/b" and a1["lastmod"] is None
    b0, b1 = rows[("b.example", 0)], rows[("b.example", 1)]
    assert b0["is_index"] is True and b0["loc"].endswith("s1.xml")
    assert b1["lastmod"] == "2026-02-03"
    # pure Catalyst: no Python nodes in the parse plan
    plan = parse_sitemap_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan


def _frontier_dfs(spark, root_xml, fetched_rows):
    from eth_event_stream_spark.plans.web import sitemap_frontier

    roots = spark.createDataFrame(
        [(1, "d.example", root_xml)], "root_id long, domain string, xml string"
    )
    fetched = spark.createDataFrame(
        fetched_rows or [("none", "<urlset></urlset>")], "url string, xml string"
    )
    return sitemap_frontier(roots, fetched)


def test_sitemap_frontier_recursion(spark):
    """Index root -> child sitemaps from the fetch cache -> page URLs at
    level 1 with parent_loc; a plain urlset root stays level 0; an
    unfetched child contributes nothing; both levels pure Catalyst."""
    index = (
        "<sitemapindex>"
        "<sitemap><loc>https://d.example/s1.xml</loc></sitemap>"
        "<sitemap><loc>https://d.example/s2.xml</loc></sitemap>"
        "<sitemap><loc>https://d.example/unfetched.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    s1 = (
        "<urlset><url><loc>https://d.example/a</loc>"
        "<lastmod>2026-03-01</lastmod></url>"
        "<url><loc>https://d.example/b</loc></url></urlset>"
    )
    s2 = "<urlset><url><loc>https://d.example/c</loc></url></urlset>"
    out = _frontier_dfs(
        spark,
        index,
        [("https://d.example/s1.xml", s1), ("https://d.example/s2.xml", s2)],
    )
    rows = {(r["parent_loc"], r["url_idx"]): r for r in out.collect()}
    assert len(rows) == 3  # unfetched child contributed nothing
    a = rows[("https://d.example/s1.xml", 0)]
    assert a["level"] == 1 and a["loc"] == "https://d.example/a"
    assert a["lastmod"] == "2026-03-01"
    assert rows[("https://d.example/s1.xml", 1)]["loc"] == "https://d.example/b"
    assert rows[("https://d.example/s2.xml", 0)]["loc"] == "https://d.example/c"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan
    # a plain urlset root surfaces at level 0 with no parent
    out0 = _frontier_dfs(
        spark, "<urlset><url><loc>https://d.example/x</loc></url></urlset>", []
    )
    (r0,) = out0.collect()
    assert r0["level"] == 0 and r0["parent_loc"] is None
    assert r0["loc"] == "https://d.example/x"


PSL_RULES = (
    "// test rules\n"
    "com\n"
    "example\n"
    "co.example\n"
    "*.wild.example\n"
    "!ok.wild.example\n"
    "uk\n"
    "co.uk\n"
)


def test_parse_suffix_rules(spark):
    from eth_event_stream_spark.plans.web import parse_suffix_rules

    df = spark.createDataFrame([(PSL_RULES,)], "text string")
    rules = {
        (r["pattern"], r["n_labels"], r["is_exception"])
        for r in parse_suffix_rules(df).collect()
    }
    assert ("co.uk", 2, False) in rules
    assert ("*.wild.example", 3, False) in rules
    assert ("ok.wild.example", 3, True) in rules
    assert not any(p.startswith("//") for p, _, _ in rules)


def test_psl_registrable_domain(spark):
    """The publicsuffix.org algorithm cases: longest match, multi-label
    suffix, wildcard = one whole label, exception overrides wildcard,
    no-match defaults to the bare TLD, host == suffix -> NULL."""
    from eth_event_stream_spark.plans.web import psl_registrable_domain

    cases = {
        "www.site.example": "site.example",
        "a.b.site.co.example": "site.co.example",  # co.example beats example
        "x.sub.wild.example": "x.sub.wild.example",  # *.wild.example
        "sub.wild.example": None,  # host IS the (wildcard) public suffix
        "go.ok.wild.example": "ok.wild.example",  # exception beats wildcard
        "ok.wild.example": "ok.wild.example",  # exception: host registrable
        "shop.co.uk": "shop.co.uk",
        "a.shop.co.uk": "shop.co.uk",
        "unknown.tld": "unknown.tld",  # no match -> '*' default
        "tldonly": None,  # bare label is a public suffix
        "MiXeD.Site.Example": "site.example",  # lowercased
    }
    rules = spark.createDataFrame([(PSL_RULES,)], "text string")
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(cases)], "k long, host string"
    )
    out = psl_registrable_domain(df, "host", rules, keys=["k"])
    got = {r["host"]: r["registrable_domain"] for r in out.collect()}
    for host, want in cases.items():
        assert got[host] == want, (host, got[host], want)
    # the rules dim must broadcast into the candidate join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_psl_differential_vs_reference(spark):
    """Differential: 120 random hosts against a straight-Python
    implementation of the published algorithm (candidate suffixes,
    exception > longest, wildcard one label, '*' default)."""
    import random

    rnd = random.Random(20260817)
    labels = ["a", "b", "co", "ok", "wild", "example", "uk", "com", "zz"]
    rule_list = [
        ("com", False), ("example", False), ("co.example", False),
        ("*.wild.example", False), ("ok.wild.example", True),
        ("uk", False), ("co.uk", False),
    ]

    def ref(host):
        hl = host.lower().split(".")
        best = None  # (is_exc, n_labels)
        for pat, exc in rule_list:
            pl = pat.split(".")
            if len(pl) > len(hl):
                continue
            tail = hl[-len(pl):]
            if all(p == "*" or p == t for p, t in zip(pl, tail)):
                key = (exc, len(pl))
                if best is None or key > best:
                    best = key
        ps_n = 1 if best is None else (best[1] - 1 if best[0] else best[1])
        if len(hl) > ps_n:
            return ".".join(hl[-(ps_n + 1):])
        return None

    hosts = [
        ".".join(rnd.choice(labels) for _ in range(rnd.randint(1, 5)))
        for _ in range(120)
    ]
    from eth_event_stream_spark.plans.web import psl_registrable_domain

    rules = spark.createDataFrame([(PSL_RULES,)], "text string")
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "k long, host string"
    )
    got = {
        r["k"]: r["registrable_domain"]
        for r in psl_registrable_domain(df, "host", rules, keys=["k"]).collect()
    }
    bad = [
        (h, got[i], ref(h)) for i, h in enumerate(hosts) if got[i] != ref(h)
    ]
    assert not bad, bad[:5]


def test_sitemap_frontier_nested_index_refuses(spark):
    """The protocol forbids index->index nesting: a fetched child that is
    itself a sitemapindex fails the job loudly, never a silently shallow
    frontier."""
    import pytest

    index = (
        "<sitemapindex><sitemap><loc>https://d.example/s1.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    nested = (
        "<sitemapindex><sitemap><loc>https://d.example/deeper.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    out = _frontier_dfs(spark, index, [("https://d.example/s1.xml", nested)])
    with pytest.raises(Exception, match="nested sitemapindex"):
        out.collect()


def test_parse_robots_sitemaps(spark):
    """Sitemap: directives are global — extracted in file order wherever
    they sit (inside or between groups), case-insensitively, comments
    stripped, empty values dropped."""
    from eth_event_stream_spark.plans.web import parse_robots_sitemaps

    text = (
        "User-agent: *\r\n"
        "Sitemap: https://d.example/a.xml  # trailing comment\r\n"
        "Disallow: /x\r\n\r\n"
        "SITEMAP:https://d.example/b.xml\r\n"
        "Sitemap:\r\n"  # empty: nothing to fetch
        "sitemap-hint: not-a-directive\r\n"
    )
    rows = parse_robots_sitemaps(
        spark.createDataFrame([("d.example", text)], "domain string, text string")
    ).collect()
    got = [(r["sitemap_idx"], r["sitemap_url"]) for r in sorted(rows, key=lambda r: r["sitemap_idx"])]
    assert got == [
        (0, "https://d.example/a.xml"),
        (1, "https://d.example/b.xml"),
    ]


def test_resolve_redirects(spark):
    """Chain semantics: multi-hop resolution, dangling Location, a cycle
    hitting the hop bound, and terminal rows passing straight through."""
    from eth_event_stream_spark.plans.web import resolve_redirects

    rows = [
        ("a", 301, "b"),
        ("b", 302, "c"),
        ("c", 200, None),
        ("d", 301, "ghost"),   # dangling: ghost never fetched
        ("e", 301, "f"),       # 2-cycle: exhausts the hop bound
        ("f", 301, "e"),
        ("g", 404, None),      # terminal error page
        ("h", 301, None),      # 3xx WITHOUT Location: terminal by contract
    ]
    resp = spark.createDataFrame(rows, "url string, status int, location string")
    got = {
        r["url"]: (
            r["final_url"], r["n_hops"], r["terminal_status"], r["resolved"]
        )
        for r in resolve_redirects(resp, max_hops=5).collect()
    }
    assert got["a"] == ("c", 2, 200, True)
    assert got["b"] == ("c", 1, 200, True)
    assert got["c"] == ("c", 0, 200, True)
    assert got["d"] == ("ghost", 1, None, False)
    assert got["g"] == ("g", 0, 404, True)
    assert got["h"] == ("h", 0, 301, True)
    # the cycle pair: still redirecting at the bound, unresolved; n_hops
    # counts the edge they were ABOUT to follow (the oracle's recursive
    # CTE computes hops+1 for still-3xx last rows), matching the
    # dangling branch's edge-into-the-void count
    assert got["e"][3] is False and got["f"][3] is False
    assert got["e"][1] == 6 and got["e"][2] is None
    assert got["e"][0] in ("e", "f")
    # exactly one output row per input url
    assert len(got) == len(rows)

    # short bound: a 2-hop linear chain truncated at max_hops=1 reports
    # the unfollowed edge's target with n_hops = 1 (followed) + 1
    # (about-to-follow), unresolved — pins the bound branch the synth
    # schedule (chains <= 3 < 5) never exercises
    short = {
        r["url"]: (
            r["final_url"], r["n_hops"], r["terminal_status"], r["resolved"]
        )
        for r in resolve_redirects(resp, max_hops=1).collect()
    }
    assert short["a"] == ("c", 2, None, False)
    assert short["b"] == ("c", 1, 200, True)
    assert short["d"] == ("ghost", 1, None, False)
    assert len(short) == len(rows)


def test_parse_robots_delays_scoping(spark):
    """Crawl-delay semantics: scopes to the UA group above it WITHOUT
    splitting UA runs (RFC 9309 tolerance), last delay in a group wins,
    non-numeric values drop, a delay above any UA line drops, and the
    effective delay shadows '*' exactly like the rules (an agent-specific
    group with NO delay yields NO delay, not the '*' value)."""
    from eth_event_stream_spark.plans.web import (
        effective_crawl_delay,
        parse_robots_delays,
        parse_robots_groups,
    )

    text = (
        "Crawl-delay: 99\r\n"            # above any group: dropped
        "User-agent: A\r\n"
        "Crawl-delay: 1\r\n"             # must NOT split the A/B UA run...
        "User-agent: B\r\n"              # ...so A and B still share a group
        "Disallow: /x\r\n"
        "Crawl-delay: nonsense\r\n"      # non-numeric: dropped
        "Crawl-delay: 2.5\r\n"           # last wins for the A+B group
        "\r\n"
        # the Disallow matters: without a rule line, the RFC contract
        # ignores the unknown Crawl-delay entirely and the '*' and C
        # User-agent lines would merge into ONE group
        "User-agent: *\r\nCrawl-delay: 7\r\nDisallow: /star\r\n"
        "\r\n"
        "User-agent: C\r\nDisallow: /c\r\n"  # specific group, NO delay
    )
    robots = spark.createDataFrame(
        [("d.example", text)], "domain string, text string"
    )
    delays = {
        (r["ua"], r["delay"]) for r in parse_robots_delays(robots).collect()
    }
    assert delays == {("a", 2.5), ("b", 2.5), ("*", 7.0)}
    groups = parse_robots_groups(robots)
    # RFC tolerance held: A and B share one group
    grp_of = {r["ua"]: r["grp"] for r in groups.collect()}
    assert grp_of["a"] == grp_of["b"]

    def eff(agent):
        rows = effective_crawl_delay(
            parse_robots_delays(robots), groups, agent
        ).collect()
        return rows[0]["delay"] if rows else None

    assert eff("B") == 2.5
    assert eff("unknownbot") == 7.0   # '*' applies
    assert eff("C") is None           # specific group shadows '*', no delay


def test_revalidation_plan_branch_order(spark):
    """RFC 9110 validator precedence under the sitemap shortcut: an
    unchanged frontier lastmod beats a stored ETag (skip costs nothing),
    a newer frontier lastmod falls through to the ETag conditional,
    never-fetched is always full — even when discovery advertises a
    lastmod — and ETag beats Last-Modified when both are stored."""
    from eth_event_stream_spark.plans.web import revalidation_plan

    urls = spark.createDataFrame([(u,) for u in "abcdef"], "url string")
    stored = spark.createDataFrame(
        [
            ("a", '"ea"', "2026-05-01"),   # both validators
            ("b", '"eb"', "2026-05-01"),
            ("c", None, "2026-05-01"),
            ("d", None, None),             # fetched, no validators
        ],
        "url string, stored_etag string, stored_lastmod string",
    )
    frontier = spark.createDataFrame(
        [("a", "2026-05-01"), ("b", "2026-08-15"), ("e", "2026-08-15")],
        "url string, frontier_lastmod string",
    )
    got = {
        r["url"]: (r["action"], r["if_none_match"], r["if_modified_since"])
        for r in revalidation_plan(urls, stored, frontier).collect()
    }
    assert got["a"] == ("skip", None, None)            # unchanged beats ETag
    assert got["b"] == ("conditional_etag", '"eb"', None)  # newer -> 304 round
    assert got["c"] == ("conditional_modified", None, "2026-05-01")
    assert got["d"] == ("full", None, None)
    assert got["e"] == ("full", None, None)            # never fetched
    assert got["f"] == ("full", None, None)


def test_strip_tracking_params(spark):
    """The data-driven strip: prefix and exact rules, regex-special rule
    names matched literally, order preserved, all-stripped queries drop
    their '?', and query-less urls pass untouched."""
    from eth_event_stream_spark.plans.web import (
        parse_tracking_rules,
        strip_tracking_params,
    )

    rules = spark.createDataFrame(
        [("// c\nutm_*\ngclid\na.b\n\nref\n",)], "text string"
    )
    parsed = {
        r["pattern"]: (r["base"], r["is_prefix"])
        for r in parse_tracking_rules(rules).collect()
    }
    assert parsed == {
        "utm_*": ("utm_", True),
        "gclid": ("gclid", False),
        "a.b": ("a.b", False),
        "ref": ("ref", False),
    }
    urls = [
        ("http://h/p?utm_source=x&id=1&utm_c=y", "http://h/p?id=1"),
        ("http://h/p?gclid=z", "http://h/p"),
        # 'a.b' must match literally — 'axb' must NOT strip
        ("http://h/p?a.b=1&axb=2", "http://h/p?axb=2"),
        ("http://h/p?b=2&a=1", "http://h/p?b=2&a=1"),
        ("http://h/p", "http://h/p"),
        # bare '?': empty query, url unchanged (canonicalize's job)
        ("http://h/p?", "http://h/p?"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in urls], "u string")
    got = [
        r["out"]
        for r in strip_tracking_params(df, "u", rules, out="out")
        .select("out")
        .collect()
    ]
    assert got == [w for _, w in urls]


def test_robots_fetch_mode(spark):
    """RFC 9309 §2.3.1 taxonomy over resolver terminals: 2xx parse,
    4xx allow-all, 5xx deny-all, unresolved (dangling/cycle) deny-all."""
    from eth_event_stream_spark.plans.web import robots_fetch_mode

    rows = [
        ("a", "a", 0, 200, True),
        ("b", "b", 0, 404, True),
        ("c", "c", 0, 503, True),
        ("d", "ghost", 1, None, False),   # dangling redirect target
        ("e", "e", 0, 301, True),         # 3xx terminal (no Location)
    ]
    df = spark.createDataFrame(
        rows,
        "url string, final_url string, n_hops int, "
        "terminal_status int, resolved boolean",
    )
    got = {r["url"]: r["mode"] for r in robots_fetch_mode(df).collect()}
    assert got == {
        "a": "parse",
        "b": "allow_all",
        "c": "deny_all",
        "d": "deny_all",
        "e": "deny_all",
    }

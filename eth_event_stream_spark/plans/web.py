"""Web-corpus curation: robots.txt evaluated as a relational program.

Crawl curation must honor robots.txt, and at 100 TB the natural shape
is relational: rule sets are a TINY dimension (a few rules per domain)
while URLs are the fact table — so parse the robots text into a rules
relation, BROADCAST it, and decide every URL with one join plus a
per-URL window (longest-match winner). This module does even the
PARSING relationally: ``split`` + ``posexplode`` turn each file into
lines, window functions reconstruct the User-agent groups (a group is a
run of consecutive ``User-agent`` lines plus the rules that follow —
the classic gaps-and-islands shape), and everything stays in Catalyst.

The MATCHING CONTRACT (RFC 9309, round 13 — the special characters
are in scope): a rule is a path pattern where ``*`` matches any octet
sequence and a TRAILING ``$`` anchors the end of the path (a
mid-pattern ``$`` is literal); patterns without wildcards match as
literal prefixes. The most specific matching rule wins — specificity
is the octet length of the pattern AS WRITTEN (wildcards and anchor
count, the RFC's longest-match measure); on a length tie Allow wins; a
directive with an EMPTY value matches nothing; a URL matching no rule
is allowed; when a group names the requested agent specifically, ONLY
that group applies (an empty specific group therefore allows
everything, even when ``*`` rules would deny) — otherwise the ``*``
group applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .catalog import t, t_parallel
from .registry import register


def _robots_grouped(robots: DataFrame) -> DataFrame:
    """(domain, text) -> classified directive lines with their User-agent
    group ids — the shared parse both relations below derive from."""
    lines = robots.select(
        "domain",
        F.posexplode(F.split("text", "\n")).alias("pos", "raw"),
    ).select(
        "domain",
        "pos",
        # regex trim, not trim(): CRLF files leave \r on every line
        F.regexp_replace(
            F.regexp_replace("raw", r"#.*$", ""), r"^\s+|\s+$", ""
        ).alias("line"),
    )
    classified = lines.select(
        "domain",
        "pos",
        F.lower(
            F.regexp_extract("line", r"(?i)^(user-agent|allow|disallow)\s*:", 1)
        ).alias("directive"),
        F.regexp_replace(
            F.regexp_extract("line", r"(?i)^[a-z-]+\s*:(.*)$", 1),
            r"^\s+|\s+$",
            "",
        ).alias("value"),
    ).filter(F.col("directive") != "")
    w = Window.partitionBy("domain").orderBy("pos")
    return classified.select(
        "domain",
        "pos",
        "directive",
        "value",
        F.sum(
            (
                (F.col("directive") == "user-agent")
                & (
                    F.lag("directive", 1, "").over(w) != "user-agent"
                )
            ).cast("int")
        )
        .over(w)
        .alias("grp"),
    )


def parse_robots_groups(robots: DataFrame) -> DataFrame:
    """(domain, text) -> (domain, grp, ua) — every User-agent a group
    names, INCLUDING groups that carry no rules (an empty specific group
    still shadows ``*``, so shadowing must come from this relation, not
    from the rules)."""
    grouped = _robots_grouped(robots)
    return grouped.filter(F.col("directive") == "user-agent").select(
        "domain", "grp", F.lower("value").alias("ua")
    )


def parse_robots_rules(robots: DataFrame) -> DataFrame:
    """(domain, text) -> (domain, grp, ua, allow, prefix, rule_re) — the
    rules relation, parsed entirely in Catalyst: lines via
    split+posexplode, comments stripped, User-agent groups reconstructed
    with the lag/running-sum gaps-and-islands idiom, empty-valued
    directives dropped (they match nothing). Unknown directives are
    ignored, as the REP requires. ``rule_re`` is the rule's RFC 9309
    matching regex, compiled IN CATALYST from the written pattern:
    ``*`` matches any octet sequence, a TRAILING ``$`` anchors the end
    (a mid-pattern ``$`` is literal), every other character matches
    literally (regex metachars escaped) — a plain literal rule compiles
    to exactly the anchored-prefix regex ``startswith`` used to
    implement."""
    grouped = _robots_grouped(robots)
    rules = grouped.filter(
        F.col("directive").isin("allow", "disallow") & (F.col("value") != "")
    ).select(
        "domain",
        "grp",
        (F.col("directive") == "allow").alias("allow"),
        F.col("value").alias("prefix"),
    )
    anchored = F.col("prefix").endswith("$") & (F.length("prefix") > 1)
    body = F.when(
        anchored,
        F.substring(F.col("prefix"), F.lit(1), F.length("prefix") - 1),
    ).otherwise(F.col("prefix"))
    esc = F.regexp_replace(body, r"([.\[\]{}()+\-^$|?\\])", r"\\$1")
    rules = rules.withColumn(
        "rule_re",
        F.concat(
            F.lit("^"),
            F.replace(esc, F.lit("*"), F.lit(".*")),
            F.when(anchored, F.lit("$")).otherwise(F.lit("")),
        ),
    ).withColumn(
        # most real rules are plain literals; flagging them lets the
        # decision join keep the cheap startswith branch. Measured
        # (round 15, quiet machine, ABBA min-of-3): inseparable at
        # sf0.1-sf1 fact sizes (0.44-0.49 s both ways — the decision is
        # dim-dominated there) and a real 1.14x at 20M urls x 20
        # domains (fast 1.87 s vs all-rlike 2.14 s) — the JVM regex on
        # tiny anchored patterns is cheap, so the win is modest but
        # grows with the url x rule product; kept for the billions-of-
        # evaluations crawl scale the asymptotic argument always named
        "is_pattern",
        F.col("prefix").contains("*") | anchored,
    )
    # a rule belongs to every agent its group names
    return rules.join(parse_robots_groups(robots), ["domain", "grp"]).select(
        "domain", "grp", "ua", "allow", "prefix", "rule_re", "is_pattern"
    )


def robots_allowed(
    urls: DataFrame, rules: DataFrame, groups: DataFrame, agent: str
) -> DataFrame:
    """Decide every (domain, path) row against the parsed relations for
    ``agent``: pick the applicable group (specific beats ``*``, and a
    specific group SHADOWS ``*`` entirely — even an EMPTY one, which is
    why ``groups`` is a separate input), broadcast-join the rules on
    domain + RFC 9309 pattern match (``rule_re``, wildcards and end
    anchor included), take the longest-written-pattern winner per URL
    (Allow wins length ties), default allowed. Adds ``allowed`` and
    ``matched_rule``."""
    agent = agent.lower()
    scoped = rules.filter(F.col("ua").isin(agent, "*"))
    # domains where ANY group names the agent — '*' is shadowed there,
    # whether or not that group carries rules
    specific = (
        groups.filter(F.col("ua") == agent).select("domain").distinct()
    )
    applicable = (
        scoped.join(broadcast(specific), "domain", "left_semi")
        .filter(F.col("ua") == agent)
        .unionByName(
            scoped.join(broadcast(specific), "domain", "left_anti").filter(
                F.col("ua") == "*"
            )
        )
    )
    hits = urls.join(
        broadcast(applicable),
        (urls["domain"] == applicable["domain"])
        & F.when(
            F.col("is_pattern"), F.expr("regexp_like(path, rule_re)")
        ).otherwise(F.col("path").startswith(F.col("prefix"))),
        "left",
    ).drop(applicable["domain"])
    w = (
        Window.partitionBy("doc_id")
        .orderBy(
            F.length("prefix").desc(), F.col("allow").desc()
        )
    )
    ranked = hits.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return ranked.select(
        urls["*"],
        F.coalesce(F.col("allow"), F.lit(True)).alias("allowed"),
        F.col("prefix").alias("matched_rule"),
    )


def parse_robots_delays(robots: DataFrame) -> DataFrame:
    """(domain, text) -> (domain, grp, ua, delay) — ``Crawl-delay``
    directives resolved to the User-agent group they follow. Crawl-delay
    is OUTSIDE RFC 9309, and per its tolerance rule unrecognized lines
    must not interfere with group parsing — so this parse deliberately
    does NOT feed the shared ``_robots_grouped`` classifier (a
    Crawl-delay between two User-agent lines would wrongly split their
    run); instead each delay line joins to the LAST User-agent line
    above it, which is how the engines that honor the directive scope
    it. Several delay lines in one group: the last wins (parsers
    overwrite). Non-numeric values are dropped (nothing to honor —
    surfaced by the value staying absent, never a silent 0)."""
    grouped = _robots_grouped(robots)
    ua_rows = grouped.filter(F.col("directive") == "user-agent").select(
        "domain", F.col("pos").alias("ua_pos"), "grp"
    )
    lines = robots.select(
        "domain",
        F.posexplode(F.split("text", "\n")).alias("pos", "raw"),
    ).select(
        "domain",
        "pos",
        F.regexp_replace(
            F.regexp_replace("raw", r"#.*$", ""), r"^\s+|\s+$", ""
        ).alias("line"),
    )
    raw_delays = lines.select(
        "domain",
        "pos",
        F.regexp_replace(
            F.regexp_extract("line", r"(?i)^crawl-delay\s*:(.*)$", 1),
            r"^\s+|\s+$",
            "",
        ).alias("val"),
    ).filter(F.col("val").rlike(r"^[0-9]+(\.[0-9]+)?$"))
    # scope each delay to the group of the last UA line above it; a delay
    # before any UA line scopes to nothing and is dropped (no group to
    # honor it for), and the LAST delay of a group wins
    scoped = (
        raw_delays.join(ua_rows, "domain")
        .filter(F.col("ua_pos") < F.col("pos"))
        .groupBy("domain", "pos", "val")
        .agg(F.max("grp").alias("grp"))
    )
    last = scoped.groupBy("domain", "grp").agg(
        F.max(F.struct("pos", "val")).alias("__w")
    ).select("domain", "grp", F.col("__w.val").cast("double").alias("delay"))
    return last.join(parse_robots_groups(robots), ["domain", "grp"]).select(
        "domain", "grp", "ua", "delay"
    )


def effective_crawl_delay(
    delays: DataFrame, groups: DataFrame, agent: str
) -> DataFrame:
    """(domain, delay) — the delay the named agent must honor per domain:
    the agent-specific group's delay when ANY group names the agent
    (specific SHADOWS ``*`` entirely, even when the specific group
    carries no delay — same shadowing contract as the rules), else the
    ``*`` group's. Domains advertising no applicable delay are absent —
    the caller picks its own politeness default."""
    agent = agent.lower()
    specific = groups.filter(F.col("ua") == agent).select("domain").distinct()
    scoped = delays.filter(F.col("ua").isin(agent, "*"))
    applicable = (
        scoped.join(broadcast(specific), "domain", "left_semi")
        .filter(F.col("ua") == agent)
        .unionByName(
            scoped.join(broadcast(specific), "domain", "left_anti").filter(
                F.col("ua") == "*"
            )
        )
    )
    # one group can be named by several UA lines (same value, per-group),
    # and RFC 9309 merges MULTIPLE groups naming the same agent — when
    # those carry different delays, MAX is the deliberate pick: the most
    # POLITE of the advertised values, never a silently faster crawl
    return applicable.groupBy("domain").agg(F.max("delay").alias("delay"))


def parse_robots_sitemaps(robots: DataFrame) -> DataFrame:
    """(domain, text) -> (domain, sitemap_idx, sitemap_url) — the
    ``Sitemap:`` directives of each robots.txt, in file order. Per the
    sitemaps.org robots extension these are GLOBAL (never scoped to a
    User-agent group), so they parse from the line relation directly —
    no group reconstruction — and they are the natural ROOTS input to
    ``sitemap_frontier``: robots politeness and sitemap discovery meet
    in the same file. Empty values are dropped (nothing to fetch);
    matching is case-insensitive like every other directive."""
    lines = robots.select(
        "domain",
        F.posexplode(F.split("text", "\n")).alias("pos", "raw"),
    ).select(
        "domain",
        "pos",
        F.regexp_replace(
            F.regexp_replace("raw", r"#.*$", ""), r"^\s+|\s+$", ""
        ).alias("line"),
    )
    hits = lines.select(
        "domain",
        "pos",
        F.regexp_replace(
            F.regexp_extract("line", r"(?i)^sitemap\s*:(.*)$", 1),
            r"^\s+|\s+$",
            "",
        ).alias("sitemap_url"),
    ).filter(F.col("sitemap_url") != "")
    w = Window.partitionBy("domain").orderBy("pos")
    return hits.select(
        "domain",
        (F.row_number().over(w) - 1).cast("bigint").alias("sitemap_idx"),
        "sitemap_url",
    )


def parse_suffix_rules(rules: DataFrame) -> DataFrame:
    """(text) -> (pattern, n_labels, is_exception) — a public-suffix-
    style rule table parsed entirely in Catalyst, the same idiom as the
    robots parse: lines via split+posexplode, ``//`` comment lines and
    blanks dropped, ``!`` exception rules flagged and stripped, patterns
    lowercased. The publicsuffix.org format restricts wildcards to a
    whole leftmost label (``*.ck``); that is the only wildcard form the
    matcher generates candidates for. IDN labels are matched as the
    caller spells them (punycode stays punycode) — normalization is the
    ingest step's job, documented, not guessed here."""
    lines = rules.select(
        F.posexplode(F.split("text", "\n")).alias("pos", "raw")
    ).select(
        F.regexp_replace("raw", r"^\s+|\s+$", "").alias("line")
    )
    kept = lines.filter(
        (F.col("line") != "") & ~F.col("line").startswith("//")
    )
    pattern = F.lower(F.regexp_replace("line", r"^!", ""))
    return kept.select(
        pattern.alias("pattern"),
        F.size(F.split(pattern, r"\.")).cast("bigint").alias("n_labels"),
        F.col("line").startswith("!").alias("is_exception"),
    )


def psl_registrable_domain(
    df: DataFrame,
    host,
    rules: DataFrame,
    keys: list[str] | None = None,
    out: str = "registrable_domain",
) -> DataFrame:
    """The REAL registrable-domain (eTLD+1) decision against a rule
    table, by the published publicsuffix.org algorithm: every suffix of
    the host's label sequence is a candidate (plus the ``*.``-wildcard
    form of each), candidates broadcast-join the rules dim, the
    prevailing rule is the exception rule if any matched else the
    longest match, no match defaults to ``*`` (the bare TLD is the
    public suffix), an exception rule's public suffix is the rule minus
    its leftmost label, and the registrable domain is the public suffix
    plus one label — NULL when the host IS a public suffix. Adds ``out``
    to ``df``. ``keys`` is accepted for backward compatibility and
    ignored — the decision is a pure function of the host string, so it
    is keyed BY the host itself.

    At 100 TB the crucial shape decision: the algorithm runs on
    ``DISTINCT host``, not per URL row — a crawl has ~10^7-10^8 hosts
    under ~10^11 URLs, so the candidate explode and the winner aggregate
    shrink by the URL-per-host factor, and the fact table pays exactly
    one equi-join against a decisions dim that AQE can broadcast when
    small. The rule table itself is a tiny broadcast (the real PSL is
    ~10k rules)."""
    h_expr = F.lower(_c_host(host))
    hosts = df.select(h_expr.alias("__h")).distinct()
    labels = F.split(F.col("__h"), r"\.")
    n = F.size(labels)
    lit_cands = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, -i, i), "."),
    )
    wild_cands = F.transform(
        F.sequence(F.lit(2), F.greatest(n, F.lit(2))),
        lambda i: F.when(
            i <= n,
            F.concat(
                F.lit("*."),
                F.array_join(F.slice(labels, (i - 1) * -1, i - 1), "."),
            ),
        ),
    )
    cands = hosts.select(
        "__h",
        F.explode(
            F.filter(
                F.concat(lit_cands, wild_cands), lambda c: c.isNotNull()
            )
        ).alias("cand"),
    )
    hits = cands.join(
        broadcast(parse_suffix_rules(rules) if "text" in rules.columns else rules),
        F.col("cand") == F.col("pattern"),
    )
    # prevailing rule = exception first, then longest — exactly struct
    # ordering on (is_exception, n_labels), so the winner pick is a
    # map-side-combinable MAX aggregate, not a window sort (same-length
    # literal + wildcard matches yield the same ps_n, so no tiebreak is
    # needed beyond the struct)
    winners = hits.groupBy("__h").agg(
        F.max(F.struct("is_exception", "n_labels")).alias("__w")
    ).select(
        "__h",
        F.when(F.col("__w.is_exception"), F.col("__w.n_labels") - 1)
        .otherwise(F.col("__w.n_labels"))
        .alias("__ps_n"),
    )
    ps_n = F.coalesce(F.col("__ps_n"), F.lit(1)).cast("int")
    reg = F.when(
        n > ps_n, F.array_join(F.slice(labels, (ps_n + 1) * -1, ps_n + 1), ".")
    )
    decisions = hosts.join(winners, "__h", "left").select(
        "__h", reg.alias("__reg")
    )
    joined = df.join(decisions, h_expr == F.col("__h"), "left")
    return joined.withColumn(out, F.col("__reg")).drop("__h", "__reg")


def _c_host(col):
    return F.col(col) if isinstance(col, str) else col


def _synth_robots(spark: SparkSession) -> DataFrame:
    """Deterministic robots.txt TEXT for the 20 synth domains — comments,
    blank lines, an empty Disallow (matches nothing), an Allow override,
    and a trainbot group on 3/4 of domains (shadowing '*' there):
      *         : Disallow /private; Allow /private/ok (d%2==0);
                  Disallow /seg/seg (d%3==0)
      trainbot  : only when d%4 != 1 — Disallow / (d%5==0) else
                  'Disallow:' (empty -> allows everything DESPITE '*')
    """
    d = F.col("d")
    text = F.concat(
        F.lit("# synthetic robots\n\nUser-agent: *\nDisallow: /private\n"),
        F.when(
            d % 2 == 0, F.lit("Allow: /private/ok\n")
        ).otherwise(F.lit("")),
        F.when(
            d % 3 == 0, F.lit("Disallow: /seg/seg\n")
        ).otherwise(F.lit("")),
        F.when(d % 4 != 1, F.lit("\nUser-agent: trainbot\n")).otherwise(
            F.lit("")
        ),
        F.when(
            (d % 4 != 1) & (d % 5 == 0), F.lit("Disallow: /\n")
        ).when(d % 4 != 1, F.lit("Disallow:\n")).otherwise(F.lit("")),
    )
    return spark.range(20).select(
        F.concat(F.lit("site"), F.col("id").cast("string"), F.lit(".example"))
        .alias("domain"),
        F.col("id").alias("d"),
    ).select("domain", text.alias("text"))


@register(
    "web_robots_filter",
    oracle="""
    WITH domains AS (SELECT UNNEST(range(0, 20)) AS d),
    rules AS (
      SELECT d, '*' AS ua, FALSE AS allow, '/private' AS pfx FROM domains
      UNION ALL
      SELECT d, '*', TRUE, '/private/ok' FROM domains WHERE d % 2 = 0
      UNION ALL
      SELECT d, '*', FALSE, '/seg/seg' FROM domains WHERE d % 3 = 0
      UNION ALL
      SELECT d, 'trainbot', FALSE, '/' FROM domains
      WHERE d % 4 != 1 AND d % 5 = 0),
    urls AS (
      SELECT doc_id, doc_id % 20 AS d,
             CASE doc_id % 5
               WHEN 0 THEN '/private/ok/page'
               WHEN 1 THEN '/private/page'
               WHEN 2 THEN '/seg/seg'
               WHEN 3 THEN '/'
               ELSE '/public' END AS path,
             CASE WHEN doc_id % 20 % 4 != 1 THEN 'trainbot' ELSE '*' END
               AS agent_group
      FROM documents),
    hits AS (
      SELECT u.doc_id, r.allow, r.pfx,
             ROW_NUMBER() OVER (
               PARTITION BY u.doc_id
               ORDER BY length(r.pfx) DESC, r.allow DESC) AS rn
      FROM urls u
      JOIN rules r
        ON r.d = u.d AND r.ua = u.agent_group
       AND u.path LIKE r.pfx || '%')
    SELECT u.doc_id,
           'site' || u.d || '.example' AS domain,
           u.path,
           u.agent_group,
           COALESCE(h.allow, TRUE) AS allowed,
           h.pfx AS matched_rule
    FROM urls u
    LEFT JOIN (SELECT * FROM hits WHERE rn = 1) h USING (doc_id)
    """,
    doc="robots.txt honored relationally: Catalyst-parsed rule groups, "
    "broadcast RFC 9309 pattern-match join, Allow-wins tie-break; the "
    "oracle replays the whole decision from the rule formulas.",
)
def web_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-politeness filter, end to end and oracle-checked: 20
    synthetic robots.txt FILES (comments, blank lines, an empty Disallow,
    Allow overrides, and a trainbot group on 3/4 of domains) are parsed
    INTO A RULES RELATION entirely in Catalyst (split + posexplode +
    gaps-and-islands windows — no Python anywhere), then every document's
    URL is decided for agent ``trainbot`` by a BROADCAST pattern-match
    join (RFC 9309 semantics — rules compile to matching regexes in
    Catalyst; the rules are a tiny dim, URLs are the fact table) with a
    per-URL window taking the longest-written matching rule, Allow
    winning length ties, default allowed. The synth paths hit every semantic: the
    ``Allow: /private/ok`` override beating the shorter ``Disallow:
    /private``, the blanket ``Disallow: /``, an empty specific group
    SHADOWING the ``*`` rules (allowed despite a matching Disallow
    there), and no-match defaults. The DuckDB oracle rebuilds the same
    rules relation from the formulas and replays the decision — a parser
    that misgrouped rules, kept empty directives, or broke the tie-break
    flips `allowed` bits and breaks the hash match.

    At 100 TB: robots files parse once into a rules dim (tiny), the dim
    broadcasts, and the per-URL decision is one join + one
    WindowGroupLimit-shaped winner pick — no shuffle of the fact table
    beyond the aggregate the caller asks for."""
    robots = _synth_robots(spark)
    rules = parse_robots_rules(robots)
    groups = parse_robots_groups(robots)
    docs = t(spark, sf_dir, "documents").select("doc_id")
    return robots_allowed(_synth_urls(docs), rules, groups, "trainbot")


def _synth_urls(docs: DataFrame) -> DataFrame:
    """The deterministic URL per document the web queries share: domain
    cycles over 20 sites, the path over five shapes the synth robots
    rules interact with, and the agent group mirrors which domains define
    a trainbot group."""
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("site"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".example"),
        ).alias("domain"),
        F.element_at(
            F.array(
                F.lit("/private/ok/page"),
                F.lit("/private/page"),
                F.lit("/seg/seg"),
                F.lit("/"),
                F.lit("/public"),
            ),
            (F.col("doc_id") % 5 + 1).cast("int"),
        ).alias("path"),
        F.when((F.col("doc_id") % 20 % 4) != 1, F.lit("trainbot"))
        .otherwise(F.lit("*"))
        .alias("agent_group"),
    )


def _parse_sitemap_entries(sitemaps: DataFrame, keys: list[str]) -> DataFrame:
    """(*keys, xml) -> (*keys, url_idx, loc, lastmod, is_index) — the
    shared Catalyst parse behind ``parse_sitemap_urls`` (keyed by
    domain) and ``sitemap_frontier`` (keyed by root + parent)."""
    blocks = sitemaps.select(
        *keys,
        F.coalesce(
            F.expr(
                r"regexp_extract_all(xml, '(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>', 1)"
            ),
            F.array(),
        ).alias("blocks"),
        F.col("xml").contains("<sitemapindex").alias("is_index"),
    )
    entries = blocks.select(
        *keys,
        "is_index",
        F.posexplode("blocks").alias("url_idx", "block"),
    )
    loc = F.regexp_extract("block", r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")]:
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    return entries.select(
        *keys,
        F.col("url_idx").cast("bigint").alias("url_idx"),
        loc.alias("loc"),
        F.nullif(
            F.regexp_extract("block", r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1),
            F.lit(""),
        ).alias("lastmod"),
        "is_index",
    ).filter(F.col("loc") != "")


def parse_sitemap_urls(sitemaps: DataFrame) -> DataFrame:
    """(domain, xml) -> one row per ``<url>`` entry: (domain, url_idx,
    loc, lastmod) — sitemap.xml parsed entirely in Catalyst:
    ``regexp_extract_all`` pulls the ``<url>`` blocks, posexplode splits
    them, per-block extracts read ``<loc>``/``<lastmod>``, and the XML
    character references a conforming ``<loc>`` must escape (``&amp;``
    in query strings) decode in the same entity order as the HTML chain.
    ``<sitemapindex>`` files (pointers to child sitemaps) are surfaced
    with ``is_index = true`` so a crawler can recurse (``sitemap_frontier``
    performs that recursion); a file with neither element yields zero
    rows for its domain (sitemaps are advisory — absence is not an
    error)."""
    return _parse_sitemap_entries(sitemaps, ["domain"])


def sitemap_frontier(roots: DataFrame, fetched: DataFrame) -> DataFrame:
    """The full crawl-discovery traversal ``is_index`` advertises:
    (root_id, domain, xml) root sitemaps + a (url, xml) fetch cache ->
    one row per discovered page URL across BOTH levels the protocol
    allows: level 0 (plain ``<urlset>`` roots) and level 1 (``<urlset>``
    children listed by a ``<sitemapindex>`` root, joined back against
    the fetch cache on the child's ``<loc>``). The sitemaps.org protocol
    FORBIDS an index listing another index, so two levels IS the
    complete traversal — a nested index in the fetch cache fails the job
    loudly (``raise_error``, the house discipline) rather than silently
    truncating discovery. Index children absent from the fetch cache
    contribute nothing (not yet fetched — sitemaps are advisory), by
    contract.

    Output: (root_id, domain, level, parent_loc, url_idx, loc, lastmod)
    — ``parent_loc`` is NULL at level 0 and the child sitemap's URL at
    level 1; ``url_idx`` is the entry's position within ITS OWN file.

    Entirely Catalyst: both levels are the shared regexp parse, the only
    join is child-loc -> fetch-cache (equi-join on url; both sides scale
    with the crawl and shuffle-partition normally at 100 TB)."""
    ents = _parse_sitemap_entries(
        roots.select("root_id", "domain", "xml"), ["root_id", "domain"]
    )
    lvl0 = ents.filter(~F.col("is_index")).select(
        "root_id",
        "domain",
        F.lit(0).cast("bigint").alias("level"),
        F.lit(None).cast("string").alias("parent_loc"),
        "url_idx",
        "loc",
        "lastmod",
    )
    kids = ents.filter(F.col("is_index")).select(
        "root_id", "domain", F.col("loc").alias("url")
    )
    kid_docs = kids.join(fetched, "url").select(
        "root_id", "domain", F.col("url").alias("parent_loc"), "xml"
    )
    kents = _parse_sitemap_entries(
        kid_docs, ["root_id", "domain", "parent_loc"]
    )
    # the protocol forbids index->index nesting: refuse loudly, never a
    # silently shallow frontier. The guard lives in a FILTER, not a
    # projected column — Catalyst prunes unused projections, and a
    # caller selecting only (domain, level) must still trip it.
    guarded = kents.filter(
        F.assert_true(
            ~F.col("is_index"),
            F.concat(
                F.lit("nested sitemapindex (forbidden by the protocol): "),
                F.col("parent_loc"),
            ),
        ).isNull()
    )
    lvl1 = guarded.select(
        "root_id",
        "domain",
        F.lit(1).cast("bigint").alias("level"),
        "parent_loc",
        "url_idx",
        "loc",
        "lastmod",
    )
    return lvl0.unionByName(lvl1)


@register(
    "web_sitemap_urls",
    oracle="""
    WITH sm AS (
      SELECT doc_id, doc_id % 20 AS d, u.j
      FROM documents,
           LATERAL (SELECT UNNEST(range(0, 1 + doc_id % 3)) AS j) u)
    SELECT 'site' || d || '.example' AS domain,
           CAST(j AS BIGINT) AS url_idx,
           'https://site' || d || '.example/page/' || doc_id || '/' || j
             || '?a=1&b=' || j AS loc,
           CASE WHEN doc_id % 2 = 0
                THEN '2026-0' || (1 + doc_id % 9) || '-01' END AS lastmod,
           FALSE AS is_index
    FROM sm
    """,
    doc="sitemap.xml parsed in pure Catalyst: url blocks via "
    "regexp_extract_all + posexplode, loc/lastmod per block, XML "
    "entities decoded; the oracle replays every url string.",
)
def web_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-discovery half of the web-metadata pair (robots.txt is
    the politeness half): every document becomes a sitemap.xml with
    ``1 + doc_id % 3`` ``<url>`` entries — locs carrying XML-escaped
    query strings (``&amp;``) and alternating optional ``<lastmod>``
    fields — and ``parse_sitemap_urls`` extracts them ENTIRELY in
    Catalyst (regexp_extract_all + posexplode + per-block extracts +
    entity decode; zero Python anywhere, enforced by the registry-wide
    no-Python plan gate). The DuckDB oracle replays every loc, lastmod,
    and index flag with string arithmetic.

    At 100 TB: sitemap parsing is a stateless per-file string transform
    — it fuses into the scan exactly like the WET extraction, and the
    output explodes into small typed rows that feed the crawl frontier
    (or, in a training pipeline, the URL-curation profile) JVM-side."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id") % 20
    entry = F.concat(
        F.lit("  <url>\n    <loc>https://site"),
        d.cast("string"),
        F.lit(".example/page/"),
        F.col("doc_id").cast("string"),
        F.lit("/"),
        F.col("j").cast("string"),
        F.lit("?a=1&amp;b="),
        F.col("j").cast("string"),
        F.lit("</loc>\n"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("    <lastmod>2026-0"),
                (F.col("doc_id") % 9 + 1).cast("string"),
                F.lit("-01</lastmod>\n"),
            ),
        ).otherwise(F.lit("")),
        F.lit("  </url>\n"),
    )
    # one sitemap per DOCUMENT; entries MUST be in j order (url_idx = j
    # in the oracle), so collect (j, entry) structs and sort before the
    # join — collect_list alone has no order guarantee
    xml = docs.select(
        "doc_id",
        F.concat(F.lit("site"), d.cast("string"), F.lit(".example")).alias(
            "domain"
        ),
        F.explode(
            F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))
        ).alias("j"),
    ).groupBy("doc_id", "domain").agg(
        F.concat(
            F.lit('<?xml version="1.0"?>\n<urlset>\n'),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("j", entry.alias("e")))),
                    lambda s: s["e"],
                ),
                "",
            ),
            F.lit("</urlset>"),
        ).alias("xml")
    )
    return parse_sitemap_urls(xml.select("domain", "xml"))


@register(
    "web_sitemap_recursive",
    oracle="""
    WITH lvl0 AS (
      SELECT doc_id, u.j
      FROM documents, LATERAL (SELECT UNNEST(range(0, 2)) AS j) u
      WHERE doc_id % 4 = 2),
    kids AS (
      SELECT doc_id, u.c
      FROM documents,
           LATERAL (SELECT UNNEST(range(0, 1 + doc_id % 3)) AS c) u
      WHERE doc_id % 4 != 2 AND NOT (doc_id % 5 = 1 AND u.c = 0)),
    lvl1 AS (
      SELECT doc_id, c, u.j
      FROM kids,
           LATERAL (SELECT UNNEST(range(0, 1 + (doc_id + c) % 2)) AS j) u)
    SELECT doc_id AS root_id,
           'site' || (doc_id % 20) || '.example' AS domain,
           CAST(0 AS BIGINT) AS level,
           CAST(NULL AS VARCHAR) AS parent_loc,
           CAST(j AS BIGINT) AS url_idx,
           'https://site' || (doc_id % 20) || '.example/p/' || doc_id
             || '/r/' || j AS loc,
           CASE WHEN (doc_id + j) % 2 = 0
                THEN '2026-0' || (1 + doc_id % 9) || '-01' END AS lastmod
    FROM lvl0
    UNION ALL
    SELECT doc_id,
           'site' || (doc_id % 20) || '.example',
           CAST(1 AS BIGINT),
           'https://site' || (doc_id % 20) || '.example/sm/' || doc_id
             || '/' || c || '.xml',
           CAST(j AS BIGINT),
           'https://site' || (doc_id % 20) || '.example/p/' || doc_id
             || '/' || c || '/' || j,
           CASE WHEN (doc_id + c + j) % 2 = 0
                THEN '2026-0' || (1 + c) || '-02' END
    FROM lvl1
    """,
    doc="sitemapindex recursion: index roots -> child sitemaps joined "
    "from the fetch cache -> page URLs, plus plain urlset roots; both "
    "levels pure Catalyst; the oracle replays the whole frontier.",
)
def web_sitemap_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The traversal ``is_index`` advertises, performed end to end and
    oracle-checked: every document becomes a ROOT sitemap — a plain
    ``<urlset>`` (two page URLs) when ``doc_id % 4 == 2``, else a
    ``<sitemapindex>`` listing ``1 + doc_id % 3`` child sitemaps — and
    the fetch cache holds each child's ``<urlset>`` (``1 + (doc_id + c)
    % 2`` page URLs, alternating optional ``<lastmod>``), EXCEPT child 0
    of ``doc_id % 5 == 1`` roots, which stays unfetched and must
    contribute nothing (inner-join contract). ``sitemap_frontier`` runs
    both protocol levels in pure Catalyst — shared regexp parse, one
    equi-join of child locs against the cache, a ``raise_error`` guard
    on spec-forbidden nested indexes — and the DuckDB oracle replays the
    complete frontier (levels, parents, positions, locs, lastmods) with
    string arithmetic.

    At 100 TB: roots and the fetch cache are both crawl-scale tables;
    the parse is stateless per-file string work that fuses into each
    scan, and the single equi-join on child URL is the only shuffle —
    the protocol's two-level bound means NO iteration, unlike generic
    graph traversal."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    d = (F.col("doc_id") % 20).cast("string")
    site = F.concat(F.lit("https://site"), d, F.lit(".example"))
    domain = F.concat(F.lit("site"), d, F.lit(".example"))

    def url_entry(loc, lastmod):
        return F.concat(
            F.lit("<url><loc>"),
            loc,
            F.lit("</loc>"),
            F.coalesce(
                F.concat(F.lit("<lastmod>"), lastmod, F.lit("</lastmod>")),
                F.lit(""),
            ),
            F.lit("</url>"),
        )

    def root_page(j):
        loc = F.concat(
            site, F.lit("/p/"), F.col("doc_id").cast("string"),
            F.lit("/r/"), F.lit(str(j)),
        )
        lastmod = F.when(
            (F.col("doc_id") + j) % 2 == 0,
            F.concat(
                F.lit("2026-0"),
                (F.col("doc_id") % 9 + 1).cast("string"),
                F.lit("-01"),
            ),
        )
        return url_entry(loc, lastmod)

    def child_url(c):
        return F.concat(
            site, F.lit("/sm/"), F.col("doc_id").cast("string"),
            F.lit("/"), c.cast("string"), F.lit(".xml"),
        )

    def index_entry(c):
        return F.when(
            F.col("doc_id") % 3 >= c,
            F.concat(
                F.lit("<sitemap><loc>"), child_url(F.lit(c)),
                F.lit("</loc></sitemap>"),
            ),
        ).otherwise(F.lit(""))

    urlset_root = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        root_page(0), root_page(1), F.lit("</urlset>"),
    )
    index_root = F.concat(
        F.lit('<?xml version="1.0"?><sitemapindex>'),
        index_entry(0), index_entry(1), index_entry(2),
        F.lit("</sitemapindex>"),
    )
    roots = docs.select(
        F.col("doc_id").alias("root_id"),
        domain.alias("domain"),
        F.when(F.col("doc_id") % 4 == 2, urlset_root)
        .otherwise(index_root)
        .alias("xml"),
    )

    # the fetch cache: child c of every index root, EXCEPT child 0 of
    # doc_id % 5 == 1 roots (deliberately unfetched)
    kids = (
        docs.filter(F.col("doc_id") % 4 != 2)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))
            ).alias("c"),
        )
        .filter(~((F.col("doc_id") % 5 == 1) & (F.col("c") == 0)))
    )

    def kid_page(j):
        loc = F.concat(
            site, F.lit("/p/"), F.col("doc_id").cast("string"),
            F.lit("/"), F.col("c").cast("string"), F.lit("/"), F.lit(str(j)),
        )
        lastmod = F.when(
            (F.col("doc_id") + F.col("c") + j) % 2 == 0,
            F.concat(
                F.lit("2026-0"), (F.col("c") + 1).cast("string"), F.lit("-02")
            ),
        )
        entry = url_entry(loc, lastmod)
        if j == 0:
            return entry
        return F.when(
            (F.col("doc_id") + F.col("c")) % 2 == 1, entry
        ).otherwise(F.lit(""))

    fetched = kids.select(
        child_url(F.col("c")).alias("url"),
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'),
            kid_page(0), kid_page(1), F.lit("</urlset>"),
        ).alias("xml"),
    )
    return sitemap_frontier(roots, fetched)


@register(
    "web_http_headers",
    oracle=r"""
    WITH r AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN 301
                  WHEN doc_id % 11 = 3 THEN 404
                  ELSE 200 END AS status,
             repeat('body ' || doc_id || ' ', 1 + doc_id % 4)
               || chr(10) || 'Location: /fake-in-body' AS body
      FROM documents)
    SELECT doc_id AS archive_id,
           'https://site' || (doc_id % 20) || '.example/p/' || doc_id AS url,
           '1.1' AS version,
           CAST(status AS BIGINT) AS status,
           CASE status WHEN 301 THEN 'Moved Permanently'
                       WHEN 404 THEN 'Not Found'
                       ELSE 'OK' END AS reason,
           CASE WHEN doc_id % 2 = 0 THEN 'text/html'
                ELSE 'text/plain' END AS content_type,
           CASE WHEN doc_id % 2 = 0 THEN 'utf-8'
                ELSE 'windows-1252' END AS charset,
           CASE WHEN doc_id % 13 = 5 THEN NULL
                ELSE CAST(length(body) AS BIGINT) END AS content_length,
           CAST(length(body) AS BIGINT) AS n_body_bytes,
           (doc_id % 13 != 5) AS length_ok,
           CASE WHEN doc_id % 7 = 0
                THEN 'https://site' || (doc_id % 20) || '.example/moved/'
                     || doc_id END AS location,
           body AS body_text
    FROM r
    """,
    doc="HTTP response headers parsed relationally from WARC "
    "application/http records: byte-level header/body split in the "
    "Arrow pass, then status/Content-Type/charset/Content-Length/"
    "Location extracted in pure Catalyst; the oracle replays every "
    "field from the response formulas.",
)
def web_http_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The missing layer between WARC record bytes and the HTML chain,
    end to end and oracle-checked: every document becomes a one-record
    ``.warc.gz`` whose record is a FULL HTTP response
    (``application/http; msgtype=response`` — real Common Crawl
    framing), ``warc_http_responses`` splits the header block from the
    body BEFORE charset decoding (the HTTP-level Content-Type drives
    the sniff — from DATA, not a parameter), and every curation field —
    status code, reason, media type, declared charset, declared length,
    redirect target — extracts from the header-block STRING in pure
    Catalyst (``functions/http.py``), exactly like the robots parse.
    The synth responses exercise the contract edges: lowercase header
    names (RFC 9110 case-insensitivity), a nonconforming ``+N``
    Content-Length that must parse to NULL (never a silent int), a
    Location header only on 301s, and a header-shaped line INSIDE the
    body that must not match (block isolation). The DuckDB oracle
    replays every field and the decoded body from the formulas.

    At 100 TB: one Arrow pass where the archive bytes live, then the
    field extraction is whole-stage-codegen'd string work over a short
    header-block column; the typed output (status, media type, length
    agreement, redirect edges) is what a crawl curator filters and
    profiles on before any content look."""
    from ..functions.http import (
        http_charset,
        http_content_length,
        http_content_type,
        http_location,
        http_reason,
        http_status_code,
        http_version,
    )
    from ..operators.ingest import documents_as_warc_http, warc_http_responses

    docs = t_parallel(spark, sf_dir, "documents")
    recs = warc_http_responses(documents_as_warc_http(docs))
    h = F.col("http_headers")
    clen = http_content_length(h)
    return recs.select(
        "archive_id",
        "url",
        http_version(h).alias("version"),
        http_status_code(h).alias("status"),
        http_reason(h).alias("reason"),
        http_content_type(h).alias("content_type"),
        http_charset(h).alias("charset"),
        clen.alias("content_length"),
        "n_body_bytes",
        F.coalesce(clen == F.col("n_body_bytes"), F.lit(False)).alias(
            "length_ok"
        ),
        http_location(h).alias("location"),
        "body_text",
    )


@register(
    "web_pipeline_keep_list",
    oracle="""
    WITH domains AS (SELECT UNNEST(range(0, 20)) AS d),
    rules AS (
      SELECT d, '*' AS ua, FALSE AS allow, '/private' AS pfx FROM domains
      UNION ALL
      SELECT d, '*', TRUE, '/private/ok' FROM domains WHERE d % 2 = 0
      UNION ALL
      SELECT d, '*', FALSE, '/seg/seg' FROM domains WHERE d % 3 = 0
      UNION ALL
      SELECT d, 'trainbot', FALSE, '/' FROM domains
      WHERE d % 4 != 1 AND d % 5 = 0),
    urls AS (
      SELECT doc_id, doc_id % 20 AS d,
             CASE doc_id % 5
               WHEN 0 THEN '/private/ok/page'
               WHEN 1 THEN '/private/page'
               WHEN 2 THEN '/seg/seg'
               WHEN 3 THEN '/'
               ELSE '/public' END AS path,
             CASE WHEN doc_id % 20 % 4 != 1 THEN 'trainbot' ELSE '*' END
               AS agent_group
      FROM documents),
    hits AS (
      SELECT u.doc_id, r.allow,
             ROW_NUMBER() OVER (
               PARTITION BY u.doc_id
               ORDER BY length(r.pfx) DESC, r.allow DESC) AS rn
      FROM urls u
      JOIN rules r
        ON r.d = u.d AND r.ua = u.agent_group
       AND u.path LIKE r.pfx || '%'),
    quality AS (
      -- the WET body is 'doc N'\\n'doc N'\\n'A & B <ok>'\\n<text>:
      -- 8 header tokens + the text's space-split tokens; digits are the
      -- two doc ids plus any numbers in the text
      SELECT doc_id,
             CAST(8 + LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(2 + LEN(regexp_extract_all(text, '[0-9]+'))
               AS BIGINT) AS n_numbers
      FROM documents)
    SELECT q.doc_id,
           'site' || u.d || '.example' AS domain,
           q.n_tokens,
           q.n_numbers,
           COALESCE(h.allow, TRUE) AS allowed,
           (q.n_tokens BETWEEN 45 AND 10000) AS len_pass,
           (q.n_numbers * 10 <= q.n_tokens * 3) AS digit_pass,
           (COALESCE(h.allow, TRUE)
            AND q.n_tokens BETWEEN 45 AND 10000
            AND q.n_numbers * 10 <= q.n_tokens * 3) AS keep
    FROM quality q
    JOIN urls u USING (doc_id)
    LEFT JOIN (SELECT * FROM hits WHERE rn = 1) h USING (doc_id)
    """,
    doc="The composed Common Crawl pipeline: WARC -> Catalyst WET "
    "extraction -> robots decision -> quality gates -> keep list; the "
    "oracle replays every stage arithmetically.",
)
def web_pipeline_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END web curation pipeline in ONE plan — the composition
    a Common Crawl user actually runs: real ``.warc.gz`` archives parse
    in an Arrow pass, the WET extraction runs in pure Catalyst
    (``html_to_text``), the robots decision joins the broadcast rules
    dim (longest-match winner), and Gopher-style quality gates
    (token-count bounds, digit-density cap — both integer-exact) produce
    the final keep bit with every intermediate signal visible. The
    DuckDB oracle replays ALL stages arithmetically from the documents
    table, so a regression anywhere in the chain — archive framing, tag
    stripping, rule grouping, tie-breaks, token math — flips keep bits
    and breaks the hash match.

    At 100 TB: the stages FUSE — one Arrow parse pass, then everything
    is codegen'd string/join/window work with only the tiny robots dim
    broadcast and no fact-table shuffle before the final projection; the
    keep list streams out partition-local."""
    from ..functions.html import html_to_text
    from ..operators.ingest import documents_as_warc_html, warc_to_documents

    docs = t(spark, sf_dir, "documents")
    recs = warc_to_documents(documents_as_warc_html(docs)).select(
        F.col("archive_id").alias("doc_id"),
        html_to_text(F.col("text")).alias("body"),
    )
    toks = F.size(F.split("body", r"\s+")).cast("bigint")
    nums = F.size(F.expr("regexp_extract_all(body, '[0-9]+', 0)")).cast(
        "bigint"
    )
    quality = recs.select(
        "doc_id",
        toks.alias("n_tokens"),
        nums.alias("n_numbers"),
    )
    robots = _synth_robots(spark)
    decided = robots_allowed(
        _synth_urls(docs.select("doc_id")),
        parse_robots_rules(robots),
        parse_robots_groups(robots),
        "trainbot",
    ).select("doc_id", "domain", "allowed")
    len_pass = F.col("n_tokens").between(45, 10000)
    digit_pass = F.col("n_numbers") * 10 <= F.col("n_tokens") * 3
    return quality.join(decided, "doc_id").select(
        "doc_id",
        "domain",
        "n_tokens",
        "n_numbers",
        "allowed",
        len_pass.alias("len_pass"),
        digit_pass.alias("digit_pass"),
        (F.col("allowed") & len_pass & digit_pass).alias("keep"),
    )


def resolve_redirects(
    resp: DataFrame,
    max_hops: int = 5,
    response_index: DataFrame | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Follow HTTP redirect chains relationally: ``resp`` is one row per
    fetched URL — (url, status, location) straight out of
    ``web_http_headers``'s field extraction — and every row's chain is
    followed through Location edges until a non-3xx terminal, a DANGLING
    edge (a Location whose target was never fetched), or the ``max_hops``
    bound. Output per starting URL: (url, final_url, n_hops,
    terminal_status, resolved) — ``final_url`` is the terminal page for
    resolved chains and the unfetched target for dangling ones
    (``terminal_status`` NULL there); a chain still redirecting at the
    bound (a cycle, or a longer-than-bound chain) also reports
    ``resolved = false`` with its last Location. n_hops counts edges
    followed, including the edge into the void for dangling chains.

    ``response_index`` (optional) is a SEPARATE response snapshot the
    Location hops look up in — the streaming shape: newly fetched rows
    arrive as ``resp`` and resolve against the static index of pages
    already fetched (the ``resolve_revisits(response_index=...)``
    pattern; stream-static left joins are append-mode legal). Default
    ``None`` keeps the batch semantics where ``resp`` is its own index.

    The implementation is a BOUNDED driver loop of equi-joins — one join
    per hop, each shrinking to the still-redirecting survivors; real
    redirect chains are short (browsers cap near 20), so ``max_hops``
    joins is the whole cost and there is no unbounded iteration. At
    100 TB each hop is a standard shuffle join on url; survivors after
    hop 1 are typically a tiny fraction of the corpus, so later hops are
    near-free. No window, no explode, no Python.

    ``materialize`` (round 16, measured): the loop's output is a union
    of ``2*max_hops + 2`` branches, and each branch embeds the whole
    upstream ``resp`` tower plus the hop-join chain — O(hops^2) joins in
    one plan, with the input re-executed per branch (12 extra towers at
    ``max_hops=5``; web_robots_availability read 222 KB of plan and
    ~150 Exchanges from exactly this). With ``materialize=True`` the
    narrow (url, status, location) projection is localCheckpoint'd
    LAZILY once and each hop's join output likewise — every hop executes
    once, branches read cached RDDs, and the plan is linear in
    ``max_hops``; only 3-column redirect metadata materializes, never
    page payloads. It is OPT-IN because the checkpoint also blocks
    whole-stage codegen across the cut and constant folding of synthetic
    literal inputs: back-to-back min-of-3 A/B at sf0.1 read
    web_robots_availability 4.52 s -> 2.99 s (expensive scan+distinct
    tower, big win) but web_redirect_chains 2.08 s -> 2.08 s (cheap
    input, neutral) and web_robots_refetch 1.29 s -> 1.54 s (literal dim
    whose branches previously constant-folded away, a loss). Callers
    whose ``resp`` tower is expensive to recompute opt in; streaming
    inputs must not (checkpoint unsupported there)."""
    if materialize:
        resp = resp.select("url", "status", "location").localCheckpoint(
            eager=False
        )
    nxt = (response_index if response_index is not None else resp).select(
        F.col("url").alias("__nu"),
        F.col("status").alias("__ns"),
        F.col("location").alias("__nl"),
    )
    is_redirect = F.col("status").between(300, 399) & F.col(
        "location"
    ).isNotNull()
    cur = resp.select(
        F.col("url").alias("start"),
        F.col("url").alias("cur_url"),
        "status",
        "location",
        F.lit(0).cast("bigint").alias("hops"),
    )
    terminal_cols = [
        F.col("start").alias("url"),
        F.col("cur_url").alias("final_url"),
        F.col("hops").alias("n_hops"),
        F.col("status").cast("bigint").alias("terminal_status"),
        F.lit(True).alias("resolved"),
    ]
    pieces = []
    for _ in range(max_hops):
        pieces.append(cur.filter(~is_redirect).select(*terminal_cols))
        stepped = cur.filter(is_redirect).join(
            nxt, F.col("location") == F.col("__nu"), "left"
        )
        if materialize:
            # one cached hop: consumed by the dangling branch AND the
            # next hop's survivors — without this each consumer re-runs
            # the join chain back to the input
            stepped = stepped.localCheckpoint(eager=False)
        # dangling: the Location target was never fetched — the chain
        # ends one hop later at an unknown page, surfaced not guessed
        pieces.append(
            stepped.filter(F.col("__nu").isNull()).select(
                F.col("start").alias("url"),
                F.col("location").alias("final_url"),
                (F.col("hops") + 1).alias("n_hops"),
                F.lit(None).cast("bigint").alias("terminal_status"),
                F.lit(False).alias("resolved"),
            )
        )
        cur = stepped.filter(F.col("__nu").isNotNull()).select(
            "start",
            F.col("__nu").alias("cur_url"),
            F.col("__ns").alias("status"),
            F.col("__nl").alias("location"),
            (F.col("hops") + 1).alias("hops"),
        )
    # the hop bound: terminals that arrived exactly at max_hops resolve
    # normally; chains STILL redirecting are cycles or over-bound chains —
    # they report the Location edge they were ABOUT to follow, so n_hops
    # counts that edge exactly as the dangling branch does (and as the
    # web_redirect_chains oracle's recursive-CTE mirror computes)
    pieces.append(cur.filter(~is_redirect).select(*terminal_cols))
    pieces.append(
        cur.filter(is_redirect).select(
            F.col("start").alias("url"),
            F.col("location").alias("final_url"),
            (F.col("hops") + 1).alias("n_hops"),
            F.lit(None).cast("bigint").alias("terminal_status"),
            F.lit(False).alias("resolved"),
        )
    )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


@register(
    "web_robots_sitemap_roots",
    oracle="""
    WITH d AS (SELECT DISTINCT doc_id % 20 AS d FROM documents),
    sm AS (
      SELECT d, u.j FROM d, LATERAL (SELECT UNNEST(range(0, 1 + d % 2)) AS j) u)
    SELECT 'site' || d || '.example' AS domain,
           CAST(j AS BIGINT) AS sitemap_idx,
           'https://site' || d || '.example/sitemaps/root' || j || '.xml'
             AS sitemap_url
    FROM sm
    """,
    doc="Sitemap: directives extracted from robots.txt (global, never "
    "group-scoped) — the discovery roots robots files advertise; the "
    "oracle replays every URL from the file formulas.",
)
def web_robots_sitemap_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where politeness meets discovery: the 20 synthetic robots.txt
    files gain ``1 + d % 2`` global ``Sitemap:`` directives (mixed-case
    directive names, comments and rule groups interleaved — Sitemap
    lines are NOT group-scoped per the sitemaps.org robots extension,
    and the parse must surface them regardless of surrounding groups),
    and ``parse_robots_sitemaps`` extracts them in pure Catalyst, in
    file order. These URLs are exactly the ``roots`` input to
    ``sitemap_frontier`` — the full chain a crawler runs: robots ->
    sitemap roots -> recursive frontier -> politeness-filtered fetch.

    The documents table only sets the scale knob (how many domains
    exist at this sf); each file's content is a pure function of its
    domain index, which the DuckDB oracle replays."""
    d = F.col("d")
    extra = F.concat(
        F.lit("# discovery\nSitemap: https://site"),
        d.cast("string"),
        F.lit(".example/sitemaps/root0.xml\n"),
        F.when(
            d % 2 == 1,
            F.concat(
                F.lit("siteMAP:   https://site"),
                d.cast("string"),
                F.lit(".example/sitemaps/root1.xml  \n"),
            ),
        ).otherwise(F.lit("")),
    )
    dims = spark.range(20).select(
        F.concat(F.lit("site"), F.col("id").cast("string"), F.lit(".example"))
        .alias("domain"),
        F.col("id").alias("d"),
    )
    present = (
        t(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 20).alias("d"))
        .distinct()
    )
    robots = (
        _synth_robots(spark)
        .join(dims, "domain")
        .join(present, "d", "left_semi")
        .select("domain", F.concat("text", extra).alias("text"))
    )
    return parse_robots_sitemaps(robots)


@register(
    "web_redirect_chains",
    oracle="""
    WITH resp AS (
      SELECT 'https://r.example/u' || doc_id AS url,
             CASE WHEN doc_id % 4 = 0 THEN 200 ELSE 301 END AS status,
             CASE WHEN doc_id % 4 = 0 THEN NULL
                  WHEN doc_id % 7 = 0
                    THEN 'https://missing.example/' || doc_id
                  ELSE 'https://r.example/u' || (doc_id - 1) END AS location
      FROM documents),
    chain AS (
      WITH RECURSIVE r AS (
        SELECT url AS start, url AS cur, status, location,
               CAST(0 AS BIGINT) AS hops
        FROM resp
        UNION ALL
        SELECT r.start, n.url, n.status, n.location, r.hops + 1
        FROM r JOIN resp n ON n.url = r.location
        WHERE r.status BETWEEN 300 AND 399 AND r.location IS NOT NULL
          AND r.hops < 5)
      SELECT * FROM r),
    last AS (
      SELECT start, MAX(hops) AS hops FROM chain GROUP BY start)
    SELECT c.start AS url,
           CASE WHEN c.status BETWEEN 300 AND 399 THEN c.location
                ELSE c.cur END AS final_url,
           CASE WHEN c.status BETWEEN 300 AND 399 THEN c.hops + 1
                ELSE c.hops END AS n_hops,
           CASE WHEN c.status BETWEEN 300 AND 399
                THEN CAST(NULL AS BIGINT)
                ELSE CAST(c.status AS BIGINT) END AS terminal_status,
           NOT (c.status BETWEEN 300 AND 399) AS resolved
    FROM chain c JOIN last l ON c.start = l.start AND c.hops = l.hops
    """,
    doc="HTTP redirect chains resolved by bounded relational hops "
    "(one equi-join per hop, survivors shrink); the oracle replays the "
    "traversal with a recursive CTE.",
)
def web_redirect_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-frontier edge resolver, end to end and oracle-checked:
    every document becomes a fetched-URL row — terminal 200 when
    ``doc_id % 4 == 0``, else a 301 whose Location points at the
    previous document's URL (chains of length 1-3) or, when
    ``doc_id % 7 == 0``, at a never-fetched target (the dangling case).
    ``resolve_redirects`` follows the chains with max_hops bounded
    equi-joins; the DuckDB oracle replays the same traversal with a
    recursive CTE — hop counts, terminal statuses, dangling finals, and
    the resolved bit all hash-checked. Chains crossing a dangling
    intermediate stop where the data stops; nothing is guessed.

    At 100 TB: hop 1 joins the full response table against itself on
    url; every later hop joins only the still-redirecting survivors
    (a shrinking fraction), so the bounded loop costs ~one fact join
    plus change — the shape a frontier dedup actually needs before
    re-crawling final URLs."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    resp = docs.select(
        F.concat(F.lit("https://r.example/u"), F.col("doc_id").cast("string")).alias(
            "url"
        ),
        F.when(F.col("doc_id") % 4 == 0, F.lit(200))
        .otherwise(F.lit(301))
        .alias("status"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(None).cast("string"))
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("https://missing.example/"), F.col("doc_id").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("https://r.example/u"),
                (F.col("doc_id") - 1).cast("string"),
            )
        )
        .alias("location"),
    )
    return resolve_redirects(resp, max_hops=5)


@register(
    "web_crawl_budget",
    oracle="""
    WITH pages AS (
      SELECT doc_id % 20 AS d, COUNT(*) AS n FROM documents GROUP BY 1),
    delay AS (
      SELECT d,
             CASE WHEN d % 4 != 1
                  THEN (CASE WHEN d % 3 = 0 THEN 2.5 END)
                  ELSE (CASE WHEN d % 2 = 0
                             THEN CAST(1 + d % 3 AS DOUBLE) END) END AS delay
      FROM pages)
    SELECT 'site' || d || '.example' AS domain,
           delay,
           CAST(n AS BIGINT) AS n_pages,
           delay * n AS est_seconds
    FROM delay JOIN pages USING (d)
    """,
    doc="Crawl-delay honored per domain: group-scoped delays parsed "
    "without breaking RFC 9309 groups, specific group shadows '*', "
    "last delay wins; budget = pages x delay; the oracle replays the "
    "whole politeness schedule.",
)
def web_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness scheduling, end to end and oracle-checked: 20
    synthetic robots.txt files carry ``Crawl-delay`` lines on formulaic
    schedules — the ``*`` group's delay on even domains, a trainbot
    group (3/4 of domains) whose delay exists only on ``d % 3 == 0`` —
    and the parse honors the directive's real-world semantics:
    Crawl-delay is OUTSIDE RFC 9309, so it must scope to the User-agent
    group ABOVE it without splitting UA runs (RFC tolerance rule), the
    last delay in a group wins, a specific group SHADOWS ``*`` even
    when it carries no delay (those domains surface delay=NULL — the
    caller's politeness default applies, never a silently inherited
    ``*`` value), and non-numeric values drop. The per-domain budget is
    one hash aggregate (pages) joined to the tiny delay dim:
    ``est_seconds = n_pages x delay`` is the serial fetch-time floor a
    crawl scheduler partitions work by. The DuckDB oracle replays
    delays, shadowing, and budgets from the formulas.

    At 100 TB: robots files parse once into tiny per-domain dims; the
    only fact-scale work is the page count — map-side-combined into a
    20-key space here, domain-key space in a real crawl."""
    d = F.col("d")
    dims = spark.range(20).select(
        F.concat(F.lit("site"), F.col("id").cast("string"), F.lit(".example"))
        .alias("domain"),
        F.col("id").alias("d"),
    )
    text = F.concat(
        F.lit("# politeness\nUser-agent: *\nDisallow: /private\n"),
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit("Crawl-delay: "),
                (d % 3 + 1).cast("string"),
                F.lit("\n"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 4 != 1, F.lit("\nUser-agent: trainbot\nDisallow: /tb\n")
        ).otherwise(F.lit("")),
        F.when(
            (d % 4 != 1) & (d % 3 == 0), F.lit("Crawl-delay: 2.5\n")
        ).otherwise(F.lit("")),
    )
    robots = dims.select("domain", "d", text.alias("text"))
    delays = effective_crawl_delay(
        parse_robots_delays(robots.select("domain", "text")),
        parse_robots_groups(robots.select("domain", "text")),
        "trainbot",
    )
    pages = (
        t(spark, sf_dir, "documents")
        .groupBy((F.col("doc_id") % 20).alias("d"))
        .agg(F.count("*").cast("bigint").alias("n_pages"))
    )
    return (
        robots.select("domain", "d")
        .join(pages, "d")
        .join(delays, "domain", "left")
        .select(
            "domain",
            "delay",
            "n_pages",
            (F.col("delay") * F.col("n_pages")).alias("est_seconds"),
        )
    )


@register(
    "web_fetch_schedule",
    oracle="""
    WITH urls AS (
      SELECT doc_id, doc_id % 20 AS d,
             CASE doc_id % 5
               WHEN 0 THEN '/private/ok/page'
               WHEN 1 THEN '/private/page'
               WHEN 2 THEN '/seg/seg'
               WHEN 3 THEN '/'
               ELSE '/public' END AS path
      FROM documents),
    delay AS (
      SELECT DISTINCT doc_id % 20 AS d,
             CASE WHEN (doc_id % 20) % 4 != 1
                  THEN (CASE WHEN (doc_id % 20) % 3 = 0 THEN 2.5 END)
                  ELSE (CASE WHEN (doc_id % 20) % 2 = 0
                             THEN CAST(1 + (doc_id % 20) % 3 AS DOUBLE) END)
             END AS delay
      FROM documents)
    SELECT u.doc_id,
           'site' || u.d || '.example' AS domain,
           u.path,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY u.d ORDER BY u.doc_id) AS BIGINT) AS fetch_rank,
           (ROW_NUMBER() OVER (PARTITION BY u.d ORDER BY u.doc_id) - 1)
             * COALESCE(dl.delay, 1.0) AS offset_seconds
    FROM urls u JOIN delay dl USING (d)
    """,
    doc="Politeness fetch schedule: per-domain row_number x effective "
    "Crawl-delay (default 1s) = each URL's fetch offset; the oracle "
    "replays ranks and offsets.",
)
def web_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From budget to SCHEDULE, end to end and oracle-checked: every
    URL gets a per-domain fetch rank (deterministic doc_id order) and a
    start offset ``(rank - 1) x effective_delay`` with a 1-second
    politeness default where robots advertises no applicable delay —
    the exact assignment a distributed fetcher partitions by domain and
    replays. Delays come from the same synthetic robots schedule as
    ``web_crawl_budget`` (specific-shadows-'*' and all), so the two
    rows cross-check each other: a budget is the schedule's last
    offset plus one delay.

    At 100 TB: the window is partitioned BY DOMAIN — the politeness
    constraint itself is per-domain, so the shuffle key is forced and
    correct, and no domain's queue ever funnels through another's
    partition. The delay dim broadcasts."""
    d = F.col("d")
    dims = spark.range(20).select(
        F.concat(F.lit("site"), F.col("id").cast("string"), F.lit(".example"))
        .alias("domain"),
        F.col("id").alias("d"),
    )
    text = F.concat(
        F.lit("# politeness\nUser-agent: *\nDisallow: /private\n"),
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit("Crawl-delay: "), (d % 3 + 1).cast("string"), F.lit("\n")
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 4 != 1, F.lit("\nUser-agent: trainbot\nDisallow: /tb\n")
        ).otherwise(F.lit("")),
        F.when(
            (d % 4 != 1) & (d % 3 == 0), F.lit("Crawl-delay: 2.5\n")
        ).otherwise(F.lit("")),
    )
    robots = dims.select("domain", text.alias("text"))
    delays = effective_crawl_delay(
        parse_robots_delays(robots),
        parse_robots_groups(robots),
        "trainbot",
    )
    docs = t(spark, sf_dir, "documents").select("doc_id")
    urls = _synth_urls(docs).select("doc_id", "domain", "path")
    w = Window.partitionBy("domain").orderBy("doc_id")
    rank = F.row_number().over(w).cast("bigint")
    return (
        urls.join(broadcast(delays), "domain", "left")
        .select(
            "doc_id",
            "domain",
            "path",
            rank.alias("fetch_rank"),
            ((rank - 1) * F.coalesce(F.col("delay"), F.lit(1.0))).alias(
                "offset_seconds"
            ),
        )
    )


# The boilerplate classification contract (jusText-style, made integer-
# exact so a SQL oracle can replay every decision): a block is CONTENT
# iff it has >= 5 words, its anchor-text chars are under 40% of its
# chars (10*link < 4*chars), and its function-word density reaches 20%
# (5*stop_hits >= n_words) OR it is long (>= 30 words). The stopword
# set is a deliberately tiny function-word list — density of closed-
# class words separates prose from nav/footer fragments; the list is
# part of the contract, not a tuning knob.
BOILERPLATE_STOPWORDS = [
    "the", "a", "an", "of", "to", "in", "and", "is", "on", "for",
    "with", "that", "it", "as", "was", "at", "by", "be",
]


def html_content_blocks(df: DataFrame, html_col: str, keys: list[str]) -> DataFrame:
    """Paragraph-level boilerplate removal, entirely in Catalyst: split
    the page into block segments (``html_blocks`` — script/style/
    comments already gone), extract each segment's visible text AND its
    anchor text (from the raw markup, before inline stripping), compute
    integer-exact metrics (word count, char count, anchor chars,
    stopword hits), and classify per the module contract above. Returns
    one row per NON-EMPTY block: (*keys, block_idx, text, n_words,
    n_chars, link_chars, stop_hits, keep). ``block_idx`` is the
    segment's position in the raw split (empty segments between
    adjacent tags keep their slots), so indices are deterministic.

    At 100 TB this is the WET extraction's shape with one explode: a
    stateless per-page string transform fused into the scan, small
    typed rows out, no shuffle — and the keep bit is what separates
    prose from the nav/footer/link-farm mass that dominates raw crawl
    bytes."""
    from ..functions.html import html_anchor_text, html_blocks, html_inline_text

    segs = df.select(
        *keys,
        F.posexplode(html_blocks(html_col)).alias("block_idx", "raw"),
    )
    # STAGE the two extraction chains as real columns before the metric
    # projection (round 16): n_chars / n_words / stop_hits each
    # referenced the text expression, and every reference re-ran the
    # whole inline-strip + entity-decode tower (the numeric-reference
    # lambda chain is interpreted, no subexpression elimination) — the
    # before-plan carried ~4 copies of it per row. As multiply-
    # referenced non-cheap aliases, CollapseProject keeps the boundary
    # and each chain runs once per block — the same staging lesson as
    # web_outlink_frontier's resolve/canonicalize split.
    staged = segs.select(
        *keys,
        F.col("block_idx").cast("bigint").alias("block_idx"),
        html_inline_text(F.col("raw")).alias("text"),
        html_anchor_text(F.col("raw")).alias("__link"),
    )
    text = F.col("text")
    m = staged.select(
        *keys,
        "block_idx",
        "text",
        F.length(text).cast("bigint").alias("n_chars"),
        F.when(text == "", F.lit(0))
        .otherwise(F.size(F.split(text, r"\s+")))
        .cast("bigint")
        .alias("n_words"),
        F.length(F.col("__link")).cast("bigint").alias("link_chars"),
        F.size(
            F.filter(
                F.split(F.lower(text), r"\s+"),
                lambda w: F.array_contains(
                    F.array(*[F.lit(s) for s in BOILERPLATE_STOPWORDS]), w
                ),
            )
        )
        .cast("bigint")
        .alias("stop_hits"),
    ).filter(F.col("text") != "")
    keep = (
        (F.col("n_words") >= 5)
        & (F.col("link_chars") * 10 < F.col("n_chars") * 4)
        & (
            (F.col("stop_hits") * 5 >= F.col("n_words"))
            | (F.col("n_words") >= 30)
        )
    )
    return m.withColumn("keep", keep)


@register(
    "web_boilerplate_filter",
    oracle=r"""
    WITH content AS (
      SELECT doc_id,
             'the quick & brown fox is on the hill and it was at rest '
               || trim(regexp_replace(text, '\s+', ' ', 'g')) AS body
      FROM documents),
    blocks AS (
      SELECT doc_id, 1 AS block_idx, 'Home About us' AS t,
             CAST(13 AS BIGINT) AS link_chars FROM documents
      UNION ALL
      SELECT doc_id, 3,
             chr(169) || ' 2026 site' || (doc_id % 20), 0 FROM documents
      UNION ALL
      SELECT doc_id, 5, body, 0 FROM content
      UNION ALL
      SELECT doc_id, 7,
             'the fox and the dog was at rest more here now',
             CAST(31 AS BIGINT) FROM documents),
    m AS (
      SELECT doc_id, CAST(block_idx AS BIGINT) AS block_idx, t AS text,
             CAST(length(t) AS BIGINT) AS n_chars,
             CAST(len(string_split(t, ' ')) AS BIGINT) AS n_words,
             link_chars,
             CAST(len(list_filter(string_split(lower(t), ' '),
                    w -> list_contains(['the','a','an','of','to','in',
                      'and','is','on','for','with','that','it','as',
                      'was','at','by','be'], w)))
               AS BIGINT) AS stop_hits
      FROM blocks)
    SELECT doc_id, block_idx, text, n_chars, n_words, link_chars,
           stop_hits,
           (n_words >= 5 AND link_chars * 10 < n_chars * 4
            AND (stop_hits * 5 >= n_words OR n_words >= 30)) AS keep
    FROM m
    """,
    doc="jusText-style boilerplate removal: block split + link-density "
    "+ stopword-density classification, pure Catalyst; the oracle "
    "replays every metric and keep bit per block.",
)
def web_boilerplate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The missing middle of the WET chain, end to end and oracle-
    checked: every document becomes an HTML page of four block-tagged
    segments — a pure-link nav bar (dropped: 3 words, 100% link
    density), a short copyright footer (dropped: 3 words), the CONTENT
    paragraph carrying a function-word-rich prefix plus the document's
    HTML-escaped text with an ``&amp;`` decode case (kept), and a
    link-heavy paragraph whose words and stopwords PASS but whose
    anchor chars exceed the 40% density cap (dropped — link density is
    the deciding signal, pinned). ``html_content_blocks`` computes every
    metric in pure Catalyst over the raw split segments; the DuckDB
    oracle rebuilds the same four blocks per document with string
    arithmetic and replays words, chars, anchor chars, stopword hits,
    and the keep bit. Block indices are raw-split positions (1,3,5,7 —
    the even slots are the empty between-tag segments), so a split
    regression shifts indices and breaks the hash.

    At 100 TB: one stateless explode fused into the WET scan; the keep
    bit typically drops the majority of raw crawl blocks before dedup
    and quality ever see them."""
    docs = t_parallel(spark, sf_dir, "documents").select("doc_id", "text")
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    page = F.concat(
        F.lit('<div><a href="/">Home</a> <a href="/a">About us</a></div>'),
        F.lit("<p>© 2026 site"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit("</p><p>the quick &amp; brown fox is on the hill and it "
              "was at rest "),
        esc,
        F.lit("</p><p><a>the fox and the dog was at rest</a> more here "
              "now</p>"),
    )
    pages = docs.select("doc_id", page.alias("html"))
    return html_content_blocks(pages, "html", ["doc_id"])


def frontier_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """Incremental crawl maintenance: diff two sitemap-URL frontiers
    keyed by (domain, loc) into ADDED / REMOVED / LASTMOD_CHANGED rows —
    exactly the set a recrawler fetches (added + changed) and retires
    (removed) without touching the unchanged mass. Anti-joins for
    membership, an inner join with a NULL-SAFE lastmod comparison for
    changes (a lastmod appearing or disappearing IS a change). Both
    sides carry (domain, loc, lastmod).

    At 100 TB: two anti-joins and one inner join, all on the same
    (domain, loc) key — one shuffle partitioning serves all three, and
    the output is proportional to the CHURN, not the frontier."""
    o = old.select(
        "domain", "loc", F.col("lastmod").alias("old_lastmod")
    )
    n = new.select(
        "domain", "loc", F.col("lastmod").alias("new_lastmod")
    )
    key = ["domain", "loc"]
    added = n.join(o, key, "left_anti").select(
        "domain",
        "loc",
        F.lit("added").alias("change"),
        F.lit(None).cast("string").alias("old_lastmod"),
        "new_lastmod",
    )
    removed = o.join(n, key, "left_anti").select(
        "domain",
        "loc",
        F.lit("removed").alias("change"),
        "old_lastmod",
        F.lit(None).cast("string").alias("new_lastmod"),
    )
    changed = (
        o.join(n, key)
        .filter(~F.col("old_lastmod").eqNullSafe(F.col("new_lastmod")))
        .select(
            "domain",
            "loc",
            F.lit("lastmod_changed").alias("change"),
            "old_lastmod",
            "new_lastmod",
        )
    )
    return added.unionByName(removed).unionByName(changed)


@register(
    "web_frontier_delta",
    oracle="""
    WITH sm AS (
      SELECT doc_id, doc_id % 20 AS d, u.j,
             'https://site' || (doc_id % 20) || '.example/page/' || doc_id
               || '/' || u.j AS loc
      FROM documents,
           LATERAL (SELECT UNNEST(range(0, 1 + doc_id % 3)) AS j) u),
    old AS (
      SELECT *, CASE WHEN doc_id % 2 = 0
                     THEN '2026-0' || (1 + doc_id % 9) || '-01' END AS lm
      FROM sm WHERE doc_id % 10 != 7),
    new AS (
      SELECT *, CASE WHEN doc_id % 2 = 0 THEN
               CASE WHEN doc_id % 6 = 2
                    THEN '2026-0' || (1 + doc_id % 9) || '-15'
                    ELSE '2026-0' || (1 + doc_id % 9) || '-01' END END AS lm
      FROM sm WHERE doc_id % 10 != 3)
    SELECT 'site' || d || '.example' AS domain, loc,
           'added' AS change, CAST(NULL AS VARCHAR) AS old_lastmod,
           lm AS new_lastmod
    FROM new WHERE doc_id % 10 = 7
    UNION ALL
    SELECT 'site' || d || '.example', loc, 'removed', lm, NULL
    FROM old WHERE doc_id % 10 = 3
    UNION ALL
    SELECT 'site' || d || '.example', loc, 'lastmod_changed',
           '2026-0' || (1 + doc_id % 9) || '-01',
           '2026-0' || (1 + doc_id % 9) || '-15'
    FROM new WHERE doc_id % 6 = 2 AND doc_id % 10 NOT IN (3, 7)
    """,
    doc="Crawl frontier diff: added/removed/lastmod-changed URLs via two "
    "anti-joins and one null-safe inner join on (domain, loc); the "
    "oracle replays the churn set from the schedule formulas.",
)
def web_frontier_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recrawl planner, end to end and oracle-checked: yesterday's
    frontier (docs except ``% 10 == 7``) against today's (docs except
    ``% 10 == 3``), with today's lastmod bumped on ``% 6 == 2`` docs —
    so the delta is exactly: every URL of the ``% 10 == 7`` docs ADDED,
    every URL of the ``% 10 == 3`` docs REMOVED, and the even-doc
    lastmod bumps CHANGED (null-safe: odd docs carry no lastmod on
    either side and must NOT report). Both frontiers synthesize in pure
    Catalyst from the documents table; ``frontier_delta`` diffs them
    with two anti-joins plus one null-safe inner join on the shared
    (domain, loc) key; the DuckDB oracle replays the full churn set.

    At 100 TB the output is churn-sized, not frontier-sized — the whole
    point of incremental recrawl planning."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    d = (F.col("doc_id") % 20).cast("string")
    base = docs.select(
        "doc_id",
        F.concat(F.lit("site"), d, F.lit(".example")).alias("domain"),
        F.explode(
            F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))
        ).alias("j"),
    ).select(
        "doc_id",
        "domain",
        F.concat(
            F.lit("https://site"), d, F.lit(".example/page/"),
            F.col("doc_id").cast("string"), F.lit("/"),
            F.col("j").cast("string"),
        ).alias("loc"),
    )
    lm_old = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit("2026-0"), (F.col("doc_id") % 9 + 1).cast("string"),
            F.lit("-01"),
        ),
    )
    lm_new = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit("2026-0"),
            (F.col("doc_id") % 9 + 1).cast("string"),
            F.when(F.col("doc_id") % 6 == 2, F.lit("-15")).otherwise(
                F.lit("-01")
            ),
        ),
    )
    old = base.filter(F.col("doc_id") % 10 != 7).select(
        "domain", "loc", lm_old.alias("lastmod")
    )
    new = base.filter(F.col("doc_id") % 10 != 3).select(
        "domain", "loc", lm_new.alias("lastmod")
    )
    return frontier_delta(old, new)


@register(
    "web_content_extraction",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS t
      FROM documents),
    blocks AS (
      SELECT doc_id, 1 AS block_idx, 'doc ' || doc_id AS t FROM documents
      UNION ALL
      SELECT doc_id, 3, 'doc ' || doc_id FROM documents
      UNION ALL
      SELECT doc_id, 5, 'A & B <ok>' FROM documents
      UNION ALL
      SELECT doc_id, 7, t FROM norm),
    m AS (
      SELECT doc_id, CAST(block_idx AS BIGINT) AS block_idx, t AS text,
             CAST(length(t) AS BIGINT) AS n_chars,
             CAST(len(string_split(t, ' ')) AS BIGINT) AS n_words,
             CAST(0 AS BIGINT) AS link_chars,
             CAST(len(list_filter(string_split(lower(t), ' '),
                    w -> list_contains(['the','a','an','of','to','in',
                      'and','is','on','for','with','that','it','as',
                      'was','at','by','be'], w)))
               AS BIGINT) AS stop_hits
      FROM blocks)
    SELECT doc_id AS archive_id, block_idx, text, n_chars, n_words,
           link_chars, stop_hits,
           (n_words >= 5 AND link_chars * 10 < n_chars * 4
            AND (stop_hits * 5 >= n_words OR n_words >= 30)) AS keep
    FROM m
    """,
    doc="The full content-extraction chain over real archive bytes: "
    ".warc.gz -> HTTP header/body split -> block split -> boilerplate "
    "classification; the oracle replays every block's metrics and keep "
    "bit from the page structure.",
)
def web_content_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed extraction a Common Crawl curator actually runs,
    end to end from BYTES: real one-record ``.warc.gz`` archives (HTTP-
    wrapped HTML pages) parse in one Arrow pass, the HTTP header block
    splits off before charset decode, and ``html_content_blocks``
    classifies each block of the RECOVERED page in pure Catalyst. The
    synth page's structure is fixed (title block, h1, a short entity
    paragraph, the document's escaped text), so the DuckDB oracle
    replays every block index (1,3,5,7 — raw-split slots), the decoded
    entity text (``A & B <ok>``), the whitespace-normalized document
    text, and all four keep decisions: title/h1/entity blocks drop on
    word count, the content block decides by the real stopword-density
    contract on the document's own words.

    At 100 TB: one Arrow parse where the bytes live, then a stateless
    codegen explode — the boilerplate keep bit lands BEFORE dedup and
    quality, which is where it belongs (most raw crawl blocks die
    here)."""
    from ..operators.ingest import documents_as_warc_html, warc_to_documents

    docs = t_parallel(spark, sf_dir, "documents")
    recs = warc_to_documents(documents_as_warc_html(docs)).select(
        F.col("archive_id"), F.col("text").alias("html")
    )
    return html_content_blocks(recs, "html", ["archive_id"])


def revalidation_plan(urls: DataFrame, stored: DataFrame, frontier: DataFrame) -> DataFrame:
    """HTTP-caching-aware recrawl planning: for every URL decide the
    CHEAPEST correct fetch using what the last crawl stored (ETag /
    Last-Modified validators, RFC 9110 conditional requests) and what
    discovery advertises (the sitemap ``lastmod``). Decision order, per
    URL: never fetched -> ``full``; sitemap lastmod present and not
    newer than the stored Last-Modified -> ``skip`` (discovery says
    unchanged); a stored ETag -> ``conditional_etag`` (If-None-Match —
    RFC 9110 prefers entity validators); a stored Last-Modified ->
    ``conditional_modified`` (If-Modified-Since); else ``full``. The
    conditional header VALUES ride along so a fetcher can execute the
    plan directly. Inputs: ``urls (url)``, ``stored (url, stored_etag,
    stored_lastmod)``, ``frontier (url, frontier_lastmod)``; lastmods
    compare as ISO-8601 strings (lexicographic == chronological).

    At 100 TB: two left joins on url — one shuffle partitioning serves
    both — and the output splits a recrawl into the skip mass (free),
    the conditional mass (header-only 304s), and the full fetches."""
    j = (
        urls.join(stored, "url", "left")
        .join(frontier, "url", "left")
    )
    never = F.col("stored_etag").isNull() & F.col("stored_lastmod").isNull()
    sitemap_stale = (
        F.col("frontier_lastmod").isNotNull()
        & F.col("stored_lastmod").isNotNull()
        & (F.col("frontier_lastmod") <= F.col("stored_lastmod"))
    )
    action = (
        F.when(never, F.lit("full"))
        .when(sitemap_stale, F.lit("skip"))
        .when(F.col("stored_etag").isNotNull(), F.lit("conditional_etag"))
        .when(
            F.col("stored_lastmod").isNotNull(),
            F.lit("conditional_modified"),
        )
        .otherwise(F.lit("full"))
    )
    return j.select(
        "url",
        action.alias("action"),
        F.when(
            action == "conditional_etag", F.col("stored_etag")
        ).alias("if_none_match"),
        F.when(
            action == "conditional_modified", F.col("stored_lastmod")
        ).alias("if_modified_since"),
    )


@register(
    "web_revalidation_plan",
    oracle="""
    WITH base AS (
      SELECT doc_id, 'https://r.example/u' || doc_id AS url FROM documents),
    stored AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN '"e' || doc_id || '"' END AS et,
             CASE WHEN doc_id % 2 = 0
                  THEN '2026-0' || (1 + doc_id % 9) || '-01' END AS lm
      FROM base WHERE doc_id % 5 != 2),
    fr AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0
                    THEN '2026-0' || (1 + doc_id % 9) || '-01'
                  WHEN doc_id % 4 = 1 THEN '2026-08-15' END AS flm
      FROM base),
    j AS (
      SELECT b.doc_id, b.url, s.et, s.lm, f.flm,
             CASE
               WHEN s.doc_id IS NULL THEN 'full'
               WHEN f.flm IS NOT NULL AND s.lm IS NOT NULL
                    AND f.flm <= s.lm THEN 'skip'
               WHEN s.et IS NOT NULL THEN 'conditional_etag'
               WHEN s.lm IS NOT NULL THEN 'conditional_modified'
               ELSE 'full' END AS action
      FROM base b LEFT JOIN stored s USING (doc_id)
                  LEFT JOIN fr f USING (doc_id))
    SELECT url, action,
           CASE WHEN action = 'conditional_etag' THEN et END
             AS if_none_match,
           CASE WHEN action = 'conditional_modified' THEN lm END
             AS if_modified_since
    FROM j
    """,
    doc="HTTP-caching-aware recrawl plan: skip on sitemap-says-unchanged, "
    "If-None-Match when an ETag is stored, If-Modified-Since on "
    "Last-Modified, full fetch otherwise; the oracle replays every "
    "decision and header value.",
)
def web_revalidation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conditional-refetch planner, end to end and oracle-checked:
    every document is a URL with a formulaic crawl history — never
    fetched on ``doc_id % 5 == 2``; a stored ETag on ``% 3 == 0``; a
    stored Last-Modified on ``% 2 == 0``; a frontier lastmod that is
    unchanged (``% 4 == 0``), newer (``% 4 == 1``), or absent — and
    ``revalidation_plan`` decides skip / If-None-Match /
    If-Modified-Since / full per RFC 9110 validator precedence (entity
    tags beat dates), with the sitemap-says-unchanged shortcut taking
    priority because it costs NOTHING. The overlaps exercise every
    branch ordering: an unchanged frontier lastmod beats a stored ETag
    (skip, not 304); a newer frontier lastmod falls through to the
    conditional path. The DuckDB oracle replays every action and header
    value.

    At 100 TB: two url-keyed left joins sharing one partitioning; the
    plan splits the recrawl into free skips, header-only 304 rounds,
    and the residual full fetches — the difference between re-reading a
    crawl and refreshing one."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(F.lit("https://r.example/u"), F.col("doc_id").cast("string"))
    urls = docs.select(url.alias("url"))
    stored = docs.filter(F.col("doc_id") % 5 != 2).select(
        url.alias("url"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit('"e'), F.col("doc_id").cast("string"), F.lit('"')),
        ).alias("stored_etag"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("2026-0"), (F.col("doc_id") % 9 + 1).cast("string"),
                F.lit("-01"),
            ),
        ).alias("stored_lastmod"),
    )
    frontier = docs.select(
        url.alias("url"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("2026-0"), (F.col("doc_id") % 9 + 1).cast("string"),
                F.lit("-01"),
            ),
        )
        .when(F.col("doc_id") % 4 == 1, F.lit("2026-08-15"))
        .alias("frontier_lastmod"),
    )
    return revalidation_plan(urls, stored, frontier)


def resolve_revisits(
    captures: DataFrame, response_index: DataFrame | None = None
) -> DataFrame:
    """Resolve WARC revisit records to the capture that actually holds
    their bytes — the missing half of crawl-time dedup (ISO 28500
    §6.7.2): real Common Crawl archives store a page's payload ONCE and
    emit zero-length ``revisit`` records for every later identical
    fetch, so a pipeline that drops revisits silently under-counts URL
    coverage and over-trusts "unique" page counts. Input is the
    ``warc_captures`` relation (response + revisit rows; request rows
    pass through unresolved — their pairing is ``WARC-Concurrent-To``,
    a different edge). Output is one row per capture, the per-URL
    "served-from" view: (archive_id, rec_idx, rectype, url, served_url,
    served_archive_id, served_rec_idx, via, resolved) where ``via`` is
    ``self`` for responses, ``refers-to`` when the revisit's explicit
    ``WARC-Refers-To`` pointer matched a response record id, ``digest``
    when only the payload digest matched, and NULL (resolved = false)
    when the referenced bytes were never captured.

    Resolution precedence follows the spec's intent: the explicit
    record-id pointer wins over the digest (a digest can legitimately
    match many stored captures; the pointer names one). When resolving
    by digest alone and several responses share the digest, the
    EARLIEST capture wins — min (archive_id, rec_idx), deterministic —
    via a MAX-struct-free aggregation of the response side into a
    one-row-per-digest dimension, so the join never multiplies rows.

    At 100 TB: responses collapse to two small dimensions (one keyed by
    record id — unique by spec, one by digest after a single groupBy),
    and revisits resolve with two equi-joins against them; output rows
    = input rows, no explode, no window over the fact table, no Python.

    ``response_index`` (optional) supplies the stored-capture relation
    the dims build from INSTEAD of ``captures`` itself — the
    incremental/streaming shape: today's arriving captures resolve
    against the PERSISTED index of everything already ingested, and
    because the dims are then static, the same plan runs under
    Structured Streaming in append mode with no streaming aggregation
    (stream==batch parity pinned in tests/test_streaming.py).
    """
    resp = (response_index if response_index is not None else captures).filter(
        F.col("rectype") == "response"
    )
    by_id = resp.select(
        F.col("record_id").alias("__rid"),
        F.col("url").alias("__rid_url"),
        F.col("archive_id").alias("__rid_aid"),
        F.col("rec_idx").alias("__rid_idx"),
    )
    by_digest = (
        resp.filter(F.col("payload_digest").isNotNull())
        .groupBy(F.col("payload_digest").alias("__dig"))
        .agg(
            F.min(
                F.struct(
                    F.col("archive_id").alias("aid"),
                    F.col("rec_idx").alias("idx"),
                    F.col("url").alias("url"),
                )
            ).alias("__first")
        )
        .select(
            "__dig",
            F.col("__first.url").alias("__dig_url"),
            F.col("__first.aid").alias("__dig_aid"),
            F.col("__first.idx").alias("__dig_idx"),
        )
    )
    revisits = captures.filter(F.col("rectype") == "revisit")
    resolved_rev = (
        revisits.join(
            by_id, F.col("refers_to") == F.col("__rid"), "left"
        )
        .join(
            by_digest,
            F.col("payload_digest") == F.col("__dig"),
            "left",
        )
        .select(
            "archive_id",
            "rec_idx",
            "rectype",
            "url",
            F.coalesce("__rid_url", "__dig_url").alias("served_url"),
            F.coalesce("__rid_aid", "__dig_aid").alias(
                "served_archive_id"
            ),
            F.coalesce("__rid_idx", "__dig_idx").alias("served_rec_idx"),
            F.when(F.col("__rid").isNotNull(), F.lit("refers-to"))
            .when(F.col("__dig").isNotNull(), F.lit("digest"))
            .alias("via"),
            (F.col("__rid").isNotNull() | F.col("__dig").isNotNull()).alias(
                "resolved"
            ),
        )
    )
    self_served = captures.filter(F.col("rectype") != "revisit").select(
        "archive_id",
        "rec_idx",
        "rectype",
        "url",
        F.when(F.col("rectype") == "response", F.col("url")).alias(
            "served_url"
        ),
        F.when(F.col("rectype") == "response", F.col("archive_id")).alias(
            "served_archive_id"
        ),
        F.when(F.col("rectype") == "response", F.col("rec_idx")).alias(
            "served_rec_idx"
        ),
        F.when(F.col("rectype") == "response", F.lit("self")).alias("via"),
        (F.col("rectype") == "response").alias("resolved"),
    )
    return self_served.unionByName(resolved_rev)


@register(
    "ingest_warc_revisits",
    oracle="""
    WITH caps AS (
      SELECT doc_id AS d, doc_id % 4 AS r, doc_id - doc_id % 4 AS g,
             CAST(CASE WHEN doc_id % 6 = 2 THEN 1 ELSE 0 END AS BIGINT)
               AS idx,
             CASE WHEN doc_id % 11 = 7 THEN 'sha1:MISSING' || doc_id
                  ELSE 'sha1:SYN' || (doc_id - doc_id % 4) END AS digest
      FROM documents),
    resp AS (
      SELECT d, idx, 'https://cc.example/p/' || d AS url, digest
      FROM caps WHERE r = 0),
    rev AS (
      SELECT d, g, r, idx,
             'https://cc.example/p/' || g || '?visit=' || r AS url,
             digest,
             CASE WHEN r = 1 THEN g END AS ref_d
      FROM caps WHERE r > 0),
    by_ref AS (
      SELECT v.*, o.d AS rid_d, o.idx AS rid_idx, o.url AS rid_url
      FROM rev v LEFT JOIN resp o ON v.ref_d = o.d),
    by_dig AS (
      SELECT b.*, o2.d AS dig_d, o2.idx AS dig_idx, o2.url AS dig_url
      FROM by_ref b LEFT JOIN resp o2
        ON b.rid_d IS NULL AND b.digest = o2.digest)
    SELECT CAST(d AS BIGINT) AS archive_id, idx AS rec_idx,
           'response' AS rectype, url, url AS served_url,
           CAST(d AS BIGINT) AS served_archive_id,
           idx AS served_rec_idx, 'self' AS via, TRUE AS resolved
    FROM resp
    UNION ALL
    SELECT CAST(d AS BIGINT), idx, 'revisit', url,
           COALESCE(rid_url, dig_url),
           CAST(COALESCE(rid_d, dig_d) AS BIGINT),
           CAST(COALESCE(rid_idx, dig_idx) AS BIGINT),
           CASE WHEN rid_d IS NOT NULL THEN 'refers-to'
                WHEN dig_d IS NOT NULL THEN 'digest' END,
           rid_d IS NOT NULL OR dig_d IS NOT NULL
    FROM by_dig
    """,
    doc="WARC revisit resolution: real .warc.gz archives interleave "
    "response, revisit (refers-to AND digest-only AND dangling), and "
    "metadata records; warc_captures parses the linkage headers and "
    "resolve_revisits replays crawl-time dedup relationally — the "
    "oracle mirrors every resolution with its own joins.",
)
def ingest_warc_revisits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-time dedup resolved end to end and oracle-checked: every
    document becomes a real ``.warc.gz`` (``synth_warc_revisit_payload``
    — groups of four archives share one page; the anchor holds the
    response, the rest hold identical-payload-digest revisits, with
    explicit-pointer, digest-only, DANGLING-digest, and
    metadata-interleaved cases all on formulaic schedules),
    ``warc_captures`` surfaces the linkage headers in one Arrow pass,
    and ``resolve_revisits`` turns them into the served-from view with
    two equi-joins. The DuckDB oracle rebuilds the capture relation
    with string arithmetic and REPLAYS the resolution with its own
    left joins — precedence (refers-to over digest), the dangling
    fail-open, and full-archive rec_idx positions all hash-checked.

    At 100 TB: archives parse where they live; the response side
    collapses to two small keyed dimensions; revisit resolution is two
    shuffle joins whose output is exactly one row per capture."""
    from ..operators.ingest import documents_as_warc_revisit, warc_captures

    docs = t_parallel(spark, sf_dir, "documents")
    # materialize the capture relation ONCE: resolve_revisits consumes it
    # three ways (record-id dim, digest dim, revisit fact) and without
    # the checkpoint each branch would re-run both Arrow lanes — at
    # 100 TB captures are a persisted table, not a re-parse
    caps = warc_captures(documents_as_warc_revisit(docs)).localCheckpoint(
        eager=False
    )
    return resolve_revisits(caps)


@register(
    "ingest_warc_unique_payloads",
    oracle="""
    WITH caps AS (
      SELECT doc_id AS d, doc_id % 4 AS r, doc_id - doc_id % 4 AS g,
             CASE WHEN doc_id % 11 = 7 THEN 'sha1:MISSING' || doc_id
                  ELSE 'sha1:SYN' || (doc_id - doc_id % 4) END AS digest
      FROM documents),
    resp AS (
      SELECT d, 'https://cc.example/p/' || d AS url, digest
      FROM caps WHERE r = 0),
    rev AS (
      SELECT d, g, r, digest, CASE WHEN r = 1 THEN g END AS ref_d
      FROM caps WHERE r > 0),
    by_ref AS (
      SELECT v.*, o.url AS rid_url
      FROM rev v LEFT JOIN resp o ON v.ref_d = o.d),
    by_dig AS (
      SELECT b.*, o2.url AS dig_url
      FROM by_ref b LEFT JOIN resp o2
        ON b.rid_url IS NULL AND b.digest = o2.digest),
    serv AS (
      SELECT url AS served_url FROM resp
      UNION ALL
      SELECT COALESCE(rid_url, dig_url) FROM by_dig),
    per_page AS (
      SELECT served_url, CAST(COUNT(*) AS BIGINT) AS n_captures
      FROM serv WHERE served_url IS NOT NULL GROUP BY served_url),
    resp_bytes AS (
      SELECT 'https://cc.example/p/' || d AS served_url,
             CAST(length('page ' || d || ' ') * (1 + d % 5) AS BIGINT)
               AS stored_bytes
      FROM caps WHERE r = 0),
    unres AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM serv
      WHERE served_url IS NULL)
    SELECT p.served_url,
           p.n_captures,
           b.stored_bytes,
           p.n_captures * b.stored_bytes AS logical_bytes
    FROM per_page p JOIN resp_bytes b USING (served_url)
    UNION ALL
    SELECT CAST(NULL AS VARCHAR), n, CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM unres WHERE n > 0
    """,
    doc="Unique-payload accounting over resolved revisits: captures per "
    "stored payload, stored vs logical bytes (the under-count a "
    "revisit-dropping pipeline inherits); unresolved captures surface "
    "as a NULL-url row, never vanish.",
)
def ingest_warc_unique_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The accounting view crawl dedup exists for, oracle-checked: after
    ``resolve_revisits``, group captures by the payload that actually
    served them — ``n_captures`` fetches collapsed onto one stored copy,
    ``stored_bytes`` (bytes on disk, once) vs ``logical_bytes`` (bytes a
    revisit-blind pipeline would claim to have) — and keep UNRESOLVED
    captures visible as a NULL-url row instead of dropping them. This is
    the query that makes the under-count concrete: coverage counted on
    stored payloads alone misses every revisit's fetch.

    At 100 TB: one hash aggregation over the served-from view keyed by
    served_url (already the join output), a broadcast-sized join against
    the per-page stored-byte dimension, no window, no explode."""
    from ..operators.ingest import documents_as_warc_revisit, warc_captures

    docs = t_parallel(spark, sf_dir, "documents")
    # one materialized capture relation feeds the served-from view AND
    # the stored-byte dimension (same reasoning as ingest_warc_revisits)
    caps = warc_captures(documents_as_warc_revisit(docs)).localCheckpoint(
        eager=False
    )
    # round 16 measured-and-rejected: checkpointing the resolved view too
    # (it is consumed twice: per-page counts + unresolved tally) read
    # NEUTRAL at sf0.1 and +16% at the 10x rehearsal on the clean A/B
    # pair — the resolution joins over the already-cached captures are
    # cheap enough that the extra materialize-then-consume serialization
    # only costs; the caps cut above is the one that pays
    served = resolve_revisits(caps)
    resp_bytes = (
        caps.filter(F.col("rectype") == "response")
        .select(
            F.col("url").alias("served_url"),
            F.col("n_bytes").alias("stored_bytes"),
        )
    )
    per_page = (
        served.filter(F.col("resolved"))
        .groupBy("served_url")
        .agg(F.count(F.lit(1)).alias("n_captures"))
        .join(resp_bytes, "served_url")
        .select(
            "served_url",
            "n_captures",
            "stored_bytes",
            (F.col("n_captures") * F.col("stored_bytes")).alias(
                "logical_bytes"
            ),
        )
    )
    unresolved = (
        served.filter(~F.col("resolved"))
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_captures"))
        .filter(F.col("n_captures") > 0)
        .select(
            F.lit(None).cast("string").alias("served_url"),
            "n_captures",
            F.lit(None).cast("bigint").alias("stored_bytes"),
            F.lit(None).cast("bigint").alias("logical_bytes"),
        )
    )
    return per_page.unionByName(unresolved)


def parse_tracking_rules(rules: DataFrame) -> DataFrame:
    """(text) -> (pattern, base, is_prefix) — a tracking-parameter rule
    table parsed entirely in Catalyst, the same idiom as the PSL and
    robots parses: lines via split+posexplode, ``//`` comments and
    blanks dropped, a trailing ``*`` marking a PREFIX rule (``utm_*``
    matches every parameter starting ``utm_``), anything else an exact
    parameter name. Patterns lowercase by contract (parameter matching
    is case-sensitive per the URL spec, but tracking params are
    conventionally lowercase; the matcher compares as written)."""
    lines = rules.select(
        F.posexplode(F.split("text", "\n")).alias("pos", "raw")
    ).select(F.regexp_replace("raw", r"^\s+|\s+$", "").alias("line"))
    kept = lines.filter(
        (F.col("line") != "") & ~F.col("line").startswith("//")
    )
    is_prefix = F.col("line").endswith("*")
    return kept.select(
        F.col("line").alias("pattern"),
        F.when(is_prefix, F.expr("substring(line, 1, length(line) - 1)"))
        .otherwise(F.col("line"))
        .alias("base"),
        is_prefix.alias("is_prefix"),
    )


def tracking_rules_regex(rules: DataFrame) -> DataFrame:
    """Aggregate the tracking-rules dim into a ONE-ROW dimension holding
    a single anchored alternation regex (``^(?:utm_.*|gclid|ref)$``) —
    the shape that makes the strip ROW-LOCAL: the one-row dim broadcast
    cross-joins the URL fact and each row filters its own split query
    params with ``regexp_like`` against the constant-valued column (the
    regex engine caches an unchanged pattern), so there is no per-param
    explode, no re-aggregation shuffle, and parameter order survives.
    Rule bases are regex-escaped in Catalyst before the join — a rule
    is a parameter NAME, never a regex."""
    parsed = (
        parse_tracking_rules(rules) if "text" in rules.columns else rules
    )
    esc = F.regexp_replace(
        "base", r"([.\^\$\*\+\?\(\)\[\]\{\}\|\\])", r"\\$1"
    )
    piece = F.when(
        F.col("is_prefix"), F.concat(esc, F.lit(".*"))
    ).otherwise(esc)
    return parsed.agg(
        F.concat(
            F.lit("^(?:"),
            F.concat_ws("|", F.collect_list(piece)),
            F.lit(")$"),
        ).alias("__trk_re")
    )


def strip_tracking_params(
    df: DataFrame, url_col, rules: DataFrame, out: str = "canonical_url"
) -> DataFrame:
    """Drop tracking parameters from a URL column, data-driven by a
    rules dim (the PSL idiom — the rule list is DATA a curation team
    maintains, not code): the rules collapse to a one-row regex
    dimension (``tracking_rules_regex``) that broadcast-cross-joins the
    fact table, and each row filters its own query parameters in a
    higher-order ``filter`` — row-local, order-preserving, no explode,
    no shuffle. A query left EMPTY by the strip drops its ``?``
    entirely (matching ``url_canonicalize``'s empty-query choice). Runs
    AFTER ``url_canonicalize`` by convention so the fragment is already
    gone and parameter spellings are percent-normalized. Adds ``out``.

    At 100 TB: one broadcast of one row; everything else is codegen
    string work fused into the scan."""
    u = _c_host(url_col)
    j = df.crossJoin(broadcast(tracking_rules_regex(rules)))
    base = F.regexp_replace(u, r"\?.*$", "")
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&", -1),
        lambda p: ~F.regexp_like(
            F.substring_index(p, "=", 1), F.col("__trk_re")
        ),
    )
    newq = F.array_join(kept, "&")
    stripped = F.when(query == "", u).otherwise(
        F.when(newq != "", F.concat(base, F.lit("?"), newq)).otherwise(base)
    )
    return j.withColumn(out, stripped).drop("__trk_re")


def _synth_tracking_rules(spark: SparkSession) -> DataFrame:
    """The synthetic tracking-parameter rule file: one prefix rule, two
    exact rules, comments and blanks — enough to exercise every parse
    branch."""
    return spark.range(1).select(
        F.lit(
            "// synthetic tracking params\n"
            "utm_*\n"
            "gclid\n"
            "\n"
            "ref\n"
        ).alias("text")
    )


@register(
    "web_url_canonicalize",
    oracle="""
    WITH d AS (
      SELECT doc_id AS d, doc_id % 20 AS h FROM documents),
    pieces AS (
      SELECT d, h,
        CASE d % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https'
             ELSE 'http' END AS sch_raw,
        CASE d % 3 WHEN 1 THEN 'https' ELSE 'http' END AS sch,
        CASE WHEN d % 4 = 0 THEN 'WWW.Site' || h || '.EXAMPLE'
             ELSE 'site' || h || '.example' END AS host_raw,
        CASE WHEN d % 4 = 0 THEN 'www.site' || h || '.example'
             ELSE 'site' || h || '.example' END AS host,
        CASE d % 5
          WHEN 0 THEN (CASE WHEN d % 3 = 1 THEN ':443' ELSE ':80' END)
          WHEN 1 THEN ':8080' ELSE '' END AS port_raw,
        CASE d % 5 WHEN 1 THEN ':8080' ELSE '' END AS port,
        CASE d % 6 WHEN 0 THEN '/a/./b' WHEN 1 THEN '/a/b/../c'
             WHEN 2 THEN '/%7Euser/p' WHEN 3 THEN '/a%2fb/p'
             WHEN 4 THEN '' ELSE '/p/' || d END AS path_raw,
        CASE d % 6 WHEN 0 THEN '/a/b' WHEN 1 THEN '/a/c'
             WHEN 2 THEN '/~user/p' WHEN 3 THEN '/a%2Fb/p'
             WHEN 4 THEN '/' ELSE '/p/' || d END AS path,
        CASE d % 7
          WHEN 0 THEN '?utm_source=x&id=' || d || '&utm_campaign=y'
          WHEN 1 THEN '?gclid=abc'
          WHEN 2 THEN '?b=2&a=1&ref=rss' ELSE '' END AS q_raw,
        CASE d % 7 WHEN 0 THEN '?id=' || d
          WHEN 2 THEN '?b=2&a=1' ELSE '' END AS q,
        CASE WHEN d % 2 = 0 THEN '#frag' ELSE '' END AS frag
      FROM d)
    SELECT d AS doc_id,
           sch_raw || '://' || host_raw || port_raw || path_raw
             || q_raw || frag AS url,
           sch || '://' || host || port || path || q AS canonical_url
    FROM pieces
    """,
    doc="RFC 3986 §6 URL canonicalization (case, default port, "
    "fragment, percent, dot-segments, empty path/query) plus "
    "tracking-param stripping from a broadcast rules dim; the oracle "
    "replays every canonical form from the dirt schedules.",
)
def web_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-level URL canonicalization, end to end and oracle-checked:
    every document becomes a DIRTY url exercising one case of each
    normalization on independent schedules — mixed-case scheme
    (``d%3``), mixed-case www host (``d%4``), default vs explicit port
    (``d%5``, the default port matching the scheme so it always
    drops), dot-segments / unreserved and reserved percent escapes /
    empty path (``d%6``), tracking params interleaved with real ones
    (``d%7``, stripped by the broadcast rules dim: ``utm_*`` prefix,
    ``gclid``/``ref`` exact), and a fragment on even docs —
    ``url_canonicalize`` then ``strip_tracking_params`` produce the
    canonical key, and the DuckDB oracle replays every canonical form
    with CASE arithmetic over the same schedules. This is the key
    crawl dedup, frontier maintenance, and revisit accounting all join
    on; composing the schedules independently means a regression in
    any one normalization breaks the hash.

    At 100 TB: pure codegen string expressions plus one broadcast of a
    ONE-ROW regex dim — no shuffle, no explode, no Python."""
    from ..functions.url import url_canonicalize

    docs = t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    h = (d % 20).cast("string")
    sch = (
        F.when(d % 3 == 0, F.lit("HTTP"))
        .when(d % 3 == 1, F.lit("https"))
        .otherwise(F.lit("http"))
    )
    host = F.when(
        d % 4 == 0, F.concat(F.lit("WWW.Site"), h, F.lit(".EXAMPLE"))
    ).otherwise(F.concat(F.lit("site"), h, F.lit(".example")))
    port = (
        F.when(
            d % 5 == 0,
            F.when(d % 3 == 1, F.lit(":443")).otherwise(F.lit(":80")),
        )
        .when(d % 5 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = (
        F.when(d % 6 == 0, F.lit("/a/./b"))
        .when(d % 6 == 1, F.lit("/a/b/../c"))
        .when(d % 6 == 2, F.lit("/%7Euser/p"))
        .when(d % 6 == 3, F.lit("/a%2fb/p"))
        .when(d % 6 == 4, F.lit(""))
        .otherwise(F.concat(F.lit("/p/"), d.cast("string")))
    )
    q = (
        F.when(
            d % 7 == 0,
            F.concat(
                F.lit("?utm_source=x&id="),
                d.cast("string"),
                F.lit("&utm_campaign=y"),
            ),
        )
        .when(d % 7 == 1, F.lit("?gclid=abc"))
        .when(d % 7 == 2, F.lit("?b=2&a=1&ref=rss"))
        .otherwise(F.lit(""))
    )
    frag = F.when(d % 2 == 0, F.lit("#frag")).otherwise(F.lit(""))
    dirty = docs.select(
        "doc_id",
        F.concat(sch, F.lit("://"), host, port, path, q, frag).alias("url"),
    )
    canon = dirty.withColumn("__c", url_canonicalize(F.col("url")))
    return strip_tracking_params(
        canon, "__c", _synth_tracking_rules(spark), out="canonical_url"
    ).select("doc_id", "url", "canonical_url")


@register(
    "web_frontier_delta_canonical",
    oracle="""
    WITH sm AS (
      SELECT doc_id, doc_id % 20 AS d,
             'https://site' || (doc_id % 20) || '.example/page/' || doc_id
               AS loc
      FROM documents),
    old AS (
      SELECT *, CASE WHEN doc_id % 2 = 0
                     THEN '2026-0' || (1 + doc_id % 9) || '-01' END AS lm
      FROM sm WHERE doc_id % 10 != 7),
    new AS (
      SELECT *, CASE WHEN doc_id % 2 = 0 THEN
               CASE WHEN doc_id % 6 = 2
                    THEN '2026-0' || (1 + doc_id % 9) || '-15'
                    ELSE '2026-0' || (1 + doc_id % 9) || '-01' END END AS lm
      FROM sm WHERE doc_id % 10 != 3)
    SELECT 'site' || d || '.example' AS domain, loc,
           'added' AS change, CAST(NULL AS VARCHAR) AS old_lastmod,
           lm AS new_lastmod
    FROM new WHERE doc_id % 10 = 7
    UNION ALL
    SELECT 'site' || d || '.example', loc, 'removed', lm, NULL
    FROM old WHERE doc_id % 10 = 3
    UNION ALL
    SELECT 'site' || d || '.example', loc, 'lastmod_changed',
           '2026-0' || (1 + doc_id % 9) || '-01',
           '2026-0' || (1 + doc_id % 9) || '-15'
    FROM new WHERE doc_id % 6 = 2 AND doc_id % 10 NOT IN (3, 7)
    """,
    doc="Frontier diff keyed on CANONICAL urls: today's frontier "
    "carries tracking params / default ports / fragments / case dirt "
    "that canonicalization must erase before the diff — the oracle's "
    "churn set contains no dirt-only rows.",
)
def web_frontier_delta_canonical(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The reason canonicalization exists, end to end and
    oracle-checked: the SAME churn schedule as ``web_frontier_delta``
    (adds on ``% 10 == 7``, removes on ``% 10 == 3``, lastmod bumps on
    ``% 6 == 2``) — but today's frontier reports every url in a DIRTY
    surface form (tracking params on ``% 3 == 0``, explicit default
    port + fragment on ``% 3 == 1``, mixed-case scheme/host on
    ``% 3 == 2``). A diff keyed on raw urls would flag nearly every
    url as simultaneously added and removed; keyed on
    ``url_canonicalize`` + ``strip_tracking_params`` output, the delta
    is EXACTLY the real churn — the oracle replays that churn set with
    no dirt anywhere, so one surviving dirt-only row breaks the hash.

    At 100 TB: canonicalization is codegen string work fused into both
    frontier scans plus one one-row broadcast; the diff itself stays
    the shared-key anti-join/inner-join shape of ``frontier_delta``."""
    from ..functions.url import url_canonicalize

    docs = t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    h = (d % 20).cast("string")
    clean = F.concat(
        F.lit("https://site"), h, F.lit(".example/page/"), d.cast("string")
    )
    dirty = (
        F.when(d % 3 == 0, F.concat(clean, F.lit("?utm_source=feed")))
        .when(
            d % 3 == 1,
            F.concat(
                F.lit("https://site"), h, F.lit(".example:443/page/"),
                d.cast("string"), F.lit("#sec"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("HTTPS://Site"), h, F.lit(".EXAMPLE/page/"),
                d.cast("string"),
            )
        )
    )
    lm_old = F.when(
        d % 2 == 0,
        F.concat(F.lit("2026-0"), (d % 9 + 1).cast("string"), F.lit("-01")),
    )
    lm_new = F.when(
        d % 2 == 0,
        F.concat(
            F.lit("2026-0"),
            (d % 9 + 1).cast("string"),
            F.when(d % 6 == 2, F.lit("-15")).otherwise(F.lit("-01")),
        ),
    )
    domain = F.concat(F.lit("site"), h, F.lit(".example"))
    rules = _synth_tracking_rules(spark)
    old = docs.filter(d % 10 != 7).select(
        domain.alias("domain"), clean.alias("loc"), lm_old.alias("lastmod")
    )
    new_raw = docs.filter(d % 10 != 3).select(
        domain.alias("domain"), dirty.alias("__raw"), lm_new.alias("lastmod")
    )
    new = strip_tracking_params(
        new_raw.withColumn("__c", url_canonicalize(F.col("__raw"))),
        "__c",
        rules,
        out="loc",
    ).select("domain", "loc", "lastmod")
    # lazy checkpoint before the diff (round 16): frontier_delta consumes
    # the new side THREE times (added anti, removed anti, changed inner),
    # and each consumer re-ran the whole canonicalize + strip-tracking
    # tower over the scan (3 of the before-plan's 12 in-plan scans were
    # this tower). What materializes is the 3-column (domain, loc,
    # lastmod) frontier — guide §8 "decide with small rows"; the old
    # side is a cheap concat and stays inline
    return frontier_delta(old, new.localCheckpoint(eager=False))


def pair_requests_responses(captures: DataFrame) -> DataFrame:
    """Join WARC request records to the responses they produced — the
    ``WARC-Concurrent-To`` edge (ISO 28500 §5.7) — yielding the
    per-fetch view politeness and latency audits read: one row per
    REQUEST with (archive_id, url, req_idx, resp_idx, req_date,
    resp_date, latency_s, paired). ``latency_s`` is the whole-second
    gap between the two records' WARC-Dates (the capture timestamps;
    NULL when unpaired). A request without a ``WARC-Concurrent-To`` —
    real archives contain them — surfaces ``paired = false`` with NULL
    response columns; pairing by target-URI guesswork would silently
    mis-attribute retried fetches, so it is not attempted.

    At 100 TB: responses collapse to a record-id-keyed dimension
    (unique by spec) and requests pay one left equi-join — same shape
    as ``resolve_revisits``' refers-to leg; no window, no explode."""
    resp = captures.filter(F.col("rectype") == "response").select(
        F.col("record_id").alias("__rid"),
        F.col("rec_idx").alias("__resp_idx"),
        F.col("warc_date").alias("__resp_date"),
    )
    req = captures.filter(F.col("rectype") == "request")
    j = req.join(resp, F.col("concurrent_to") == F.col("__rid"), "left")
    # try_to_timestamp: a malformed WARC-Date in a real archive yields a
    # NULL latency for that row, never a failed job under ANSI mode
    fmt = F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")
    lat = (
        F.unix_timestamp(F.try_to_timestamp(F.col("__resp_date"), fmt))
        - F.unix_timestamp(F.try_to_timestamp(F.col("warc_date"), fmt))
    ).cast("bigint")
    return j.select(
        "archive_id",
        "url",
        F.col("rec_idx").alias("req_idx"),
        F.col("__resp_idx").alias("resp_idx"),
        F.col("warc_date").alias("req_date"),
        F.col("__resp_date").alias("resp_date"),
        F.when(F.col("__rid").isNotNull(), lat).alias("latency_s"),
        F.col("__rid").isNotNull().alias("paired"),
    )


@register(
    "web_request_response_pairs",
    oracle="""
    WITH d AS (
      SELECT doc_id AS d,
             CAST(CASE WHEN doc_id % 6 = 2 THEN 1 ELSE 0 END AS BIGINT)
               AS base
      FROM documents)
    SELECT d AS archive_id,
           'https://site' || (d % 20) || '.example/p/' || d AS url,
           base AS req_idx,
           CASE WHEN d % 9 != 4 THEN base + 1 END AS resp_idx,
           '2026-01-01T00:00:00Z' AS req_date,
           CASE WHEN d % 9 != 4
                THEN '2026-01-01T00:00:0' || (d % 5) || 'Z' END AS resp_date,
           CASE WHEN d % 9 != 4 THEN CAST(d % 5 AS BIGINT) END
             AS latency_s,
           d % 9 != 4 AS paired
    FROM d
    """,
    doc="Request<->response pairing via WARC-Concurrent-To: one left "
    "equi-join against the record-id dim; fetch latency from the "
    "WARC-Date gap; linkless requests surface unpaired. The oracle "
    "replays every pair, index, and latency from the schedules.",
)
def web_request_response_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The fetch-event view, end to end and oracle-checked: every
    document becomes a real ``.warc.gz`` holding a request and its
    response (``synth_warc_pair_payload`` — the request's
    ``WARC-Concurrent-To`` names the response record; ``d % 9 == 4``
    requests LACK the link and must surface unpaired; ``d % 6 == 2``
    archives interleave a metadata record so rec_idx stays the
    full-archive position; response WARC-Dates land ``d % 5`` seconds
    after the request's). ``warc_captures`` surfaces the linkage in
    one Arrow pass; ``pair_requests_responses`` joins and computes the
    latency; the DuckDB oracle replays every pair, both indices, both
    dates, and the latency from the schedules. This is the view a
    per-domain politeness audit aggregates (fetch cadence vs the
    Crawl-delay budgets of ``web_crawl_budget``).

    At 100 TB: one Arrow parse where the bytes live, one left
    equi-join against a record-id dim, output one small typed row per
    request."""
    from ..operators.ingest import documents_as_warc_pairs, warc_captures

    docs = t_parallel(spark, sf_dir, "documents")
    caps = warc_captures(documents_as_warc_pairs(docs)).localCheckpoint(
        eager=False
    )
    return pair_requests_responses(caps)


@register(
    "web_http_entity_decoding",
    oracle="""
    WITH d AS (
      SELECT doc_id AS d,
             repeat('enc ' || doc_id || ' ', 1 + doc_id % 5) AS entity
      FROM documents)
    SELECT d AS archive_id,
           'https://enc.example/p/' || d AS url,
           CASE WHEN d % 4 IN (1, 3) THEN 'chunked' END
             AS transfer_encoding,
           CASE WHEN d % 4 IN (2, 3) THEN 'gzip' END AS content_encoding,
           CAST(length(entity) AS BIGINT) AS n_body_bytes,
           entity AS body_text
    FROM d
    """,
    doc="HTTP entity decoding: chunked transfer framing (extensions, "
    "trailers) and gzip Content-Encoding undone — alone and composed — "
    "before the charset decode; the oracle replays the identical "
    "entity across all four wire forms, so any decode bug breaks the "
    "hash.",
)
def web_http_entity_decoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wire-to-entity step real archives need, end to end and
    oracle-checked: every document becomes a real ``.warc.gz`` whose
    HTTP response carries the SAME entity in one of four wire forms
    (plain / chunked with an extension and a trailer / gzip /
    gzip-inside-chunked — ``synth_warc_encoded_payload``), and
    ``warc_http_responses`` must produce identical text and byte counts
    for all of them: the chunk framing is removed first (it is the wire
    layer), then the Content-Encoding, then the charset decode. The
    transfer/content encodings are ALSO surfaced from the raw header
    block by the pure-Catalyst field extraction, so the oracle pins
    both the decode AND the header schedule.

    At 100 TB: the decode happens inside the same Arrow pass that
    already holds the record bytes — no extra pass, no shuffle; a
    pipeline without it either ships gzip bytes into its text columns
    or dies on the first chunked record."""
    from ..functions.http import http_header
    from ..operators.ingest import (
        documents_as_warc_encoded,
        warc_http_responses,
    )

    docs = t_parallel(spark, sf_dir, "documents")
    resp = warc_http_responses(documents_as_warc_encoded(docs))
    return resp.select(
        "archive_id",
        "url",
        F.lower(http_header("http_headers", "Transfer-Encoding")).alias(
            "transfer_encoding"
        ),
        F.lower(http_header("http_headers", "Content-Encoding")).alias(
            "content_encoding"
        ),
        "n_body_bytes",
        F.col("body_text"),
    )


def politeness_audit(fetches: DataFrame, delays: DataFrame) -> DataFrame:
    """Did the crawler actually honor Crawl-delay? ``fetches`` is the
    observed fetch log — (domain, fetch_ts) integer epoch seconds, the
    view ``web_request_response_pairs`` yields from real archives —
    and ``delays`` the per-domain budget dim (``effective_crawl_delay``
    output, or any (domain, delay) relation). Output per domain:
    (domain, n_fetches, min_gap_s, crawl_delay, compliant) where
    ``min_gap_s`` is the smallest gap between CONSECUTIVE fetches (NULL
    for single-fetch domains) and ``compliant`` is min_gap >= delay —
    vacuously true when the domain advertises no delay or was fetched
    once. The aggregate keeps every domain visible; a compliance report
    that silently drops the violating domains is worse than none.

    At 100 TB: one window pass partitioned BY DOMAIN (the politeness
    key — never a global sort), one hash aggregation on the same
    partitioning, and a broadcast-sized join against the delay dim."""
    w = Window.partitionBy("domain").orderBy("fetch_ts")
    gaps = fetches.select(
        "domain",
        (F.col("fetch_ts") - F.lag("fetch_ts").over(w)).alias("gap"),
    )
    per_domain = gaps.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fetches"),
        F.min("gap").cast("bigint").alias("min_gap_s"),
    )
    d = delays.select("domain", F.col("delay").alias("crawl_delay"))
    joined = per_domain.join(broadcast(d), "domain", "left")
    compliant = F.when(
        F.col("crawl_delay").isNull() | F.col("min_gap_s").isNull(),
        F.lit(True),
    ).otherwise(
        F.col("min_gap_s").cast("double") >= F.col("crawl_delay")
    )
    return joined.select(
        "domain", "n_fetches", "min_gap_s", "crawl_delay",
        compliant.alias("compliant"),
    )


@register(
    "web_politeness_audit",
    oracle="""
    WITH f AS (
      SELECT doc_id % 20 AS h, COUNT(*) AS n FROM documents GROUP BY 1),
    gap AS (
      SELECT h, n,
             CASE h % 4 WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 2
                  ELSE 5 END AS g
      FROM f),
    delay AS (
      SELECT h, CASE WHEN h % 3 = 0 THEN 2.5
                     WHEN h % 5 = 1 THEN CAST(1 + h % 3 AS DOUBLE)
                END AS delay
      FROM f)
    SELECT 'site' || h || '.example' AS domain,
           CAST(n AS BIGINT) AS n_fetches,
           CASE WHEN n > 1 THEN CAST(g AS BIGINT) END AS min_gap_s,
           delay AS crawl_delay,
           (delay IS NULL OR n <= 1 OR CAST(g AS DOUBLE) >= delay)
             AS compliant
    FROM gap JOIN delay USING (h)
    """,
    doc="Crawl-delay compliance over an observed fetch log: per-domain "
    "consecutive-gap minimum (domain-partitioned window) vs the "
    "broadcast delay dim; violating domains flagged, never dropped. "
    "The oracle replays gaps and verdicts from the schedules.",
)
def web_politeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compliance report a crawl operator actually reads, end to
    end and oracle-checked: every document is a fetch of its domain
    (``site{d%20}``), fetch timestamps within a domain arrive at a
    constant per-domain cadence (1/3/2/5 seconds by ``h % 4`` — so the
    min gap IS the cadence and the oracle replays it exactly), and the
    delay dim advertises 2.5 s on ``h % 3 == 0`` domains, ``1 + h % 3``
    on ``h % 5 == 1``, nothing elsewhere. Domains fetched faster than
    their advertised delay surface ``compliant = false`` (the 1 s and
    2 s cadences under a 2.5 s delay); no-delay domains and
    single-fetch domains are vacuously compliant and stay VISIBLE.

    At 100 TB: one domain-partitioned window + one hash agg + one
    broadcast join — the fetch log never sorts globally."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    h = d % 20
    cadence = (
        F.when(h % 4 == 0, F.lit(1))
        .when(h % 4 == 1, F.lit(3))
        .when(h % 4 == 2, F.lit(2))
        .otherwise(F.lit(5))
    )
    fetches = docs.select(
        F.concat(F.lit("site"), h.cast("string"), F.lit(".example")).alias(
            "domain"
        ),
        (F.floor(d / 20) * cadence).cast("bigint").alias("fetch_ts"),
    )
    delays = (
        docs.select(h.alias("h"))
        .distinct()
        .select(
            F.concat(
                F.lit("site"), F.col("h").cast("string"), F.lit(".example")
            ).alias("domain"),
            F.when(F.col("h") % 3 == 0, F.lit(2.5))
            .when(
                F.col("h") % 5 == 1,
                (F.col("h") % 3 + 1).cast("double"),
            )
            .alias("delay"),
        )
    )
    return politeness_audit(fetches, delays)


def robots_fetch_mode(resolved: DataFrame) -> DataFrame:
    """RFC 9309 §2.3.1: what a crawler must ASSUME when fetching
    robots.txt itself succeeds, fails, or redirects. Input is the
    ``resolve_redirects`` output over the robots.txt fetch log (one row
    per robots url, redirects already followed to a terminal). Mode per
    the spec's access-results taxonomy:
      2xx terminal  -> ``parse``     (use the file's rules)
      4xx terminal  -> ``allow_all`` ("unavailable": MAY access any
                       resources)
      5xx terminal, an unresolved chain (dangling redirect target or a
      cycle), or any other terminal -> ``deny_all`` ("unreachable":
      MUST assume complete disallow)
    Adds (mode) to the resolver's columns. Pure column mapping — the
    redirect following (the spec's "at least five consecutive hops")
    was already the resolver's bounded-join job."""
    status = F.col("terminal_status")
    mode = (
        F.when(~F.col("resolved"), F.lit("deny_all"))
        .when(status.between(200, 299), F.lit("parse"))
        .when(status.between(400, 499), F.lit("allow_all"))
        .otherwise(F.lit("deny_all"))
    )
    return resolved.withColumn("mode", mode)


@register(
    "web_robots_availability",
    oracle="""
    WITH d AS (SELECT DISTINCT doc_id % 20 AS h FROM documents),
    fstat AS (
      SELECT h,
             CASE WHEN h % 7 = 0 THEN 301
                  WHEN h % 5 = 0 THEN 500
                  WHEN h % 3 = 0 THEN 404 ELSE 200 END AS status,
             CASE WHEN h % 7 = 0 AND h % 2 = 0 THEN 200
                  WHEN h % 7 = 0 THEN NULL END AS redirected_status
      FROM d),
    m AS (
      SELECT h, status,
             CASE WHEN status = 301 THEN redirected_status
                  ELSE status END AS final_status,
             CASE WHEN status = 301 AND redirected_status IS NULL
                    THEN 'deny_all'
                  WHEN COALESCE(CASE WHEN status = 301
                         THEN redirected_status ELSE status END, 0)
                         BETWEEN 200 AND 299 THEN 'parse'
                  WHEN CASE WHEN status = 301 THEN redirected_status
                         ELSE status END BETWEEN 400 AND 499
                    THEN 'allow_all'
                  ELSE 'deny_all' END AS mode
      FROM fstat)
    SELECT 'site' || h || '.example' AS domain,
           CAST(status AS BIGINT) AS fetch_status,
           CAST(final_status AS BIGINT) AS final_status,
           mode,
           CASE mode WHEN 'allow_all' THEN TRUE
                WHEN 'deny_all' THEN FALSE
                ELSE h % 2 = 0 END AS private_ok_allowed
    FROM m
    """,
    doc="RFC 9309 §2.3.1 fetch-status semantics: 2xx parse, 4xx "
    "allow-all (unavailable), 5xx/dangling-redirect deny-all "
    "(unreachable), redirects followed first; composed with the real "
    "rules decision on the parse-mode domains. Oracle replays every "
    "mode and decision.",
)
def web_robots_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The robots decision a real crawler makes BEFORE it has a file,
    end to end and oracle-checked: each of the 20 synth domains' robots
    fetch gets a scheduled outcome — 301 on ``h % 7 == 0`` (redirecting
    to a 200 copy on even h, DANGLING otherwise), 500 on ``h % 5 == 0``,
    404 on ``h % 3 == 0``, else 200 — ``resolve_redirects`` follows the
    chains, ``robots_fetch_mode`` maps terminals to the RFC 9309
    §2.3.1 assumption (parse / allow_all / deny_all), and the
    parse-mode domains then decide the probe path ``/private/ok``
    against their REAL parsed rules (``_synth_robots``: Disallowed
    under ``/private`` for agents without a trainbot group; Allowed by
    the ``Allow: /private/ok`` override on even domains — which is
    exactly ``h % 2 = 0`` here because parse-mode survivors of the
    schedules are even). A crawler that treats a 500 like a 404 (or
    vice versa) flips rows and breaks the hash.

    At 100 TB: the robots fetch log is domains-sized (tiny vs the URL
    fact table); everything here is dim-scale joins and column maps."""
    docs = t(spark, sf_dir, "documents").select((F.col("doc_id") % 20).alias("h"))
    # the 20-row domains dim feeds the fetch log, the redirect targets,
    # AND the fetch-status join below — checkpoint it lazily so the
    # corpus scan + distinct behind it executes once, not once per
    # consumer branch (round 16: this row's plan carried ~150 Exchanges,
    # nearly all replicas of this tower)
    hosts = docs.distinct().localCheckpoint(eager=False)
    h = F.col("h")
    url = F.concat(F.lit("robots://site"), h.cast("string"), F.lit(".example"))
    status = (
        F.when(h % 7 == 0, F.lit(301))
        .when(h % 5 == 0, F.lit(500))
        .when(h % 3 == 0, F.lit(404))
        .otherwise(F.lit(200))
    )
    location = F.when(
        h % 7 == 0,
        F.concat(F.lit("robots-final://site"), h.cast("string"), F.lit(".example")),
    )
    first = hosts.select(
        h.alias("h0"), url.alias("url"), status.alias("status"),
        location.alias("location"),
    )
    # the redirect targets: fetched (200) only for even redirecting hosts
    targets = hosts.filter((h % 7 == 0) & (h % 2 == 0)).select(
        F.concat(
            F.lit("robots-final://site"), h.cast("string"), F.lit(".example")
        ).alias("url"),
        F.lit(200).alias("status"),
        F.lit(None).cast("string").alias("location"),
    )
    resp = first.select("url", "status", "location").unionByName(targets)
    # materialize=True: resp embeds the documents scan + distinct tower,
    # which the stacked redirect plan re-executes per union branch —
    # measured 4.52 s -> 2.99 s min-of-3 (rationale at resolve_redirects)
    modes = robots_fetch_mode(
        resolve_redirects(resp, max_hops=5, materialize=True)
    ).filter(F.col("url").startswith("robots://"))
    keyed = modes.select(
        F.regexp_extract("url", r"robots://site([0-9]+)\.example", 1)
        .cast("int")
        .alias("h"),
        F.col("terminal_status").alias("final_status"),
        "mode",
    ).join(first.select(F.col("h0").alias("h"), F.col("status").alias("fetch_status")), "h")
    # parse-mode domains decide the probe path against their REAL rules
    robots = _synth_robots(spark)
    probe = keyed.filter(F.col("mode") == "parse").select(
        # the winner window partitions by doc_id — one probe per domain
        # needs one id per domain
        F.col("h").cast("bigint").alias("doc_id"),
        F.concat(F.lit("site"), F.col("h").cast("string"), F.lit(".example")).alias("domain"),
        F.lit("/private/ok").alias("path"),
        "h",
    )
    decided = robots_allowed(
        probe,
        parse_robots_rules(robots),
        parse_robots_groups(robots),
        "otherbot",
    ).select(F.col("h"), F.col("allowed").alias("__rule_allowed"))
    out = keyed.join(decided, "h", "left")
    allowed = (
        F.when(F.col("mode") == "allow_all", F.lit(True))
        .when(F.col("mode") == "deny_all", F.lit(False))
        .otherwise(F.col("__rule_allowed"))
    )
    return out.select(
        F.concat(F.lit("site"), F.col("h").cast("string"), F.lit(".example")).alias("domain"),
        F.col("fetch_status").cast("bigint"),
        F.col("final_status").cast("bigint"),
        "mode",
        allowed.alias("private_ok_allowed"),
    )


@register(
    "web_url_surt_keys",
    oracle="""
    WITH d AS (SELECT doc_id AS d, doc_id % 20 AS h FROM documents)
    SELECT d AS doc_id,
           'https://WWW.Site' || h || '.EXAMPLE' ||
             CASE WHEN d % 5 = 1 THEN ':8080' ELSE '' END ||
             '/a/' || d ||
             CASE WHEN d % 3 = 0 THEN '?b=2&a=1' ELSE '' END AS url,
           'example,site' || h ||
             CASE WHEN d % 5 = 1 THEN ':8080' ELSE '' END ||
             ')/a/' || d ||
             CASE WHEN d % 3 = 0 THEN '?a=1&b=2' ELSE '' END AS surt_key
    FROM d
    """,
    doc="SURT keys (reversed host labels + sorted query) over "
    "canonicalized urls — the cc-index ordering that makes per-site "
    "scans range-prunable; the oracle replays every key.",
)
def web_url_surt_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index key a 100 TB URL store sorts on, end to end and
    oracle-checked: dirty urls (mixed-case www hosts, an explicit
    non-default port on ``d % 5 == 1``, unsorted query params on
    ``d % 3 == 0``) canonicalize (``url_canonicalize``) and transform
    to SURT (``url_surt``): host labels reversed and comma-joined (all
    of ``site{h}.example`` — and any subdomain — lands in one
    contiguous ``example,site{h}`` range), conventional ``www.`` strip,
    ports kept (different services), query byte-sorted. The oracle
    replays every key with string arithmetic.

    At 100 TB: pure codegen string work; the value is downstream —
    a URL store sorted by this key turns per-site reads into range
    scans instead of full-index shuffles."""
    from ..functions.url import url_canonicalize, url_surt

    docs = t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    h = (d % 20).cast("string")
    url = F.concat(
        F.lit("https://WWW.Site"), h, F.lit(".EXAMPLE"),
        F.when(d % 5 == 1, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/a/"), d.cast("string"),
        F.when(d % 3 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
    )
    # stage the canonical url as a real column: url_surt references its
    # input several times, and a single-expression composition would
    # duplicate the whole canonicalize tree per reference (the same
    # expression-blowup web_outlink_frontier documents)
    return docs.select(
        "doc_id",
        url.alias("url"),
        url_canonicalize(url).alias("__c"),
    ).select(
        "doc_id",
        "url",
        url_surt(F.col("__c")).alias("surt_key"),
    )


@register(
    "web_outlink_frontier",
    oracle="""
    WITH d AS (SELECT doc_id AS d, doc_id % 20 AS h FROM documents),
    base AS (
      SELECT d, h, 'https://site' || h || '.example' AS root FROM d),
    l AS (
      SELECT d, h, CAST(0 AS BIGINT) AS link_idx,
             root || '/dir/g' || d AS outlink FROM base
      UNION ALL
      SELECT d, h, 1, root || '/up/' || d FROM base
      UNION ALL
      SELECT d, h, 2, root || '/abs/' || d || '?b=2&a=1' FROM base
      UNION ALL
      SELECT d, h, 3, 'https://cdn.example/x/' || d FROM base
      UNION ALL
      SELECT d, h, 4, 'https://other.example/p/' || d FROM base
      UNION ALL
      SELECT d, h, CASE WHEN d % 3 = 0 THEN 6 ELSE 5 END,
             root || '/dir/page' || d || '?q=' || d
      FROM base WHERE d % 2 = 0
      UNION ALL
      SELECT d, h, 5 + CASE WHEN d % 3 = 0 THEN 1 ELSE 0 END
                     + CASE WHEN d % 2 = 0 THEN 1 ELSE 0 END,
             root || '/esc/' || d FROM base)
    SELECT d AS doc_id, link_idx, outlink FROM l
    """,
    doc="Outlink frontier discovery: href harvest (quote forms, entity "
    "decode, script/comment exclusion) -> RFC 3986 §5.2 resolution "
    "against the page URL -> scheme filter -> canonicalization; the "
    "oracle replays every resolved canonical outlink and its document "
    "position.",
)
def web_outlink_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl's discovery step, end to end and oracle-checked: every
    document becomes an HTML page at ``/dir/page{d}`` whose anchors
    exercise each resolution class in document order — a relative path
    (``g{d}``, §5.2.3 merge), a ``../`` climb, an absolute path
    carrying an ``&amp;``-escaped query (entity decode before
    resolution), a scheme-relative ``//cdn...``, a DIRTY absolute
    (mixed case, explicit :443, dot-segment, fragment — erased by
    ``url_canonicalize``), a ``javascript:`` link on ``d % 3 == 0``
    (filtered by scheme, which SHIFTS later indices — pinned by the
    oracle's CASE), a query-only ``?q={d}`` ref on even docs
    (resolves onto the page's own path), and — round 15 — a
    NUMERIC-escaped absolute path (``&#47;esc&#x2F;{d}``) exercising
    the bounded numeric-reference decode. ``html_links`` harvests,
    ``url_resolve`` resolves, the frontier keeps http(s) only, and the
    DuckDB oracle replays every (position, canonical outlink) pair.

    At 100 TB: one posexplode per page over pure-codegen extraction and
    resolution — the same stateless fused-scan shape as the WET
    extraction; the output IS the next crawl round's frontier input
    (dedup against it with web_frontier_delta_canonical)."""
    from ..functions.html import html_links
    from ..functions.url import url_canonicalize, url_resolve

    docs = t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    ds = d.cast("string")
    h = (d % 20).cast("string")
    root = F.concat(F.lit("https://site"), h, F.lit(".example"))
    page_url = F.concat(root, F.lit("/dir/page"), ds)
    html = F.concat(
        F.lit("<html><body><a href=\"g"), ds, F.lit("\">r</a>"),
        F.lit("<a href='../up/"), ds, F.lit("'>u</a>"),
        F.lit('<a href="/abs/'), ds, F.lit('?b=2&amp;a=1">a</a>'),
        F.lit('<a href="//cdn.example/x/'), ds, F.lit('">c</a>'),
        F.lit('<a href="HTTPS://Other.EXAMPLE:443/p/./'), ds,
        F.lit('#f">o</a>'),
        F.when(
            d % 3 == 0, F.lit('<a href="javascript:void(0)">j</a>')
        ).otherwise(F.lit("")),
        F.when(
            d % 2 == 0,
            F.concat(F.lit('<a href="?q='), ds, F.lit('">q</a>')),
        ).otherwise(F.lit("")),
        # round 15: a NUMERIC-escaped absolute path (&#47; / &#x2F;) —
        # the href that was an unfetchable verbatim string before the
        # bounded numeric-reference decode landed in html_links
        F.lit('<a href="&#47;esc&#x2F;'), ds, F.lit('">n</a>'),
        F.lit("</body></html>"),
    )
    pages = docs.select("doc_id", page_url.alias("page_url"), html.alias("html"))
    exploded = pages.select(
        "doc_id",
        "page_url",
        F.posexplode(html_links("html")).alias("link_idx", "href"),
    )
    # STAGE the resolved url as a real column before canonicalizing:
    # url_canonicalize references its input ~a dozen times, and a
    # single-expression composition would duplicate the whole resolve
    # tree into every reference (measured 14.4 s -> staged cost below);
    # as a multiply-referenced non-cheap alias, CollapseProject keeps
    # the projection boundary and the resolve runs once per row
    # the scheme filter runs on the STAGED column too: a filter on the
    # canonical alias would substitute the whole canonicalize tree into
    # the pushed-down predicate and evaluate it twice per row (the
    # scheme is fixed at resolution; canonicalize only lowercases it)
    return (
        exploded.select(
            "doc_id",
            F.col("link_idx").cast("bigint"),
            url_resolve("page_url", "href").alias("__resolved"),
        )
        .filter(F.col("__resolved").rlike(r"(?i)^https?://"))
        .select(
            "doc_id",
            "link_idx",
            url_canonicalize(F.col("__resolved")).alias("outlink"),
        )
    )


def cache_freshness(resp: DataFrame, as_of, headers_col: str = "http_headers") -> DataFrame:
    """RFC 9111 §4.2 freshness over archived responses: per row compute
    ``freshness_lifetime`` (max-age directive first, else Expires − Date
    — §4.2.1's explicit forms; NULL means only a heuristic would apply,
    surfaced rather than guessed), ``current_age`` (the archive
    simplification of §4.2.3: the Age header plus the wall time since
    the response's Date, both from stored bytes), and ``fresh`` —
    lifetime known, age strictly under it, and no ``no-store``/
    ``no-cache`` directive (either forces revalidation regardless of
    age). ``as_of`` is the evaluation instant in epoch seconds — an
    explicit column/literal so the decision is reproducible (and the
    oracle can replay it), never a hidden now(). Adds the parsed
    columns; pure Catalyst.

    Documented conservative choice: a QUALIFIED ``no-cache`` —
    ``no-cache="set-cookie"`` — is treated as unqualified, i.e. full
    revalidation, although RFC 9111 §5.2.2.4 scopes the qualified form
    to the listed fields only (a cache may serve the response with
    those fields stripped). A crawler never serves stripped responses,
    so the field-scoped semantics buy nothing here and the strict
    reading only costs extra refetches — flip to
    cacheable-with-field-strip only if a serving cache is ever built
    on this function."""
    from ..functions.http import http_age, http_cache_control, http_date

    as_of_c = F.lit(as_of) if isinstance(as_of, int) else as_of
    date_ts = http_date(headers_col, "Date")
    expires_ts = http_date(headers_col, "Expires")
    # http_cache_control returns the directive NAME for boolean-style
    # presence (including a non-numeric argument, legal per RFC 9111
    # §5.2.2) — try_cast keeps ANSI mode from throwing on it without
    # duplicating the extraction tree into an rlike gate
    max_age = http_cache_control(headers_col, "max-age").try_cast("bigint")
    no_store = (
        http_cache_control(headers_col, "no-store").isNotNull()
        | http_cache_control(headers_col, "no-cache").isNotNull()
    )
    lifetime = F.coalesce(max_age, expires_ts - date_ts)
    age = F.coalesce(http_age(headers_col), F.lit(0)) + (as_of_c - date_ts)
    fresh = (
        ~no_store
        & lifetime.isNotNull()
        & date_ts.isNotNull()
        & (age < lifetime)
    )
    return (
        resp.withColumn("date_ts", date_ts)
        .withColumn("freshness_lifetime_s", lifetime)
        .withColumn("current_age_s", F.when(date_ts.isNotNull(), age))
        .withColumn("no_store", no_store)
        .withColumn("fresh", fresh)
    )


@register(
    "web_cache_freshness",
    oracle="""
    WITH base AS (
      SELECT doc_id AS d,
             CAST(epoch(TIMESTAMP '2026-01-01 00:00:00') AS BIGINT)
               AS date_ts
      FROM documents),
    m AS (
      SELECT d, date_ts,
             CASE WHEN d % 3 = 0 THEN 600 * (1 + d % 5)
                  WHEN d % 3 = 1 THEN 3600 END AS lifetime,
             CASE WHEN d % 4 = 0 THEN (d % 7) * 10 ELSE 0 END + 1800
               AS age,
             d % 11 = 3 AS no_store
      FROM base)
    SELECT 'https://c.example/p/' || d AS url,
           date_ts,
           CAST(lifetime AS BIGINT) AS freshness_lifetime_s,
           CAST(age AS BIGINT) AS current_age_s,
           no_store,
           (NOT no_store AND lifetime IS NOT NULL AND age < lifetime)
             AS fresh
    FROM m
    """,
    doc="RFC 9111 freshness: max-age / Expires-Date lifetime, Age + "
    "elapsed current age, no-store/no-cache override — all parsed from "
    "raw header blocks in Catalyst; the oracle replays every lifetime, "
    "age, and verdict.",
)
def web_cache_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The don't-refetch-what's-fresh decision, end to end and
    oracle-checked: every document becomes a stored response whose raw
    header block carries a fixed IMF-fixdate Date plus scheduled cache
    metadata — a ``max-age`` directive (``600 * (1 + d % 5)``, embedded
    in a multi-directive Cache-Control list with ``public`` noise) on
    ``d % 3 == 0``, an Expires one hour past Date on ``d % 3 == 1``,
    neither on the rest (lifetime NULL — only a heuristic would apply,
    and the engine surfaces that instead of inventing one), an Age
    header on ``d % 4 == 0``, and ``no-store`` on ``d % 11 == 3``.
    Evaluated at Date + 1800 s: the short max-ages are stale, the long
    ones fresh (strict <; the 1800-lifetime row pins the boundary), the
    Expires rows fresh unless no-store. ``http_date`` parses the
    IMF-fixdate as a real zoned instant, so a session-timezone bug
    breaks every row.

    At 100 TB: pure codegen over the already-split header strings —
    composes with web_revalidation_plan (freshness says WHETHER to
    revalidate, the plan says HOW)."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    ds = d.cast("string")
    date_line = F.lit("Date: Thu, 01 Jan 2026 00:00:00 GMT\r\n")
    cc = F.when(
        d % 3 == 0,
        F.concat(
            F.lit("Cache-Control: public, max-age="),
            (600 * (1 + d % 5)).cast("string"),
            F.when(d % 11 == 3, F.lit(", no-store")).otherwise(F.lit("")),
            F.lit("\r\n"),
        ),
    ).when(
        d % 11 == 3, F.lit("Cache-Control: no-store\r\n")
    ).otherwise(F.lit(""))
    expires = F.when(
        d % 3 == 1, F.lit("Expires: Thu, 01 Jan 2026 01:00:00 GMT\r\n")
    ).otherwise(F.lit(""))
    age = F.when(
        d % 4 == 0,
        F.concat(F.lit("Age: "), ((d % 7) * 10).cast("string"), F.lit("\r\n")),
    ).otherwise(F.lit(""))
    hdr = F.concat(
        F.lit("HTTP/1.1 200 OK\r\n"), date_line, cc, expires, age,
        F.lit("Content-Type: text/html"),
    )
    resp = docs.select(
        F.concat(F.lit("https://c.example/p/"), ds).alias("url"),
        hdr.alias("http_headers"),
    )
    # 2026-01-01T00:00:00Z + 1800 s, computed not hard-coded
    as_of = 1800 + int(
        __import__("calendar").timegm((2026, 1, 1, 0, 0, 0))
    )
    return cache_freshness(resp, as_of).select(
        "url",
        "date_ts",
        "freshness_lifetime_s",
        "current_age_s",
        "no_store",
        "fresh",
    )


def recrawl_fetch_actions(
    resp: DataFrame, as_of, headers_col: str = "http_headers"
) -> DataFrame:
    """The STATELESS prefix of the recrawl plan — per stored response,
    independent of every other row: RFC 9111 freshness
    (``cache_freshness``) then the RFC 9110 validator choice for the
    stale mass (stored ETag -> If-None-Match takes precedence over
    Last-Modified -> If-Modified-Since, else an unconditional fetch).
    Adds ``action``/``cond_header``/``cond_value`` to the freshness
    columns. Factored out of ``recrawl_fetch_list`` because this half
    is append-mode streamable as-is (pure codegen, no window): fetched
    rows can be classified AT INGEST; only the per-domain politeness
    ORDERING — scheduling, inherently a rank over the assembled stale
    set — stays batch-side in ``recrawl_fetch_list``. The stream==batch
    parity twin pins exactly this split."""
    from ..functions.http import http_header

    f = cache_freshness(resp, as_of, headers_col=headers_col)
    etag = http_header(headers_col, "ETag")
    lastmod = http_header(headers_col, "Last-Modified")
    action = (
        F.when(F.col("fresh"), F.lit("skip"))
        .when(etag.isNotNull(), F.lit("conditional_etag"))
        .when(lastmod.isNotNull(), F.lit("conditional_modified"))
        .otherwise(F.lit("full"))
    )
    cond_header = (
        F.when(F.col("action") == "conditional_etag", F.lit("If-None-Match"))
        .when(
            F.col("action") == "conditional_modified",
            F.lit("If-Modified-Since"),
        )
    )
    cond_value = F.when(
        F.col("action") == "conditional_etag", etag
    ).when(F.col("action") == "conditional_modified", lastmod)
    return f.withColumn("action", action).withColumn(
        "cond_header", cond_header
    ).withColumn("cond_value", cond_value)


def recrawl_fetch_list(
    resp: DataFrame, delays: DataFrame, as_of, headers_col: str = "http_headers"
) -> DataFrame:
    """The composed recrawl artifact a fetcher executes: freshness
    first (RFC 9111 — a fresh stored copy is never refetched), then the
    cheapest correct fetch for the stale mass (RFC 9110 validator
    precedence: a stored ETag -> If-None-Match, else a stored
    Last-Modified -> If-Modified-Since, else an unconditional fetch),
    then Crawl-delay politeness ordering per domain (fetch_order by
    url — deterministic — and est_start_s = (order-1) x delay). Fresh
    urls STAY VISIBLE as ``skip`` rows with NULL order; a fetch list
    that silently drops the skip mass cannot be audited against the
    frontier. Inputs: ``resp (url, domain, <headers_col>)``, ``delays
    (domain, delay)``, ``as_of`` epoch seconds.

    At 100 TB: freshness and validator choice are codegen over the
    stored header strings; the only shuffle is the per-domain window
    over the STALE subset, plus a broadcast of the delay dim."""
    staged = recrawl_fetch_actions(resp, as_of, headers_col=headers_col)
    w = Window.partitionBy("domain").orderBy("url")
    # rank only the stale mass: fresh rows carry no order, and the
    # window runs over the stale subset so skips never burn slots
    stale = staged.filter(F.col("action") != "skip").withColumn(
        "fetch_order", F.row_number().over(w).cast("bigint")
    )
    fresh_rows = staged.filter(F.col("action") == "skip").withColumn(
        "fetch_order", F.lit(None).cast("bigint")
    )
    ranked = stale.unionByName(fresh_rows)
    d = delays.select("domain", F.col("delay").alias("__delay"))
    out = ranked.join(broadcast(d), "domain", "left")
    est = (F.col("fetch_order") - 1) * F.coalesce(
        F.col("__delay"), F.lit(1.0)
    )
    return out.select(
        "url",
        "domain",
        "fresh",
        "action",
        "cond_header",
        "cond_value",
        "fetch_order",
        est.alias("est_start_s"),
    )


@register(
    "web_recrawl_fetch_list",
    oracle="""
    WITH base AS (
      SELECT doc_id AS d, doc_id % 20 AS h,
             'https://site' || (doc_id % 20) || '.example/p/' || doc_id
               AS url
      FROM documents),
    m AS (
      SELECT d, h, url,
             CASE WHEN d % 3 = 0 THEN 600 * (1 + d % 5)
                  WHEN d % 3 = 1 THEN 3600 END AS lifetime,
             CASE WHEN d % 4 = 0 THEN (d % 7) * 10 ELSE 0 END + 1800
               AS age,
             d % 11 = 3 AS no_store,
             d % 3 = 0 AS has_etag,
             d % 2 = 0 AS has_lm
      FROM base),
    fr AS (
      SELECT *,
             (NOT no_store AND lifetime IS NOT NULL AND age < lifetime)
               AS fresh
      FROM m),
    act AS (
      SELECT *,
             CASE WHEN fresh THEN 'skip'
                  WHEN has_etag THEN 'conditional_etag'
                  WHEN has_lm THEN 'conditional_modified'
                  ELSE 'full' END AS action
      FROM fr),
    ranked AS (
      SELECT *,
             CASE WHEN action != 'skip' THEN
               ROW_NUMBER() OVER (
                 PARTITION BY h,
                   CASE WHEN action = 'skip' THEN 1 ELSE 0 END
                 ORDER BY url)
             END AS fetch_order
      FROM act),
    delay AS (
      SELECT DISTINCT h,
             CASE WHEN h % 3 = 0 THEN 2.5 ELSE 1.0 END AS delay
      FROM base)
    SELECT url, 'site' || h || '.example' AS domain, fresh, action,
           CASE action WHEN 'conditional_etag' THEN 'If-None-Match'
                WHEN 'conditional_modified' THEN 'If-Modified-Since'
           END AS cond_header,
           CASE action WHEN 'conditional_etag' THEN '"e' || d || '"'
                WHEN 'conditional_modified'
                  THEN 'Thu, 01 Jan 2026 00:00:00 GMT'
           END AS cond_value,
           CAST(fetch_order AS BIGINT) AS fetch_order,
           (fetch_order - 1) * delay AS est_start_s
    FROM ranked JOIN delay USING (h)
    """,
    doc="The composed recrawl artifact: RFC 9111 freshness gate -> "
    "RFC 9110 validator choice for the stale mass -> Crawl-delay "
    "politeness ordering per domain, fresh urls visible as skip rows; "
    "the oracle replays every action, validator value, rank, and "
    "start offset.",
)
def web_recrawl_fetch_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Everything the caching layer exists for, composed and
    oracle-checked: the stored responses reuse web_cache_freshness's
    header schedules (max-age / Expires / Age / no-store) PLUS an ETag
    on ``d % 3 == 0`` (exactly the max-age rows — so stale short-max-age
    pages revalidate by entity validator) and a Last-Modified on even
    docs; the per-domain delay dim advertises 2.5 s on ``h % 3 == 0``
    domains, 1 s elsewhere. ``recrawl_fetch_list`` gates on freshness,
    picks If-None-Match over If-Modified-Since per RFC 9110, ranks ONLY
    the stale mass per domain, and prices each slot at (order-1) x
    delay. The DuckDB oracle replays every decision relationally —
    a fetcher could execute either side's output verbatim.

    At 100 TB: codegen + one stale-subset window per domain + one
    broadcast dim — the skip mass costs a filter."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    ds = d.cast("string")
    h = d % 20
    date_line = F.lit("Date: Thu, 01 Jan 2026 00:00:00 GMT\r\n")
    cc = F.when(
        d % 3 == 0,
        F.concat(
            F.lit("Cache-Control: public, max-age="),
            (600 * (1 + d % 5)).cast("string"),
            F.when(d % 11 == 3, F.lit(", no-store")).otherwise(F.lit("")),
            F.lit("\r\n"),
        ),
    ).when(
        d % 11 == 3, F.lit("Cache-Control: no-store\r\n")
    ).otherwise(F.lit(""))
    expires = F.when(
        d % 3 == 1, F.lit("Expires: Thu, 01 Jan 2026 01:00:00 GMT\r\n")
    ).otherwise(F.lit(""))
    age = F.when(
        d % 4 == 0,
        F.concat(F.lit("Age: "), ((d % 7) * 10).cast("string"), F.lit("\r\n")),
    ).otherwise(F.lit(""))
    etag = F.when(
        d % 3 == 0,
        F.concat(F.lit('ETag: "e'), ds, F.lit('"\r\n')),
    ).otherwise(F.lit(""))
    lm = F.when(
        d % 2 == 0,
        F.lit("Last-Modified: Thu, 01 Jan 2026 00:00:00 GMT\r\n"),
    ).otherwise(F.lit(""))
    hdr = F.concat(
        F.lit("HTTP/1.1 200 OK\r\n"), date_line, cc, expires, age, etag, lm,
        F.lit("Content-Type: text/html"),
    )
    resp = docs.select(
        F.concat(
            F.lit("https://site"), h.cast("string"), F.lit(".example/p/"), ds
        ).alias("url"),
        F.concat(F.lit("site"), h.cast("string"), F.lit(".example")).alias(
            "domain"
        ),
        hdr.alias("http_headers"),
    # lazy checkpoint between synthesis and parse (round 16): every one
    # of the freshness/validator tower's ~270 header references inlined
    # the whole synthetic hdr concat tree (115 KB formatted plan, ~3 s
    # of optimizer time per action measured via the analyze/execute
    # split) — the cut makes each reference a plain column read of the
    # 3-column dim-scale log
    ).localCheckpoint(eager=False)
    delays = (
        docs.select(h.alias("h"))
        .distinct()
        .select(
            F.concat(
                F.lit("site"), F.col("h").cast("string"), F.lit(".example")
            ).alias("domain"),
            F.when(F.col("h") % 3 == 0, F.lit(2.5))
            .otherwise(F.lit(1.0))
            .alias("delay"),
        )
    )
    as_of = 1800 + int(__import__("calendar").timegm((2026, 1, 1, 0, 0, 0)))
    return recrawl_fetch_list(resp, delays, as_of)


def page_robots_directives(
    pages: DataFrame, html_col: str = "html", headers_col: str | None = None
) -> DataFrame:
    """Page-level robots semantics, merged the way crawlers must merge
    them: the ``<meta name=robots>`` content and (when ``headers_col``
    names the stored HTTP header block) the ``X-Robots-Tag`` header
    both carry comma-separated directives, and the effective rule is
    the RESTRICTIVE UNION — ``noindex``/``nofollow`` bind if EITHER
    source says so (obeying only one channel is how pages leak into
    indexes). Adds ``indexable`` and ``followable`` booleans. Token
    matching is list-boundary-anchored, so a hypothetical
    ``nofollowup`` token never reads as ``nofollow``."""
    from ..functions.html import html_meta_content
    from ..functions.http import http_header

    meta = F.lower(
        F.coalesce(html_meta_content(html_col, "robots"), F.lit(""))
    )
    xrt = (
        F.lower(F.coalesce(http_header(headers_col, "X-Robots-Tag"), F.lit("")))
        if headers_col
        else F.lit("")
    )
    both = F.concat(meta, F.lit(","), xrt)
    tok = lambda t: both.rlike(rf"(^|[,\s]){t}($|[,\s])")  # noqa: E731
    return pages.withColumn("indexable", ~tok("noindex")).withColumn(
        "followable", ~tok("nofollow")
    )


@register(
    "web_page_robots",
    oracle="""
    WITH d AS (SELECT doc_id AS d FROM documents),
    m AS (
      SELECT d,
             d % 4 IN (1, 3) AS meta_noindex,
             d % 4 IN (2, 3) AS meta_nofollow,
             d % 7 = 2 AS hdr_noindex
      FROM d)
    SELECT d AS doc_id,
           NOT (meta_noindex OR hdr_noindex) AS indexable,
           NOT meta_nofollow AS followable,
           CAST(3 AS BIGINT) AS n_links,
           CAST(CASE WHEN meta_nofollow THEN 0 ELSE 2 END AS BIGINT)
             AS n_followed
    FROM m
    """,
    doc="Page-level robots: meta name=robots UNION X-Robots-Tag "
    "(restrictive merge), rel=nofollow excluded per link, page-level "
    "nofollow zeroing the followed set; the oracle replays every bit.",
)
def web_page_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The page-level politeness layer, end to end and oracle-checked:
    every document becomes a page whose ``<meta name=robots>`` carries
    ``noindex`` (``d % 4 == 1``), ``nofollow`` (``d % 4 == 2``), both
    (``d % 4 == 3``), or nothing — while the stored HTTP header block
    ADDS ``X-Robots-Tag: noindex`` on ``d % 7 == 2`` (the overlap rows
    pin the restrictive union: a meta-clean page with a header noindex
    must NOT be indexable). Each page carries three links, one
    ``rel=nofollow``: the followed count is 2 on followable pages and 0
    on page-level-nofollow pages (link-level and page-level opt-outs
    compose). The DuckDB oracle replays every bit and count.

    At 100 TB: pure codegen over the page scan — the same fused shape
    as the link harvest it composes with."""
    from ..functions.html import html_links_followable

    docs = t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    ds = d.cast("string")
    meta = (
        F.when(d % 4 == 1, F.lit('<meta name="robots" content="noindex">'))
        .when(d % 4 == 2, F.lit('<meta name="robots" content="nofollow">'))
        .when(
            d % 4 == 3,
            F.lit('<meta name="robots" content="noindex, nofollow">'),
        )
        .otherwise(F.lit(""))
    )
    html = F.concat(
        F.lit("<head>"), meta, F.lit("</head><body>"),
        F.lit('<a href="/a/'), ds, F.lit('">a</a>'),
        F.lit('<a rel="nofollow" href="/n/'), ds, F.lit('">n</a>'),
        F.lit('<a href="/b/'), ds, F.lit('">b</a></body>'),
    )
    hdr = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html"),
        F.when(d % 7 == 2, F.lit("\r\nX-Robots-Tag: noindex")).otherwise(
            F.lit("")
        ),
    )
    pages = docs.select(
        "doc_id", html.alias("html"), hdr.alias("http_headers")
    )
    out = page_robots_directives(
        pages, html_col="html", headers_col="http_headers"
    )
    from ..functions.html import html_links

    return out.select(
        "doc_id",
        "indexable",
        "followable",
        F.size(html_links("html")).cast("bigint").alias("n_links"),
        F.when(
            F.col("followable"),
            F.size(html_links_followable("html")).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("n_followed"),
    )


def robots_refetch_list(
    fetch_log: DataFrame,
    as_of,
    headers_col: str = "http_headers",
    response_index: DataFrame | None = None,
) -> DataFrame:
    """RFC 9309 §2.4 robots.txt cache lifetime, composed the same way
    ``recrawl_fetch_list`` composes the page-side caching layer: the
    spec lets crawlers cache a robots.txt (conventionally up to 24
    hours, "or longer if ... based on standard cache-control"), so the
    effective lifetime is the header-derived one when the stored
    response carries Cache-Control/Expires (``cache_freshness``) and
    the 86 400 s conventional default when the headers are silent;
    ``no-store``/``no-cache`` force refetch. Input is one row per
    DOMAIN — (domain, url, status, location, ``<headers_col>``), the
    robots fetch log. Redirect chains resolve first
    (``resolve_redirects`` — §2.3.1.2's five-hop follow), the terminal
    maps to the §2.3.1 assumption (``robots_fetch_mode``: parse /
    allow_all / deny_all), and the CACHED ARTIFACT — the parsed file
    or the fallback assumption alike — expires under the same clock
    (documented choice: the spec's cache language covers the file;
    applying it uniformly to the assumption rows keeps unreachable
    hosts re-probed instead of denied forever). A missing/unparseable
    Date makes the age unknowable — conservative refetch, surfaced not
    guessed.

    At 100 TB: the robots fetch log is domains-sized; everything here
    is dim-scale joins and codegen column maps — the refetch list is
    the tiny input a scheduler merges ahead of the page-side fetch
    list.

    ``response_index`` (optional) is the streaming shape, same
    snapshot discipline as ``resolve_redirects(response_index=...)``:
    the redirect resolution AND the mode table derive from the static
    index, so an arriving robots-fetch row classifies via one
    stream-static equi-join on url — append-mode legal; the freshness
    arithmetic is per-row codegen either way. Default ``None`` keeps
    the batch semantics where the log indexes itself (parity pinned in
    tests/test_streaming.py)."""
    mode_src = response_index if response_index is not None else fetch_log
    resolved = resolve_redirects(
        mode_src.select("url", "status", "location"),
        response_index=response_index,
    )
    modes = robots_fetch_mode(resolved).select(
        "url", "terminal_status", "mode"
    )
    f = cache_freshness(
        fetch_log.join(modes, "url"), as_of, headers_col=headers_col
    )
    lifetime = F.coalesce(
        F.col("freshness_lifetime_s"), F.lit(86400)
    ).cast("bigint")
    staged = f.withColumn("lifetime_s", lifetime)
    refetch = F.col("no_store") | F.coalesce(
        F.col("current_age_s") >= F.col("lifetime_s"), F.lit(True)
    )
    return staged.withColumn("refetch", refetch)


@register(
    "web_robots_refetch",
    oracle="""
    WITH d AS (SELECT DISTINCT doc_id % 20 AS h FROM documents),
    m AS (
      SELECT h,
             CASE WHEN h % 5 = 0 THEN 'allow_all'
                  WHEN h % 5 = 1 THEN 'deny_all'
                  ELSE 'parse' END AS mode,
             CASE WHEN h % 3 = 0 THEN 7200 ELSE 86400 END AS lifetime,
             CASE WHEN h % 2 = 0 THEN 43200 ELSE 216000 END AS age,
             h % 4 = 2 AS no_store
      FROM d)
    SELECT 'site' || h || '.example' AS domain,
           mode,
           CAST(lifetime AS BIGINT) AS lifetime_s,
           CAST(age AS BIGINT) AS age_s,
           (no_store OR age >= lifetime) AS refetch
    FROM m
    """,
    doc="RFC 9309 §2.4 robots.txt cache lifetime: Cache-Control "
    "honored when present, the 24 h conventional default when silent, "
    "no-store forces refetch, fetch-status assumptions expire on the "
    "same clock; the oracle replays every domain's verdict.",
)
def web_robots_refetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The robots-side recrawl artifact, end to end and oracle-checked:
    each of the 20 synth domains' stored robots fetch carries a
    scheduled Date (12 h old on even domains, 2.5 days on odd), a
    ``Cache-Control: max-age=7200`` on ``h % 3 == 0`` (shortening the
    24 h convention per §2.4), ``no-store`` on ``h % 4 == 2``, and a
    fetch status (404 -> allow_all on ``h % 5 == 0``, 503 -> deny_all
    on ``h % 5 == 1``, else 200 -> parse). ``robots_refetch_list``
    resolves status to the §2.3.1 mode, computes freshness from the
    stored headers, applies the default-lifetime rule, and flags the
    refetch set: short-max-age domains and stale odd domains refetch,
    no-store always refetches, 12-h-old default-lifetime domains do
    not. The DuckDB oracle replays every verdict arithmetically.

    At 100 TB: domains-sized input, codegen decisions — the robots
    cache never touches the URL fact table."""
    hosts = (
        t(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 20).alias("h"))
        .distinct()
    )
    h = F.col("h")
    hs = h.cast("string")
    date_line = F.when(
        h % 2 == 0, F.lit("Date: Thu, 01 Jan 2026 00:00:00 GMT\r\n")
    ).otherwise(F.lit("Date: Tue, 30 Dec 2025 00:00:00 GMT\r\n"))
    cc = (
        F.when(
            (h % 3 == 0) & (h % 4 == 2),
            F.lit("Cache-Control: max-age=7200, no-store\r\n"),
        )
        .when(h % 3 == 0, F.lit("Cache-Control: max-age=7200\r\n"))
        .when(h % 4 == 2, F.lit("Cache-Control: no-store\r\n"))
        .otherwise(F.lit(""))
    )
    status = (
        F.when(h % 5 == 0, F.lit(404))
        .when(h % 5 == 1, F.lit(503))
        .otherwise(F.lit(200))
    )
    fetch_log = hosts.select(
        F.concat(F.lit("site"), hs, F.lit(".example")).alias("domain"),
        F.concat(F.lit("https://site"), hs, F.lit(".example/robots.txt")).alias(
            "url"
        ),
        status.alias("status"),
        F.lit(None).cast("string").alias("location"),
        F.concat(
            F.lit("HTTP/1.1 200 OK\r\n"),
            date_line,
            cc,
            F.lit("Content-Type: text/plain"),
        ).alias("http_headers"),
    )
    as_of = 43200 + int(__import__("calendar").timegm((2026, 1, 1, 0, 0, 0)))
    out = robots_refetch_list(fetch_log, as_of)
    return out.select(
        "domain",
        "mode",
        "lifetime_s",
        F.col("current_age_s").alias("age_s"),
        "refetch",
    )


def persist_surt_index(urls: DataFrame, out_dir: str) -> None:
    """Persist a URL store keyed for PER-SITE range reads — SURT as an
    access path, not just a key (the cc-index layout): canonicalize
    (RFC 3986 §6), derive the SURT key, and extract ``site_key`` — the
    reversed-host section of the SURT WITHOUT the port (ports are
    different services but a site read wants both, so they group under
    the host; the full key still orders them apart). The store writes
    ``partitionBy(site_key)`` parquet with rows SORTED by ``surt_key``
    within each partition — every site is its own directory holding a
    SURT-ordered run, so a per-site scan is a directory read (parquet
    partition pruning; asserted in tests/test_surt_index.py) and a
    key-range probe within a site never sorts.

    The same physical-layout-is-the-index pattern as
    ``plans/ann_index.py``'s cell store: pay the shuffle once at
    publish, then every per-site access lists one directory out of
    millions instead of shuffling the 100 TB URL fact table."""
    from ..functions.url import url_canonicalize, url_surt

    # stage canonical url, then the surt key, as REAL columns —
    # url_surt references its input several times (the measured
    # expression-blowup lesson at web_url_surt_keys)
    staged = urls.select(
        "*", url_canonicalize(F.col("url")).alias("__c")
    ).select(
        *[c for c in urls.columns],
        url_surt(F.col("__c")).alias("surt_key"),
    )
    keyed = staged.withColumn(
        "site_key", F.regexp_extract("surt_key", r"^([^):]*)[):]", 1)
    )
    # sort by (site_key, surt_key): the dynamic-partition writer
    # REQUIRES an ordering on the partition column and would insert its
    # own (unstable) sort if the data didn't already satisfy it —
    # destroying the surt order; leading with site_key makes the
    # existing sort satisfy the requirement, so the per-site surt run
    # survives into the files
    (
        keyed.repartition("site_key")
        .sortWithinPartitions("site_key", "surt_key")
        .write.mode("overwrite")
        .partitionBy("site_key")
        .parquet(out_dir)
    )


def surt_site_read(
    spark: SparkSession, idx_dir: str, site_key: str
) -> DataFrame:
    """Read ONE site's rows from a ``persist_surt_index`` store. The
    equality filter on the partition column prunes at PLANNING time —
    the scan lists exactly one directory (PartitionFilters in the
    plan; file-level assertion in tests/test_surt_index.py) and rows
    arrive in SURT order within each file."""
    return spark.read.parquet(idx_dir).filter(
        F.col("site_key") == site_key
    )


# per-process memo: sf_dir -> temp dir holding the persisted SURT store
# (the retrieval._SERVED_WORK pattern: dies with the process, amortizes
# across a bench/driver session like production's once-per-release build)
_SURT_WORK: dict[str, str] = {}


def _surt_store(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    key = os.path.abspath(sf_dir)
    work = _SURT_WORK.get(key)
    if work is None:
        work = tempfile.mkdtemp(prefix="surt_index_")
        docs = t(spark, sf_dir, "documents").select("doc_id")
        d = F.col("doc_id")
        h = (d % 20).cast("string")
        url = F.concat(
            F.lit("https://WWW.Site"), h, F.lit(".EXAMPLE"),
            F.when(d % 5 == 1, F.lit(":8080")).otherwise(F.lit("")),
            F.lit("/a/"), d.cast("string"),
            F.when(d % 3 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
        )
        persist_surt_index(
            docs.select("doc_id", url.alias("url")), os.path.join(work, "surt")
        )
        _SURT_WORK[key] = work
    return os.path.join(work, "surt")


@register(
    "web_surt_site_read",
    oracle="""
    WITH d AS (SELECT doc_id AS d FROM documents WHERE doc_id % 20 = 3)
    SELECT d AS doc_id,
           'https://WWW.Site3.EXAMPLE' ||
             CASE WHEN d % 5 = 1 THEN ':8080' ELSE '' END ||
             '/a/' || d ||
             CASE WHEN d % 3 = 0 THEN '?b=2&a=1' ELSE '' END AS url,
           'example,site3' ||
             CASE WHEN d % 5 = 1 THEN ':8080' ELSE '' END ||
             ')/a/' || d ||
             CASE WHEN d % 3 = 0 THEN '?a=1&b=2' ELSE '' END AS surt_key,
           'example,site3' AS site_key
    FROM d
    """,
    doc="SURT as an access path: the persisted site-partitioned URL "
    "store read back for ONE site via partition pruning (one directory "
    "listed, not a fact-table shuffle); the oracle replays the site's "
    "rows from the url schedule.",
)
def web_surt_site_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The read half of the SURT index cycle, end to end and
    oracle-checked: the dirty-url schedule from ``web_url_surt_keys``
    persists once per process as a ``site_key``-partitioned,
    SURT-sorted parquet store (``persist_surt_index`` — the publish
    shuffle), and this query performs the per-site access a cc-index
    serves: read ``site3``'s directory (ports included — ``:8080``
    rows group under the host by design), every row carrying the full
    SURT key. The plan prunes to one partition directory
    (tests/test_surt_index.py asserts the file list); the DuckDB
    oracle replays the site's membership and keys arithmetically.

    At 100 TB: the publish pays one shuffle by site; every later
    per-site read lists one directory — the difference between a
    range scan and a full-index shuffle, same argument as the IVF
    cell store."""
    idx = _surt_store(spark, sf_dir)
    out = surt_site_read(spark, idx, "example,site3")
    return out.select("doc_id", "url", "surt_key", "site_key")


def surt_prefix_read(
    spark: SparkSession, idx_dir: str, site_key: str, key_prefix: str
) -> DataFrame:
    """The range half of the SURT access path: one site's directory
    (partition-pruned, as ``surt_site_read``) further narrowed to a
    SURT KEY PREFIX — a per-path-subtree probe. Because the store's
    files hold surt-sorted runs, the ``startswith`` predicate reaches
    the parquet scan (``PushedFilters: StringStartsWith(surt_key``,
    plan-gated) where row-group min/max stats skip non-overlapping
    ranges — at cc-index scale the difference between reading a path
    subtree and reading the site."""
    return spark.read.parquet(idx_dir).filter(
        (F.col("site_key") == site_key)
        & F.col("surt_key").startswith(key_prefix)
    )


@register(
    "web_surt_prefix_read",
    oracle="""
    WITH d AS (SELECT doc_id AS d FROM documents
               WHERE doc_id % 20 = 3 AND CAST(doc_id AS VARCHAR) LIKE '1%')
    SELECT d AS doc_id,
           'https://WWW.Site3.EXAMPLE/a/' || d ||
             CASE WHEN d % 3 = 0 THEN '?b=2&a=1' ELSE '' END AS url,
           'example,site3)/a/' || d ||
             CASE WHEN d % 3 = 0 THEN '?a=1&b=2' ELSE '' END AS surt_key,
           'example,site3' AS site_key
    FROM d
    """,
    doc="SURT range probe: partition prune to one site, then a surt_key "
    "prefix predicate pushed to the parquet scan (row-group stats over "
    "sorted runs); the oracle replays the subtree membership.",
)
def web_surt_prefix_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The path-subtree read a cc-index serves, end to end and
    oracle-checked: the per-process SURT store (same build as
    ``web_surt_site_read``) probed for site3's ``/a/1...`` key range —
    partition pruning lists one directory, the prefix predicate lands
    in PushedFilters over the sorted run. The DuckDB oracle replays
    the subtree membership arithmetically.

    At 100 TB: partition prune (directory) x row-group prune (sorted
    min/max) is what turns a trillion-row URL index into a two-level
    seek — the read cost tracks the SUBTREE size, not the site or the
    corpus."""
    idx = _surt_store(spark, sf_dir)
    out = surt_prefix_read(
        spark, idx, "example,site3", "example,site3)/a/1"
    )
    return out.select("doc_id", "url", "surt_key", "site_key")


def surt_batch_lookup(
    spark: SparkSession,
    idx_dir: str,
    queries: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Batched CDX-style lookup over a ``persist_surt_index`` store —
    the production access pattern ``surt_site_read`` and
    ``surt_prefix_read`` are single-key special cases of: "here are N
    URLs — which are captured, and where?". The query side
    canonicalizes (RFC 3986 §6) and derives (surt_key, site_key)
    exactly as the publish side did, then BROADCASTS into an equi-join
    on ``(site_key, surt_key)``. Because ``site_key`` is the store's
    partition column and the build side is a broadcast, Spark's dynamic
    partition pruning turns the broadcast keys into the scan's
    PartitionFilters — the store lists ONLY the site directories the
    query batch touches (plan- and file-level gates in
    tests/test_surt_index.py), and within each directory the surt-
    sorted runs keep row-group stats tight. Output: one row per HIT —
    ``query_url`` beside the stored row; misses simply don't match
    (anti-join the result against the queries for a miss list).

    At 100 TB: the query batch is 10^4-ish rows against a 10^12-row
    store — without DPP this is a full-store scan per lookup batch;
    with it the cost tracks the number of DISTINCT QUERY SITES, the
    same directory-read argument as the single-site path."""
    from ..functions.url import url_canonicalize, url_surt

    q = queries.select(
        F.col(url_col).alias("query_url"),
        url_canonicalize(F.col(url_col)).alias("__c"),
    ).select(
        "query_url", url_surt(F.col("__c")).alias("q_surt")
    ).withColumn(
        "q_site", F.regexp_extract("q_surt", r"^([^):]*)[):]", 1)
    )
    # Two load-bearing lines, both measured (round 16, sf0.1, 32 cores):
    # the lazy checkpoint cuts the canonicalize/surt expression towers
    # out of the join's optimizer view — joining on the raw expressions
    # triggers Catalyst's constraint-propagation substitution blowup
    # (~12-14 s of PLANNING per action vs 0.6 s with the lineage cut;
    # disabling spark.sql.constraintPropagation confirms the attribution
    # but is a session-wide hammer, rejected). The filter is not
    # decoration: dynamic partition pruning only triggers when the build
    # side carries a selective (non-IsNotNull) predicate, and a bare
    # checkpointed RDD has none — without it the store scan silently
    # reverts to listing every site directory (measured, plan-gated in
    # tests/test_surt_index.py). The query batch is lookup-sized by
    # contract, so materializing it is O(batch).
    q = q.localCheckpoint(eager=False).filter(F.col("q_surt") != "")
    store = spark.read.parquet(idx_dir)
    hits = store.join(
        F.broadcast(q),
        (store["site_key"] == q["q_site"])
        & (store["surt_key"] == q["q_surt"]),
    )
    return hits.select("query_url", *[store[c] for c in store.columns])


@register(
    "web_surt_batch_lookup",
    oracle="""
    WITH a AS (SELECT doc_id AS d, 3 AS h FROM documents
               WHERE doc_id % 20 = 3 AND doc_id % 6 = 3),
    b AS (SELECT doc_id AS d, 7 AS h FROM documents
          WHERE doc_id % 20 = 7 AND doc_id % 3 = 1),
    hits AS (
      SELECT 'HTTPS://Www.Site3.Example'
               || CASE WHEN d % 5 = 1 THEN ':8080' ELSE ':443' END
               || '/a/' || d
               || CASE WHEN d % 3 = 0 THEN '?b=2&a=1' ELSE '' END
               AS query_url,
             d, h
      FROM a
      UNION ALL
      SELECT 'https://site7.example'
               || CASE WHEN d % 5 = 1 THEN ':8080' ELSE '' END
               || '/a/../a/' || d
               || CASE WHEN d % 3 = 0 THEN '?b=2&a=1' ELSE '' END,
             d, h
      FROM b)
    SELECT query_url,
           d AS doc_id,
           'https://WWW.Site' || h || '.EXAMPLE' ||
             CASE WHEN d % 5 = 1 THEN ':8080' ELSE '' END ||
             '/a/' || d ||
             CASE WHEN d % 3 = 0 THEN '?b=2&a=1' ELSE '' END AS url,
           'example,site' || h ||
             CASE WHEN d % 5 = 1 THEN ':8080' ELSE '' END ||
             ')/a/' || d ||
             CASE WHEN d % 3 = 0 THEN '?a=1&b=2' ELSE '' END AS surt_key,
           'example,site' || h AS site_key
    FROM hits
    """,
    doc="Batched CDX lookup over the SURT store: a broadcast query batch "
    "(dirty spellings — casing, default ports, dot-segments) joins on "
    "(site_key, surt_key) with dynamic partition pruning listing only "
    "the probed site directories; the oracle replays the full hit set.",
)
def web_surt_batch_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batched read of the SURT index cycle, end to end and
    oracle-checked: against the per-process store (same build as
    ``web_surt_site_read``), a query batch probes three sites in three
    different dirty spellings — site3 with shouted casing and an
    explicit ``:443`` (canonicalization drops the default port, keeps
    ``:8080``), site7 through a ``/a/../a/`` dot-segment path (§6
    path normalization), and site11 with ``/z/`` paths that exist
    nowhere (every probe a MISS — the directory is still pruned-to,
    proving the prune follows the query sites, not the hits). The hit
    set — every site3/site7 probe — comes back with the stored row,
    and the DuckDB oracle replays it arithmetically. Plan + file gates
    (only the three probed directories listed; a corrupted unprobed
    directory never read) live in tests/test_surt_index.py.

    At 100 TB: one broadcast + one partition-pruned directory read per
    distinct query site — the CDX lookup cost a crawler actually pays,
    independent of store size."""
    idx = _surt_store(spark, sf_dir)
    d = F.col("doc_id")
    ds = d.cast("string")
    port_8080 = F.when(d % 5 == 1, F.lit(":8080")).otherwise(F.lit(""))
    qtail = F.when(d % 3 == 0, F.lit("?b=2&a=1")).otherwise(F.lit(""))
    docs = t(spark, sf_dir, "documents").select("doc_id")
    qa = docs.filter((d % 20 == 3) & (d % 6 == 3)).select(
        F.concat(
            F.lit("HTTPS://Www.Site3.Example"),
            F.when(d % 5 == 1, F.lit(":8080")).otherwise(F.lit(":443")),
            F.lit("/a/"), ds, qtail,
        ).alias("url")
    )
    qb = docs.filter((d % 20 == 7) & (d % 3 == 1)).select(
        F.concat(
            F.lit("https://site7.example"), port_8080,
            F.lit("/a/../a/"), ds, qtail,
        ).alias("url")
    )
    qc = docs.filter((d % 20 == 11) & (d % 8 == 3)).select(
        F.concat(
            F.lit("https://www.site11.example/z/"), ds
        ).alias("url")
    )
    out = surt_batch_lookup(
        spark, idx, qa.unionByName(qb).unionByName(qc)
    )
    return out.select("query_url", "doc_id", "url", "surt_key", "site_key")


def surt_batch_coverage(
    spark: SparkSession,
    idx_dir: str,
    queries: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """The full CDX answer — every query row back with a ``found`` flag
    and the stored row when present. Deliberately COMPOSED from the
    pruned inner lookup rather than one left join against the store:
    Spark's dynamic partition pruning does not apply to the
    null-producing side of an outer join (measured — the left-join
    formulation scans every site directory), so the scalable shape is
    the DPP inner join for hits (``surt_batch_lookup`` — store cost
    tracks the probed directories) plus a left-anti join of the query
    batch against the HIT SET (batch-sized, broadcast) for misses. The
    store is touched exactly once, pruned; the tiny query side is read
    twice."""
    hits = surt_batch_lookup(spark, idx_dir, queries, url_col=url_col)
    store_cols = [c for c in hits.columns if c != "query_url"]
    found = hits.select(
        "query_url", F.lit(True).alias("found"), *store_cols
    )
    misses = queries.select(F.col(url_col).alias("query_url")).join(
        F.broadcast(hits.select("query_url")), "query_url", "left_anti"
    )
    missing = misses.select(
        "query_url",
        F.lit(False).alias("found"),
        *[F.lit(None).cast(found.schema[c].dataType).alias(c) for c in store_cols],
    )
    return found.unionByName(missing)


@register(
    "web_surt_batch_coverage",
    oracle="""
    WITH a AS (SELECT doc_id AS d, 3 AS h FROM documents
               WHERE doc_id % 20 = 3 AND doc_id % 6 = 3),
    b AS (SELECT doc_id AS d, 7 AS h FROM documents
          WHERE doc_id % 20 = 7 AND doc_id % 3 = 1),
    c AS (SELECT doc_id AS d FROM documents
          WHERE doc_id % 20 = 11 AND doc_id % 8 = 3),
    hits AS (
      SELECT 'HTTPS://Www.Site3.Example'
               || CASE WHEN d % 5 = 1 THEN ':8080' ELSE ':443' END
               || '/a/' || d
               || CASE WHEN d % 3 = 0 THEN '?b=2&a=1' ELSE '' END
               AS query_url,
             d, h
      FROM a
      UNION ALL
      SELECT 'https://site7.example'
               || CASE WHEN d % 5 = 1 THEN ':8080' ELSE '' END
               || '/a/../a/' || d
               || CASE WHEN d % 3 = 0 THEN '?b=2&a=1' ELSE '' END,
             d, h
      FROM b)
    SELECT query_url,
           TRUE AS found,
           d AS doc_id,
           'https://WWW.Site' || h || '.EXAMPLE' ||
             CASE WHEN d % 5 = 1 THEN ':8080' ELSE '' END ||
             '/a/' || d ||
             CASE WHEN d % 3 = 0 THEN '?b=2&a=1' ELSE '' END AS url,
           'example,site' || h ||
             CASE WHEN d % 5 = 1 THEN ':8080' ELSE '' END ||
             ')/a/' || d ||
             CASE WHEN d % 3 = 0 THEN '?a=1&b=2' ELSE '' END AS surt_key,
           'example,site' || h AS site_key
    FROM hits
    UNION ALL
    SELECT 'https://www.site11.example/z/' || d,
           FALSE,
           CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM c
    """,
    doc="Batched CDX coverage: the same three-site probe batch answered "
    "COMPLETELY — hits carry the stored row, misses (site11's /z/ "
    "probes) come back found=false; composed as pruned-inner-join hits "
    "plus an anti-join of the batch against the hit set, so the store "
    "is scanned once, partition-pruned.",
)
def web_surt_batch_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``web_surt_batch_lookup``'s completing twin: the CDX client's
    actual question is "which of these N URLs are archived, and where"
    — BOTH halves. Same query batch (site3 shouted casing + ``:443``,
    site7 dot-segments, site11 nonexistent ``/z/`` paths); hits return
    the stored row with ``found=true``, every site11 probe returns
    ``found=false`` with null store columns, and the DuckDB oracle
    replays the complete coverage. The store scan is the SAME dynamic-
    partition-pruned inner join as the lookup row (the left-join
    formulation that would scan the whole store is documented-and-
    rejected in ``surt_batch_coverage``); the miss side is an anti-join
    against the batch-sized hit set.

    At 100 TB: store cost still tracks the probed directories; the
    coverage flag costs one broadcast anti-join over the query batch."""
    idx = _surt_store(spark, sf_dir)
    d = F.col("doc_id")
    ds = d.cast("string")
    port_8080 = F.when(d % 5 == 1, F.lit(":8080")).otherwise(F.lit(""))
    qtail = F.when(d % 3 == 0, F.lit("?b=2&a=1")).otherwise(F.lit(""))
    docs = t(spark, sf_dir, "documents").select("doc_id")
    qa = docs.filter((d % 20 == 3) & (d % 6 == 3)).select(
        F.concat(
            F.lit("HTTPS://Www.Site3.Example"),
            F.when(d % 5 == 1, F.lit(":8080")).otherwise(F.lit(":443")),
            F.lit("/a/"), ds, qtail,
        ).alias("url")
    )
    qb = docs.filter((d % 20 == 7) & (d % 3 == 1)).select(
        F.concat(
            F.lit("https://site7.example"), port_8080,
            F.lit("/a/../a/"), ds, qtail,
        ).alias("url")
    )
    qc = docs.filter((d % 20 == 11) & (d % 8 == 3)).select(
        F.concat(
            F.lit("https://www.site11.example/z/"), ds
        ).alias("url")
    )
    out = surt_batch_coverage(
        spark, idx, qa.unionByName(qb).unionByName(qc)
    )
    return out.select(
        "query_url", "found", "doc_id", "url", "surt_key", "site_key"
    )

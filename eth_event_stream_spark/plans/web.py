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

The MATCHING CONTRACT (the original REP core, documented — Google's
``*``/``$`` wildcard extensions are out of scope and such patterns are
treated as literals): rules are literal path prefixes; the most
specific (longest) matching rule wins; on a length tie Allow wins; a
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

from .catalog import t
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
    """(domain, text) -> (domain, grp, ua, allow, prefix) — the rules
    relation, parsed entirely in Catalyst: lines via split+posexplode,
    comments stripped, User-agent groups reconstructed with the
    lag/running-sum gaps-and-islands idiom, empty-valued directives
    dropped (they match nothing). Unknown directives are ignored, as the
    REP requires."""
    grouped = _robots_grouped(robots)
    rules = grouped.filter(
        F.col("directive").isin("allow", "disallow") & (F.col("value") != "")
    ).select(
        "domain",
        "grp",
        (F.col("directive") == "allow").alias("allow"),
        F.col("value").alias("prefix"),
    )
    # a rule belongs to every agent its group names
    return rules.join(parse_robots_groups(robots), ["domain", "grp"]).select(
        "domain", "grp", "ua", "allow", "prefix"
    )


def robots_allowed(
    urls: DataFrame, rules: DataFrame, groups: DataFrame, agent: str
) -> DataFrame:
    """Decide every (domain, path) row against the parsed relations for
    ``agent``: pick the applicable group (specific beats ``*``, and a
    specific group SHADOWS ``*`` entirely — even an EMPTY one, which is
    why ``groups`` is a separate input), broadcast-join the rules on
    domain + prefix match, take the longest-match winner per URL (Allow
    wins length ties), default allowed. Adds ``allowed`` and
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
        & F.col("path").startswith(F.col("prefix")),
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
    "broadcast longest-prefix-match join, Allow-wins tie-break; the "
    "oracle replays the whole decision from the rule formulas.",
)
def web_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-politeness filter, end to end and oracle-checked: 20
    synthetic robots.txt FILES (comments, blank lines, an empty Disallow,
    Allow overrides, and a trainbot group on 3/4 of domains) are parsed
    INTO A RULES RELATION entirely in Catalyst (split + posexplode +
    gaps-and-islands windows — no Python anywhere), then every document's
    URL is decided for agent ``trainbot`` by a BROADCAST longest-prefix-
    match join (the rules are a tiny dim; URLs are the fact table) with a
    per-URL window taking the longest matching rule, Allow winning length
    ties, default allowed. The synth paths hit every semantic: the
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


def parse_sitemap_urls(sitemaps: DataFrame) -> DataFrame:
    """(domain, xml) -> one row per ``<url>`` entry: (domain, url_idx,
    loc, lastmod) — sitemap.xml parsed entirely in Catalyst:
    ``regexp_extract_all`` pulls the ``<url>`` blocks, posexplode splits
    them, per-block extracts read ``<loc>``/``<lastmod>``, and the XML
    character references a conforming ``<loc>`` must escape (``&amp;``
    in query strings) decode in the same entity order as the HTML chain.
    ``<sitemapindex>`` files (pointers to child sitemaps) are surfaced
    with ``is_index = true`` so a crawler can recurse; a file with
    neither element yields zero rows for its domain (sitemaps are
    advisory — absence is not an error)."""
    blocks = sitemaps.select(
        "domain",
        F.coalesce(
            F.expr(
                r"regexp_extract_all(xml, '(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>', 1)"
            ),
            F.array(),
        ).alias("blocks"),
        F.col("xml").contains("<sitemapindex").alias("is_index"),
    )
    entries = blocks.select(
        "domain",
        "is_index",
        F.posexplode("blocks").alias("url_idx", "block"),
    )
    loc = F.regexp_extract("block", r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")]:
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    return entries.select(
        "domain",
        F.col("url_idx").cast("bigint").alias("url_idx"),
        loc.alias("loc"),
        F.nullif(
            F.regexp_extract("block", r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1),
            F.lit(""),
        ).alias("lastmod"),
        "is_index",
    ).filter(F.col("loc") != "")


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

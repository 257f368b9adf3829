"""Pure-Catalyst HTML -> visible text (functions/html.py, round 12).
The contract is documented in the module: script/style/comments drop,
block tags break lines, other tags become spaces, the five core named
entities (+ nbsp) decode AFTER tag stripping with &amp; last, anything
else passes through verbatim, whitespace collapses."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eth_event_stream_spark.functions.html import html_title, html_to_text


def _extract(spark, html: str) -> tuple[str, str]:
    row = (
        spark.createDataFrame([(html,)], "html string")
        .select(
            html_to_text("html").alias("t"), html_title("html").alias("ti")
        )
        .collect()[0]
    )
    return row["t"], row["ti"]


def test_html_basic_page(spark):
    text, title = _extract(
        spark,
        "<html><head><title>A Page</title><style>p { x: 1 }</style></head>"
        "<body><h1>Head</h1><p>one</p><p>two</p></body></html>",
    )
    assert title == "A Page"
    assert text == "A Page\nHead\none\ntwo"


def test_html_script_and_comment_content_dropped(spark):
    text, _ = _extract(
        spark,
        '<body><script type="text/javascript">if (a < b) { alert("<p>hi") }'
        "</script><!-- <p>not me</p> -->visible</body>",
    )
    assert text == "visible"
    # uppercase tags and attribute-laden closers too
    text, _ = _extract(
        spark,
        "<BODY><SCRIPT>x < y</SCRIPT >kept<P CLASS='a'>line</P></BODY>",
    )
    assert text == "kept\nline"


def test_html_entities_decode_after_tag_strip(spark):
    # &lt;p&gt; decodes to a literal <p> that must NOT be re-parsed
    text, _ = _extract(spark, "<p>&lt;p&gt; &amp; &quot;q&quot; &#39;s&#39;</p>")
    assert text == "<p> & \"q\" 's'"
    # the HTML-standard double-escape: &amp;lt; is the TEXT "&lt;"
    text, _ = _extract(spark, "<p>&amp;lt;</p>")
    assert text == "&lt;"
    # printable-ASCII numeric references decode (round 15); unknown
    # NAMED entities still pass through verbatim (documented)
    text, _ = _extract(spark, "<p>&#x41; &copy; &nbsp;x</p>")
    assert text == "A &copy; x"


def test_html_whitespace_and_blocks(spark):
    text, _ = _extract(
        spark,
        "<div>  a   b\t c </div><div></div><div>d</div><span>e</span> f",
    )
    assert text == "a b c\nd\ne f"
    # plain text is (collapsed) identity — no markup, no change
    text, _ = _extract(spark, "just words here")
    assert text == "just words here"


def test_html_title_edges(spark):
    _, title = _extract(spark, "<title>  A &amp; B  </title>")
    assert title == "A & B"
    _, title = _extract(spark, "<p>no title</p>")
    assert title == ""
    # first title wins
    _, title = _extract(spark, "<title>one</title><title>two</title>")
    assert title == "one"


def test_html_plan_is_pure_codegen(spark):
    """The extraction must stay JVM-side: no Python eval nodes anywhere
    in the plan — the 100 TB contract for a per-document transform."""
    df = spark.createDataFrame([("<p>x</p>",)], "html string").select(
        html_to_text("html").alias("t")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan


def test_warc_html_lane_end_to_end(spark):
    """The WET-style composition: HTML archives -> parse -> Catalyst
    extraction; the visible text round-trips the embedded document text
    exactly (escaping inverted, markup gone)."""
    from eth_event_stream_spark.operators.ingest import (
        documents_as_warc_html,
        warc_to_documents,
    )

    docs = spark.createDataFrame(
        [(7, "alpha & <beta> gamma"), (8, "plain words")],
        "doc_id long, text string",
    )
    recs = warc_to_documents(documents_as_warc_html(docs))
    out = {
        r["archive_id"]: r
        for r in recs.select(
            "archive_id",
            html_title(F.col("text")).alias("title"),
            html_to_text(F.col("text")).alias("body"),
        ).collect()
    }
    assert out[7]["title"] == "doc 7"
    assert out[7]["body"] == "doc 7\ndoc 7\nA & B <ok>\nalpha & <beta> gamma"
    assert out[8]["body"] == "doc 8\ndoc 8\nA & B <ok>\nplain words"


def test_html_unclosed_script_and_style_do_not_leak(spark):
    """A truncated page's trailing <script>/<style> with no closer must
    not leak its contents into the visible text (review finding), while
    <styleguide>-style custom elements are ordinary tags, not style
    openers."""
    text, _ = _extract(
        spark, "<p>kept</p><script>var tracker={id:123456}"
    )
    assert text == "kept"
    text, _ = _extract(spark, "<p>a</p><style>.x{color:red}")
    assert text == "a"
    # \b guard: a custom element starting with 'style' must NOT swallow
    # the rest of the document
    text, _ = _extract(spark, "<styleguide>shown</styleguide><p>more</p>")
    assert text == "shown\nmore"


def test_html_title_ignores_comments_and_scripts(spark):
    """The first REAL title wins — titles inside comments or script
    strings never shadow it (review finding)."""
    _, title = _extract(
        spark,
        "<!-- <title>stale draft</title> --><head><title>Real</title></head>",
    )
    assert title == "Real"
    _, title = _extract(
        spark,
        '<script>document.title="<title>x</title>"</script><title>Good</title>',
    )
    assert title == "Good"


def test_html_blocks_and_content_classification(spark):
    """Block split keeps deterministic indices (empty between-tag slots),
    inline text matches html_to_text's line structure, anchor text reads
    the RAW markup, and the keep contract classifies nav/short/content/
    link-heavy blocks the documented way."""
    from eth_event_stream_spark.functions.html import (
        html_blocks,
        html_inline_text,
        html_to_text,
    )
    from eth_event_stream_spark.plans.web import html_content_blocks

    html = (
        '<div><a href="/">Home</a> <a href="/x">About us</a></div>'
        "<p>tiny</p>"
        "<p>the quick &amp; brown fox is on the hill and it was at rest "
        "here today</p>"
        "<p><a>the fox and the dog was at rest</a> more here now</p>"
        "<script>var a = '<p>not a block</p>';</script>"
    )
    df = spark.createDataFrame([(1, html)], "k long, html string")
    out = {
        r["block_idx"]: r
        for r in html_content_blocks(df, "html", ["k"]).collect()
    }
    assert sorted(out) == [1, 3, 5, 7]  # script block never splits
    assert out[1]["text"] == "Home About us" and not out[1]["keep"]
    assert out[3]["text"] == "tiny" and not out[3]["keep"]
    c = out[5]
    assert c["keep"] and c["text"].startswith("the quick & brown fox")
    assert c["stop_hits"] >= 8 and c["link_chars"] == 0
    d = out[7]
    # words and stopwords pass; anchor density is the deciding drop
    assert d["n_words"] >= 5 and d["stop_hits"] * 5 >= d["n_words"]
    assert not d["keep"] and d["link_chars"] == 31
    # joining per-block inline text reproduces html_to_text's lines
    joined = spark.createDataFrame([(html,)], "h string").select(
        F.array_join(
            F.filter(
                F.transform(html_blocks("h"), html_inline_text),
                lambda x: x != "",
            ),
            "\n",
        ).alias("j"),
        html_to_text("h").alias("t"),
    ).collect()[0]
    assert joined["j"] == joined["t"]
    # pure Catalyst
    plan = (
        html_content_blocks(df, "html", ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "MapInPandas" not in plan


def test_html_links(spark):
    """Outlink harvest: quote forms, document order, entity decode,
    script/comment regions excluded, non-anchor hrefs (link rel) and
    area/base tags out of scope by contract."""
    from pyspark.sql import functions as F

    from eth_event_stream_spark.functions.html import html_links

    page = (
        '<html><head><link href="/style.css" rel="stylesheet">'
        "<script>var a = '<a href=\"/from-js\">';</script></head>"
        '<body><!-- <a href="/commented-out">x</a> -->'
        '<a href="/first">1</a>'
        "<a class='x' href='/second?a=1&amp;b=2'>2</a>"
        "<a href=/bare>3</a>"
        '<A HREF="../up">4</A>'
        '<a name="anchor-without-href">5</a>'
        '<a href=" /padded ">6</a></body></html>'
    )
    df = spark.createDataFrame([(page,)], "html string")
    got = df.select(html_links("html").alias("ls")).collect()[0]["ls"]
    assert got == [
        "/first",
        "/second?a=1&b=2",
        "/bare",
        "../up",
        "/padded",
    ]
    plan = df.select(html_links("html"))._jdf.queryExecution()
    assert "Python" not in plan.executedPlan().toString()


def test_html_base_href(spark):
    from eth_event_stream_spark.functions.html import html_base_href

    rows = [
        ('<head><base href="https://b.example/dir/"></head>', "https://b.example/dir/"),
        ("<base href='/root/'>", "/root/"),
        ("<base target=_top href=/bare>", "/bare"),
        ("<p>no base</p>", None),
        ("<!-- <base href='/commented'> --><p>x</p>", None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "h string")
    got = [r[0] for r in df.select(html_base_href("h")).collect()]
    assert got == [w for _, w in rows]


def test_html_meta_content_and_followable_links(spark):
    """Page-level robots surface: meta name=robots in either attribute
    order and any quote form; rel=nofollow token excluded from the
    followable harvest (multi-token rel, either side of href)."""
    from eth_event_stream_spark.functions.html import (
        html_links_followable,
        html_meta_content,
    )

    page = (
        '<head><meta charset="utf-8">'
        '<meta name="ROBOTS" content="noindex, nofollow">'
        '<meta content="desc text" name="description"></head>'
        '<body><a href="/a">a</a>'
        '<a rel="nofollow" href="/no1">n</a>'
        "<a href='/b' rel='noopener nofollow'>n</a>"
        '<a rel="noopener" href="/c">c</a>'
        '<a href="/d?x=1&amp;y=2">d</a>'
        "<!-- <a href='/commented'>x</a> --></body>"
    )
    df = spark.createDataFrame([(page,)], "h string")
    row = df.select(
        html_meta_content("h", "robots").alias("robots"),
        html_meta_content("h", "description").alias("desc"),
        html_meta_content("h", "keywords").alias("kw"),
        html_links_followable("h").alias("ls"),
    ).collect()[0]
    assert row["robots"] == "noindex, nofollow"
    assert row["desc"] == "desc text"      # content-before-name order
    assert row["kw"] is None
    assert row["ls"] == ["/a", "/c", "/d?x=1&y=2"]


def test_html_meta_content_literal_name_binding(spark):
    """The meta name must match LITERALLY (r15 ADVICE): a LONGER name
    sharing the probe as a prefix (robots-custom) must not answer a
    "robots" probe in either attribute order or quote form, while exact
    bare/quoted names still hit."""
    from eth_event_stream_spark.functions.html import html_meta_content

    rows = [
        # prefix impostors: must NOT answer
        ('<meta name="robots-custom" content="nofollow">', None, None),
        ("<meta name='robotsx' content='nofollow'>", None, None),
        ("<meta name=robots-custom content=nofollow>", None, None),
        ('<meta content="nofollow" name="robots-custom">', None, None),
        ('<meta name="description-long" content="d">', None, None),
        # exact names: all forms still hit
        ('<meta name="robots" content="noindex">', "noindex", None),
        ("<meta name=robots content=noindex>", "noindex", None),
        ("<meta content='x y' name=robots>", "x y", None),
        ('<meta name=robots content="a, b"/>', "a, b", None),
        ('<meta name="description" content="d">', None, "d"),
        # impostor BEFORE the real one: first LITERAL match wins
        (
            '<meta name="robots-custom" content="bad">'
            '<meta name="robots" content="good">',
            "good",
            None,
        ),
    ]
    df = spark.createDataFrame([(h,) for h, _, _ in rows], "h string")
    got = df.select(
        html_meta_content("h", "robots").alias("r"),
        html_meta_content("h", "description").alias("d"),
    ).collect()
    for (h, wr, wd), g in zip(rows, got):
        assert g["r"] == wr, (h, g["r"])
        assert g["d"] == wd, (h, g["d"])


def test_html_numeric_character_references(spark):
    """Bounded numeric-reference decode (round 15): printable-ASCII
    decimal and hex forms decode in text and hrefs; the HTML standard's
    one-pass semantics hold (&#38;lt; is the TEXT "&lt;" — a decoded
    ampersand never combines into a named entity; &amp;#47; is the
    TEXT "&#47;"); out-of-band codepoints, unterminated and over-long
    references pass through verbatim."""
    from eth_event_stream_spark.functions.html import (
        html_links,
        html_to_text,
    )

    rows = [
        ("<p>&#47;&#x2F;</p>", "//"),
        ("<p>a&#32;b</p>", "a b"),
        ("<p>&#65;&#x41;</p>", "AA"),
        # one-pass decode semantics
        ("<p>&#38;lt;</p>", "&lt;"),
        ("<p>&amp;#47;</p>", "&#47;"),
        ("<p>&#38;amp;</p>", "&amp;"),
        ("<p>&#38; B</p>", "& B"),
        # boundaries: control code, beyond-ASCII, unterminated, overlong
        ("<p>&#7;</p>", "&#7;"),
        ("<p>&#233;</p>", "&#233;"),
        ("<p>&#x10FFFF;</p>", "&#x10FFFF;"),
        ("<p>&#47</p>", "&#47"),
        ("<p>&#12345678;</p>", "&#12345678;"),
        ("<p>tail&#</p>", "tail&#"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "h string")
    got = [r[0] for r in df.select(html_to_text("h")).collect()]
    for (h, want), g in zip(rows, got):
        assert g == want, (h, g)

    # href harvest: the frontier-critical case — encoded slashes and a
    # numeric-escaped query separator inside an anchor
    page = (
        '<a href="&#47;p&#x2F;1&#63;a=1&#38;b=2">x</a>'
        '<a href="&#104;ttps://h.example/">y</a>'
    )
    df2 = spark.createDataFrame([(page,)], "h string")
    links = df2.select(html_links("h")).collect()[0][0]
    assert links == ["/p/1?a=1&b=2", "https://h.example/"]

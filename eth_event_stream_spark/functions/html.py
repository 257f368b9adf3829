"""HTML -> visible text, pure Catalyst — the Common Crawl WET step.

After WARC ingest (``operators/ingest.py``) the canonical next stage of
a web training pipeline is extracting visible text from HTML so the
text layers (dedup, quality, language ID) can run on prose instead of
markup. This module does it entirely with built-in column expressions
(``regexp_replace`` / ``replace`` chains) — JVM-side, whole-stage
codegen, no Python in the hot path — which is exactly where a
per-document string transform belongs at 100 TB.

The CONTRACT (documented, not guessed): script/style/comment content is
dropped; block-level tags become newlines and every other tag a space;
the five core named character references (``&lt; &gt; &quot; &#39;
&amp;`` — ``&amp;`` decoded LAST so ``&amp;lt;`` yields the literal
``&lt;``, per the HTML standard) plus ``&nbsp;`` are decoded; any other
entity passes through VERBATIM (numeric references need a character
table no Catalyst expression provides — a documented pass-through,
never a wrong guess); runs of spaces collapse and newlines dedupe.
Entity decoding runs AFTER tag stripping, so decoded ``<`` / ``>`` can
never be re-parsed as markup (the standard's anti-mXSS ordering).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# decode order matters: &amp; LAST (see module docstring)
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

# tags whose boundaries are line breaks in visible text
_BLOCK_TAGS = "p|br|div|h[1-6]|li|ul|ol|tr|table|title|section|article|header|footer|blockquote|pre"


def _strip_invisible(c: Column) -> Column:
    """Drop everything a browser never renders: closed script/style
    blocks, UNCLOSED script/style (a truncated crawl page's trailing
    ``<script>...`` must not leak JavaScript into the visible text), and
    comments. Shared by ``html_to_text`` and ``html_title`` so a title
    inside a comment or script string can never win."""
    # (?is): case-insensitive, dot-matches-newline. Java regex supports
    # the backreference; the oracle side never parses HTML (it replays
    # expected text arithmetically), so RE2 compatibility is not needed.
    # \b: <styleguide>/<scripted-thing> are ordinary elements, not style/
    # script openers — without the boundary the unclosed-tag pass would
    # swallow the rest of the document after one
    c = F.regexp_replace(c, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<(script|style)\b[^>]*>.*$", " ")
    return F.regexp_replace(c, r"(?s)<!--.*?-->", " ")


def html_to_text(col: Column | str) -> Column:
    """Visible text of an HTML column — one codegen'd expression chain:
    drop ``<script>``/``<style>`` blocks (closed or truncated-open) and
    comments, break on block-level tags, strip every other tag to a
    space, decode the core named entities (``&amp;`` last), collapse
    whitespace. Returns a trimmed string column."""
    c = F.col(col) if isinstance(col, str) else col
    c = _strip_invisible(c)
    c = F.regexp_replace(c, rf"(?i)</?({_BLOCK_TAGS})(\s[^>]*)?/?>", "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"[ \t\r\f]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n+", "\n")
    # trim() strips only spaces; boundary newlines need the regex strip
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def html_blocks(col: Column | str) -> Column:
    """The page split into RAW segments at block-level tag boundaries
    (script/style/comments stripped first) — ``array<string>`` whose
    entries still carry their inline markup, so per-block metrics that
    need the markup (anchor text for link density) can read it before
    stripping. Segments BETWEEN adjacent block tags are empty strings;
    callers filter on the extracted text, keeping indices deterministic.
    The splitting tag set is exactly ``html_to_text``'s newline set, so
    joining each block's ``html_inline_text`` reproduces that function's
    line structure."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(
        _strip_invisible(c), rf"(?i)</?({_BLOCK_TAGS})(\s[^>]*)?/?>"
    )


def html_inline_text(col: Column | str) -> Column:
    """Visible text of ONE block segment: inline tags to spaces, core
    entities decoded (``&amp;`` last), whitespace collapsed, trimmed —
    the per-segment half of ``html_to_text``'s contract."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_anchor_text(col: Column | str) -> Column:
    """The concatenated visible text of a segment's ``<a>`` elements —
    the numerator of link density. Anchors are extracted from the RAW
    segment (before inline-tag stripping), then flattened through the
    same inline-text chain."""
    c = F.col(col) if isinstance(col, str) else col
    joined = F.array_join(
        F.regexp_extract_all(c, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"), F.lit(1)),
        " ",
    )
    return html_inline_text(joined)


def html_title(col: Column | str) -> Column:
    """The first ``<title>`` element's text (entity-decoded, whitespace
    collapsed), or empty string when there is none — same pure-Catalyst
    discipline as ``html_to_text``. Comments and script/style content are
    stripped FIRST, so a title inside them can never shadow the real
    one."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_extract(
        _strip_invisible(c), r"(?is)<title[^>]*>(.*?)</title\s*>", 1
    )
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_links(col: Column | str) -> Column:
    """Every ``<a href=...>`` value in the page, in document order, as
    ``array<string>`` — the raw outlink harvest frontier discovery
    starts from. Pure Catalyst: script/style/comment regions are
    stripped first (a link inside a commented-out nav or a JS string
    literal is not a link), then ``regexp_extract_all`` over the anchor
    openers — double-quoted, single-quoted, and bare attribute forms
    all parse (the three capture groups come back as three aligned
    arrays, exactly one non-empty per match, zipped back together), the
    basic entity set decodes (query separators arrive entity-escaped in
    real markup), and surrounding whitespace trims. Resolution against
    the page URL is ``functions.url.url_resolve``'s job; scheme
    filtering (javascript:, mailto:) is the frontier builder's."""
    c = _strip_invisible(F.col(col) if isinstance(col, str) else col)
    pat = (
        "(?is)<a\\b[^>]*?\\shref\\s*=\\s*"
        "(\"([^\"]*)\"|'([^']*)'|([^\\s\"'>]+))"
    )
    g2 = F.regexp_extract_all(c, F.lit(pat), F.lit(2))
    g3 = F.regexp_extract_all(c, F.lit(pat), F.lit(3))
    g4 = F.regexp_extract_all(c, F.lit(pat), F.lit(4))
    pick = lambda a, b: F.when(a != "", a).otherwise(b)  # noqa: E731
    merged = F.zip_with(F.zip_with(g2, g3, pick), g4, pick)

    def clean(x: Column) -> Column:
        x = F.trim(x)
        for ent, ch in _ENTITIES:
            x = F.replace(x, F.lit(ent), F.lit(ch))
        return x

    return F.transform(merged, clean)


def html_base_href(col: Column | str) -> Column:
    """The page's ``<base href=...>`` value — when present it replaces
    the page URL as the base every relative reference resolves against
    (HTML's one global override of RFC 3986 §5.1; the FIRST base
    element wins per the HTML spec and later ones are ignored). NULL
    when absent — callers ``coalesce`` with the fetch URL:
    ``url_resolve(coalesce(html_base_href(h), page_url), href)``.
    Script/comment regions are stripped first, same as the link
    harvest."""
    c = _strip_invisible(F.col(col) if isinstance(col, str) else col)
    pat = (
        "(?is)<base\\b[^>]*?\\shref\\s*=\\s*"
        "(\"([^\"]*)\"|'([^']*)'|([^\\s\"'>]+))"
    )
    got = F.trim(
        F.concat(
            F.regexp_extract(c, pat, 2),
            F.regexp_extract(c, pat, 3),
            F.regexp_extract(c, pat, 4),
        )
    )
    return F.nullif(got, F.lit(""))

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
``&lt;``, per the HTML standard) plus ``&nbsp;`` are decoded, and —
round 15 — NUMERIC references (``&#47;`` / ``&#x2F;``) whose codepoint
lands in printable ASCII decode too (``_decode_numeric_refs``; an
encoded ``/`` left verbatim in an href yields an unfetchable frontier
URL); any other entity — named beyond the core set, numeric outside
32..126 — passes through VERBATIM (a documented boundary, never a
wrong guess); runs of spaces collapse and newlines dedupe.
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

# A decoded &#38; must not combine with following text into a named
# entity (&#38;lt; is the TEXT "&lt;" per the HTML standard's one-pass
# decode), so the numeric pass emits this private-use sentinel for 38
# and the chain restores it to "&" AFTER the named replaces run. Pages
# containing U+E000 itself (private use, never emitted by real markup
# generators) would alias — a documented boundary.
_AMP_SENTINEL = ""
_HTML_BIG = 2147483647


def _decode_numeric_refs(c: Column) -> Column:
    """Bounded numeric character reference decode (round 15):
    ``&#47;`` / ``&#x2F;`` forms whose codepoint lands in printable
    ASCII (32..126 — the href-critical band: an encoded ``/`` or ``:``
    left verbatim in an anchor yields an unfetchable frontier URL)
    decode via ``chr(conv(...))``; everything else — larger codepoints
    (Catalyst's ``chr`` is byte-ranged), control codes, unterminated or
    over-long references — passes through VERBATIM, the same documented
    never-guess boundary the module always had. Implementation is the
    ``url_normalize_percent`` idiom: one ``split`` on the literal
    ``&#`` + one ``transform`` where each tail piece decides its own
    leading reference — no UDF, no explode, whole-stage codegen."""

    def piece(x: Column) -> Column:
        dec = F.regexp_extract(x, r"^([0-9]{1,7});", 1)
        hx = F.regexp_extract(x, r"^[xX]([0-9A-Fa-f]{1,6});", 1)
        code = (
            F.when(dec != "", dec.cast("bigint"))
            .when(hx != "", F.conv(hx, 16, 10).cast("bigint"))
        )
        reflen = F.when(dec != "", F.length(dec) + 1).when(
            hx != "", F.length(hx) + 2
        )
        rest = F.substr(x, reflen + 1, F.lit(_HTML_BIG))
        ch = F.when(code == 38, F.lit(_AMP_SENTINEL)).otherwise(F.chr(code))
        ok = code.isNotNull() & (code >= 32) & (code <= 126)
        return F.when(ok, F.concat(ch, rest)).otherwise(
            F.concat(F.lit("&#"), x)
        )

    # let-binding via transform(array(...)): this chain also runs
    # INSIDE per-block transform() lambdas (html_inline_text), which
    # are interpreted with NO common-subexpression elimination — every
    # reference to a subtree re-evaluates it. Binding the input (its
    # upstream tag-strip chain) and the split result to LAMBDA
    # VARIABLES makes references cheap lookups, and the contains guard
    # on the BOUND input makes the common no-reference block pay one
    # substring scan instead of the split + array machinery. Measured
    # r15 on the per-block boilerplate row (min-of-3, sf0.1,
    # analyze/execute split): this form costs +0.16 s analysis (the
    # lambda tree is real resolver work, paid per query build) and
    # +0.11 s execution vs a stubbed chain — the accepted, documented
    # price of the feature; the naive multi-reference forms before
    # this shape read ~2x the whole row.
    def body(cc: Column) -> Column:
        return F.when(~cc.contains("&#"), cc).otherwise(
            F.element_at(
                F.transform(
                    F.array(F.split(cc, "&#", -1)),
                    lambda parts: F.concat(
                        F.element_at(parts, 1),
                        F.array_join(
                            F.transform(
                                F.slice(parts, 2, F.size(parts) - 1),
                                lambda x: piece(x),
                            ),
                            "",
                        ),
                    ),
                ),
                1,
            )
        )

    return F.element_at(F.transform(F.array(c), body), 1)


def _decode_entities(c: Column) -> Column:
    """The full entity chain in HTML-standard one-pass order: numeric
    references first (``&#38;`` to the sentinel so it can never combine
    into a named form), the core named set with ``&amp;`` LAST (so
    ``&amp;lt;`` yields the literal ``&lt;``), then the sentinel
    restores to ``&``."""
    c = _decode_numeric_refs(c)
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.replace(c, F.lit(_AMP_SENTINEL), F.lit("&"))

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
    c = _decode_entities(c)
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
    c = _decode_entities(c)
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


def html_title(col: Column | str, *, stripped: bool = False) -> Column:
    """The first ``<title>`` element's text (entity-decoded, whitespace
    collapsed), or empty string when there is none — same pure-Catalyst
    discipline as ``html_to_text``. Comments and script/style content are
    stripped FIRST, so a title inside them can never shadow the real
    one. ``stripped=True`` promises the caller already applied
    ``_strip_invisible`` (staged as a real column so several harvests
    share ONE strip pass — the WAT envelope publish does this)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_extract(
        c if stripped else _strip_invisible(c),
        r"(?is)<title[^>]*>(.*?)</title\s*>",
        1,
    )
    t = _decode_entities(t)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_links(col: Column | str, *, stripped: bool = False) -> Column:
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
    filtering (javascript:, mailto:) is the frontier builder's.

    Shape note (round 16): ONE ``regexp_extract_all`` of the whole
    alternation (group 1) + a per-element quote strip, not three
    per-group extractions. The strip/extract tower sits inside a
    Generate (posexplode) at the main call site, which Spark does not
    codegen — no runtime subexpression elimination — so the old
    three-group form ran the 3-regex script/comment strip AND the
    full-text anchor scan three times per row (12 full-text regex
    passes); this form runs them once each (4). The quote strip is
    exactly the group-2/3/4 pick: a token starting with a quote is a
    quoted form (bare hrefs cannot start with ``"``/``'`` by the
    pattern), so dropping first+last char equals the inner group.
    ``stripped=True``: caller already applied ``_strip_invisible``
    (staged once as a real column, shared by several harvests — the
    WAT envelope publish)."""
    raw = F.col(col) if isinstance(col, str) else col
    c = raw if stripped else _strip_invisible(raw)
    pat = (
        "(?is)<a\\b[^>]*?\\shref\\s*=\\s*"
        "(\"([^\"]*)\"|'([^']*)'|([^\\s\"'>]+))"
    )
    toks = F.regexp_extract_all(c, F.lit(pat), F.lit(1))

    def clean(x: Column) -> Column:
        first = F.substring(x, 1, 1)
        unq = F.when(
            (first == '"') | (first == "'"),
            F.substring(x, 2, F.length(x) - F.lit(2)),
        ).otherwise(x)
        return _decode_entities(F.trim(unq))

    return F.transform(toks, clean)


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


def html_meta_content(col: Column | str, name: str) -> Column:
    """The ``content`` value of ``<meta name="..." content="...">`` for
    a literal ``name`` (case-insensitive, either attribute order,
    quoted or bare values) — NULL when absent. First match wins.
    Script/comment regions are stripped first, like the link harvest.
    The crawl-relevant instance is ``name="robots"`` (page-level
    indexing/following directives); the caller merges it with the
    ``X-Robots-Tag`` HTTP header per the documented union semantics in
    ``plans.web.page_robots_directives``."""
    import re as _re

    c = _strip_invisible(F.col(col) if isinstance(col, str) else col)
    nm = _re.escape(name)
    # The name must match LITERALLY: either exactly quoted, or bare and
    # immediately followed by an attribute boundary ([\s/>]). A lone
    # optional quote ([\"']?) would let [^>]*? absorb the tail of a
    # LONGER name (name="robots-custom" answering a "robots" probe) —
    # the alternation is non-capturing so value group numbers are
    # stable.
    nm_lit = f"(?:\"{nm}\"|'{nm}'|{nm}(?=[\\s/>]))"
    pre = (
        f"(?is)<meta\\b[^>]*?\\sname\\s*=\\s*{nm_lit}[^>]*?"
        "\\scontent\\s*=\\s*"
    )
    post = (
        f"(?is)<meta\\b[^>]*?\\scontent\\s*=\\s*"
        "(\"([^\"]*)\"|'([^']*)'|([^\\s\"'>]+))"
        f"[^>]*?\\sname\\s*=\\s*{nm_lit}"
    )
    val_pat = "(\"([^\"]*)\"|'([^']*)'|([^\\s\"'>]+))"

    def first_nonempty(*cols):
        out = F.lit("")
        for x in cols:
            out = F.when(out != "", out).otherwise(x)
        return out

    name_first = first_nonempty(
        F.regexp_extract(c, pre + val_pat, 2),
        F.regexp_extract(c, pre + val_pat, 3),
        F.regexp_extract(c, pre + val_pat, 4),
    )
    content_first = first_nonempty(
        F.regexp_extract(c, post, 2),
        F.regexp_extract(c, post, 3),
        F.regexp_extract(c, post, 4),
    )
    return F.nullif(
        F.trim(first_nonempty(name_first, content_first)), F.lit("")
    )


def html_links_followable(col: Column | str) -> Column:
    """Like ``html_links`` but EXCLUDING anchors whose ``rel`` attribute
    contains the ``nofollow`` token (the per-link opt-out crawlers must
    honor; ``rel`` may carry several space-separated tokens — ``rel=
    "nofollow noopener"`` — and sit on either side of ``href``).
    Returns ``array<string>`` of trimmed, entity-decoded href values in
    document order. One ``regexp_extract_all`` over the anchor openers'
    ATTRIBUTE BODIES, then per-element href/rel extraction inside array
    lambdas — still pure Catalyst, no explode."""
    c = _strip_invisible(F.col(col) if isinstance(col, str) else col)
    bodies = F.regexp_extract_all(
        c, F.lit("(?is)<a\\b([^>]*)>"), F.lit(1)
    )
    href_pat = "(?is)\\shref\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s\"'>]+))"
    rel_pat = "(?is)\\srel\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s\"'>]+))"

    def attr(x: Column, pat: str) -> Column:
        out = F.lit("")
        for g in (2, 3, 4):
            v = F.regexp_extract(x, pat, g)
            out = F.when(out != "", out).otherwise(v)
        return out

    def clean(x: Column) -> Column:
        return _decode_entities(F.trim(x))

    followable = F.filter(
        bodies,
        lambda x: (attr(x, href_pat) != "")
        & ~F.lower(attr(x, rel_pat)).rlike(
            "(^|\\s)nofollow(\\s|$)"
        ),
    )
    return F.transform(followable, lambda x: clean(attr(x, href_pat)))


def html_meta_pairs(col: Column | str, *, stripped: bool = False) -> Column:
    """Every ``<meta name=... content=...>`` pair in the page head (or
    body — HTML tolerates both), in document order, as
    ``array<struct<name:string,content:string>>`` — the harvest a
    CC-shaped WAT envelope publishes under ``HTML-Metadata.Head.Metas``.
    ``html_meta_content`` answers a SINGLE literal name; this is the
    enumerating twin. Same pure-Catalyst discipline: script/style/
    comment regions are stripped first, one ``regexp_extract_all`` over
    the meta tags' attribute bodies, then per-element name/content
    extraction inside array lambdas (the ``html_links_followable``
    idiom — no explode). Both attribute orders and all three value
    quoting forms parse; values entity-decode and trim; entries missing
    either attribute (charset-only metas, property-only OpenGraph tags)
    are filtered out — this harvest is the name/content family.
    ``stripped=True``: caller already applied ``_strip_invisible``
    (staged once, shared by several harvests — the WAT publish)."""
    raw = F.col(col) if isinstance(col, str) else col
    c = raw if stripped else _strip_invisible(raw)
    bodies = F.regexp_extract_all(
        c, F.lit("(?is)<meta\\b([^>]*)>"), F.lit(1)
    )
    name_pat = "(?is)\\sname\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s\"'>]+))"
    content_pat = (
        "(?is)\\scontent\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s\"'>]+))"
    )

    def attr(x: Column, pat: str) -> Column:
        out = F.lit("")
        for g in (2, 3, 4):
            v = F.regexp_extract(x, pat, g)
            out = F.when(out != "", out).otherwise(v)
        return out

    def clean(x: Column) -> Column:
        return _decode_entities(F.trim(x))

    named = F.filter(
        bodies,
        lambda x: (attr(x, name_pat) != "") & (attr(x, content_pat) != ""),
    )
    return F.transform(
        named,
        lambda x: F.struct(
            clean(attr(x, name_pat)).alias("name"),
            clean(attr(x, content_pat)).alias("content"),
        ),
    )

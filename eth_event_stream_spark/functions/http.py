"""HTTP/1.x response-message parsing, pure Catalyst — the relational
layer between raw WARC ``application/http`` record bytes and the HTML
chain (``functions/html.py``).

Common Crawl response records carry a FULL HTTP message (status line,
CRLF-terminated headers, blank line, entity body — RFC 9112 framing),
not a bare page: the WARC-level ``Content-Type`` is ``application/http;
msgtype=response`` and everything a curator filters on — status code,
media type, declared charset, redirect target, declared length — lives
in the HTTP header block. Headers are ASCII-structured string data, so
the parse belongs in codegen'd column expressions, exactly like
robots.txt (``plans/web.py``): ``regexp_extract`` per field over the
header block, with the block isolated first so a header-shaped line in
the BODY can never match. No Python, no UDF, no shuffle.

Scope (documented, like the robots matching contract): the first
status line and the first occurrence of each named header; RFC 9112
deprecated obs-fold continuation lines are not reassembled (crawl
archives do not emit them); field names are matched case-insensitively
per RFC 9110 §5.1.

The byte-level half (splitting header block from body BEFORE charset
decode, so header bytes never leak into extracted text) lives in
``operators/ingest.py:split_http_response`` — this module parses the
header block those rows carry.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_BLANK = "\r\n\r\n"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def http_headers_block(col: Column | str) -> Column:
    """Everything before the first CRLF CRLF — the status line plus the
    header fields. Safe to run on a full message OR on an
    already-isolated block (then it is the identity)."""
    return F.substring_index(_c(col), _BLANK, 1)


def http_body(col: Column | str) -> Column:
    """The entity body of a full message: everything after the FIRST
    blank line (later blank lines belong to the body). NULL when the
    message has no blank line (malformed framing — surfaced, not
    guessed)."""
    c = _c(col)
    at = F.instr(c, _BLANK)
    return F.when(at > 0, F.substring(c, at + F.lit(len(_BLANK)), F.length(c)))


def http_version(col: Column | str) -> Column:
    """``1.1`` from ``HTTP/1.1 200 OK`` — '' when the block does not
    start with a status line (the caller's malformed-record signal)."""
    return F.regexp_extract(http_headers_block(col), r"^HTTP/(\d\.\d)\s", 1)


def http_status_code(col: Column | str) -> Column:
    """The 3-digit status code as a bigint, NULL on a malformed status
    line (never a silent 0)."""
    s = F.regexp_extract(
        http_headers_block(col), r"^HTTP/\d\.\d (\d{3})(?=[ \r\n]|$)", 1
    )
    return F.nullif(s, F.lit("")).cast("bigint")


def http_reason(col: Column | str) -> Column:
    """The reason phrase ('' is legal per RFC 9112 — NULL means the
    status line itself was malformed)."""
    block = http_headers_block(col)
    line = F.regexp_extract(block, r"^(HTTP/\d\.\d \d{3}[^\r\n]*)", 1)
    return F.when(
        F.nullif(line, F.lit("")).isNotNull(),
        F.regexp_replace(line, r"^HTTP/\d\.\d \d{3} ?", ""),
    )


def http_header(col: Column | str, name: str) -> Column:
    """The value of the FIRST header field named ``name`` (RFC 9110
    case-insensitive field names, optional whitespace around the value),
    NULL when absent. ``name`` is a literal Python string — it is
    escaped into the regex, never interpolated as a pattern."""
    pat = r"(?im)^" + re.escape(name) + r"[ \t]*:[ \t]*([^\r\n]*?)[ \t]*$"
    return F.nullif(
        F.regexp_extract(http_headers_block(col), pat, 1), F.lit("")
    )


def http_content_type(col: Column | str) -> Column:
    """The media type alone (parameters stripped), lowercased and
    trimmed — ``text/html; charset=utf-8`` -> ``text/html``."""
    ct = http_header(col, "Content-Type")
    return F.lower(F.trim(F.substring_index(ct, ";", 1)))


def http_charset(col: Column | str) -> Column:
    """The charset parameter of the Content-Type header, lowercased,
    quotes stripped, NULL when undeclared — the data-driven input to the
    sniffing precedence (``operators/charset.py``)."""
    ct = http_header(col, "Content-Type")
    # parameter name anchored at a boundary so a parameter merely ENDING
    # in 'charset' (e.g. x-charset=foo) is never read as the charset
    got = F.regexp_extract(
        ct, r"""(?i)(?:^|[;\s])charset[ \t]*=[ \t]*"?([^;"\s]+)""", 1
    )
    return F.lower(F.nullif(got, F.lit("")))


def http_content_length(col: Column | str) -> Column:
    """Content-Length as a bigint — NULL when absent OR nonconforming
    (anything but ASCII digits; ``int``-style '+10'/'1_0' forms must not
    decode silently, the same contract as the WARC-level framing check
    in ``operators/warc.py``)."""
    v = http_header(col, "Content-Length")
    return F.when(v.rlike(r"^[0-9]+$"), v).cast("bigint")


def http_location(col: Column | str) -> Column:
    """The redirect target (3xx responses) — the crawl-frontier edge a
    curation pipeline follows or prunes."""
    return http_header(col, "Location")


def http_date(col: Column | str, name: str = "Date") -> Column:
    """An RFC 9110 §5.6.7 IMF-fixdate header (``Sun, 06 Nov 1994
    08:49:37 GMT``) parsed to a UTC epoch-seconds BIGINT — NULL when
    absent or not in the preferred format (the obsolete RFC 850 and
    asctime forms are rare in archived crawls and parse to NULL rather
    than guessed; a pipeline can count them). ``name`` picks the header
    (Date, Last-Modified, Expires)."""
    v = http_header(col, name)
    # Spark's post-3.0 pattern table makes 'E' (day name) FORMAT-only,
    # so the weekday prefix is validated then stripped by regex; 'zzz'
    # parses the GMT zone designator, so the instant is UTC regardless
    # of the session timezone; try_to_timestamp keeps malformed values
    # NULL instead of failing the job under ANSI mode
    body = F.regexp_extract(
        v, r"^(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun), ([0-9]{2} .+)$", 1
    )
    return F.unix_timestamp(
        F.try_to_timestamp(
            F.nullif(body, F.lit("")),
            F.lit("dd MMM yyyy HH:mm:ss zzz"),
        )
    ).cast("bigint")


def http_cache_control(col: Column | str, directive: str) -> Column:
    """One Cache-Control directive's value (RFC 9111 §5.2): the seconds
    argument for valued directives (``max-age=3600`` -> ``3600``) or
    the directive name itself for boolean ones (``no-store`` ->
    ``no-store``); NULL when the directive is absent. The directive
    name is anchored at a list boundary so ``s-maxage`` never matches a
    ``max-age`` probe. Non-numeric arguments are legal (RFC 9111 §5.2.2
    field-name lists: ``no-cache="set-cookie"``) — the directive still
    reads as PRESENT (name returned, argument dropped); only an
    all-digits argument comes back as the seconds value."""
    cc = http_header(col, "Cache-Control")
    # The optional argument is a quoted-string (may contain commas and
    # spaces) or an unquoted token — matching it fully is what keeps
    # the trailing list-boundary lookahead from rejecting the whole
    # directive when the argument is non-numeric. ONE capture keeps
    # the quotes; the digits re-extract runs on that SMALL value, not
    # the whole header (a two-group + rlike formulation here read 2.3x
    # on the composed recrawl row — measured r15, fixed same round).
    pat = (
        r"(?i)(?:^|[,\s])"
        + re.escape(directive)
        + r"(?:[ \t]*=[ \t]*(\"[^\"]*\"|[^,\s\"]+))?"
        + r"(?=$|[,\s])"
    )
    hit = F.regexp_extract(cc, pat, 0)
    raw = F.regexp_extract(cc, pat, 1)
    num = F.regexp_extract(raw, r'^"?([0-9]+)"?$', 1)
    return F.when(
        F.trim(hit) != "",
        F.coalesce(F.nullif(num, F.lit("")), F.lit(directive)),
    )


def http_age(col: Column | str) -> Column:
    """The Age header as BIGINT seconds (RFC 9111 §5.1) — NULL when
    absent or nonconforming (digits only, same discipline as
    Content-Length)."""
    v = http_header(col, "Age")
    return F.when(v.rlike(r"^[0-9]+$"), v).cast("bigint")


def http_header_pairs(col: Column | str) -> Column:
    """Every header field of the block, in wire order, as
    ``array<struct<name:string,value:string>>`` — the full-response-
    header harvest a CC-shaped WAT envelope publishes under
    ``HTTP-Response-Metadata.Headers``. ``http_header`` answers a
    SINGLE literal name; this is the enumerating twin. The status line
    (no colon before its first space) is excluded by requiring a
    colon-terminated field name; names and values trim optional
    whitespace per RFC 9110. Deprecated line folding (obs-fold,
    RFC 9112 §5.2) is not unfolded — folded continuations lack a colon
    and drop out, surfacing as a shorter map rather than a corrupt
    value. Pure Catalyst (split + array lambdas), no UDF."""
    lines = F.split(http_headers_block(col), r"\r\n")
    fields = F.filter(lines, lambda x: x.rlike("^[^\\s:][^:]*:"))
    return F.transform(
        fields,
        lambda x: F.struct(
            F.trim(F.substring_index(x, ":", 1)).alias("name"),
            F.trim(F.regexp_replace(x, "^[^:]*:", "")).alias("value"),
        ),
    )

"""URL features, pure Catalyst — the domain-level curation step.

Web-corpus curation filters and aggregates BY URL STRUCTURE before any
content look: per-domain page budgets, TLD allow/deny lists, path-depth
heuristics (deep paths correlate with calendars/faceted search), query-
string stripping for URL-level dedup. All of it is string work, so it
belongs in codegen'd column expressions — Spark ships ``parse_url``
(HOST/PATH/QUERY/PROTOCOL, the obscure-but-JVM-side primitive) and the
rest is regex arithmetic. No Python, no UDF, no shuffle until the
per-domain aggregate the caller asks for.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_host(col: Column | str) -> Column:
    """Hostname (no scheme, no port, no userinfo), lowercased."""
    return F.lower(F.parse_url(_c(col), F.lit("HOST")))


def url_tld(col: Column | str) -> Column:
    """The final dot-separated host label ('' when the host has no dot —
    a bare label has no TLD to speak of)."""
    return F.regexp_extract(url_host(col), r"\.([^.]+)$", 1)


def url_registrable_domain(col: Column | str) -> Column:
    """The last two host labels (``site.example``) — the eTLD+1 under
    single-label public suffixes ONLY. The real decision against a
    public-suffix rule table (multi-label ``co.uk`` suffixes, wildcard
    and exception rules, by the published publicsuffix.org algorithm)
    is ``plans.web.psl_registrable_domain``, which broadcast-joins the
    rules dim; use this column form only when no rule table is in
    play."""
    h = url_host(col)
    return F.when(
        h.rlike(r"\.[^.]+\.[^.]+$"),
        F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1),
    ).otherwise(h)


def url_path_depth(col: Column | str) -> Column:
    """Number of non-empty path segments (``/a/b/c`` -> 3, ``/`` -> 0)."""
    p = F.coalesce(F.parse_url(_c(col), F.lit("PATH")), F.lit(""))
    return F.size(F.filter(F.split(p, "/"), lambda x: x != "")).cast("bigint")


def url_has_query(col: Column | str) -> Column:
    return F.parse_url(_c(col), F.lit("QUERY")).isNotNull()


def url_strip_query(col: Column | str) -> Column:
    """The URL without its query string or fragment — the key URL-level
    dedup canonicalizes on."""
    return F.regexp_replace(_c(col), r"[?#].*$", "")


_UNRESERVED_RE = r"^[A-Za-z0-9._~-]$"
_BIG = 2147483647


def url_normalize_percent(col: Column | str) -> Column:
    """RFC 3986 §6.2.2.1-2 percent-encoding normalization, pure
    Catalyst: hex digits of every percent triplet uppercased
    (``%2f`` -> ``%2F``) and triplets encoding UNRESERVED characters
    (ALPHA / DIGIT / ``-._~``) decoded (``%7E`` -> ``~``) — decoding
    anything else would change meaning (``%2F`` is not ``/``), so
    everything else stays encoded. A ``%`` not followed by two hex
    digits is nonconforming input and passes through untouched (never
    guessed at). Implementation: one ``split`` on ``%`` + one
    ``transform`` over the tail pieces — each piece decides its own
    leading escape — then ``array_join``; no UDF, no explode."""
    s = _c(col)
    parts = F.split(s, "%", -1)

    def piece(x):
        pr = F.upper(F.substring(x, 1, 2))
        rest = F.substring(x, 3, _BIG)
        valid = pr.rlike(r"^[0-9A-F]{2}$")
        ch = F.chr(F.conv(pr, 16, 10).cast("bigint"))
        return (
            F.when(valid & ch.rlike(_UNRESERVED_RE), F.concat(ch, rest))
            .when(valid, F.concat(F.lit("%"), pr, rest))
            .otherwise(F.concat(F.lit("%"), x))
        )

    return F.when(F.size(parts) <= 1, s).otherwise(
        F.concat(
            F.element_at(parts, 1),
            F.array_join(
                F.transform(
                    F.slice(parts, 2, F.size(parts) - 1), lambda x: piece(x)
                ),
                "",
            ),
        )
    )


def url_remove_dot_segments(path: Column | str) -> Column:
    """RFC 3986 §5.2.4 remove_dot_segments over an ABSOLUTE path, as one
    Catalyst ``aggregate`` over the split segments: ``.`` drops, ``..``
    pops (never past the root), anything else — including empty
    segments from ``//`` runs, which the RFC preserves — appends; a
    trailing ``.``/``..`` leaves the trailing slash the RFC's algorithm
    leaves. Relative references are a resolver's job (§5.2), not this
    column's; crawl URLs are absolute."""
    p = _c(path)
    segs = F.split(p, "/", -1)
    folded = F.aggregate(
        segs,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, seg: F.when(seg == ".", acc)
        .when(
            seg == "..",
            F.when(
                F.size(acc) > 1, F.slice(acc, 1, F.size(acc) - 1)
            ).otherwise(acc),
        )
        .otherwise(F.concat(acc, F.array(seg))),
    )
    closed = F.when(
        F.element_at(segs, -1).isin(".", ".."),
        F.concat(folded, F.array(F.lit(""))),
    ).otherwise(folded)
    return F.when(p == "", p).otherwise(F.array_join(closed, "/"))


def url_canonicalize(col: Column | str, sort_query: bool = False) -> Column:
    """RFC 3986 §6 syntax-based normalization in pure Catalyst — the
    canonical form crawl-level URL dedup keys on: scheme and host
    lowercased (§6.2.2.1), percent-encoding normalized
    (``url_normalize_percent``), the default port of the scheme dropped
    (§6.2.3: ``:80`` for http, ``:443`` for https; any explicit empty
    ``:`` drops too), the fragment removed (it never reaches the
    server), dot-segments removed from the path
    (``url_remove_dot_segments``), an empty path normalized to ``/``
    for http(s) (§6.2.3), and an EMPTY query dropped (a crawl treats
    ``/p?`` and ``/p`` as one fetch; documented choice — RFC 3986
    technically distinguishes them). With ``sort_query`` the query
    parameters are additionally sorted byte-wise — NOT an RFC
    normalization (order can matter to servers) but the standard
    crawl-dedup strengthening; off by default. Tracking-parameter
    stripping is data-driven and lives in
    ``plans.web.strip_tracking_params`` (broadcast rules dim).

    One regexp parse (the RFC appendix-B grammar), string expressions
    throughout, no UDF, no shuffle."""
    u = url_normalize_percent(F.regexp_replace(_c(col), "#.*$", ""))
    scheme = F.lower(F.regexp_extract(u, r"^([^:/?#]+):", 1))
    auth = F.regexp_extract(u, r"^[^:/?#]+://([^/?#]*)", 1)
    path = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"^[^#]*?\?([^#]*)", 1)
    has_query = u.rlike(r"^[^#]*\?")
    userinfo = F.regexp_extract(auth, r"^([^@]*)@", 1)
    hostport = F.regexp_replace(auth, r"^[^@]*@", "")
    host = F.lower(F.regexp_replace(hostport, r":[0-9]*$", ""))
    port = F.regexp_extract(hostport, r":([0-9]*)$", 1)
    default_port = F.when(scheme == "http", F.lit("80")).when(
        scheme == "https", F.lit("443")
    )
    keep_port = (
        hostport.rlike(r":[0-9]*$")
        & (port != "")
        & ~port.eqNullSafe(default_port)
    )
    norm_path = url_remove_dot_segments(path)
    norm_path = F.when(
        (norm_path == "") & scheme.isin("http", "https"), F.lit("/")
    ).otherwise(norm_path)
    q = (
        F.array_join(F.sort_array(F.split(query, "&", -1)), "&")
        if sort_query
        else query
    )
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        F.when(userinfo != "", F.concat(userinfo, F.lit("@"))).otherwise(
            F.lit("")
        ),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        norm_path,
        F.when(has_query & (q != ""), F.concat(F.lit("?"), q)).otherwise(
            F.lit("")
        ),
    )
    # non-hierarchical references (mailto:, data:, a bare path) have no
    # authority to normalize — they keep the fragment/percent pass only
    return F.when(u.rlike(r"^[^:/?#]+://"), rebuilt).otherwise(u)


def url_surt(col: Column | str, strip_www: bool = True) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the ordering
    CDX / cc-index-style URL indexes sort and range-scan on: host
    labels REVERSED and comma-joined, a ``)`` separator, then the path
    and (byte-wise sorted) query — ``https://www.example.com:8080/a?b=2&a=1``
    -> ``com,example:8080)/a?a=1&b=2``. Reversing the host puts every
    page of a registrable domain (and every subdomain under it) in ONE
    contiguous key range, which is what makes per-site scans, prefix
    dedup, and domain sharding range-prunable at 100 TB. Expects a
    CANONICAL url (``url_canonicalize``); applies the conventional
    ``www.`` strip by default (cc-index does; pass ``strip_www=False``
    for the strict transform). Non-default ports stay in the key —
    different ports are different services. Pure Catalyst."""
    u = _c(col)
    auth = F.regexp_extract(u, r"^[^:/?#]+://([^/?#]*)", 1)
    hostport = F.regexp_replace(auth, r"^[^@]*@", "")
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    rest = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*([^#]*)", 1)
    path = F.regexp_replace(rest, r"\?.*$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.sort_array(F.split(query, "&", -1)), "&")
    return F.concat(
        rev,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        path,
        F.when(
            rest.rlike(r"\?") & (sorted_q != ""),
            F.concat(F.lit("?"), sorted_q),
        ).otherwise(F.lit("")),
    )


def url_resolve(base: Column | str, ref: Column | str) -> Column:
    """RFC 3986 §5.2 relative-reference resolution, pure Catalyst — the
    step that turns a page's raw ``href`` values into fetchable frontier
    URLs. Covers the whole §5.2.2 algorithm over hierarchical bases:
    absolute refs pass through (their own path dot-normalized),
    scheme-relative ``//host/p`` takes the base scheme, absolute-path
    ``/p`` takes the base authority, query-only ``?q`` keeps the base
    path, empty and fragment-only refs resolve to the base itself
    WITHOUT its query (documented deviation: §5.4 says ``""`` yields
    ``http://a/b/c/d;p?q`` — this resolver keys on the PAGE and drops
    ``?q``, the right identity for a frontier builder; pinned beside
    the RFC vectors in tests/test_url.py), fragments never reach the
    server and are dropped throughout, and
    RELATIVE paths merge per §5.2.3 — the base path up to its last
    ``/`` prepends the ref, then ``url_remove_dot_segments`` normalizes
    ``..``/``.`` exactly as the spec's algorithm does. The RFC's own
    §5.4 test vectors are pinned in tests/test_url.py. Non-hierarchical
    refs (``mailto:``, ``javascript:``) pass through for the caller to
    filter — a frontier builder drops them by scheme.

    Plan-size note: the branches pick (root, raw path, query) FIRST and
    ONE shared ``url_remove_dot_segments`` runs on the chosen path — a
    per-branch normalization would triple the expression tree, and this
    column is built to be composed under ``url_canonicalize`` (stage
    the result as a real column before composing; see
    ``web_outlink_frontier``)."""
    b = _c(base)
    r = F.regexp_replace(_c(ref), "#.*$", "")  # fragments never arrive
    b_scheme = F.regexp_extract(b, r"^([^:/?#]+):", 1)
    b_root = F.regexp_extract(b, r"^([^:/?#]+://[^/?#]*)", 1)
    b_path = F.regexp_extract(b, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    has_scheme = r.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:")
    is_abs = r.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    is_schemerel = r.startswith("//")
    # merge (§5.2.3): base path up to the last '/', or '/' when the
    # base has an authority but an empty path
    b_dir = F.when(b_path == "", F.lit("/")).otherwise(
        F.regexp_replace(b_path, r"[^/]*$", "")
    )
    r_path = F.regexp_replace(r, r"\?.*$", "")
    r_query = F.regexp_extract(r, r"(\?.*)$", 1)
    root = (
        F.when(is_abs, F.regexp_extract(r, r"^([^:/?#]+://[^/?#]*)", 1))
        .when(
            is_schemerel,
            F.concat(
                b_scheme, F.lit(":"), F.regexp_extract(r, r"^(//[^/?#]*)", 1)
            ),
        )
        .otherwise(b_root)
    )
    raw_path = (
        F.when(is_abs, F.regexp_extract(r, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1))
        .when(is_schemerel, F.regexp_extract(r, r"^//[^/?#]*([^?#]*)", 1))
        .when((r == "") | r.startswith("?"), b_path)
        .when(r.startswith("/"), r_path)
        .otherwise(F.concat(b_dir, r_path))
    )
    query = F.when(r == "", F.lit("")).otherwise(r_query)
    hier = F.concat(root, url_remove_dot_segments(raw_path), query)
    # non-hierarchical (mailto:, javascript:): passthrough for the
    # caller's scheme filter
    return F.when(has_scheme & ~is_abs, r).otherwise(hier)

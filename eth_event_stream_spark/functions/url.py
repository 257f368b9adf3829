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

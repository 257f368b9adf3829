"""Charset sniffing for web ingest — BOM, Content-Type, meta tags.

Real crawls carry pages in many encodings; feeding them all through
``bytes.decode("utf-8", "replace")`` silently mangles every legacy-
encoded page. This module implements the deterministic core of the
WHATWG encoding-sniffing algorithm a pipeline actually needs, in
precedence order: (1) a byte-order mark wins outright (UTF-8 / UTF-16
LE / BE); (2) a ``charset=`` parameter on the transport Content-Type;
(3) a ``<meta charset=...>`` or ``<meta http-equiv="Content-Type"
content="...charset=...">`` tag inside the first 1024 bytes (the
standard's prescan window); (4) the caller's default (UTF-8). Labels
resolve through the stdlib codec registry with the two WHATWG aliases
the registry spells differently (``latin1`` for ``iso-8859-1``,
``cp1252`` for ``windows-1252``). An unknown label in a CONTENT source
(Content-Type param, meta tag) is a failure of that precedence step per
the WHATWG algorithm and falls through to the next one — crawl pages
declare garbage charsets and must not abort the job; an unknown label
handed directly to ``resolve_charset_label`` (a caller-supplied fixed
codec name) still fails LOUDLY.

Decoding itself is stdlib ``codecs`` — the reference implementation IS
the implementation, so there is nothing to pin beyond the sniffing
logic, which the tests cover label by label.
"""

from __future__ import annotations

import codecs
import re

# BOMs in precedence order (UTF-8 first: its BOM is also valid UTF-16 noise)
_BOMS = [
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
]

# the WHATWG prescan window
_PRESCAN = 1024

_META_CHARSET = re.compile(
    rb"""(?is)<meta[^>]+charset\s*=\s*["']?\s*([a-z0-9._:\-]+)"""
)

# labels whose WHATWG meaning the stdlib spells differently; everything
# else resolves through codecs.lookup directly
_ALIASES = {
    "iso-8859-1": "latin-1",
    "latin1": "latin-1",
    "windows-1252": "cp1252",
    "x-user-defined": "latin-1",  # closest stdlib analog, byte-preserving
}


def resolve_charset_label(label: str) -> str:
    """A charset label -> the canonical stdlib codec name, or ValueError
    for labels the registry cannot resolve (never a silent fallback)."""
    label = label.strip().strip("\"'").lower()
    if not label:
        raise ValueError("empty charset label")
    name = _ALIASES.get(label, label)
    try:
        return codecs.lookup(name).name
    except LookupError:
        raise ValueError(f"unknown charset label {label!r}") from None


def sniff_charset(payload: bytes, content_type: str | None = None) -> str:
    """The encoding of an HTML/text payload, by the documented precedence:
    BOM > Content-Type charset param > meta tag in the first 1024 bytes >
    UTF-8. Returns a canonical stdlib codec name.

    Unknown labels in the CONTENT sources (Content-Type, meta tag) are
    treated per the WHATWG algorithm: a label that fails to resolve is a
    failure of that precedence step, and sniffing falls through to the
    next one — one crawl page declaring ``charset=klingon-9`` (or a
    false-positive of the loose meta prescan) must not abort a
    100 TB ingest job. ``resolve_charset_label`` itself stays LOUD for
    caller-supplied fixed codec names."""
    for bom, name in _BOMS:
        if payload.startswith(bom):
            return codecs.lookup(name).name
    if content_type:
        m = re.search(r"(?i)charset\s*=\s*([^;\s\"']+)", content_type)
        if m:
            try:
                return resolve_charset_label(m.group(1))
            except ValueError:
                pass  # WHATWG: unresolvable label -> next precedence step
    m = _META_CHARSET.search(payload[:_PRESCAN])
    if m:
        try:
            return resolve_charset_label(m.group(1).decode("ascii", "replace"))
        except ValueError:
            pass
    return "utf-8"


def decode_payload(payload: bytes, content_type: str | None = None) -> str:
    """Sniff, strip the BOM when one chose the codec, and decode with
    REPLACEMENT (a training pipeline keeps the page and marks damage
    rather than dropping it) — but the codec itself is never guessed
    past the documented precedence."""
    enc = sniff_charset(payload, content_type)
    for bom, name in _BOMS:
        if payload.startswith(bom) and codecs.lookup(name).name == enc:
            payload = payload[len(bom):]
            break
    return payload.decode(enc, "replace")

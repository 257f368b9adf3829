"""Minimal pure-stdlib WARC (Web ARChive) reader/writer — the Common
Crawl ingest format.

WARC (ISO 28500; the public WARC 1.0/1.1 specification) is the format
the largest public web corpora ship in, so a training-data engine needs
to read it natively: a WARC file is a sequence of records, each a
version line (``WARC/1.0``), CRLF-terminated named headers (at minimum
``WARC-Type``, ``WARC-Record-ID``, ``WARC-Date``, ``Content-Length``),
one empty line, ``Content-Length`` bytes of payload, and a CRLF CRLF
trailer. Archives are usually stored with EACH RECORD as its own gzip
member (``.warc.gz``) — that per-record framing is what makes 100 TB
crawls random-access: an index of (offset, length) pairs lets any
worker inflate exactly one record without touching the rest of the
file. This module supports both plain and multi-member-gzip framing,
with the loud-failure discipline of the other in-repo codecs: a
truncated record, a bad version line, a missing mandatory header, a
Content-Length that disagrees with the framing, or trailing garbage
raises ``ValueError`` — never a silently short record list.

The writer exists so tests and the synth lane can build REAL archives
in-container; it is not a production write path.

Reference parity note: the reference repo (Rust, ~1.6k lines) has no
web-archive layer; this file extends the engine's training-data ingest
surface (SURVEY.md §2 capability categories) from the public format
specification only, like operators/png.py and operators/wav.py before
it.
"""

from __future__ import annotations

import gzip
import io
import zlib

_MAX_DECODED_BYTES = 256 * 1024 * 1024  # same ceiling as the other codecs

_CRLF = b"\r\n"
_MANDATORY = ("WARC-Type", "WARC-Record-ID", "WARC-Date", "Content-Length")
# well-known field names re-keyed to canonical casing on parse (WARC
# field names are case-insensitive per ISO 28500); the revisit /
# concurrency linkage headers (ISO 28500 §6.7.2 / §5.7) are included so
# the captures lane reads them whatever casing the writer emitted
_CANONICAL = _MANDATORY + (
    "WARC-Target-URI",
    "Content-Type",
    "WARC-Payload-Digest",
    "WARC-Refers-To",
    "WARC-Refers-To-Target-URI",
    "WARC-Refers-To-Date",
    "WARC-Concurrent-To",
    "WARC-Profile",
)


def is_warc(data: bytes) -> bool:
    """Plain WARC starts with a version line; gzipped WARC is a gzip
    stream whose FIRST inflated bytes are one (checked lazily on parse —
    here the magic is enough to route)."""
    return data[:5] == b"WARC/" or data[:2] == b"\x1f\x8b"


def _parse_one(data: bytes, pos: int) -> tuple[dict, int]:
    """Parse the record starting at ``pos``; return (record, next_pos).
    The record dict carries every header (original case) plus
    ``payload`` (bytes)."""
    eol = data.find(_CRLF, pos)
    if eol < 0:
        raise ValueError("truncated WARC: no version line terminator")
    version = data[pos:eol]
    if version not in (b"WARC/1.0", b"WARC/1.1"):
        raise ValueError(f"not a WARC record: version line {version[:20]!r}")
    headers: dict[str, str] = {}
    pos = eol + 2
    while True:
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("truncated WARC: header block ran past the end")
        line = data[pos:eol]
        pos = eol + 2
        if not line:
            break  # empty line ends the header block
        if line[:1] in (b" ", b"\t"):  # obs-fold continuation
            if not headers:
                raise ValueError("corrupt WARC: continuation before any header")
            headers[last] += " " + line.strip().decode("utf-8", "replace")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise ValueError(f"corrupt WARC: header line without colon: {line[:40]!r}")
        last = name.strip().decode("ascii")
        headers[last] = value.strip().decode("utf-8", "replace")
    lower = {k.lower(): v for k, v in headers.items()}
    for h in _MANDATORY:
        if h.lower() not in lower:
            raise ValueError(f"corrupt WARC: missing mandatory header {h}")
    # WARC field names are case-insensitive (ISO 28500): re-key the
    # well-known headers to canonical casing so consumers can read
    # rec["WARC-Type"] whatever the writer emitted; unknown headers keep
    # their original spelling
    for canon in _CANONICAL:
        low = canon.lower()
        if low in lower:
            for k in list(headers):
                if k.lower() == low and k != canon:
                    del headers[k]
            headers[canon] = lower[low]
    # strict ASCII digits only: int() would silently accept '+10',
    # ' 10 ', '1_0' (underscore grouping), and non-ASCII decimal digits —
    # all nonconforming per ISO 28500, which defines the value as 1*DIGIT
    clen_raw = lower["content-length"]
    if not (clen_raw and all("0" <= c <= "9" for c in clen_raw)):
        raise ValueError(
            f"corrupt WARC: non-digit Content-Length {clen_raw!r}"
        )
    clen = int(clen_raw)
    if pos + clen + 4 > len(data):
        raise ValueError("truncated WARC: payload ran past the end")
    payload = data[pos : pos + clen]
    pos += clen
    if data[pos : pos + 4] != _CRLF + _CRLF:
        raise ValueError("corrupt WARC: record lacks the CRLF CRLF trailer")
    rec = dict(headers)
    rec["payload"] = payload
    return rec, pos + 4


def _walk_members(data: bytes) -> list[tuple[int, int, bytes]]:
    """Walk a multi-member gzip stream ONCE: (offset, compressed length,
    inflated bytes) per member — the ``.warc.gz`` per-record framing.
    zlib tells us where each member ends (``unused_data``), which is
    exactly the offset a random-access index records. The shared walk
    behind ``parse_warc``, ``warc_member_index``, and ``warc_cdx``, so
    each pays for one inflation."""
    members = []
    budget = _MAX_DECODED_BYTES
    pos = 0
    while pos < len(data):
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("corrupt warc.gz: garbage between gzip members")
        if budget <= 0:
            # zlib treats max_length=0 as UNLIMITED — never hand it that
            raise ValueError("refusing warc.gz: decoded size exceeds the ceiling")
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(data[pos:], budget)
        except zlib.error as e:
            raise ValueError(f"corrupt warc.gz: {e}") from None
        if not d.eof:
            raise ValueError(
                "truncated warc.gz member (or decoded size exceeds the ceiling)"
            )
        budget -= len(out)
        end = len(data) - len(d.unused_data)
        members.append((pos, end - pos, out))
        pos = end
    return members


def _gzip_members(data: bytes) -> list[bytes]:
    return [out for _, _, out in _walk_members(data)]


def parse_warc(data: bytes) -> list[dict]:
    """Parse a WARC payload (plain or multi-member gzip) into its record
    list. Every record is validated: version line, mandatory headers,
    Content-Length framing, CRLF CRLF trailer, no trailing garbage. For
    gzip framing, each member must hold a whole number of records (the
    spec RECOMMENDS exactly one per member; a conforming multi-record
    member still parses)."""
    if len(data) > _MAX_DECODED_BYTES:
        raise ValueError("refusing WARC: input exceeds the ceiling")
    if data[:2] == b"\x1f\x8b":
        chunks = _gzip_members(data)
    elif data[:5] == b"WARC/":
        chunks = [data]
    else:
        raise ValueError("not a WARC: neither a version line nor gzip magic")
    records = []
    for chunk in chunks:
        pos = 0
        while pos < len(chunk):
            rec, pos = _parse_one(chunk, pos)
            records.append(rec)
    if not records:
        raise ValueError("corrupt WARC: no records")
    return records


def warc_member_index(data: bytes) -> list[tuple[int, int]]:
    """(offset, compressed length) of every gzip member in a ``.warc.gz``
    — the CDX-style index that makes a crawl random-access: store these
    two ints per record and any worker can fetch one record with a ranged
    read (``warc_record_at``) instead of streaming the archive."""
    if data[:2] != b"\x1f\x8b":
        raise ValueError("warc_member_index: not a gzip stream")
    return [(off, ln) for off, ln, _ in _walk_members(data)]


def warc_record_at(data: bytes, offset: int) -> dict:
    """Random access into a ``.warc.gz``: inflate and parse ONLY the gzip
    member starting at byte ``offset`` — the 100 TB access pattern (a
    CDX-style index stores these offsets; a worker fetches one record
    with a ranged read and never touches the rest of the archive)."""
    if data[offset : offset + 2] != b"\x1f\x8b":
        raise ValueError(f"no gzip member at offset {offset}")
    d = zlib.decompressobj(wbits=31)
    out = d.decompress(data[offset:], _MAX_DECODED_BYTES)
    if not d.eof:
        raise ValueError("truncated warc.gz member at offset")
    rec, end = _parse_one(out, 0)
    if end != len(out):
        raise ValueError("gzip member holds more than one record")
    return rec


def encode_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Build a WARC payload from record dicts (``headers`` mapping +
    ``payload`` bytes; mandatory headers must be present). With
    ``gzip_members`` each record becomes its own gzip member — the
    ``.warc.gz`` random-access framing. Tests and the synth lane only."""
    out = []
    for rec in records:
        headers = rec["headers"]
        lower = {k.lower() for k in headers}
        missing = [h for h in _MANDATORY if h.lower() not in lower and h != "Content-Length"]
        if missing:
            raise ValueError(f"encode_warc: missing mandatory headers {missing}")
        payload = rec["payload"]
        lines = [b"WARC/1.0"]
        for k, v in headers.items():
            if k.lower() == "content-length":
                continue  # framing owns it
            lines.append(f"{k}: {v}".encode())
        lines.append(f"Content-Length: {len(payload)}".encode())
        raw = _CRLF.join(lines) + _CRLF + _CRLF + payload + _CRLF + _CRLF
        if gzip_members:
            buf = io.BytesIO()
            # mtime pinned so archives are byte-reproducible across runs
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(raw)
            raw = buf.getvalue()
        out.append(raw)
    return b"".join(out)

"""Web-archive ingest: WARC files -> document rows, Spark-first.

The Common Crawl access pattern at 100 TB: archives live as binary
columns (or files) partitioned across the cluster; each worker parses
its own archives record by record inside one Arrow-batched
``mapInPandas`` pass — no shuffle, bytes never leave their partition,
and the output is small typed rows (url, type, length, text) that are
JVM-side again for everything downstream (dedup, quality, language
ID, ...). Per-record gzip members (``.warc.gz``) keep the format
random-access: ``operators.warc.warc_record_at`` inflates exactly one
record from a byte offset, which is how a CDX-style index turns a 100 TB
crawl into ranged reads.

The synth half (``documents_as_warc``) builds REAL ``.warc.gz`` archives
from the documents table with record bodies that are pure functions of
(doc_id, record index), so a SQL oracle replays every parsed record's
url and byte count arithmetically — the same oracle discipline as the
media codec lanes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_ARCHIVE_SCHEMA = StructType(
    [
        StructField("archive_id", LongType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

WARC_DOC_SCHEMA = StructType(
    [
        StructField("archive_id", LongType(), False),
        StructField("rec_idx", LongType(), False),
        StructField("rectype", StringType(), False),
        StructField("url", StringType(), True),
        StructField("n_bytes", LongType(), False),
        StructField("text", StringType(), True),
    ]
)


def split_http_message(message: bytes) -> tuple[bytes, bytes]:
    """Split ANY HTTP/1.x message (request or response) at its first
    blank line into ``(header_block, body)`` — requests start with a
    method line rather than ``HTTP/``, so this validates only the RFC
    9112 blank-line framing. Real Common Crawl archives occasionally
    carry LF-only-framed messages (RFC 9112 §2.2 tells recipients they
    MAY recognize bare LF as a line terminator), so bare ``\\n\\n``
    framing is tolerated — whichever blank line comes FIRST wins, so a
    conforming CRLF message is never re-split at a stray LF pair inside
    its body. Loud only when NO blank line exists in either framing (a
    header block that never ends is corrupt, not a judgment call)."""
    at_crlf = message.find(b"\r\n\r\n")
    at_lf = message.find(b"\n\n")
    if at_crlf < 0 and at_lf < 0:
        raise ValueError(
            "corrupt HTTP message: no blank line ends the header block"
        )
    if at_lf < 0 or (0 <= at_crlf and at_crlf <= at_lf):
        return message[:at_crlf], message[at_crlf + 4 :]
    return message[:at_lf], message[at_lf + 2 :]


def split_http_response(message: bytes) -> tuple[bytes, bytes]:
    """Split a full HTTP/1.x response message (RFC 9112 framing: status
    line, CRLF-terminated header fields, one blank line, entity body)
    into ``(header_block, body)`` — the byte-level step that must happen
    BEFORE charset decoding, so header bytes never leak into extracted
    text and the HTTP-level Content-Type can drive the sniff. Loud on a
    missing status line or a missing blank line (a WARC response record
    whose payload claims ``application/http`` but is not an HTTP message
    is corrupt data, not a judgment call)."""
    if not message.startswith(b"HTTP/"):
        raise ValueError(
            f"not an HTTP response message: starts {message[:12]!r}"
        )
    return split_http_message(message)


def _http_content_type(header_block: bytes) -> str | None:
    """The FIRST Content-Type header value from a raw header block —
    field names are case-insensitive per RFC 9110. Header bytes are
    ASCII-structured; latin-1 maps every byte losslessly."""
    import re

    m = re.search(
        r"(?im)^content-type[ \t]*:[ \t]*([^\r\n]*)",
        header_block.decode("latin-1"),
    )
    return m.group(1).strip() if m else None


def synth_warc_payload(doc_id: int) -> bytes:
    """Deterministic REAL ``.warc.gz`` archive for ``doc_id``:
    ``1 + doc_id % 3`` response records, each its own gzip member
    (mtime pinned, byte-reproducible), record ``r``'s body
    ``("doc {doc_id} rec {r} ") * (1 + (doc_id + r) % 5)`` — so a SQL
    oracle replays every record's url and byte count with string
    arithmetic, no WARC parsing anywhere near the oracle."""
    from .warc import encode_warc

    n = 1 + doc_id % 3
    recs = []
    for r in range(n):
        body = (f"doc {doc_id} rec {r} " * (1 + (doc_id + r) % 5)).encode()
        recs.append(
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:{doc_id:016x}{r:016x}>",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                    "WARC-Target-URI": f"https://example.invalid/{doc_id}/{r}",
                },
                "payload": body,
            }
        )
    return encode_warc(recs, gzip_members=True)


def documents_as_warc(documents: DataFrame) -> DataFrame:
    """Synthesize real ``.warc.gz`` archives from the documents table
    inside an Arrow-batched ``mapInPandas`` — the encode half of the WARC
    ingest round trip, running in executor Python workers where the rows
    already are: no shuffle, no driver involvement."""
    from ..shipping import ship_package

    ship_package(documents.sparkSession)
    ids = documents.select(F.col("doc_id").alias("archive_id"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (int(aid), synth_warc_payload(int(aid)))
                for aid in pdf["archive_id"]
            ]
            yield pd.DataFrame(
                out, columns=[f.name for f in WARC_ARCHIVE_SCHEMA.fields]
            )

    return ids.mapInPandas(fn, schema=WARC_ARCHIVE_SCHEMA)


def synth_warc_html_payload(doc_id: int, text: str) -> bytes:
    """Deterministic one-record ``.warc.gz`` whose record is a FULL HTTP
    response (``application/http; msgtype=response`` — the framing real
    Common Crawl response records use: status line, Content-Type with a
    charset param, exact Content-Length, blank line) whose entity is an
    HTML page embedding the document's text (HTML-escaped), plus every
    markup feature the extraction contract must survive: a comment, a
    style block, a script block containing ``<`` and quotes, block tags,
    and pre-escaped entities. The visible text is a pure string function
    of (doc_id, text), so a SQL oracle replays the extraction end to end
    — which makes the oracle ALSO verify the HTTP header/body split: a
    split that leaked header bytes into the text breaks the hash."""
    from .warc import encode_warc

    esc = (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )
    html = (
        f"<html><!-- meta {doc_id} --><head><title>doc {doc_id}</title>"
        "<style>p { color: red }</style></head>"
        '<body><script>var x = "1"; if (x < "2") { }</script>'
        f"<h1>doc {doc_id}</h1><p>A &amp; B &lt;ok&gt;</p>"
        f"<p>{esc}</p></body></html>"
    ).encode()
    message = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )
    return encode_warc(
        [
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:{doc_id:032x}>",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                    "WARC-Target-URI": f"https://example.invalid/{doc_id}",
                    "Content-Type": "application/http; msgtype=response",
                },
                "payload": message,
            }
        ],
        gzip_members=True,
    )


def documents_as_warc_html(documents: DataFrame) -> DataFrame:
    """Synthesize one-record HTML ``.warc.gz`` archives from the documents
    table (doc_id + text) in one Arrow-batched ``mapInPandas`` — the
    encode half of the WET-style extraction round trip."""
    from ..shipping import ship_package

    ship_package(documents.sparkSession)
    ids = documents.select(F.col("doc_id").alias("archive_id"), "text")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (int(aid), synth_warc_html_payload(int(aid), str(txt)))
                for aid, txt in zip(pdf["archive_id"], pdf["text"])
            ]
            yield pd.DataFrame(
                out, columns=[f.name for f in WARC_ARCHIVE_SCHEMA.fields]
            )

    return ids.mapInPandas(fn, schema=WARC_ARCHIVE_SCHEMA)


WARC_CDX_SCHEMA = StructType(
    [
        StructField("archive_id", LongType(), False),
        StructField("rec_idx", LongType(), False),
        StructField("url", StringType(), True),
        StructField("offset", LongType(), False),
        StructField("length", LongType(), False),
        StructField("ranged_read_ok", StringType(), False),  # 'true'|mismatch
    ]
)


def warc_cdx(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Build a CDX-style index over ``.warc.gz`` archives — one row per
    record with its gzip-member (offset, length) — and SELF-VERIFY each
    entry by actually performing the ranged read (``warc_record_at`` on
    the offset) and comparing the fetched record's id and target URI
    against the sequential parse. Two independent code paths must agree
    before a row leaves the executor; a mismatch is reported in the row
    (never silently dropped) and any framing corruption raises.

    At 100 TB the index is built once per archive where the bytes live
    (one Arrow pass, no shuffle) and persisted; every later access is a
    two-int ranged read instead of a stream-through."""
    from ..shipping import ship_package

    ship_package(df.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .warc import _parse_one, _walk_members, warc_record_at

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["archive_id"], pdf[payload_col]):
                data = bytes(payload)
                if data[:2] != b"\x1f\x8b":
                    raise ValueError(
                        f"archive {aid}: the per-record index requires "
                        ".warc.gz framing (one gzip member per record)"
                    )
                # ONE walk yields offsets, lengths, AND the inflated
                # bytes — the sequential parse pays a single inflation;
                # the ranged read below is the deliberate independent
                # second path being verified
                seq = []
                for i, (off, ln, out) in enumerate(_walk_members(data)):
                    rec, end = _parse_one(out, 0)
                    if end != len(out):
                        raise ValueError(
                            f"archive {aid}: gzip member {i} holds more "
                            "than one record (multi-record member "
                            "archives have no per-record index)"
                        )
                    seq.append((rec, off, ln))
                for i, (rec, off, ln) in enumerate(seq):
                    fetched = warc_record_at(data, off)
                    ok = (
                        fetched["WARC-Record-ID"] == rec["WARC-Record-ID"]
                        and fetched.get("WARC-Target-URI")
                        == rec.get("WARC-Target-URI")
                        and fetched["payload"] == rec["payload"]
                    )
                    rows.append(
                        (
                            int(aid),
                            i,
                            rec.get("WARC-Target-URI"),
                            off,
                            ln,
                            "true" if ok else "ranged read mismatch",
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_CDX_SCHEMA.fields]
            )

    return df.mapInPandas(fn, schema=WARC_CDX_SCHEMA)


def warc_to_documents(
    df: DataFrame, payload_col: str = "payload", charset: str = "sniff"
) -> DataFrame:
    """Parse WARC archives (plain or per-record-gzip) into one row per
    record: (archive_id, rec_idx, rectype, url, n_bytes, text) — the
    ingest step that turns a crawl into a documents table. One
    Arrow-batched ``mapInPandas`` pass; a malformed archive fails LOUDLY
    (the codec-lane contract), never a silently short record list.

    Records whose WARC-level Content-Type is ``application/http`` (the
    framing real Common Crawl response records use) carry a FULL HTTP
    message as payload: the HTTP header block is split off BEFORE
    decoding (``split_http_response``) so header bytes never leak into
    ``text``, and the HTTP-level Content-Type — not the WARC-level one —
    feeds the charset sniff. Every other record's payload is the bare
    entity, decoded directly.

    ``text`` decodes per ``charset``: ``"sniff"`` (default) runs the
    documented BOM > Content-Type > meta-prescan > UTF-8 precedence
    (``operators/charset.py``) so legacy-encoded crawl pages come out as
    the right characters instead of replacement junk; any other value is
    a fixed codec name. Characters the chosen codec cannot map are
    REPLACED (a pipeline keeps the page and marks damage); the lossless
    byte count of the decoded entity (the HTTP body for
    ``application/http`` records, the record payload otherwise) travels
    separately in ``n_bytes``."""
    from ..shipping import ship_package

    ship_package(df.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .charset import decode_payload
        from .warc import parse_warc

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["archive_id"], pdf[payload_col]):
                for i, rec in enumerate(parse_warc(bytes(payload))):
                    body = rec["payload"]
                    ctype = rec.get("Content-Type")
                    if (
                        ctype
                        and ctype.split(";")[0].strip().lower()
                        == "application/http"
                    ):
                        # responses must carry a status line; requests
                        # (and other msgtypes real crawls interleave)
                        # start with a method line — only the blank-line
                        # framing is common to both
                        if rec["WARC-Type"] == "response":
                            hdr, body = split_http_response(body)
                        else:
                            hdr, body = split_http_message(body)
                        # message body -> entity (chunked / gzip /
                        # deflate undone) before the charset decode
                        body = http_entity_bytes(hdr, body)
                        ctype = _http_content_type(hdr)
                    text = (
                        decode_payload(body, ctype)
                        if charset == "sniff"
                        else body.decode(charset, "replace")
                    )
                    rows.append(
                        (
                            int(aid),
                            i,
                            rec["WARC-Type"],
                            rec.get("WARC-Target-URI"),
                            len(body),
                            text,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_DOC_SCHEMA.fields]
            )

    return df.mapInPandas(fn, schema=WARC_DOC_SCHEMA)


WARC_HTTP_SCHEMA = StructType(
    [
        StructField("archive_id", LongType(), False),
        StructField("rec_idx", LongType(), False),
        StructField("url", StringType(), True),
        StructField("http_headers", StringType(), False),
        StructField("n_body_bytes", LongType(), False),
        StructField("body_text", StringType(), False),
    ]
)


def synth_warc_http_payload(doc_id: int) -> bytes:
    """Deterministic one-record ``.warc.gz`` whose record is a full HTTP
    response exercising the header-parse surface on formulaic schedules
    a SQL oracle replays: status 301 + Location when ``doc_id % 7 == 0``
    (checked first), 404 when ``doc_id % 11 == 3``, else 200; media type
    and charset alternate on ``doc_id % 2``; the Content-Type field NAME
    is lowercased on ``doc_id % 3 == 0`` (RFC 9110 case-insensitivity);
    Content-Length is exact except ``doc_id % 13 == 5`` which emits the
    nonconforming ``+N`` (must parse to NULL, never a silent int); and
    the BODY contains a header-shaped ``Location:`` line that must NOT
    match (block isolation)."""
    from .warc import encode_warc

    if doc_id % 7 == 0:
        status, reason = 301, "Moved Permanently"
    elif doc_id % 11 == 3:
        status, reason = 404, "Not Found"
    else:
        status, reason = 200, "OK"
    body = (
        f"body {doc_id} " * (1 + doc_id % 4) + "\nLocation: /fake-in-body"
    ).encode()
    ct_name = "content-type" if doc_id % 3 == 0 else "Content-Type"
    ct_val = (
        "text/html; charset=utf-8"
        if doc_id % 2 == 0
        else "text/plain; charset=windows-1252"
    )
    clen = f"+{len(body)}" if doc_id % 13 == 5 else str(len(body))
    lines = [f"HTTP/1.1 {status} {reason}", f"{ct_name}: {ct_val}"]
    if status == 301:
        lines.append(
            f"Location: https://site{doc_id % 20}.example/moved/{doc_id}"
        )
    lines.append(f"Content-Length: {clen}")
    message = ("\r\n".join(lines) + "\r\n\r\n").encode() + body
    return encode_warc(
        [
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:{doc_id:032x}>",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                    "WARC-Target-URI": (
                        f"https://site{doc_id % 20}.example/p/{doc_id}"
                    ),
                    "Content-Type": "application/http; msgtype=response",
                },
                "payload": message,
            }
        ],
        gzip_members=True,
    )


def documents_as_warc_http(documents: DataFrame) -> DataFrame:
    """Synthesize the HTTP-response ``.warc.gz`` archives
    (``synth_warc_http_payload``) in one Arrow-batched ``mapInPandas``."""
    from ..shipping import ship_package

    ship_package(documents.sparkSession)
    ids = documents.select(F.col("doc_id").alias("archive_id"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (int(aid), synth_warc_http_payload(int(aid)))
                for aid in pdf["archive_id"]
            ]
            yield pd.DataFrame(
                out, columns=[f.name for f in WARC_ARCHIVE_SCHEMA.fields]
            )

    return ids.mapInPandas(fn, schema=WARC_ARCHIVE_SCHEMA)


def warc_http_responses(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Parse WARC archives and surface every ``application/http``
    RESPONSE record as (archive_id, rec_idx, url, http_headers,
    n_body_bytes, body_text) — the byte-level half of the HTTP layer:
    the header block splits off BEFORE decoding (headers are ASCII-
    structured and decode latin-1 losslessly into ``http_headers`` for
    the pure-Catalyst field extraction in ``functions/http.py``), the
    body decodes by the documented charset precedence with the
    HTTP-level Content-Type as its transport input, and ``rec_idx``
    keeps the record's position in the FULL archive so rows join back
    against a CDX index. Non-response / non-http records (request,
    metadata, warcinfo — real crawls interleave them) are SELECTED OUT
    by contract; a response record whose payload is not a well-formed
    HTTP message raises. One Arrow pass, bytes partition-local."""
    from ..shipping import ship_package

    ship_package(df.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .charset import decode_payload
        from .warc import parse_warc

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["archive_id"], pdf[payload_col]):
                for i, rec in enumerate(parse_warc(bytes(payload))):
                    ctype = rec.get("Content-Type", "")
                    if (
                        rec["WARC-Type"] != "response"
                        or ctype.split(";")[0].strip().lower()
                        != "application/http"
                    ):
                        continue
                    hdr, body = split_http_response(rec["payload"])
                    # message body -> entity: undo chunked transfer
                    # coding and Content-Encoding BEFORE the charset
                    # sniff; n_body_bytes is the DECODED entity length
                    # (the bytes the text actually came from)
                    body = http_entity_bytes(hdr, body)
                    rows.append(
                        (
                            int(aid),
                            i,
                            rec.get("WARC-Target-URI"),
                            hdr.decode("latin-1"),
                            len(body),
                            decode_payload(body, _http_content_type(hdr)),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_HTTP_SCHEMA.fields]
            )

    return df.mapInPandas(fn, schema=WARC_HTTP_SCHEMA)


WARC_CAPTURE_SCHEMA = StructType(
    [
        StructField("archive_id", LongType(), False),
        StructField("rec_idx", LongType(), False),
        StructField("rectype", StringType(), False),
        StructField("url", StringType(), True),
        StructField("record_id", StringType(), False),
        StructField("warc_date", StringType(), False),
        StructField("payload_digest", StringType(), True),
        StructField("refers_to", StringType(), True),
        StructField("concurrent_to", StringType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)


def warc_captures(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Surface every CAPTURE-shaped record (response, revisit, request —
    the record types that participate in crawl-time dedup and
    request/response pairing; metadata/warcinfo/conversion are selected
    out by contract) with its linkage headers: ``WARC-Payload-Digest``
    (the crawl-time dedup key, ISO 28500 §5.9), ``WARC-Refers-To`` (the
    revisit's explicit pointer at the original capture, §6.7.2), and
    ``WARC-Concurrent-To`` (the request<->response pairing edge, §5.7).
    ``rec_idx`` keeps the FULL-archive position so rows join back
    against a CDX index; ``n_bytes`` is the record payload length as
    stored (a conforming identical-payload-digest revisit stores 0 —
    exactly the under-count a pipeline inherits if it drops revisits
    instead of resolving them). One Arrow pass, bytes partition-local;
    the RESOLUTION of these edges is relational and lives in
    ``plans/web.py:resolve_revisits`` where it runs as ordinary joins.

    Reference parity note: the reference repo has no web-archive layer
    (SURVEY.md §2.4); this extends the training-data ingest surface from
    the public ISO 28500 specification only."""
    from ..shipping import ship_package

    ship_package(df.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .warc import parse_warc

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["archive_id"], pdf[payload_col]):
                for i, rec in enumerate(parse_warc(bytes(payload))):
                    if rec["WARC-Type"] not in (
                        "response",
                        "revisit",
                        "request",
                        # WET derivations carry WARC-Refers-To linkage
                        # back at their source response (ISO 28500 §6.8)
                        "conversion",
                    ):
                        continue
                    rows.append(
                        (
                            int(aid),
                            i,
                            rec["WARC-Type"],
                            rec.get("WARC-Target-URI"),
                            rec["WARC-Record-ID"],
                            rec["WARC-Date"],
                            rec.get("WARC-Payload-Digest"),
                            rec.get("WARC-Refers-To"),
                            rec.get("WARC-Concurrent-To"),
                            len(rec["payload"]),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_CAPTURE_SCHEMA.fields]
            )

    return df.mapInPandas(fn, schema=WARC_CAPTURE_SCHEMA)


def synth_warc_revisit_payload(doc_id: int) -> bytes:
    """Deterministic ``.warc.gz`` interleaving response and REVISIT
    records on formulaic schedules a SQL oracle replays relationally.
    Archives come in groups of four sharing one page: with
    ``g = doc_id - doc_id % 4`` and ``r = doc_id % 4``, archive ``g``
    (r == 0) holds the ORIGINAL response — url ``/p/{g}``, body
    ``("page {g} ") * (1 + g % 5)``, payload digest ``sha1:SYN{g}`` (a
    formulaic stand-in: the digest is a join key here, not a checksum —
    resolution semantics are what's under test) — and archives r in
    1..3 hold identical-payload-digest REVISITS of it (zero-length
    stored payload, per the revisit profile): r == 1 carries an explicit
    ``WARC-Refers-To`` pointing at the original's record id; r in {2,3}
    resolve by digest alone. When ``doc_id % 11 == 7`` the digest is
    ``sha1:MISSING{doc_id}`` — dangling for the digest-only rows
    (unresolvable: the bytes were never captured) while the r == 1 row
    still resolves via its explicit pointer (refers-to precedence,
    pinned). When ``doc_id % 6 == 2`` a metadata record precedes the
    capture (selected out by ``warc_captures``) so rec_idx must keep the
    full-archive position."""
    from .warc import encode_warc

    g = doc_id - doc_id % 4
    r = doc_id % 4
    recs = []
    if doc_id % 6 == 2:
        recs.append(
            {
                "headers": {
                    "WARC-Type": "metadata",
                    "WARC-Record-ID": f"<urn:uuid:meta-{doc_id}>",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                },
                "payload": b"fetch-notes: ok",
            }
        )
    digest = (
        f"sha1:MISSING{doc_id}" if doc_id % 11 == 7 else f"sha1:SYN{g}"
    )
    if r == 0:
        body = (f"page {g} " * (1 + g % 5)).encode()
        recs.append(
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:rec-{doc_id}>",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                    "WARC-Target-URI": f"https://cc.example/p/{g}",
                    "WARC-Payload-Digest": digest,
                },
                "payload": body,
            }
        )
    else:
        headers = {
            "WARC-Type": "revisit",
            "WARC-Record-ID": f"<urn:uuid:rec-{doc_id}>",
            "WARC-Date": f"2026-01-0{1 + r}T00:00:00Z",
            "WARC-Target-URI": f"https://cc.example/p/{g}?visit={r}",
            "WARC-Payload-Digest": digest,
            "WARC-Profile": (
                "http://netpreserve.org/warc/1.0/revisit/"
                "identical-payload-digest"
            ),
        }
        if r == 1:
            headers["WARC-Refers-To"] = f"<urn:uuid:rec-{g}>"
            headers["WARC-Refers-To-Target-URI"] = (
                f"https://cc.example/p/{g}"
            )
            headers["WARC-Refers-To-Date"] = "2026-01-01T00:00:00Z"
        recs.append({"headers": headers, "payload": b""})
    return encode_warc(recs, gzip_members=True)


def documents_as_warc_revisit(documents: DataFrame) -> DataFrame:
    """Synthesize the revisit-interleaved ``.warc.gz`` archives
    (``synth_warc_revisit_payload``) in one Arrow-batched
    ``mapInPandas``."""
    from ..shipping import ship_package

    ship_package(documents.sparkSession)
    ids = documents.select(F.col("doc_id").alias("archive_id"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (int(aid), synth_warc_revisit_payload(int(aid)))
                for aid in pdf["archive_id"]
            ]
            yield pd.DataFrame(
                out, columns=[f.name for f in WARC_ARCHIVE_SCHEMA.fields]
            )

    return ids.mapInPandas(fn, schema=WARC_ARCHIVE_SCHEMA)


def synth_warc_pair_payload(doc_id: int) -> bytes:
    """Deterministic ``.warc.gz`` holding a REQUEST record and its
    RESPONSE, linked the way real crawls link them (ISO 28500 §5.7: the
    request's ``WARC-Concurrent-To`` names the response record written
    for the same capture event). Schedules a SQL oracle replays: the
    response's WARC-Date lands ``doc_id % 5`` seconds after the
    request's (the fetch-latency signal a politeness audit reads); when
    ``doc_id % 9 == 4`` the request carries NO ``WARC-Concurrent-To``
    (sloppy writer — must surface unpaired, never join by guesswork);
    when ``doc_id % 6 == 2`` a metadata record precedes both (rec_idx
    keeps full-archive positions)."""
    from .warc import encode_warc

    recs = []
    if doc_id % 6 == 2:
        recs.append(
            {
                "headers": {
                    "WARC-Type": "metadata",
                    "WARC-Record-ID": f"<urn:uuid:meta-{doc_id}>",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                },
                "payload": b"fetch-notes: ok",
            }
        )
    req_headers = {
        "WARC-Type": "request",
        "WARC-Record-ID": f"<urn:uuid:req-{doc_id}>",
        "WARC-Date": "2026-01-01T00:00:00Z",
        "WARC-Target-URI": f"https://site{doc_id % 20}.example/p/{doc_id}",
        "Content-Type": "application/http; msgtype=request",
    }
    if doc_id % 9 != 4:
        req_headers["WARC-Concurrent-To"] = f"<urn:uuid:resp-{doc_id}>"
    body = (f"page {doc_id} " * (1 + doc_id % 3)).encode()
    recs.append(
        {
            "headers": req_headers,
            "payload": (
                b"GET /p/" + str(doc_id).encode() + b" HTTP/1.1\r\n"
                b"Host: site" + str(doc_id % 20).encode()
                + b".example\r\n\r\n"
            ),
        }
    )
    recs.append(
        {
            "headers": {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:uuid:resp-{doc_id}>",
                "WARC-Date": f"2026-01-01T00:00:0{doc_id % 5}Z",
                "WARC-Target-URI": (
                    f"https://site{doc_id % 20}.example/p/{doc_id}"
                ),
            },
            "payload": body,
        }
    )
    return encode_warc(recs, gzip_members=True)


def documents_as_warc_pairs(documents: DataFrame) -> DataFrame:
    """Synthesize the request/response-paired ``.warc.gz`` archives
    (``synth_warc_pair_payload``) in one Arrow-batched ``mapInPandas``."""
    from ..shipping import ship_package

    ship_package(documents.sparkSession)
    ids = documents.select(F.col("doc_id").alias("archive_id"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (int(aid), synth_warc_pair_payload(int(aid)))
                for aid in pdf["archive_id"]
            ]
            yield pd.DataFrame(
                out, columns=[f.name for f in WARC_ARCHIVE_SCHEMA.fields]
            )

    return ids.mapInPandas(fn, schema=WARC_ARCHIVE_SCHEMA)


def dechunk_http_body(body: bytes) -> tuple[bytes, bytes]:
    """Decode an RFC 9112 §7.1 chunked transfer coding into
    ``(entity, trailer_block)``: hex chunk-size lines (chunk extensions
    after ``;`` ignored per spec), exact chunk bytes each followed by
    CRLF, a ``0`` last-chunk, then an optional trailer section ended by
    a blank line. Malformed chunk framing — a non-hex size line, chunk
    bytes not followed by CRLF, a missing last-chunk — raises
    ``ValueError`` (that is CORRUPT data, the same contract as the WARC
    framing checks; an unsupported-but-legal coding is a different case
    and passes through in ``decode_content_encoding``)."""
    out = []
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("corrupt chunked body: no chunk-size line")
        size_line = body[pos:eol].split(b";", 1)[0].strip()
        if not size_line or any(
            c not in b"0123456789abcdefABCDEF" for c in size_line
        ):
            raise ValueError(
                f"corrupt chunked body: bad chunk size {size_line[:16]!r}"
            )
        size = int(size_line, 16)
        pos = eol + 2
        if size == 0:
            break
        if pos + size + 2 > len(body):
            raise ValueError("corrupt chunked body: chunk ran past the end")
        out.append(body[pos : pos + size])
        if body[pos + size : pos + size + 2] != b"\r\n":
            raise ValueError("corrupt chunked body: chunk lacks CRLF")
        pos += size + 2
    # trailer section: zero or more header lines, then a blank line
    trailer_end = body.find(b"\r\n\r\n", pos - 2)
    trailer = body[pos:] if trailer_end < 0 else body[pos : trailer_end + 2]
    return b"".join(out), trailer.rstrip(b"\r\n")


def decode_content_encoding(body: bytes, encoding: str | None) -> bytes:
    """Undo an RFC 9110 Content-Encoding: ``gzip``/``x-gzip`` (RFC 1952),
    ``deflate`` (RFC 1950 zlib framing, with the documented raw-deflate
    fallback — real servers send both), ``identity``/absent passthrough.
    Any OTHER coding (``br``, ``zstd``, …) is LEGAL HTTP this container
    cannot decode (no brotli/zstd libs): the raw bytes pass through
    UNCHANGED — the caller sees the coding name in the headers and
    filters or routes; raising would kill a 100 TB pass over records
    that are merely unsupported, not corrupt. Corrupt framing WITHIN a
    supported coding raises."""
    import gzip as _gzip
    import zlib as _zlib

    enc = (encoding or "identity").strip().lower()
    if enc in ("identity", ""):
        return body
    if enc in ("gzip", "x-gzip"):
        try:
            return _gzip.decompress(body)
        except (OSError, EOFError, _zlib.error) as e:
            raise ValueError(f"corrupt gzip entity: {e}") from None
    if enc == "deflate":
        try:
            return _zlib.decompress(body)
        except _zlib.error:
            try:
                return _zlib.decompress(body, -15)  # raw-deflate fallback
            except _zlib.error as e:
                raise ValueError(f"corrupt deflate entity: {e}") from None
    return body


def http_entity_bytes(header_block: bytes, body: bytes) -> bytes:
    """The full RFC message-body -> entity decode: undo
    ``Transfer-Encoding: chunked`` first (it is the WIRE framing,
    applied last by the sender), then ``Content-Encoding`` (the entity
    representation). Values read case-insensitively from the raw header
    block; a Transfer-Encoding list ending in ``chunked``
    (``gzip, chunked``) dechunks — any earlier codings in the list are
    then handled by the same decode_content_encoding table. Returns the
    entity bytes the charset sniff should see.

    FAIL-OPEN per record: archive writers that store the DECODED
    payload without renaming the framing headers exist (Common Crawl
    renames to ``X-Crawler-Transfer-Encoding`` precisely because
    others don't) — for such records the stored body is already the
    entity, and attempting the advertised decode hits corrupt-looking
    framing. A ValueError from any decode stage therefore falls back
    to the ORIGINAL stored bytes instead of killing the whole Arrow
    pass; truly corrupt payloads surface downstream as mojibake text,
    not a dead job. The component decoders (``dechunk_http_body``,
    ``decode_content_encoding``) keep their loud contracts for callers
    that want them."""
    import re

    hdrs = header_block.decode("latin-1")

    def h(name):
        m = re.search(
            rf"(?im)^{name}[ \t]*:[ \t]*([^\r\n]*)", hdrs
        )
        return m.group(1).strip() if m else None

    original = body
    te = (h("Transfer-Encoding") or "").lower()
    codings = [c.strip() for c in te.split(",") if c.strip()]
    try:
        if codings and codings[-1] == "chunked":
            body, _trailer = dechunk_http_body(body)
            codings = codings[:-1]
        for c in reversed(codings):
            body = decode_content_encoding(body, c)
        return decode_content_encoding(body, h("Content-Encoding"))
    except ValueError:
        return original


def synth_warc_encoded_payload(doc_id: int) -> bytes:
    """Deterministic one-record ``.warc.gz`` whose HTTP response body
    travels in a different WIRE form per schedule while the ENTITY is
    always the same pure string function of doc_id — so one oracle
    replays text and decoded length across all four lanes and any
    decode bug breaks the hash:
      d % 4 == 0: plain (Content-Length)
      d % 4 == 1: Transfer-Encoding: chunked (two chunks, a chunk
                  extension on the first, a trailer on d % 8 == 1)
      d % 4 == 2: Content-Encoding: gzip (RFC 1952, mtime pinned)
      d % 4 == 3: gzip entity INSIDE chunked framing (CE then TE,
                  the order the RFCs compose them)
    """
    import gzip as _gzip

    from .warc import encode_warc

    entity = (f"enc {doc_id} " * (1 + doc_id % 5)).encode()
    te = doc_id % 4 in (1, 3)
    ce = doc_id % 4 in (2, 3)
    wire = _gzip.compress(entity, mtime=0) if ce else entity
    lines = [
        b"HTTP/1.1 200 OK",
        b"Content-Type: text/plain; charset=utf-8",
    ]
    if ce:
        lines.append(b"Content-Encoding: gzip")
    if te:
        lines.append(b"Transfer-Encoding: chunked")
        cut = min(10, len(wire))
        chunks = [wire[:cut], wire[cut:]]
        ext = b";why=split" if doc_id % 8 == 1 else b""
        framed = b""
        for c in chunks:
            if not c:
                continue
            framed += (
                format(len(c), "x").encode()
                + (ext if c is chunks[0] else b"")
                + b"\r\n"
                + c
                + b"\r\n"
            )
        framed += b"0\r\n"
        if doc_id % 8 == 1:
            framed += b"X-Trailer: 1\r\n"
        framed += b"\r\n"
        wire = framed
    else:
        lines.append(b"Content-Length: " + str(len(wire)).encode())
    message = b"\r\n".join(lines) + b"\r\n\r\n" + wire
    return encode_warc(
        [
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:enc-{doc_id}>",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                    "WARC-Target-URI": (
                        f"https://enc.example/p/{doc_id}"
                    ),
                    "Content-Type": "application/http; msgtype=response",
                },
                "payload": message,
            }
        ],
        gzip_members=True,
    )


def documents_as_warc_encoded(documents: DataFrame) -> DataFrame:
    """Synthesize the wire-encoded ``.warc.gz`` archives
    (``synth_warc_encoded_payload``) in one Arrow-batched
    ``mapInPandas``."""
    from ..shipping import ship_package

    ship_package(documents.sparkSession)
    ids = documents.select(F.col("doc_id").alias("archive_id"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (int(aid), synth_warc_encoded_payload(int(aid)))
                for aid in pdf["archive_id"]
            ]
            yield pd.DataFrame(
                out, columns=[f.name for f in WARC_ARCHIVE_SCHEMA.fields]
            )

    return ids.mapInPandas(fn, schema=WARC_ARCHIVE_SCHEMA)


def documents_to_wet(
    docs: DataFrame,
    id_col: str = "archive_id",
    url_col: str = "url",
    text_col: str = "text",
    refers_col: str | None = None,
) -> DataFrame:
    """The WRITE side of the WET pipeline: one real ``.warc.gz`` per row
    holding a ``conversion`` record (ISO 28500 §6.8 — the record type
    WET extracts ship as), UTF-8 text payload, ``text/plain`` content
    type, and — when ``refers_col`` names a column — a ``WARC-Refers-To``
    pointer back at the response record the text was derived from (the
    linkage real Common Crawl WET files carry). Arrow-batched
    ``mapInPandas``; records are byte-reproducible (gzip mtime pinned)
    so a re-publish of unchanged text is binary-identical — the
    property release diffing relies on."""
    from ..shipping import ship_package

    ship_package(docs.sparkSession)
    cols = [id_col, url_col, text_col] + (
        [refers_col] if refers_col else []
    )
    src = docs.select(*cols)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .warc import encode_warc

        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False):
                aid = int(getattr(tup, id_col))
                url = getattr(tup, url_col)
                text = str(getattr(tup, text_col))
                headers = {
                    "WARC-Type": "conversion",
                    "WARC-Record-ID": f"<urn:uuid:wet-{aid}>",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                    "WARC-Target-URI": url,
                    "Content-Type": "text/plain",
                }
                # a NULL linkage is omitted, never serialized as 'None'
                if refers_col and getattr(tup, refers_col) is not None:
                    headers["WARC-Refers-To"] = str(
                        getattr(tup, refers_col)
                    )
                rows.append(
                    (
                        aid,
                        encode_warc(
                            [{"headers": headers, "payload": text.encode()}],
                            gzip_members=True,
                        ),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_ARCHIVE_SCHEMA.fields]
            )

    return src.mapInPandas(fn, schema=WARC_ARCHIVE_SCHEMA)


def synth_warc_linked_payload(doc_id: int) -> bytes:
    """Deterministic one-record ``.warc.gz`` holding a full HTTP
    response whose HTML body carries a formulaic ANCHOR schedule — the
    source material a WAT derivation harvests. With ``h = doc_id % 20``
    the page lives at ``https://site{h}.example/dir/page{doc_id}`` and
    links, in document order: a relative path ``g{d}``, an absolute
    path with an ``&amp;``-escaped query (entity decode is part of the
    harvest contract), an absolute ``https://cdn.example/x/{d}``, and a
    query-only ``?q={d}`` ref on even docs — every href a pure string
    function of doc_id so a SQL oracle replays the harvested link list
    verbatim. The head carries a ``<title>`` and one
    ``<meta name="description">`` (round 16) — the ``Head`` material a
    CC-shaped WAT envelope publishes. Record id ``<urn:uuid:{doc_id:032x}>`` (the same shape the
    WET lane derives its ``WARC-Refers-To`` from), gzip mtime pinned."""
    from .warc import encode_warc

    d = doc_id
    anchors = (
        f'<a href="g{d}">r</a>'
        f'<a href="/abs/{d}?b=2&amp;a=1">a</a>'
        f'<a href="https://cdn.example/x/{d}">c</a>'
    )
    if d % 2 == 0:
        anchors += f'<a href="?q={d}">q</a>'
    html = (
        f"<html><head><title>page {d}</title>"
        f'<meta name="description" content="synthetic page {d}">'
        f"</head><body><h1>page {d}</h1>{anchors}</body></html>"
    ).encode()
    message = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )
    return encode_warc(
        [
            {
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:{doc_id:032x}>",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                    "WARC-Target-URI": (
                        f"https://site{doc_id % 20}.example/dir/page{doc_id}"
                    ),
                    "Content-Type": "application/http; msgtype=response",
                },
                "payload": message,
            }
        ],
        gzip_members=True,
    )


def documents_as_warc_linked(documents: DataFrame) -> DataFrame:
    """Synthesize the linked-page ``.warc.gz`` archives
    (``synth_warc_linked_payload``) in one Arrow-batched
    ``mapInPandas`` — the WARC input of the WAT derivation round
    trip."""
    from ..shipping import ship_package

    ship_package(documents.sparkSession)
    ids = documents.select(F.col("doc_id").alias("archive_id"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (int(aid), synth_warc_linked_payload(int(aid)))
                for aid in pdf["archive_id"]
            ]
            yield pd.DataFrame(
                out, columns=[f.name for f in WARC_ARCHIVE_SCHEMA.fields]
            )

    return ids.mapInPandas(fn, schema=WARC_ARCHIVE_SCHEMA)


def documents_to_wat(
    meta: DataFrame,
    id_col: str = "archive_id",
    url_col: str = "url",
    refers_col: str = "refers_to",
    ctype_col: str = "content_type",
    links_col: str = "links",
    headers_col: str | None = None,
    title_col: str | None = None,
    metas_col: str | None = None,
) -> DataFrame:
    """The WRITE side of the WAT pipeline — the third member of the
    Common Crawl derived-format triple (WARC/WAT/WET). One real
    ``.warc.gz`` per page holding a ``metadata`` record (ISO 28500
    §6.9) whose payload is the WAT JSON envelope: the source page's
    ``WARC-Target-URI`` under ``Envelope.WARC-Header-Metadata``, the
    response headers under ``HTTP-Response-Metadata.Headers`` — the
    FULL header map when ``headers_col`` names an
    ``array<struct<name,value>>`` column (``functions.http.
    http_header_pairs``; duplicate field names keep the LAST value,
    a JSON object cannot repeat keys), else the single stored
    ``Content-Type`` from ``ctype_col`` — and the harvested outlinks
    as ``HTML-Metadata.Links`` (``[{"path": "A@/href", "url": ...}]``
    — url plus the ``path`` provenance key real CC WAT link objects
    carry). When ``title_col``/``metas_col`` are given (``html_title``
    / ``html_meta_pairs`` harvests), an ``HTML-Metadata.Head`` object
    publishes the page title and ``<meta name/content>`` list the way
    CC WAT does. A ``WARC-Refers-To`` header points back at the source
    response record when the value is non-null (omitted otherwise —
    an absent linkage must not serialize as the literal string
    ``None``), the same discipline as ``documents_to_wet``. JSON is
    serialized with sorted keys and compact separators so a re-publish
    of unchanged metadata is byte-identical (gzip mtime pinned) —
    release diffing works on WAT exactly as it does on WET.
    Arrow-batched ``mapInPandas``, bytes partition-local."""
    import json as _json

    from ..shipping import ship_package

    ship_package(meta.sparkSession)
    cols = [id_col, url_col, refers_col, links_col]
    cols.append(headers_col if headers_col else ctype_col)
    if title_col:
        cols.append(title_col)
    if metas_col:
        cols.append(metas_col)
    src = meta.select(*cols)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .warc import encode_warc

        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False):
                aid = int(getattr(tup, id_col))
                url = getattr(tup, url_col)
                # Arrow hands array columns over as numpy arrays, whose
                # truthiness is ambiguous — test None explicitly
                raw_links = getattr(tup, links_col)
                links = [] if raw_links is None else list(raw_links)
                if headers_col:
                    raw_h = getattr(tup, headers_col)
                    hdr_map = {
                        p["name"]: p["value"]
                        for p in ([] if raw_h is None else list(raw_h))
                    }
                else:
                    hdr_map = {"Content-Type": getattr(tup, ctype_col)}
                resp_meta: dict = {
                    "Headers": hdr_map,
                    "HTML-Metadata": {
                        "Links": [
                            {"path": "A@/href", "url": u} for u in links
                        ]
                    },
                }
                if title_col or metas_col:
                    head: dict = {}
                    if metas_col:
                        raw_m = getattr(tup, metas_col)
                        head["Metas"] = [
                            {"content": p["content"], "name": p["name"]}
                            for p in ([] if raw_m is None else list(raw_m))
                        ]
                    if title_col:
                        head["Title"] = getattr(tup, title_col)
                    resp_meta["HTML-Metadata"]["Head"] = head
                envelope = {
                    "Envelope": {
                        "WARC-Header-Metadata": {"WARC-Target-URI": url},
                        "Payload-Metadata": {
                            "HTTP-Response-Metadata": resp_meta
                        },
                    }
                }
                payload = _json.dumps(
                    envelope, sort_keys=True, separators=(",", ":")
                ).encode()
                headers = {
                    "WARC-Type": "metadata",
                    "WARC-Record-ID": f"<urn:uuid:wat-{aid}>",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                    "WARC-Target-URI": url,
                    "Content-Type": "application/json",
                }
                refers = getattr(tup, refers_col)
                if refers is not None:
                    headers["WARC-Refers-To"] = str(refers)
                rows.append(
                    (
                        aid,
                        encode_warc(
                            [{"headers": headers, "payload": payload}],
                            gzip_members=True,
                        ),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_ARCHIVE_SCHEMA.fields]
            )

    return src.mapInPandas(fn, schema=WARC_ARCHIVE_SCHEMA)


WARC_METADATA_SCHEMA = StructType(
    [
        StructField("archive_id", LongType(), False),
        StructField("rec_idx", LongType(), False),
        StructField("rectype", StringType(), False),
        StructField("url", StringType(), True),
        StructField("record_id", StringType(), False),
        StructField("refers_to", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("n_bytes", LongType(), False),
        StructField("json_text", StringType(), False),
    ]
)


def warc_metadata_records(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """The READ side of the WAT pipeline: surface every ``metadata``
    record (ISO 28500 §6.9) with its linkage headers and UTF-8 payload
    text — everything read from the published bytes, nothing
    recomputed. ``warc_captures`` deliberately selects metadata records
    OUT (they are not captures and must not join crawl-time dedup);
    this is the lane that reads them. ``rec_idx`` keeps the
    full-archive position so rows join a CDX index; parsing the JSON
    envelope is Catalyst's job downstream (``from_json`` — see
    ``ingest_wat_roundtrip``). One Arrow pass, bytes partition-local."""
    from ..shipping import ship_package

    ship_package(df.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .warc import parse_warc

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["archive_id"], pdf[payload_col]):
                for i, rec in enumerate(parse_warc(bytes(payload))):
                    if rec["WARC-Type"] != "metadata":
                        continue
                    rows.append(
                        (
                            int(aid),
                            i,
                            rec["WARC-Type"],
                            rec.get("WARC-Target-URI"),
                            rec["WARC-Record-ID"],
                            rec.get("WARC-Refers-To"),
                            rec.get("Content-Type"),
                            len(rec["payload"]),
                            rec["payload"].decode("utf-8"),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_METADATA_SCHEMA.fields]
            )

    return df.mapInPandas(fn, schema=WARC_METADATA_SCHEMA)

"""The HTTP response layer (round 13): byte-level header/body split
(operators/ingest.py:split_http_response), pure-Catalyst field
extraction (functions/http.py), and the Spark lane surfacing WARC
application/http records (warc_http_responses) — plus the ADVICE-r12
fix that warc_to_documents must not leak HTTP header bytes into text
and must consult the HTTP-level charset."""

from __future__ import annotations

import pytest

from eth_event_stream_spark.operators.ingest import (
    _http_content_type,
    split_http_response,
)


def _msg(
    status=b"HTTP/1.1 200 OK",
    headers=(b"Content-Type: text/html; charset=utf-8",),
    body=b"<p>hi</p>",
):
    return status + b"\r\n" + b"\r\n".join(headers) + b"\r\n\r\n" + body


def test_split_http_response():
    hdr, body = split_http_response(_msg())
    assert hdr.startswith(b"HTTP/1.1 200 OK") and b"\r\n\r\n" not in hdr
    assert body == b"<p>hi</p>"
    # later blank lines belong to the body
    hdr, body = split_http_response(_msg(body=b"a\r\n\r\nb"))
    assert body == b"a\r\n\r\nb"
    with pytest.raises(ValueError, match="not an HTTP response"):
        split_http_response(b"<html>no status line</html>")
    with pytest.raises(ValueError, match="no blank line"):
        split_http_response(b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n")


def test_split_http_lf_only_framing():
    """ADVICE-r13: real archives occasionally carry LF-only-framed
    messages (RFC 9112 §2.2 bare-LF tolerance); one such record must not
    kill a 100 TB ingest pass. The FIRST blank line wins in either
    framing, so conforming CRLF messages never re-split at an LF pair
    inside their body."""
    from eth_event_stream_spark.operators.ingest import split_http_message

    hdr, body = split_http_response(
        b"HTTP/1.1 200 OK\nContent-Type: text/plain\n\nlf body"
    )
    assert hdr == b"HTTP/1.1 200 OK\nContent-Type: text/plain"
    assert body == b"lf body"
    # CRLF framing wins when its blank line comes first, even with a
    # bare \n\n later in the body
    hdr, body = split_http_response(_msg(body=b"x\n\ny"))
    assert body == b"x\n\ny"
    # LF blank line before a CRLF one: LF framing is the real split
    hdr, body = split_http_message(b"GET / HTTP/1.1\nHost: x\n\na\r\n\r\nb")
    assert hdr == b"GET / HTTP/1.1\nHost: x" and body == b"a\r\n\r\nb"
    with pytest.raises(ValueError, match="no blank line"):
        split_http_message(b"GET / HTTP/1.1\nHost: x\n")


def test_http_content_type_python_side():
    assert _http_content_type(split_http_response(_msg())[0]) == (
        "text/html; charset=utf-8"
    )
    # case-insensitive field name; first occurrence wins
    hdr, _ = split_http_response(
        _msg(headers=(b"CONTENT-TYPE: a/b", b"Content-Type: c/d"))
    )
    assert _http_content_type(hdr) == "a/b"
    hdr, _ = split_http_response(_msg(headers=(b"X-Other: 1",)))
    assert _http_content_type(hdr) is None


def _extract(spark, message: str) -> dict:
    from pyspark.sql import functions as F

    from eth_event_stream_spark.functions.http import (
        http_body,
        http_charset,
        http_content_length,
        http_content_type,
        http_header,
        http_location,
        http_reason,
        http_status_code,
        http_version,
    )

    df = spark.createDataFrame([(message,)], "m string")
    row = df.select(
        http_version("m").alias("version"),
        http_status_code("m").alias("status"),
        http_reason("m").alias("reason"),
        http_content_type("m").alias("ctype"),
        http_charset("m").alias("charset"),
        http_content_length("m").alias("clen"),
        http_location("m").alias("location"),
        http_body("m").alias("body"),
        http_header("m", "X-Custom").alias("custom"),
    ).collect()[0]
    # the extraction must be pure Catalyst
    plan = df.select(http_status_code("m"))._jdf.queryExecution()
    assert "Python" not in plan.executedPlan().toString()
    return row.asDict()


def test_catalyst_field_extraction(spark):
    got = _extract(
        spark,
        "HTTP/1.1 301 Moved Permanently\r\n"
        "content-type: Text/HTML ; charset=\"Windows-1252\"\r\n"
        "Location: https://d.example/new\r\n"
        "Content-Length: 12\r\n"
        "X-Custom:  padded value \r\n"
        "\r\n"
        "body\r\nLocation: /fake-in-body",
    )
    assert got["version"] == "1.1" and got["status"] == 301
    assert got["reason"] == "Moved Permanently"
    # media type lowercased + trimmed; charset param unquoted + lowercased
    assert got["ctype"] == "text/html" and got["charset"] == "windows-1252"
    assert got["clen"] == 12
    # the header-shaped line inside the BODY must not match (block isolation)
    assert got["location"] == "https://d.example/new"
    assert got["body"] == "body\r\nLocation: /fake-in-body"
    assert got["custom"] == "padded value"


def test_catalyst_extraction_edges(spark):
    # empty reason phrase is legal ('' not NULL); absent headers are NULL
    got = _extract(spark, "HTTP/1.0 204 \r\n\r\n")
    assert got["status"] == 204 and got["reason"] == ""
    assert got["ctype"] is None and got["charset"] is None
    assert got["clen"] is None and got["location"] is None
    assert got["body"] == ""
    # nonconforming Content-Length forms parse to NULL, never a silent int
    for bad in ("+10", "1_0", " 10 x", "0x10"):
        got = _extract(spark, f"HTTP/1.1 200 OK\r\nContent-Length: {bad}\r\n\r\n")
        assert got["clen"] is None, bad
    # malformed status line -> NULL status / NULL reason, '' version
    got = _extract(spark, "ICY 200 OK\r\n\r\n")
    assert got["status"] is None and got["reason"] is None
    assert got["version"] == ""
    # no blank line -> body NULL (malformed framing surfaced, not guessed)
    got = _extract(spark, "HTTP/1.1 200 OK\r\nContent-Type: a/b\r\n")
    assert got["body"] is None and got["status"] == 200
    # ADVICE-r13: a parameter merely ENDING in 'charset' must not be read
    # as the charset; a real charset after it still is
    got = _extract(
        spark, "HTTP/1.1 200 OK\r\nContent-Type: a/b; x-charset=foo\r\n\r\n"
    )
    assert got["charset"] is None
    got = _extract(
        spark,
        "HTTP/1.1 200 OK\r\n"
        "Content-Type: a/b; x-charset=foo; charset=utf-8\r\n\r\n",
    )
    assert got["charset"] == "utf-8"


def _http_rec(i, message, rectype=b"response"):
    return {
        "headers": {
            "WARC-Type": rectype.decode(),
            "WARC-Record-ID": f"<urn:uuid:{i}>",
            "WARC-Date": "2026-01-01T00:00:00Z",
            "WARC-Target-URI": f"https://example.invalid/{i}",
            "Content-Type": "application/http; msgtype=response",
        },
        "payload": message,
    }


def test_warc_http_responses_lane(spark):
    """Mixed archive: request/metadata records are selected out,
    response records split and decode per the HTTP-level charset, and
    rec_idx keeps the FULL-archive position."""
    from eth_event_stream_spark.operators.ingest import warc_http_responses
    from eth_event_stream_spark.operators.warc import encode_warc

    page1252 = "déjà — café"
    archive = encode_warc(
        [
            _http_rec(0, _msg()),
            _http_rec(1, _msg(), rectype=b"request"),  # selected out
            _http_rec(
                2,
                _msg(
                    headers=(b"Content-Type: text/plain; charset=windows-1252",),
                    body=page1252.encode("cp1252"),
                ),
            ),
        ],
        gzip_members=True,
    )
    media = spark.createDataFrame(
        [(0, archive)], "archive_id long, payload binary"
    )
    rows = {r["rec_idx"]: r for r in warc_http_responses(media).collect()}
    assert sorted(rows) == [0, 2]  # the request record is gone, idx kept
    assert rows[0]["body_text"] == "<p>hi</p>"
    assert rows[0]["http_headers"].startswith("HTTP/1.1 200 OK")
    assert "\r\n\r\n" not in rows[0]["http_headers"]
    # HTTP-level charset drove the decode; byte count is the raw body
    assert rows[2]["body_text"] == page1252
    assert rows[2]["n_body_bytes"] == len(page1252.encode("cp1252"))
    # a response record that is not an HTTP message fails the job loudly
    bad = spark.createDataFrame(
        [(1, encode_warc([_http_rec(0, b"not http")], gzip_members=True))],
        "archive_id long, payload binary",
    )
    with pytest.raises(Exception, match="not an HTTP response"):
        warc_http_responses(bad).collect()


def test_warc_to_documents_handles_request_records(spark):
    """Real crawls interleave request records (application/http;
    msgtype=request — a METHOD line, not a status line). warc_to_documents
    must split them at the blank line like any HTTP message, never raise,
    and never leak the request headers into text."""
    from eth_event_stream_spark.operators.ingest import (
        split_http_message,
        warc_to_documents,
    )
    from eth_event_stream_spark.operators.warc import encode_warc

    req = (
        b"GET /page HTTP/1.1\r\nHost: example.invalid\r\n"
        b"User-Agent: trainbot\r\n\r\n"
    )
    hdr, body = split_http_message(req)
    assert hdr.startswith(b"GET /page") and body == b""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no blank line"):
        split_http_message(b"GET / HTTP/1.1\r\nHost: x\r\n")

    archive = encode_warc(
        [
            _http_rec(0, req, rectype=b"request"),
            _http_rec(1, _msg(body=b"the page")),
        ],
        gzip_members=True,
    )
    media = spark.createDataFrame(
        [(0, archive)], "archive_id long, payload binary"
    )
    rows = {r["rec_idx"]: r for r in warc_to_documents(media).collect()}
    assert rows[0]["rectype"] == "request" and rows[0]["text"] == ""
    assert "GET /page" not in rows[0]["text"]
    assert rows[1]["text"] == "the page"


def test_warc_to_documents_splits_http(spark):
    """The ADVICE-r12 fix: for application/http records, text is the
    decoded BODY only (no header leak) and the HTTP-level Content-Type
    feeds the charset sniff; bare records keep the old behavior."""
    from eth_event_stream_spark.operators.ingest import warc_to_documents
    from eth_event_stream_spark.operators.warc import encode_warc

    page1252 = "naïve café"
    bare = {
        "headers": {
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:uuid:b>",
            "WARC-Date": "2026-01-01T00:00:00Z",
            "WARC-Target-URI": "https://example.invalid/bare",
            "Content-Type": "text/plain",
        },
        "payload": b"bare payload",
    }
    archive = encode_warc(
        [
            _http_rec(
                0,
                _msg(
                    headers=(b"Content-Type: text/plain; charset=iso-8859-1",),
                    body=page1252.encode("latin-1"),
                ),
            ),
            bare,
        ],
        gzip_members=True,
    )
    media = spark.createDataFrame(
        [(0, archive)], "archive_id long, payload binary"
    )
    rows = {r["rec_idx"]: r for r in warc_to_documents(media).collect()}
    assert rows[0]["text"] == page1252  # headers gone, charset honored
    assert "HTTP/1.1" not in rows[0]["text"]
    assert rows[0]["n_bytes"] == len(page1252.encode("latin-1"))
    assert rows[1]["text"] == "bare payload"


def test_dechunk_http_body():
    """RFC 9112 §7.1 framing: extensions ignored, trailers surfaced,
    exact chunk byte counts enforced, malformed framing loud."""
    from eth_event_stream_spark.operators.ingest import dechunk_http_body

    body = b"5;x=1\r\nhello\r\n6\r\n world\r\n0\r\nX-T: 1\r\n\r\n"
    entity, trailer = dechunk_http_body(body)
    assert entity == b"hello world" and trailer == b"X-T: 1"
    # empty trailer
    assert dechunk_http_body(b"0\r\n\r\n") == (b"", b"")
    # binary-safe: chunk bytes may contain CRLF
    e, _ = dechunk_http_body(b"4\r\na\r\nb\r\n0\r\n\r\n")
    assert e == b"a\r\nb"
    for bad in (
        b"zz\r\nhello\r\n0\r\n\r\n",     # non-hex size
        b"5\r\nhell\r\n0\r\n\r\n",       # chunk short of its size
        b"5\r\nhelloX\r\n0\r\n\r\n",     # missing CRLF after chunk
        b"5\r\nhello\r\n",               # missing last-chunk
    ):
        with pytest.raises(ValueError):
            dechunk_http_body(bad)


def test_decode_content_encoding():
    """gzip/x-gzip/deflate (zlib AND raw) decode; identity and UNKNOWN
    codings pass through raw (legal HTTP this container cannot decode
    must not kill a pass); corrupt framing within a supported coding is
    loud."""
    import gzip
    import zlib

    from eth_event_stream_spark.operators.ingest import (
        decode_content_encoding,
        http_entity_bytes,
    )

    raw = b"the entity bytes"
    assert decode_content_encoding(gzip.compress(raw, mtime=0), "gzip") == raw
    assert decode_content_encoding(gzip.compress(raw, mtime=0), "X-Gzip") == raw
    assert decode_content_encoding(zlib.compress(raw), "deflate") == raw
    co = zlib.compressobj(wbits=-15)
    assert decode_content_encoding(co.compress(raw) + co.flush(), "deflate") == raw
    assert decode_content_encoding(raw, None) == raw
    assert decode_content_encoding(raw, "identity") == raw
    assert decode_content_encoding(b"\x0b\x02brotli-ish", "br") == b"\x0b\x02brotli-ish"
    with pytest.raises(ValueError, match="gzip"):
        decode_content_encoding(b"\x1f\x8btruncated", "gzip")

    # composition: CE inside TE, undone wire-first
    hdr = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Transfer-Encoding: chunked"
    )
    gz = gzip.compress(raw, mtime=0)
    wire = (
        format(len(gz), "x").encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
    )
    assert http_entity_bytes(hdr, wire) == raw
    # TE list ending in chunked: earlier codings also undone
    hdr2 = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip, chunked"
    assert http_entity_bytes(hdr2, wire) == raw
    # no TE/CE headers: passthrough (the pre-r14 contract unchanged)
    assert http_entity_bytes(b"HTTP/1.1 200 OK", raw) == raw


def test_http_caching_fields(spark):
    """RFC 9111 parse surface: IMF-fixdate to UTC epoch (weekday
    validated, zone honored), Cache-Control directive extraction with
    list-boundary anchoring (s-maxage never answers a max-age probe),
    Age digit discipline."""
    from pyspark.sql import functions as F

    from eth_event_stream_spark.functions.http import (
        http_age,
        http_cache_control,
        http_date,
    )

    hdr = (
        "HTTP/1.1 200 OK\r\n"
        "Date: Sun, 06 Nov 1994 08:49:37 GMT\r\n"
        "Last-Modified: Thu, 01 Jan 2026 00:00:00 GMT\r\n"
        "Expires: not-a-date\r\n"
        "Cache-Control: public, s-maxage=99, max-age=3600, no-cache\r\n"
        "Age: 42\r\n"
    )
    df = spark.createDataFrame([(hdr,)], "m string")
    row = df.select(
        http_date("m").alias("date"),
        http_date("m", "Last-Modified").alias("lm"),
        http_date("m", "Expires").alias("exp"),
        http_cache_control("m", "max-age").alias("ma"),
        http_cache_control("m", "s-maxage").alias("sma"),
        http_cache_control("m", "no-cache").alias("nc"),
        http_cache_control("m", "no-store").alias("ns"),
        http_age("m").alias("age"),
    ).collect()[0]
    assert row["date"] == 784111777          # the RFC's own example instant
    assert row["lm"] == 1767225600           # 2026-01-01T00:00:00Z
    assert row["exp"] is None                # malformed -> NULL, no raise
    assert row["ma"] == "3600" and row["sma"] == "99"
    assert row["nc"] == "no-cache" and row["ns"] is None
    assert row["age"] == 42
    # Age digit discipline
    df2 = spark.createDataFrame(
        [("HTTP/1.1 200 OK\r\nAge: +5\r\n",)], "m string"
    )
    assert df2.select(http_age("m")).collect()[0][0] is None


def test_http_cache_control_non_numeric_arguments(spark):
    """RFC 9111 §5.2.2 field-name arguments (r15 ADVICE): a directive
    with a NON-numeric argument — quoted (no-cache="set-cookie", commas
    inside the quotes legal) or token — still reads as PRESENT (the
    directive name comes back, boolean-style); only all-digit arguments
    come back as seconds, quoted or bare."""
    from eth_event_stream_spark.functions.http import http_cache_control

    rows = [
        ('no-cache="set-cookie"', "nc", "no-cache"),
        ('private="x-internal", no-cache="set-cookie, age"', "nc", "no-cache"),
        ("no-cache=etag-only", "nc", "no-cache"),
        ('max-age=3600, no-cache="set-cookie"', "ma", "3600"),
        ('no-cache="set-cookie", max-age=60', "ma", "60"),
        ('max-age="120"', "ma", "120"),
        ("max-age=abc", "ma", "max-age"),  # present, argument unusable
        ('private="no-cache"', "nc", None),  # name INSIDE quotes: absent
        ("public", "nc", None),
    ]
    hdrs = [f"HTTP/1.1 200 OK\r\nCache-Control: {cc}\r\n" for cc, _, _ in rows]
    df = spark.createDataFrame([(h,) for h in hdrs], "m string")
    got = df.select(
        http_cache_control("m", "max-age").alias("ma"),
        http_cache_control("m", "no-cache").alias("nc"),
    ).collect()
    for (cc, which, want), g in zip(rows, got):
        assert g[which] == want, (cc, which, g[which])


def test_http_entity_bytes_fail_open_on_predecoded_body(spark):
    """Archive writers that store the DECODED payload without renaming
    the framing headers (r15 ADVICE): headers advertise chunked / gzip
    but the body is already plain — http_entity_bytes falls back to the
    stored bytes instead of raising out of the Arrow lane. The
    component decoders keep their loud contracts."""
    import pytest as _pytest

    from eth_event_stream_spark.operators.ingest import (
        dechunk_http_body,
        http_entity_bytes,
    )

    plain = b"already-decoded entity text"
    hdr_chunked = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
    hdr_gzip = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
    hdr_both = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Encoding: gzip\r\n"
    )
    assert http_entity_bytes(hdr_chunked, plain) == plain
    assert http_entity_bytes(hdr_gzip, plain) == plain
    assert http_entity_bytes(hdr_both, plain) == plain
    # honest framing still decodes through the same path
    wire = b"1b\r\n" + plain + b"\r\n0\r\n\r\n"
    assert http_entity_bytes(hdr_chunked, wire) == plain
    # the component keeps its loud contract
    with _pytest.raises(ValueError):
        dechunk_http_body(plain)

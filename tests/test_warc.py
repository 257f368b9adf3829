"""WARC (ISO 28500) reader/writer and the Spark ingest lane
(operators/warc.py, operators/ingest.py, round 12). The format's own
redundancy is the oracle: Content-Length framing, CRLF CRLF trailers,
per-record gzip member boundaries — every record is validated and a
malformed archive refuses loudly."""

from __future__ import annotations

import random
import zlib

import pytest

from eth_event_stream_spark.operators.warc import (
    encode_warc,
    is_warc,
    parse_warc,
    warc_record_at,
)


def _rec(i: int, body: bytes) -> dict:
    return {
        "headers": {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:uuid:{i:032x}>",
            "WARC-Date": "2026-01-01T00:00:00Z",
            "WARC-Target-URI": f"https://example.invalid/{i}",
        },
        "payload": body,
    }


def _member_offsets(gz: bytes) -> list[int]:
    offs, pos = [], 0
    while pos < len(gz):
        offs.append(pos)
        d = zlib.decompressobj(wbits=31)
        d.decompress(gz[pos:])
        assert d.eof
        pos = len(gz) - len(d.unused_data)
    return offs


def test_warc_roundtrip_plain_and_gzip():
    """Both framings round-trip every header and payload byte; gzip
    framing produces one member per record (the random-access contract)
    and byte-reproducible archives (mtime pinned)."""
    recs = [_rec(i, f"body {i} ".encode() * (i + 1)) for i in range(7)]
    plain = encode_warc(recs)
    gz = encode_warc(recs, gzip_members=True)
    assert is_warc(plain) and is_warc(gz)
    assert gz == encode_warc(recs, gzip_members=True)  # reproducible
    for data in (plain, gz):
        got = parse_warc(data)
        assert len(got) == 7
        for i, r in enumerate(got):
            assert r["WARC-Type"] == "response"
            assert r["WARC-Target-URI"] == f"https://example.invalid/{i}"
            assert r["payload"] == f"body {i} ".encode() * (i + 1)
    assert len(_member_offsets(gz)) == 7


def test_warc_record_at_is_random_access():
    """warc_record_at inflates exactly one gzip member from its byte
    offset — the CDX-index access pattern; a mid-member offset refuses."""
    recs = [_rec(i, f"payload number {i}".encode()) for i in range(5)]
    gz = encode_warc(recs, gzip_members=True)
    offs = _member_offsets(gz)
    for i, off in enumerate(offs):
        rec = warc_record_at(gz, off)
        assert rec["WARC-Target-URI"] == f"https://example.invalid/{i}"
        assert rec["payload"] == f"payload number {i}".encode()
    with pytest.raises(ValueError, match="no gzip member"):
        warc_record_at(gz, offs[1] + 1)


def test_warc_header_semantics():
    """Header edge cases: obs-fold continuations join, header case is
    preserved, empty payloads frame correctly, WARC/1.1 accepted."""
    raw = (
        b"WARC/1.1\r\n"
        b"WARC-Type: metadata\r\n"
        b"WARC-Record-ID: <urn:uuid:1>\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"X-Long: first\r\n\t second\r\n"
        b"Content-Length: 0\r\n"
        b"\r\n"
        b"\r\n\r\n"
    )
    (rec,) = parse_warc(raw)
    assert rec["X-Long"] == "first second"
    assert rec["payload"] == b""


def test_warc_fail_fast():
    """Truncation, bad version, framing disagreement, garbage between
    members, missing mandatory headers — all refuse loudly."""
    recs = [_rec(i, b"x" * 10) for i in range(3)]
    plain = encode_warc(recs)
    gz = encode_warc(recs, gzip_members=True)

    with pytest.raises(ValueError, match="trailer|past the end"):
        parse_warc(plain[:-3])
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"WARC/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="not a WARC"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    # inflate one member, tamper the framing (shrink Content-Length)
    bad = plain.replace(b"Content-Length: 10", b"Content-Length: 9", 1)
    with pytest.raises(ValueError, match="trailer"):
        parse_warc(bad)
    with pytest.raises(ValueError, match="gzip members|truncated"):
        parse_warc(gz[: _member_offsets(gz)[1] + 7])
    no_date = {
        "headers": {
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:uuid:2>",
        },
        "payload": b"",
    }
    with pytest.raises(ValueError, match="missing mandatory"):
        encode_warc([no_date])
    raw_missing = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    )
    with pytest.raises(ValueError, match="mandatory header"):
        parse_warc(raw_missing)
    # Content-Length must be ASCII digits only: int() forms that decode
    # silently ('+10', '1_0') are nonconforming and refuse loudly
    for bad_len in (b"+10", b"1_0", b"0x10", b"-0"):
        tampered = plain.replace(
            b"Content-Length: 10", b"Content-Length: " + bad_len, 1
        )
        with pytest.raises(ValueError, match="non-digit Content-Length"):
            parse_warc(tampered)


def test_warc_single_byte_corruptions_fail_loudly():
    """The codec-fuzz contract: any single-byte flip either still parses
    (headers carry free text) or raises ValueError — never an unhandled
    exception, never a hang."""
    recs = [_rec(i, f"abc {i}".encode() * 4) for i in range(4)]
    for payload in (encode_warc(recs), encode_warc(recs, gzip_members=True)):
        rnd = random.Random(zlib.crc32(payload) & 0xFFFF)
        for _ in range(200):
            data = bytearray(payload)
            at = rnd.randrange(len(data))
            data[at] ^= 1 << rnd.randrange(8)
            try:
                parse_warc(bytes(data))
            except ValueError:
                pass


def test_warc_ingest_lane_spark(spark):
    """The Spark lane end to end: documents -> real .warc.gz archives in
    executors -> parsed record rows; counts, urls, and byte lengths all
    match the synth formulas; a corrupt archive fails the job loudly."""
    from eth_event_stream_spark.operators.ingest import (
        documents_as_warc,
        synth_warc_payload,
        warc_to_documents,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(20)], "doc_id long"
    )
    rows = warc_to_documents(documents_as_warc(docs)).collect()
    got = {(r["archive_id"], r["rec_idx"]): r for r in rows}
    want_n = sum(1 + i % 3 for i in range(20))
    assert len(got) == want_n
    for i in range(20):
        for r in range(1 + i % 3):
            row = got[(i, r)]
            body = f"doc {i} rec {r} " * (1 + (i + r) % 5)
            assert row["url"] == f"https://example.invalid/{i}/{r}"
            assert row["n_bytes"] == len(body.encode())
            assert row["text"] == body
            assert row["rectype"] == "response"
    # loud failure through the lane
    bad = spark.createDataFrame(
        [(0, bytearray(synth_warc_payload(0)[:-2]))],
        "archive_id long, payload binary",
    )
    with pytest.raises(Exception, match="truncated|corrupt|ValueError"):
        warc_to_documents(bad).collect()


def test_warc_member_index_and_cdx_lane(spark):
    """warc_member_index walks the gzip members (offset, length) and the
    CDX lane self-verifies every entry by ranged read — two independent
    code paths (sequential parse vs offset inflate) must agree per row."""
    from eth_event_stream_spark.operators.ingest import (
        documents_as_warc,
        warc_cdx,
    )
    from eth_event_stream_spark.operators.warc import warc_member_index

    recs = [_rec(i, f"payload {i}".encode()) for i in range(4)]
    gz = encode_warc(recs, gzip_members=True)
    idx = warc_member_index(gz)
    assert [o for o, _ in idx] == _member_offsets(gz)
    assert sum(ln for _, ln in idx) == len(gz)  # members tile the archive
    with pytest.raises(ValueError, match="not a gzip"):
        warc_member_index(encode_warc(recs))

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    rows = warc_cdx(documents_as_warc(docs)).collect()
    assert len(rows) == sum(1 + i % 3 for i in range(12))
    assert all(r["ranged_read_ok"] == "true" for r in rows)
    by_arch: dict[int, list] = {}
    for r in rows:
        by_arch.setdefault(r["archive_id"], []).append(r)
    for aid, rs in by_arch.items():
        rs.sort(key=lambda r: r["rec_idx"])
        assert rs[0]["offset"] == 0  # first member at archive start
        for a, b in zip(rs, rs[1:]):
            assert b["offset"] == a["offset"] + a["length"]  # contiguous
        assert rs[-1]["url"] == f"https://example.invalid/{aid}/{len(rs) - 1}"


def test_warc_header_names_are_case_insensitive():
    """WARC field names are case-insensitive (ISO 28500): a record
    written with non-canonical casing parses AND its well-known headers
    read back under canonical names (review finding: the ingest lane
    crashed with KeyError on 'warc-type:'); unknown headers keep their
    original spelling."""
    raw = (
        b"WARC/1.0\r\n"
        b"warc-type: response\r\n"
        b"WARC-RECORD-ID: <urn:uuid:9>\r\n"
        b"warc-date: 2026-01-01T00:00:00Z\r\n"
        b"WARC-TARGET-URI: https://example.invalid/9\r\n"
        b"X-CaSe: kept\r\n"
        b"content-length: 2\r\n"
        b"\r\nhi\r\n\r\n"
    )
    (rec,) = parse_warc(raw)
    assert rec["WARC-Type"] == "response"
    assert rec["WARC-Record-ID"] == "<urn:uuid:9>"
    assert rec["WARC-Target-URI"] == "https://example.invalid/9"
    assert rec["X-CaSe"] == "kept"  # unknown header spelling preserved
    # and the Spark lane consumes it without KeyError
    import gzip as _gzip
    import io as _io

    buf = _io.BytesIO()
    with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    rec2 = warc_record_at(buf.getvalue(), 0)
    assert rec2["WARC-Type"] == "response"


def test_warc_gz_budget_exhaustion_refuses(monkeypatch):
    """When earlier members consume the whole decode budget, the next
    member REFUSES instead of inflating uncapped (review finding: zlib
    treats max_length=0 as unlimited, silently disabling the bomb
    ceiling)."""
    from eth_event_stream_spark.operators import warc as warc_mod

    recs = [_rec(i, b"x" * 600) for i in range(3)]
    gz = encode_warc(recs, gzip_members=True)
    # each member inflates to ~700 bytes; let two fit exactly-ish and
    # the third find budget <= 0
    one = len(parse_warc(gz)[0]["payload"]) + 200  # header+framing slack
    monkeypatch.setattr(warc_mod, "_MAX_DECODED_BYTES", 2 * one)
    with pytest.raises(ValueError, match="ceiling"):
        parse_warc(gz)


def _cap_rows(rows):
    """captures-relation rows as (archive_id, rec_idx, rectype, url,
    record_id, warc_date, payload_digest, refers_to, concurrent_to,
    n_bytes) tuples for createDataFrame."""
    return [
        (
            r.get("aid", 0),
            r.get("idx", 0),
            r["rectype"],
            r.get("url"),
            r.get("rid", f"<urn:uuid:x-{r.get('aid', 0)}-{r.get('idx', 0)}>"),
            "2026-01-01T00:00:00Z",
            r.get("digest"),
            r.get("refers_to"),
            r.get("concurrent_to"),
            r.get("n", 0),
        )
        for r in rows
    ]


_CAP_DDL = (
    "archive_id long, rec_idx long, rectype string, url string, "
    "record_id string, warc_date string, payload_digest string, "
    "refers_to string, concurrent_to string, n_bytes long"
)


def test_resolve_revisits_semantics(spark):
    """Unit contract for the relational revisit resolver: refers-to wins
    over digest, a refers-to MISS falls back to digest, a shared digest
    resolves to the EARLIEST stored capture (min archive_id, rec_idx),
    requests pass through unresolved-but-present, and a dangling digest
    yields resolved=false with NULL served columns."""
    from eth_event_stream_spark.plans.web import resolve_revisits

    caps = spark.createDataFrame(
        _cap_rows(
            [
                # two responses SHARING a digest: earliest (aid 1) wins
                {"aid": 1, "rectype": "response", "url": "u1",
                 "rid": "<id:r1>", "digest": "sha1:D", "n": 10},
                {"aid": 2, "rectype": "response", "url": "u2",
                 "rid": "<id:r2>", "digest": "sha1:D", "n": 10},
                # revisit with explicit pointer at the LATER copy:
                # refers-to wins over the digest's earliest-capture rule
                {"aid": 3, "rectype": "revisit", "url": "v1",
                 "digest": "sha1:D", "refers_to": "<id:r2>"},
                # digest-only revisit: earliest capture serves
                {"aid": 4, "rectype": "revisit", "url": "v2",
                 "digest": "sha1:D"},
                # refers-to MISS + live digest: falls back to digest
                {"aid": 5, "rectype": "revisit", "url": "v3",
                 "digest": "sha1:D", "refers_to": "<id:ghost>"},
                # dangling: digest never stored, no pointer
                {"aid": 6, "rectype": "revisit", "url": "v4",
                 "digest": "sha1:GONE"},
                # request: passes through, never "served"
                {"aid": 7, "rectype": "request", "url": "u1",
                 "concurrent_to": "<id:r1>"},
            ]
        ),
        _CAP_DDL,
    )
    got = {
        r["archive_id"]: (
            r["served_archive_id"], r["via"], r["resolved"], r["served_url"]
        )
        for r in resolve_revisits(caps).collect()
    }
    assert got[1] == (1, "self", True, "u1")
    assert got[2] == (2, "self", True, "u2")
    assert got[3] == (2, "refers-to", True, "u2")
    assert got[4] == (1, "digest", True, "u1")
    assert got[5] == (1, "digest", True, "u1")
    assert got[6] == (None, None, False, None)
    assert got[7] == (None, None, False, None)
    assert len(got) == 7


def test_warc_captures_lane_spark(spark):
    """The captures lane end to end on a real synth archive: linkage
    headers surface, metadata records are selected out but keep their
    slot in rec_idx, and revisit payloads store zero bytes."""
    from eth_event_stream_spark.operators.ingest import (
        synth_warc_revisit_payload,
        warc_captures,
    )

    # doc 2: metadata-first (2 % 6 == 2), revisit r=2 (digest-only)
    # doc 0: anchor response; doc 1: refers-to revisit
    df = spark.createDataFrame(
        [(d, synth_warc_revisit_payload(d)) for d in (0, 1, 2)],
        "archive_id long, payload binary",
    )
    rows = {r["archive_id"]: r for r in warc_captures(df).collect()}
    assert rows[0]["rectype"] == "response" and rows[0]["rec_idx"] == 0
    assert rows[0]["payload_digest"] == "sha1:SYN0"
    assert rows[0]["n_bytes"] > 0
    assert rows[1]["rectype"] == "revisit"
    assert rows[1]["refers_to"] == "<urn:uuid:rec-0>"
    assert rows[1]["n_bytes"] == 0
    # metadata record held slot 0; the capture keeps full-archive idx 1
    assert rows[2]["rec_idx"] == 1
    assert rows[2]["refers_to"] is None
    assert rows[2]["payload_digest"] == "sha1:SYN0"
    assert len(rows) == 3


def test_pair_requests_responses_semantics(spark):
    """Pairing contract: the Concurrent-To edge joins, a dangling edge
    and a missing edge both surface unpaired (no target-URI guessing),
    two requests may legitimately point at one response (retries), and
    latency is the whole-second WARC-Date gap."""
    from pyspark.sql import functions as F

    from eth_event_stream_spark.plans.web import pair_requests_responses

    caps = spark.createDataFrame(
        _cap_rows(
            [
                {"aid": 1, "idx": 1, "rectype": "response", "url": "u1",
                 "rid": "<id:r1>"},
                {"aid": 1, "idx": 0, "rectype": "request", "url": "u1",
                 "concurrent_to": "<id:r1>"},
                # retry: second request to the same response
                {"aid": 2, "idx": 0, "rectype": "request", "url": "u1",
                 "concurrent_to": "<id:r1>"},
                # dangling edge
                {"aid": 3, "idx": 0, "rectype": "request", "url": "u3",
                 "concurrent_to": "<id:ghost>"},
                # no edge at all
                {"aid": 4, "idx": 0, "rectype": "request", "url": "u4"},
            ]
        ),
        _CAP_DDL,
    )
    # give the response a later date for a 3-second latency
    caps = caps.withColumn(
        "warc_date",
        F.when(
            F.col("rectype") == "response", F.lit("2026-01-01T00:00:03Z")
        ).otherwise(F.lit("2026-01-01T00:00:00Z")),
    )
    got = {
        r["archive_id"]: (
            r["resp_idx"], r["latency_s"], r["paired"]
        )
        for r in pair_requests_responses(caps).collect()
    }
    assert got[1] == (1, 3, True)
    assert got[2] == (1, 3, True)
    assert got[3] == (None, None, False)
    assert got[4] == (None, None, False)
    # one row per REQUEST only (the response row itself is not emitted)
    assert len(got) == 4


def test_wat_publish_roundtrip(spark):
    """WAT lane (round 15): linked pages publish as metadata-record
    .warc.gz archives whose JSON envelope and linkage read back from
    the published bytes; re-publishing unchanged metadata is
    byte-identical (release diffing contract, same as WET)."""
    import json

    from pyspark.sql import functions as F

    from eth_event_stream_spark.operators.ingest import (
        documents_as_warc_linked,
        documents_to_wat,
        warc_http_responses,
        warc_metadata_records,
    )
    from eth_event_stream_spark.functions.html import html_links
    from eth_event_stream_spark.functions.http import http_header

    docs = spark.createDataFrame([(5,), (6,)], "doc_id long")
    pages = warc_http_responses(documents_as_warc_linked(docs))
    harvested = pages.select(
        "archive_id",
        "url",
        F.concat(
            F.lit("<urn:uuid:"),
            F.lpad(
                F.lower(F.conv(F.col("archive_id").cast("string"), 10, 16)),
                32,
                "0",
            ),
            F.lit(">"),
        ).alias("refers_to"),
        http_header("http_headers", "Content-Type").alias("content_type"),
        html_links("body_text").alias("links"),
    )
    wat1 = {r["archive_id"]: bytes(r["payload"])
            for r in documents_to_wat(harvested).collect()}
    wat2 = {r["archive_id"]: bytes(r["payload"])
            for r in documents_to_wat(harvested).collect()}
    assert wat1 == wat2  # byte-reproducible publish
    back = {
        r["archive_id"]: r.asDict()
        for r in warc_metadata_records(
            documents_to_wat(harvested)
        ).collect()
    }
    for d in (5, 6):
        r = back[d]
        assert r["rectype"] == "metadata"
        assert r["record_id"] == f"<urn:uuid:wat-{d}>"
        assert r["refers_to"] == f"<urn:uuid:{d:032x}>"
        assert r["url"] == f"https://site{d % 20}.example/dir/page{d}"
        assert r["content_type"] == "application/json"
        env = json.loads(r["json_text"])["Envelope"]
        assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == r["url"]
        meta = env["Payload-Metadata"]["HTTP-Response-Metadata"]
        assert meta["Headers"]["Content-Type"] == "text/html; charset=utf-8"
        links = [x["url"] for x in meta["HTML-Metadata"]["Links"]]
        want = [f"g{d}", f"/abs/{d}?b=2&a=1", f"https://cdn.example/x/{d}"]
        if d % 2 == 0:
            want.append(f"?q={d}")
        assert links == want
        assert r["n_bytes"] == len(r["json_text"].encode())

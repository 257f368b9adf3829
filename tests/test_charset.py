"""Charset sniffing (operators/charset.py, round 12): the documented
precedence (BOM > Content-Type > meta prescan > UTF-8), WHATWG label
aliases, loud failure on unknown labels, BOM stripping on decode."""

from __future__ import annotations

import codecs

import pytest

from eth_event_stream_spark.operators.charset import (
    decode_payload,
    resolve_charset_label,
    sniff_charset,
)


def test_bom_wins_over_everything():
    assert sniff_charset(codecs.BOM_UTF8 + b"hi", "text/html; charset=latin1") == "utf-8"
    assert sniff_charset(codecs.BOM_UTF16_LE + "hé".encode("utf-16-le")) == "utf-16-le"
    assert sniff_charset(codecs.BOM_UTF16_BE + "hé".encode("utf-16-be")) == "utf-16-be"
    # decode strips the winning BOM
    assert decode_payload(codecs.BOM_UTF8 + "héllo".encode()) == "héllo"
    assert decode_payload(codecs.BOM_UTF16_LE + "héllo".encode("utf-16-le")) == "héllo"


def test_content_type_beats_meta():
    body = b'<meta charset="utf-8"><p>caf\xe9</p>'
    assert sniff_charset(body, "text/html; charset=iso-8859-1") == "iso8859-1"
    assert decode_payload(body, "text/html; charset=iso-8859-1").endswith("café</p>")
    # without the header the meta tag applies
    assert sniff_charset(body) == "utf-8"


def test_meta_tag_variants_inside_prescan():
    for html in (
        b"<meta charset=windows-1252>",
        b'<META CHARSET="WINDOWS-1252">',
        b"<meta http-equiv=\"Content-Type\" content=\"text/html; charset=windows-1252\">",
    ):
        assert sniff_charset(html + b"\xe9") == "cp1252"
    # a meta tag PAST the 1024-byte prescan window is not consulted
    far = b" " * 1100 + b'<meta charset="latin1">'
    assert sniff_charset(far) == "utf-8"


def test_default_and_loud_failures():
    assert sniff_charset(b"plain ascii") == "utf-8"
    with pytest.raises(ValueError, match="unknown charset"):
        resolve_charset_label("not-a-codec")
    assert resolve_charset_label("ISO-8859-1") == "iso8859-1"
    assert resolve_charset_label("x-user-defined") == "iso8859-1"


def test_unknown_content_labels_fall_through():
    """WHATWG: an unresolvable label in a CONTENT source is a failure of
    that precedence STEP, not of the job — one garbage charset= on one
    crawl page must not abort a 100 TB ingest. Content-Type falls
    through to meta, meta falls through to the UTF-8 default."""
    # garbage meta label -> default
    assert sniff_charset(b'<meta charset="klingon-9">') == "utf-8"
    # garbage Content-Type label -> the meta tag still applies
    body = b'<meta charset="windows-1252">\xe9'
    assert sniff_charset(body, "text/html; charset=bogus-1") == "cp1252"
    # both garbage -> default
    assert sniff_charset(b'<meta charset="x">', "text/html; charset=y") == "utf-8"
    # a BOM still wins before any label is consulted
    import codecs as _c

    assert sniff_charset(_c.BOM_UTF8 + b"x", "text/html; charset=bogus") == "utf-8"
    # and the fall-through never weakens a RESOLVABLE higher-precedence label
    assert sniff_charset(body, "text/html; charset=iso-8859-1") == "iso8859-1"


def test_legacy_page_round_trip():
    """The motivating case: a windows-1252 page decodes to the right
    characters instead of replacement junk."""
    page = '<meta charset="windows-1252"><p>déjà vu — naïve café</p>'
    payload = page.encode("cp1252")
    assert decode_payload(payload) == page
    # while blind utf-8 would have mangled it
    assert payload.decode("utf-8", "replace") != page


def test_warc_ingest_sniffs_legacy_charsets(spark):
    """The Spark lane end to end: a windows-1252 page (meta tag), a
    UTF-16 page (BOM), and a header-charset page all come out as the
    right characters; charset='utf-8' forces the old blind behavior."""
    from eth_event_stream_spark.operators.ingest import warc_to_documents
    from eth_event_stream_spark.operators.warc import encode_warc

    def rec(i, body, ctype="text/html"):
        return {
            "headers": {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:uuid:{i}>",
                "WARC-Date": "2026-01-01T00:00:00Z",
                "WARC-Target-URI": f"https://example.invalid/{i}",
                "Content-Type": ctype,
            },
            "payload": body,
        }

    page1252 = '<meta charset="windows-1252"><p>déjà — café</p>'
    import codecs

    archive = encode_warc(
        [
            rec(0, page1252.encode("cp1252")),
            rec(1, codecs.BOM_UTF16_LE + "héllo".encode("utf-16-le")),
            rec(2, "naïve".encode("latin-1"), "text/html; charset=iso-8859-1"),
            rec(3, b"plain ascii"),
        ],
        gzip_members=True,
    )
    media = spark.createDataFrame(
        [(0, archive)], "archive_id long, payload binary"
    )
    rows = {r["rec_idx"]: r for r in warc_to_documents(media).collect()}
    assert rows[0]["text"] == page1252
    assert rows[1]["text"] == "héllo"
    assert rows[2]["text"] == "naïve"
    assert rows[3]["text"] == "plain ascii"
    # n_bytes stays the RAW byte count, not the decoded length
    assert rows[1]["n_bytes"] == 2 + 10
    # forcing utf-8 reproduces the blind decode (replacement junk)
    blind = {
        r["rec_idx"]: r["text"]
        for r in warc_to_documents(media, charset="utf-8").collect()
    }
    assert blind[0] != page1252 and "�" in blind[0]

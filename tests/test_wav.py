"""Pure-stdlib RIFF-WAVE codec incl. G.711 mu-law / A-law
(operators/wav.py, round 11). The expansion tables are pinned against
CPython's audioop (the G.711 reference implementation shipped with this
interpreter) when it imports; the structural contracts hold regardless."""

from __future__ import annotations

import io
import struct
import wave as stdlib_wave

import pytest

from eth_event_stream_spark.operators.wav import (
    _ALAW_TABLE,
    _ULAW_TABLE,
    decode_wav,
    encode_wav_g711,
    is_wav,
    linear_to_alaw,
    linear_to_ulaw,
)


def _pcm_wav(n_frames, channels=2, framerate=16000, width=2):
    buf = io.BytesIO()
    with stdlib_wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(framerate)
        w.writeframes(bytes((i * 31) % 256 for i in range(n_frames * channels * width)))
    return buf.getvalue()


def test_g711_tables_match_audioop():
    """The 256-entry expansion tables equal CPython's audioop output
    byte-for-byte — the strongest available in-container oracle."""
    audioop = pytest.importorskip("audioop")
    for table, fn in ((_ULAW_TABLE, audioop.ulaw2lin), (_ALAW_TABLE, audioop.alaw2lin)):
        ref = [
            int.from_bytes(fn(bytes([b]), 2), "little", signed=True)
            for b in range(256)
        ]
        assert table == ref


def test_g711_compress_is_table_inverse_with_bounded_error():
    """compress(decode(b)) == b for every byte (nearest-in-table), and a
    full linear sweep round-trips within the local quantization step."""
    for table, compress, expand in (
        (_ULAW_TABLE, linear_to_ulaw, _ULAW_TABLE),
        (_ALAW_TABLE, linear_to_alaw, _ALAW_TABLE),
    ):
        for b in range(256):
            assert compress(table[b]) == b or table[compress(table[b])] == table[b]
        for x in range(-32768, 32768, 193):
            got = expand[compress(x)]
            # nearest-in-table: no other byte decodes closer
            assert abs(got - x) == min(abs(v - x) for v in table)


def test_decode_wav_pcm_matches_stdlib_wave():
    data = _pcm_wav(321, channels=2)
    a = decode_wav(data)
    with stdlib_wave.open(io.BytesIO(data)) as w:
        assert a["n_frames"] == w.getnframes() == 321
        assert a["channels"] == w.getnchannels()
        assert a["sample_rate"] == w.getframerate()
    # sample VALUES match a direct little-endian int16 read
    raw = data[data.index(b"data") + 8 :]
    want = list(struct.unpack(f"<{len(raw) // 2}h", raw[: 321 * 2 * 2]))
    assert a["samples"] == want


def test_decode_wav_g711_roundtrip():
    """A mu-law/A-law WAV (stdlib wave REFUSES these) decodes to the exact
    table expansion of its companded bytes, frame counts from the
    container."""
    lin = [0, 500, -500, 8000, -8000, 32000, -32000, 77]
    for law in ("ulaw", "alaw"):
        compress = linear_to_ulaw if law == "ulaw" else linear_to_alaw
        table = _ULAW_TABLE if law == "ulaw" else _ALAW_TABLE
        comp = [compress(x) for x in lin]
        data = encode_wav_g711(comp, law=law, channels=1, rate=8000)
        assert is_wav(data)
        # the stdlib module cannot read it -- that is the gap being closed
        with pytest.raises(Exception):
            stdlib_wave.open(io.BytesIO(data))
        a = decode_wav(data)
        assert a["format"] == law
        assert a["n_frames"] == len(lin)
        assert a["samples"] == [table[b] for b in comp]


def test_decode_wav_fail_fast():
    data = _pcm_wav(50)
    with pytest.raises(ValueError, match="signature"):
        decode_wav(b"OggS" + data[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(data[:-7])
    bad = bytearray(data)
    bad[12:16] = b"XXXX"  # clobber fmt -> data arrives with no format
    with pytest.raises(ValueError, match="no fmt|before fmt"):
        decode_wav(bytes(bad))
    # float WAV (format tag 3): refuse loudly
    f = bytearray(data)
    at = bytes(f).index(b"fmt ") + 8
    struct.pack_into("<H", f, at, 3)
    with pytest.raises(NotImplementedError, match="format tag"):
        decode_wav(bytes(f))


def test_extract_features_real_g711_audio(spark):
    """The multimodal lane now reports real frame counts for G.711
    telephony WAVs the previous stdlib-wave path raised on."""
    from eth_event_stream_spark.operators.multimodal import extract_features

    comp = [linear_to_ulaw((i * 997) % 30000 - 15000) for i in range(250)]
    payload = encode_wav_g711(comp, law="ulaw", channels=1)
    media = spark.createDataFrame(
        [(0, "audio", payload, {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    row = extract_features(media, codec="real").collect()[0]
    assert row["n_frames"] == 250
    assert row["width"] is None


def test_wav_segment_is_a_byte_slice_decode():
    """wav_segment decodes ONLY the requested frame range — the audio
    analog of avi_frame: same values as the full decode's slice, EOF-short
    ranges truncate, negative args refuse."""
    from eth_event_stream_spark.operators.wav import wav_segment

    samples = [(i * 37) % 4000 - 2000 for i in range(500)]
    for law in ("ulaw", "alaw"):
        data = encode_wav_g711(samples, law=law)
        full = decode_wav(data)
        seg = wav_segment(data, 100, 50)
        assert seg["samples"] == full["samples"][100:150]
        assert seg["n_frames"] == 50
        assert seg["format"] == law and seg["channels"] == 1
    # stereo PCM: frame positions are per-channel, samples interleaved
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        inter = []
        for i in range(300):
            inter += [samples[i], -samples[i]]
        wv.writeframes(b"".join(s.to_bytes(2, "little", signed=True) for s in inter))
    data = buf.getvalue()
    full = decode_wav(data)
    seg = wav_segment(data, 10, 5)
    assert seg["samples"] == full["samples"][20:30]
    assert seg["n_frames"] == 5
    # EOF-short and fully-past-EOF ranges
    assert wav_segment(data, 290, 100)["n_frames"] == 10
    assert wav_segment(data, 900, 10)["n_frames"] == 0
    with pytest.raises(ValueError, match="negative"):
        wav_segment(data, -1, 5)

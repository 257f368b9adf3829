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


# ---------------------------------------------------------------------------
# IMA (DVI) ADPCM — round 12. audioop ships the reference implementation
# of the same recurrence (Modules/audioop.c), so every decode transition
# is pinned against it exhaustively, and whole nibble streams replay
# bit-exactly (audioop packs the FIRST sample in the HIGH nibble; WAV IMA
# packs it in the LOW nibble, so the cross-check flips each byte).


def _adpcm_body(data: bytes) -> bytes:
    """The data chunk of an encode_wav_adpcm payload (tests slice headers
    and nibble bytes out of it directly)."""
    at = data.index(b"data")
    (size,) = struct.unpack("<I", data[at + 4 : at + 8])
    return data[at + 8 : at + 8 + size]


def test_adpcm_every_decode_transition_matches_audioop():
    """All 89 step indexes x 16 nibbles x a predictor sweep: the new
    predictor equals audioop's first output sample, and the new index
    equals audioop's state after it also consumes the padding low nibble
    (audioop decodes two samples per byte, so its returned index is one
    extra zero-nibble transition ahead)."""
    audioop = pytest.importorskip("audioop")
    from eth_event_stream_spark.operators.wav import _adpcm_step

    for idx in range(89):
        for nib in range(16):
            for pred in (-32768, -12345, -1, 0, 1, 777, 32767):
                pcm, (_, aidx) = audioop.adpcm2lin(
                    bytes([nib << 4]), 2, (pred, idx)
                )
                p1, i1 = _adpcm_step(nib, pred, idx)
                assert struct.unpack("<h", pcm[:2])[0] == p1, (idx, nib, pred)
                _, i2 = _adpcm_step(0, p1, i1)
                assert aidx == i2, (idx, nib, pred)


def test_adpcm_whole_stream_replays_through_audioop():
    """Encode a random signal, then decode the SAME nibble stream with
    audioop (nibble order flipped, state seeded from the block header):
    every sample after the header sample must match bit-for-bit."""
    audioop = pytest.importorskip("audioop")
    import random

    from eth_event_stream_spark.operators.wav import encode_wav_adpcm

    rnd = random.Random(12)
    sig = [rnd.randint(-32768, 32767) for _ in range(505)]
    data = encode_wav_adpcm([sig], block_samples=505)
    full = decode_wav(data)
    assert full["format"] == "ima_adpcm"
    assert full["bits"] == 4
    assert full["n_frames"] == 505
    assert full["samples"][0] == sig[0]  # header sample is verbatim
    body = _adpcm_body(data)
    flipped = bytes(((b & 0x0F) << 4) | (b >> 4) for b in body[4:])
    state = (struct.unpack("<h", body[:2])[0], body[2])
    pcm, _ = audioop.adpcm2lin(flipped, 2, state)
    ref = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    assert ref == full["samples"][1:]


def test_adpcm_multiblock_and_segments():
    """Multi-block decode: the index carries across blocks while each
    header re-seeds the predictor; wav_segment decodes ONLY overlapping
    blocks and equals the full-decode slice at every offset, including
    mid-block starts and windows spanning block boundaries."""
    import random

    from eth_event_stream_spark.operators.wav import encode_wav_adpcm, wav_segment

    rnd = random.Random(34)
    sig = [rnd.randint(-32768, 32767) for _ in range(130)]
    data = encode_wav_adpcm([sig], block_samples=9)
    full = decode_wav(data)
    assert full["n_frames"] == 130  # fact-trimmed (15 blocks hold 135)
    for st, k in [(0, 9), (5, 20), (8, 2), (9, 9), (120, 50), (129, 1), (130, 4)]:
        seg = wav_segment(data, st, k)
        assert seg["samples"] == full["samples"][st : min(st + k, 130)], (st, k)
        assert seg["n_frames"] == min(st + k, 130) - min(st, 130)
    # every block's header sample is the signal verbatim (lossless resync)
    for blk in range(14):
        assert full["samples"][blk * 9] == sig[blk * 9]


def test_adpcm_stereo_interleave_and_segment():
    """Stereo: per-channel headers, 4-byte nibble groups round-robin by
    channel, interleaved output; segments slice per-channel FRAME
    positions like the PCM path."""
    import random

    from eth_event_stream_spark.operators.wav import encode_wav_adpcm, wav_segment

    rnd = random.Random(56)
    left = [rnd.randint(-32768, 32767) for _ in range(40)]
    right = [rnd.randint(-32768, 32767) for _ in range(40)]
    data = encode_wav_adpcm([left, right], block_samples=17)
    full = decode_wav(data)
    assert full["channels"] == 2
    assert full["n_frames"] == 40
    assert full["samples"][0] == left[0] and full["samples"][1] == right[0]
    assert full["samples"][34] == left[17] and full["samples"][35] == right[17]
    seg = wav_segment(data, 10, 10)
    assert seg["samples"] == full["samples"][20:40]


def test_adpcm_block_constant_signal_is_exact():
    """The synth-lane contract: a block-constant signal (value stored in
    each block header, all-zero nibbles after it) round-trips EXACTLY
    through the lossy codec — step 7 >> 3 == 0 at index 0, so the
    predictor never moves inside a block and the index never leaves 0."""
    from eth_event_stream_spark.operators.wav import encode_wav_adpcm

    sig = [((7 * 31 + (i // 9) * 7) % 65536) - 32768 for i in range(121)]
    data = encode_wav_adpcm([sig], block_samples=9)
    assert decode_wav(data)["samples"] == sig


def test_adpcm_fail_fast():
    """Geometry contradictions refuse loudly: bad bits, block_align that
    doesn't hold whole nibble groups, samples-per-block mismatch, missing
    fact, inconsistent fact, header step index > 88, partial blocks."""
    from eth_event_stream_spark.operators.wav import encode_wav_adpcm

    data = bytearray(encode_wav_adpcm([[0] * 25], block_samples=9))
    decode_wav(bytes(data))  # pristine payload decodes
    fmt_at = data.index(b"fmt ") + 8

    bad = bytearray(data)
    bad[fmt_at + 14] = 16  # wBitsPerSample 4 -> 16
    with pytest.raises(ValueError, match="16 bits"):
        decode_wav(bytes(bad))

    bad = bytearray(data)
    bad[fmt_at + 12] = 9  # block_align 8 -> 9: not whole 4-byte groups
    with pytest.raises(ValueError, match="block_align"):
        decode_wav(bytes(bad))

    bad = bytearray(data)
    bad[fmt_at + 18] = 10  # wSamplesPerBlock 9 -> 10: contradicts align
    with pytest.raises(ValueError, match="samples per block"):
        decode_wav(bytes(bad))

    bad = bytearray(data)
    at = bad.index(b"fact")
    bad[at : at + 4] = b"junk"  # fact chunk gone
    with pytest.raises(ValueError, match="fact"):
        decode_wav(bytes(bad))

    bad = bytearray(data)
    at = bad.index(b"fact") + 8
    bad[at] = 200  # fact says 200 frames; 3 blocks hold at most 27
    with pytest.raises(ValueError, match="inconsistent"):
        decode_wav(bytes(bad))

    bad = bytearray(data)
    at = bad.index(b"data") + 8
    bad[at + 2] = 89  # first block header step index out of range
    with pytest.raises(ValueError, match="step index"):
        decode_wav(bytes(bad))

    bad = bytearray(data)
    at = bad.index(b"data")
    (size,) = struct.unpack("<I", bad[at + 4 : at + 8])
    bad[at + 4 : at + 8] = struct.pack("<I", size - 4)  # torn final block
    del bad[at + 8 + size - 4 : at + 8 + size]
    bad[4:8] = struct.pack("<I", struct.unpack("<I", bad[4:8])[0] - 4)
    with pytest.raises(ValueError, match="whole block"):
        decode_wav(bytes(bad))

    with pytest.raises(ValueError, match="8k\\+1"):
        encode_wav_adpcm([[0] * 10], block_samples=10)
    with pytest.raises(ValueError, match="equal length"):
        encode_wav_adpcm([[0] * 10, [0] * 9], block_samples=9)


def test_adpcm_extract_features_and_segments_real(spark):
    """The Spark lane end to end on a real ADPCM payload: n_frames is the
    fact count; extract_segment_features stats equal a straight decode."""
    from eth_event_stream_spark.operators.multimodal import (
        extract_features,
        extract_segment_features,
    )
    from eth_event_stream_spark.operators.wav import encode_wav_adpcm

    sig = [((11 * 31 + (i // 9) * 7) % 65536) - 32768 for i in range(119)]
    payload = encode_wav_adpcm([sig], block_samples=9)
    media = spark.createDataFrame(
        [(0, "audio", payload, {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    feats = extract_features(media, codec="real").collect()
    assert len(feats) == 1 and feats[0]["n_frames"] == 119
    rows = {
        r["seg_idx"]: r
        for r in extract_segment_features(media, window=32).collect()
    }
    assert len(rows) == 4  # ceil(119 / 32)
    for si, row in rows.items():
        seg = sig[si * 32 : (si + 1) * 32]
        assert row["n_samples"] == len(seg)
        assert row["sum_abs"] == sum(abs(s) for s in seg)
        assert row["peak_abs"] == max(abs(s) for s in seg)


def test_resample_audio_decimation_exact(spark):
    """The audio-downsample lane: integer decimation keeps frames
    0, factor, 2*factor, ... across ALL channels; re-encode is 16-bit PCM
    WAV at rate // factor; verify-decode stats equal the kept samples.
    Covers stereo interleave, a G.711 source (decoded linear values are
    what decimation sees), factor=1 passthrough, and the loud failure on
    an audio row with no codec signature."""
    import io
    import wave as stdwave

    from eth_event_stream_spark.operators.multimodal import (
        decode_wav_sample_sums,
        resample_audio,
    )

    def pcm_wav(inter, channels, rate=16000):
        buf = io.BytesIO()
        with stdwave.open(buf, "wb") as wv:
            wv.setnchannels(channels)
            wv.setsampwidth(2)
            wv.setframerate(rate)
            wv.writeframes(
                b"".join(s.to_bytes(2, "little", signed=True) for s in inter)
            )
        return buf.getvalue()

    # stereo, odd frame count: kept frames 0, 2, ..., 100 (51 frames)
    inter = []
    for i in range(101):
        inter += [i * 3 - 150, -(i * 3 - 150)]
    g711 = encode_wav_g711([_ULAW_TABLE[i % 256] for i in range(80)], law="ulaw")
    schema = "media_id long, kind string, payload binary, meta map<string,string>"
    media = spark.createDataFrame(
        [
            (0, "audio", pcm_wav(inter, 2), {}),
            (1, "audio", g711, {}),
            (2, "image", b"notaudio", {}),
        ],
        schema,
    )
    out = {r["media_id"]: r for r in resample_audio(media, factor=2).collect()}
    assert set(out) == {0, 1}  # non-audio rows skipped
    assert (out[0]["n_frames"], out[0]["new_n_frames"]) == (101, 51)
    dec = decode_wav(bytes(out[0]["resampled"]))
    assert dec["channels"] == 2 and dec["sample_rate"] == 8000
    want = [v for i in range(0, 101, 2) for v in inter[2 * i : 2 * i + 2]]
    assert dec["samples"] == want
    # G.711 source: linear expansion, then every second frame
    dec1 = decode_wav(bytes(out[1]["resampled"]))
    want1 = [_ULAW_TABLE[_ULAW_TABLE[i % 256] & 0xFF] for i in range(0, 80, 2)]
    assert dec1["samples"] == want1 and dec1["sample_rate"] == 4000
    # the verify-decode half agrees with the kept samples
    sums = {
        r["media_id"]: r
        for r in decode_wav_sample_sums(
            resample_audio(media, factor=2)
        ).collect()
    }
    assert sums[0]["new_n_frames"] == 51
    assert sums[0]["sum_abs"] == sum(abs(v) for v in want)
    assert sums[0]["peak_abs"] == max(abs(v) for v in want)
    # factor=1: byte-reproducible passthrough re-encode (fresh container)
    one = {r["media_id"]: r for r in resample_audio(media, factor=1).collect()}
    assert decode_wav(bytes(one[0]["resampled"]))["samples"] == inter
    # loud failure on a signatureless audio payload
    foreign = spark.createDataFrame([(9, "audio", b"junkjunk", {})], schema)
    with pytest.raises(Exception, match="no in-repo codec signature"):
        resample_audio(foreign, factor=2).collect()

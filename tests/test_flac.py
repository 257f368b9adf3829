"""Pure-stdlib FLAC codec (operators/flac.py, round 11).

FLAC is LOSSLESS, so every round trip asserts exact sample equality —
and the format itself carries an MD5 of the unencoded audio in
STREAMINFO, which decode_flac verifies on every call: the tests'
equality checks and the format's own integrity oracle back each other.
"""

from __future__ import annotations

import math

import pytest

from eth_event_stream_spark.operators.flac import (
    decode_flac,
    encode_flac,
    is_flac,
)


def _mono(n=1000):
    return [int(1000 * math.sin(i / 7)) + (i % 17) for i in range(n)]


def _stereo(n=1000):
    left = _mono(n)
    right = [int(800 * math.cos(i / 9)) - (i % 11) for i in range(n)]
    return left, right


@pytest.mark.parametrize(
    "mode", ["constant", "verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4"]
)
def test_every_subframe_type_roundtrips_exactly(mode):
    samples = [42] * 1000 if mode == "constant" else _mono()
    data = encode_flac([samples], modes=(mode,), block_size=250)
    assert is_flac(data)
    got = decode_flac(data)
    assert got["samples"] == samples
    assert got["n_frames"] == 1000
    assert (got["channels"], got["bits"]) == (1, 16)


def test_lpc_with_arbitrary_coefficients_roundtrips():
    """LPC subframes: the encoder computes residuals against CHOSEN
    quantized coefficients, so the file is valid by construction and the
    decoder's shift-and-accumulate path is pinned exactly."""
    mono = _mono()
    data = encode_flac(
        [mono], modes=("lpc",), lpc_coefs=[40, -15, 6], lpc_shift=5, block_size=200
    )
    assert decode_flac(data)["samples"] == mono


def test_stereo_independent_and_mid_side():
    left, right = _stereo()
    inter = [v for pair in zip(left, right) for v in pair]
    for sm in ("independent", "mid_side"):
        data = encode_flac([left, right], modes=("fixed2",), stereo_mode=sm)
        got = decode_flac(data)
        assert got["samples"] == inter, sm
        assert got["channels"] == 2


def test_rice_partitions_and_utf8_frame_numbers():
    mono = _mono(1024)
    # partitioned residuals (first partition short by the predictor order)
    data = encode_flac([mono], modes=("fixed2",), block_size=256, part_order=2)
    assert decode_flac(data)["samples"] == mono
    # > 127 frames forces the multi-byte UTF-8-coded frame number path
    data = encode_flac([mono], modes=("fixed3",), block_size=8)
    assert decode_flac(data)["samples"] == mono


def test_raw_escape_partitions():
    """Noisy high-order residuals make the raw-escape cheaper than any
    Rice parameter — the escape path must round-trip too."""
    noisy = [((i * 2654435761) % 60001) - 30000 for i in range(512)]
    data = encode_flac([noisy], modes=("fixed4",), block_size=256)
    assert decode_flac(data)["samples"] == noisy


def test_constant_mode_refuses_lossy_use():
    """The encoder refuses a constant subframe on non-constant samples —
    and the format's MD5 oracle would have caught the silent corruption
    anyway (that is exactly how this guard was found)."""
    with pytest.raises(ValueError, match="lossy"):
        encode_flac([_mono(200)], modes=("constant",), block_size=200)


def test_mode_mix_across_frames():
    mono = _mono(1200)
    data = encode_flac(
        [mono],
        modes=("verbatim", "fixed1", "fixed4", "lpc", "fixed0"),
        lpc_coefs=[32, -8],
        lpc_shift=5,
        block_size=200,
    )
    assert decode_flac(data)["samples"] == mono


def test_fail_fast_on_damage():
    mono = _mono(400)
    data = encode_flac([mono], modes=("fixed2",), block_size=200)
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"OggS" + data[4:])
    with pytest.raises(ValueError, match="truncated|sync|CRC|samples"):
        decode_flac(data[:-9])
    # flip one entropy byte: a CRC (or the MD5 backstop) must catch it
    bad = bytearray(data)
    bad[-40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|MD5|corrupt|truncated"):
        decode_flac(bytes(bad))
    # tamper the STREAMINFO MD5: decode must refuse the mismatch loudly
    tampered = bytearray(data)
    tampered[8 + 18] ^= 0xFF  # first MD5 byte inside STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(tampered))


def test_extract_features_real_flac_audio(spark):
    """The multimodal audio lane reports real FLAC frame counts through
    executor Python workers, with the in-format MD5 verified per row."""
    from eth_event_stream_spark.operators.multimodal import extract_features

    left, right = _stereo(777)
    payload = encode_flac([left, right], modes=("fixed2",), stereo_mode="mid_side")
    media = spark.createDataFrame(
        [(0, "audio", payload, {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    row = extract_features(media, codec="real").collect()[0]
    assert row["n_frames"] == 777
    assert row["width"] is None


def test_short_last_frame_degrades_predictor_to_verbatim():
    """A last frame SHORTER than the predictor order (e.g. 129 samples at
    block_size=64 leaves a 1-sample frame) cannot carry that predictor —
    the encoder falls back to verbatim and the stream round-trips exactly
    (found by the multimodal synth sweep; the MD5 oracle flagged it)."""
    for n in (129, 65, 66, 100):
        samples = [(i * 7919) % 40000 - 20000 for i in range(n)]
        data = encode_flac([samples], modes=("fixed4",), block_size=64)
        assert decode_flac(data)["samples"] == samples


def test_reserved_sample_size_code_refuses():
    """RFC 9639 §9.1.3: frame sample-size code 3 is RESERVED — decode must
    refuse loudly instead of silently falling back to the STREAMINFO bit
    depth (regression: the fallback hid the reserved code)."""
    from eth_event_stream_spark.operators.flac import _crc8

    data = bytearray(encode_flac([_mono(64)], block_size=64))
    fs = 4 + 4 + 34  # magic + STREAMINFO block header + body
    assert data[fs] == 0xFF and (data[fs + 1] & 0xFE) == 0xF8, "frame sync"
    assert data[fs + 4] == 0, "first frame number (1-byte UTF-8 zero)"
    bs_code, sr_code = data[fs + 2] >> 4, data[fs + 2] & 0x0F
    crc_at = fs + 5 + {6: 1, 7: 2}.get(bs_code, 0) + {12: 1, 13: 2, 14: 2}.get(sr_code, 0)
    data[fs + 3] = (data[fs + 3] & 0xF1) | (3 << 1)  # ss_code = 3 (reserved)
    data[crc_at] = _crc8(bytes(data[fs:crc_at]))  # keep the header CRC valid
    with pytest.raises(ValueError, match="reserved sample size"):
        decode_flac(bytes(data))


def test_flac_segment_early_stop_matches_full_decode():
    """flac_segment decodes frames only UP TO the segment end (early
    stop): the values match the full decode's slice exactly, mono and
    stereo (per-channel positions, interleaved output), EOF-short ranges
    truncate. The whole-stream MD5 is deliberately NOT checked here — it
    covers audio the early stop never decodes."""
    from eth_event_stream_spark.operators.flac import flac_segment

    mono = _mono(500)
    data = encode_flac([mono], modes=("fixed2", "fixed3"), block_size=64)
    full = decode_flac(data)
    for start, n in ((0, 10), (100, 50), (63, 2), (64, 64), (450, 100)):
        seg = flac_segment(data, start, n)
        assert seg["samples"] == full["samples"][start : start + n]
        assert seg["n_frames"] == len(seg["samples"])
    left, right = _stereo(300)
    data = encode_flac([left, right], stereo_mode="mid_side", block_size=64)
    full = decode_flac(data)
    seg = flac_segment(data, 33, 10)
    assert seg["samples"] == full["samples"][66:86]
    assert seg["n_frames"] == 10
    with pytest.raises(ValueError, match="negative"):
        flac_segment(data, 5, -1)
    # a corrupt frame INSIDE the requested range still fails loudly
    bad = bytearray(encode_flac([mono], modes=("fixed2",), block_size=64))
    bad[-40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|corrupt|truncated"):
        flac_segment(bytes(bad), 0, 500)


def test_extract_segment_features_real_wav_and_flac(spark):
    """The per-segment audio lane (the frame lane's audio analog): WAV and
    FLAC rows slice into fixed windows with integer-exact per-segment
    stats, through executor Python workers; non-audio rows are skipped
    (the lane is audio-only) while an AUDIO row whose payload matches no
    codec signature fails LOUDLY — the extract_features contract, same as
    the image resample lane."""
    import io
    import wave

    from eth_event_stream_spark.operators.multimodal import (
        extract_segment_features,
        sample_segments,
    )

    mono = _mono(100)
    flac_payload = encode_flac([mono], modes=("fixed2",), block_size=64)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(16000)
        wv.writeframes(b"".join(s.to_bytes(2, "little", signed=True) for s in mono))
    wav_payload = buf.getvalue()
    schema = "media_id long, kind string, payload binary, meta map<string,string>"
    media = spark.createDataFrame(
        [
            (0, "audio", wav_payload, {}),
            (1, "audio", flac_payload, {}),
            (2, "image", b"notaudio", {}),
        ],
        schema,
    )
    rows = extract_segment_features(media, window=32).collect()
    got = {(r["media_id"], r["seg_idx"]): r for r in rows}
    assert {m for m, _ in got} == {0, 1}  # non-audio row skipped
    # an audio-kind row that matches no codec signature fails loudly
    foreign = spark.createDataFrame([(3, "audio", b"notwavorflac", {})], schema)
    with pytest.raises(Exception, match="no in-repo codec signature"):
        extract_segment_features(foreign, window=32).collect()
    for mid in (0, 1):
        segs = sorted(s for m, s in got if m == mid)
        assert segs == [0, 1, 2, 3]  # ceil(100/32)
        for si in segs:
            lo, hi = si * 32, min(100, (si + 1) * 32)
            want = [abs(s) for s in mono[lo:hi]]
            r = got[(mid, si)]
            assert (r["start_sample"], r["n_samples"]) == (lo, hi - lo)
            assert r["sum_abs"] == sum(want) and r["peak_abs"] == max(want)
    # the explode-only sampling plumbing agrees on segment indexes (its
    # extract_features(codec="real") pass keeps the loud-failure contract,
    # so it gets only decodable rows)
    decodable = media.filter("media_id IN (0, 1)")
    idx = {
        (r["media_id"], r["seg_idx"])
        for r in sample_segments(decodable, window=32, codec="real").collect()
    }
    assert idx == {(m, s) for m in (0, 1) for s in range(4)}


def test_segment_lane_fake_codec_and_degenerate_clips(spark):
    """Review findings: (1) sample_segments must WORK under its default
    fake codec (fake audio rows now synthesize a sample count, like fake
    video synthesizes frame counts); (2) a valid-but-empty clip
    (n_frames = 0) yields NO segment rows — not the descending
    sequence(0, -1) pair; (3) stereo consistency: n_samples counts the
    interleaved values the stats aggregate, so sum_abs / n_samples is a
    correct mean at any channel count."""
    import io
    import wave

    from eth_event_stream_spark.operators.multimodal import (
        extract_segment_features,
        sample_segments,
    )

    def wav_of(frames, channels=1):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wv:
            wv.setnchannels(channels)
            wv.setsampwidth(2)
            wv.setframerate(8000)
            wv.writeframes(
                b"".join(s.to_bytes(2, "little", signed=True) for s in frames)
            )
        return buf.getvalue()

    # (1) fake codec: payload length drives the fake sample count
    media = spark.createDataFrame(
        [(0, "audio", b"x" * 70, {}), (1, "video", b"y" * 70, {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    idx = sorted(
        (r["media_id"], r["seg_idx"])
        for r in sample_segments(media, window=32).collect()
    )
    assert idx == [(0, 0), (0, 1), (0, 2)]  # fake n_frames = 71 -> 3 segs
    # (2) empty clip: zero segment rows under the real codec
    media = spark.createDataFrame(
        [(0, "audio", wav_of([]), {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    assert sample_segments(media, window=32, codec="real").count() == 0
    assert extract_segment_features(media, window=32).count() == 0
    # (3) stereo: 50 frames -> 2 segments; n_samples doubles with channels
    inter = []
    for i in range(50):
        inter += [100 + i, -(100 + i)]
    media = spark.createDataFrame(
        [(0, "audio", wav_of(inter, channels=2), {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    rows = {r["seg_idx"]: r for r in extract_segment_features(media, window=32).collect()}
    assert rows[0]["n_samples"] == 64 and rows[1]["n_samples"] == 36
    want0 = sum(abs(s) for s in inter[:64])
    assert rows[0]["sum_abs"] == want0
    assert rows[0]["sum_abs"] / rows[0]["n_samples"] == want0 / 64
    assert rows[1]["start_sample"] == 32  # per-channel frame position

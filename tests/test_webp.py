"""Pure-stdlib lossless WebP / VP8L codec (operators/webp.py, round 12).

VP8L is LOSSLESS, so every round trip asserts exact RGBA equality. The
test-side encoder forward-applies each transform, so a decoder whose
inverse deviates anywhere — prediction modes, cross-color deltas,
palette bundling, LZ77 distance mapping, cache hashing, canonical code
numbering — breaks byte equality.
"""

from __future__ import annotations

import random

import pytest

from eth_event_stream_spark.operators.webp import (
    decode_webp,
    encode_webp_lossless,
    is_webp,
)


def _rows(w, h, fn):
    return [bytes(b for x in range(w) for b in fn(x, y)) for y in range(h)]


GRADIENT = _rows(11, 7, lambda x, y: ((x * 13) % 256, (y * 29) % 256, (x * y) % 256, 255))


def test_plain_literals_roundtrip():
    data = encode_webp_lossless(11, 7, GRADIENT)
    assert is_webp(data)
    img = decode_webp(data)
    assert (img["width"], img["height"], img["channels"]) == (11, 7, 4)
    assert img["pixels"] == GRADIENT
    assert img["has_alpha"] is False


@pytest.mark.parametrize("mode", range(14))
def test_every_predictor_mode_roundtrips(mode):
    img = decode_webp(encode_webp_lossless(11, 7, GRADIENT, predictor_mode=mode))
    assert img["pixels"] == GRADIENT, f"predictor mode {mode}"


def test_subtract_green_and_color_transform():
    img = decode_webp(encode_webp_lossless(11, 7, GRADIENT, subtract_green=True))
    assert img["pixels"] == GRADIENT
    for cte in ((34, 236, 7), (0, 0, 0), (255, 128, 1)):
        img = decode_webp(
            encode_webp_lossless(11, 7, GRADIENT, color_transform=cte)
        )
        assert img["pixels"] == GRADIENT, cte


@pytest.mark.parametrize("n_colors", [2, 3, 4, 5, 16, 17, 200])
def test_palette_roundtrips_at_every_bundling_width(n_colors):
    """Color-indexing transform: 2 colors -> 1-bit bundling (8 px/byte),
    <=4 -> 2-bit, <=16 -> 4-bit, else unbundled."""
    rnd = random.Random(n_colors)
    pal = [
        (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256), 255)
        for _ in range(n_colors)
    ]
    rows = _rows(19, 5, lambda x, y: pal[(x * 3 + y * 7) % n_colors])
    img = decode_webp(encode_webp_lossless(19, 5, rows, palette=True))
    assert img["pixels"] == rows


def test_lz77_runs_and_color_cache():
    """Run-length LZ77 alternates the 2D plane-code distance (1,0) and the
    linear distance code, and the color cache round-trips exact hits."""
    rows = _rows(16, 9, lambda x, y: ((y % 4) * 60, (y % 4) * 60, 200, 255))
    for cache_bits in (0, 1, 4, 11):
        img = decode_webp(
            encode_webp_lossless(
                16, 9, rows, run_length=True, cache_bits=cache_bits
            )
        )
        assert img["pixels"] == rows, cache_bits


def test_max_symbol_shortcut_and_alpha():
    rows = _rows(9, 4, lambda x, y: (x * 20, y * 50, 7, (x + y) * 9 % 256))
    img = decode_webp(encode_webp_lossless(9, 4, rows, use_max_symbol=True))
    assert img["pixels"] == rows
    assert img["has_alpha"] is True


def test_transform_combination_roundtrips():
    rows = _rows(16, 9, lambda x, y: ((y % 4) * 60, (y % 4) * 60, 200, 255))
    img = decode_webp(
        encode_webp_lossless(
            16, 9, rows, subtract_green=True, predictor_mode=11,
            run_length=True, cache_bits=3,
        )
    )
    assert img["pixels"] == rows


def test_fuzz_roundtrip_random_images():
    """Randomized corpora across dims / features — exact equality every
    time (the lossless analog of the JPEG progressive-vs-baseline fuzz)."""
    rnd = random.Random(1234)
    for trial in range(25):
        w = rnd.randint(1, 23)
        h = rnd.randint(1, 17)
        rows = [
            bytes(rnd.randrange(256) for _ in range(w * 4)) for _ in range(h)
        ]
        kwargs = {}
        if rnd.random() < 0.4:
            kwargs["subtract_green"] = True
        if rnd.random() < 0.4:
            kwargs["predictor_mode"] = rnd.randrange(14)
        if rnd.random() < 0.3:
            kwargs["color_transform"] = (
                rnd.randrange(256), rnd.randrange(256), rnd.randrange(256)
            )
        if rnd.random() < 0.3:
            kwargs["cache_bits"] = rnd.randint(1, 11)
        if rnd.random() < 0.3:
            kwargs["run_length"] = True
        if rnd.random() < 0.3:
            kwargs["use_max_symbol"] = True
        img = decode_webp(encode_webp_lossless(w, h, rows, **kwargs))
        assert img["pixels"] == rows, (trial, w, h, kwargs)


def test_meta_prefix_groups_decode():
    """Hand-built stream with TWO prefix-code groups selected by an
    entropy image (the encoder emits only single-group streams): an 8x1
    image, entropy bits 2 -> 4-pixel blocks, block 0 -> group 0, block 1
    -> group 1. Each group's codes only cover its own half's bytes, so a
    decoder that picked the wrong group cannot produce these pixels."""
    import struct

    from eth_event_stream_spark.operators.webp import (
        _BitsW,
        _canonical_codes,
        _write_code_msb,
        _write_prefix_code,
    )

    w = _BitsW()
    w.write(0x2F, 8)
    w.write(8 - 1, 14)
    w.write(1 - 1, 14)
    w.write(0, 1)  # alpha hint
    w.write(0, 3)  # version
    w.write(0, 1)  # no transforms
    w.write(0, 1)  # no color cache
    w.write(1, 1)  # meta prefix codes present
    w.write(0, 3)  # entropy bits field: bits = 0 + 2 (the minimum)

    # entropy image: 2x1, meta codes 0 and 1 in (red<<8)|green
    def write_entropy_subimage():
        w.write(0, 1)  # no cache in the sub-image
        # green code over {0, 1}; red/blue/alpha single-symbol; dist single
        glens = [0] * 280
        glens[0] = glens[1] = 1
        _write_prefix_code(w, glens)
        for sym in (0, 0, 0xFF):  # red, blue, alpha constants
            lens = [0] * 256
            lens[sym] = 1
            _write_prefix_code(w, lens)
        dlens = [0] * 40
        dlens[0] = 1
        _write_prefix_code(w, dlens)
        gcodes = _canonical_codes(glens)
        _write_code_msb(w, *gcodes[0])  # meta code 0
        _write_code_msb(w, *gcodes[1])  # meta code 1

    write_entropy_subimage()

    # two groups: group 0 greens over {10, 20}, group 1 over {30, 40};
    # constant red/blue/alpha per group
    groups = [((10, 20), 1), ((30, 40), 2)]
    gcodes_per = []
    for (greens, const) in groups:
        glens = [0] * 280
        for g in greens:
            glens[g] = 1
        _write_prefix_code(w, glens)
        for sym in (const, const + 1, 0xFF):
            lens = [0] * 256
            lens[sym] = 1
            _write_prefix_code(w, lens)
        dlens = [0] * 40
        dlens[0] = 1
        _write_prefix_code(w, dlens)
        gcodes_per.append(_canonical_codes(glens))

    # pixels: x=0..3 from group 0 (greens 10,20,10,20), x=4..7 group 1
    for g in (10, 20, 10, 20):
        _write_code_msb(w, *gcodes_per[0][g])
    for g in (30, 40, 30, 40):
        _write_code_msb(w, *gcodes_per[1][g])

    payload = w.bytes()
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff += b"\x00"
    img = decode_webp(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    assert img["width"] == 8 and img["height"] == 1
    px = img["pixels"][0]
    got = [(px[4 * x], px[4 * x + 1], px[4 * x + 2]) for x in range(8)]
    assert got == (
        [(1, 10, 2), (1, 20, 2)] * 2 + [(2, 30, 3), (2, 40, 3)] * 2
    )


def test_fail_fast_on_damage_and_lossy():
    data = encode_webp_lossless(11, 7, GRADIENT)
    assert is_webp(data)
    with pytest.raises(ValueError, match="signature"):
        decode_webp(b"JUNK" + data[4:])
    with pytest.raises(ValueError, match="truncated|ran out|cut short"):
        decode_webp(data[:-6])
    # lossy VP8 refuses loudly with the actionable message
    lossy = bytearray(data)
    at = bytes(lossy).index(b"VP8L")
    lossy[at : at + 4] = b"VP8 "
    with pytest.raises(NotImplementedError, match="lossy WebP"):
        decode_webp(bytes(lossy))
    # bad VP8L signature byte
    bad = bytearray(data)
    bad[at + 8] ^= 0xFF
    with pytest.raises(ValueError, match="VP8L signature"):
        decode_webp(bytes(bad))
    # absurd declared dimensions refuse before allocating
    import struct

    from eth_event_stream_spark.operators.webp import _BitsW

    w = _BitsW()
    w.write(0x2F, 8)
    w.write(16383, 14)
    w.write(16383, 14)
    w.write(0, 4)
    payload = w.bytes()
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    with pytest.raises(ValueError, match="refusing WebP"):
        decode_webp(b"RIFF" + struct.pack("<I", len(riff)) + riff)


def test_extract_features_real_webp(spark):
    """The multimodal image lane reports real lossless-WebP dimensions
    through executor Python workers, beside PNG/JPEG/GIF."""
    from eth_event_stream_spark.operators.multimodal import extract_features

    payload = encode_webp_lossless(11, 7, GRADIENT, subtract_green=True)
    media = spark.createDataFrame(
        [(0, "image", payload, {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    row = extract_features(media, codec="real").collect()[0]
    assert (row["width"], row["height"]) == (11, 7)
    assert row["n_frames"] is None


def test_synth_media_sweep_decodes_to_oracle_formulas():
    """Every synth lane (PNG, WebP at doc_id % 12 == 6, JPEG, GIF,
    MJPEG-AVI, PCM-WAV, FLAC) decodes for every id the driver could draw,
    and the decoded features equal the registered oracle's arithmetic —
    the offline version of the sweep that must re-run whenever a
    registered query's synth input is extended (it caught a FLAC
    short-frame bug when the % 5 -> % 6 extension landed in round 11)."""
    from eth_event_stream_spark.operators.multimodal import (
        _decode_real,
        synth_media_payload,
    )

    for doc_id in range(0, 2 * 12 * 7 * 13 + 1, 1):  # full lane x dim cycle
        kind, payload = synth_media_payload(doc_id)
        feats = _decode_real(kind, payload)
        lane = doc_id % 6
        if lane <= 3:
            w, h = 2 + doc_id % 13, 2 + doc_id % 7
            assert (feats["width"], feats["height"]) == (w, h), doc_id
            if lane == 2:
                nf = 1 + doc_id % 3
                assert feats["n_frames"] == (nf if nf > 1 else None), doc_id
            elif lane == 3:
                assert feats["n_frames"] == 1 + doc_id % 3, doc_id
            else:
                assert feats["n_frames"] is None, doc_id
        else:
            assert feats["n_frames"] == 100 + doc_id % 50, doc_id
            assert feats["width"] is None, doc_id


def test_corruption_fuzz_always_fails_loudly():
    """Untrusted bytes reach decode_webp straight from binary columns:
    flipping any byte must either still decode (entropy streams can be
    coincidentally valid) or raise the codec's typed errors — never an
    IndexError/KeyError/hang. 300 seeded single-byte corruptions across
    feature-rich payloads."""
    rnd = random.Random(99)
    payloads = [
        encode_webp_lossless(11, 7, GRADIENT),
        encode_webp_lossless(11, 7, GRADIENT, subtract_green=True, predictor_mode=12),
        encode_webp_lossless(
            16, 9,
            _rows(16, 9, lambda x, y: ((y % 4) * 60, 10, 200, 255)),
            run_length=True, cache_bits=5,
        ),
    ]
    for trial in range(300):
        data = bytearray(rnd.choice(payloads))
        at = rnd.randrange(12, len(data))  # keep the RIFF signature
        data[at] ^= 1 << rnd.randrange(8)
        try:
            img = decode_webp(bytes(data))
            assert img["width"] > 0 and img["height"] > 0
        except (ValueError, NotImplementedError):
            pass  # the loud-failure contract


def test_animated_lossless_webp_counts_and_composites():
    """VP8X + ANIM/ANMF with all-VP8L frames: frame 1 composites at its
    offset onto a transparent canvas, EVERY later frame's stream decodes
    (so n_frames is a validated count), corrupt last frames fail loudly,
    and a lossy (VP8) frame refuses with the actionable message."""
    from eth_event_stream_spark.operators.webp import encode_webp_animation

    f1 = _rows(6, 4, lambda x, y: (200, x * 30 % 256, y * 50 % 256, 255))
    f2 = _rows(4, 4, lambda x, y: (1, 2, 3, 255))
    f3 = _rows(8, 2, lambda x, y: (9, 8, 7, 128))
    anim = encode_webp_animation(
        16, 12, [(2, 4, 6, 4, f1), (0, 0, 4, 4, f2), (8, 10, 8, 2, f3)],
        subtract_green=True,
    )
    img = decode_webp(anim)
    assert (img["width"], img["height"], img["n_frames"]) == (16, 12, 3)
    px = img["pixels"]
    assert px[0] == b"\x00" * 64  # transparent canvas above frame 1
    assert px[4][4 * 2 : 4 * 8] == f1[0]  # frame 1 row 0 at x offset 2
    assert px[4][: 4 * 2] == b"\x00" * 8
    # stills report n_frames None (the GIF single-frame convention)
    assert decode_webp(encode_webp_lossless(11, 7, GRADIENT))["n_frames"] is None
    # corrupting the LAST frame's entropy bytes still fails loudly
    bad = bytearray(anim)
    bad[-5] ^= 0xFF
    with pytest.raises((ValueError, NotImplementedError)):
        decode_webp(bytes(bad))
    # any lossy frame refuses
    lossy = bytearray(anim)
    at = bytes(lossy).index(b"VP8L", 30)
    lossy[at : at + 4] = b"VP8 "
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(bytes(lossy))


def test_animated_webp_through_the_media_lane(spark):
    """extract_features(codec='real') reports the validated frame count
    for an animated lossless WebP under both 'image' and 'video' kinds —
    the same contract as animated GIF."""
    from eth_event_stream_spark.operators.multimodal import extract_features
    from eth_event_stream_spark.operators.webp import encode_webp_animation

    f = _rows(6, 4, lambda x, y: (200, x * 30 % 256, y * 50 % 256, 255))
    anim = encode_webp_animation(8, 6, [(0, 0, 6, 4, f), (2, 2, 6, 4, f)])
    media = spark.createDataFrame(
        [(0, "image", anim, {}), (1, "video", anim, {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    rows = {r["media_id"]: r for r in extract_features(media, codec="real").collect()}
    for mid in (0, 1):
        assert (rows[mid]["width"], rows[mid]["height"], rows[mid]["n_frames"]) == (8, 6, 2)


def test_simple_code_cannot_hold_wide_symbols():
    """Streams whose 1-2 used green symbols include an LZ77 length prefix
    (>= 256) or cache reference (>= 280) must take the normal code-length
    path — the simple form stores symbols in 8 bits and used to silently
    truncate them into a corrupt stream (review-confirmed bug)."""
    rows = [b"\x07\x07\x07\xff" * 10] * 10
    img = decode_webp(encode_webp_lossless(10, 10, rows, run_length=True))
    assert img["pixels"] == rows
    # cache-dominated stream: one literal then cache hits (symbol >= 280)
    rows = [b"\x09\x0a\x0b\xff" * 6] * 5
    img = decode_webp(encode_webp_lossless(6, 5, rows, cache_bits=4))
    assert img["pixels"] == rows
    # and combined
    img = decode_webp(
        encode_webp_lossless(10, 10, [b"\x01\x02\x03\xff" * 10] * 10,
                             run_length=True, cache_bits=2)
    )
    assert img["pixels"] == [b"\x01\x02\x03\xff" * 10] * 10

"""Pure-stdlib+numpy baseline JPEG codec (operators/jpeg.py, round 11).

JPEG is lossy, so round-trip tests assert BOUNDED error, not identity:
solid blocks are DC-only and survive quantization exactly; smooth
gradients stay within a few codes at quality 90+; sharp mod-wrap edges
ring (that is JPEG working as specified), so those assert mean error.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from eth_event_stream_spark.operators.jpeg import (
    _AC_CHROMA,
    _AC_LUMA,
    _DC_CHROMA,
    _DC_LUMA,
    _ZIGZAG,
    _build_huffman,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)


def _rgb(w, h, fn):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = fn(x, y)
    return img


def _decode_to_array(data):
    img = decode_jpeg(data)
    ch = img["channels"]
    return np.frombuffer(b"".join(img["pixels"]), dtype=np.uint8).reshape(
        img["height"], img["width"], ch
    )


def test_solid_block_roundtrips_exactly():
    """A solid color is a DC-only block: quantization cannot move it (the
    DC step divides and re-multiplies the same table entry)."""
    rows = [bytes([120, 200, 64] * 8)] * 8
    got = _decode_to_array(encode_jpeg(8, 8, rows, quality=90))
    assert got.shape == (8, 8, 3)
    assert np.abs(got.astype(int) - [120, 200, 64]).max() == 0


def test_smooth_gradient_stays_close():
    w, h = 64, 48
    orig = _rgb(w, h, lambda x, y: (min(255, x * 3), min(255, y * 4), 128))
    rows = [orig[y].tobytes() for y in range(h)]
    got = _decode_to_array(encode_jpeg(w, h, rows, quality=92))
    err = np.abs(got.astype(int) - orig.astype(int))
    assert got.shape == (h, w, 3)
    assert err.max() <= 12, err.max()
    assert err.mean() <= 2.0, err.mean()


def test_sharp_edges_ring_but_stay_bounded_in_the_mean():
    w, h = 64, 48
    orig = _rgb(
        w, h, lambda x, y: ((x * 4) % 256, (y * 5) % 256, ((x + y) * 3) % 256)
    )
    rows = [orig[y].tobytes() for y in range(h)]
    got = _decode_to_array(encode_jpeg(w, h, rows, quality=90))
    err = np.abs(got.astype(int) - orig.astype(int))
    assert err.mean() <= 3.0, err.mean()


def test_grayscale_and_odd_dimensions():
    """1-component path + the edge-replication padding for non-multiple-of-8
    dimensions (13x9 forces both a partial MCU row and column)."""
    w, h = 13, 9
    orig = (np.arange(w * h, dtype=np.uint8).reshape(h, w) * 2)
    rows = [orig[y].tobytes() for y in range(h)]
    img = decode_jpeg(encode_jpeg(w, h, rows, channels=1, quality=95))
    assert (img["width"], img["height"], img["channels"]) == (w, h, 1)
    got = np.frombuffer(b"".join(img["pixels"]), dtype=np.uint8).reshape(h, w)
    assert np.abs(got.astype(int) - orig.astype(int)).max() <= 3


def test_restart_markers_decode_identically():
    """DRI/RSTn: byte-aligned intervals with DC-predictor resets must
    decode bit-identically to the plain stream of the same image."""
    w, h = 32, 16
    orig = _rgb(
        w, h, lambda x, y: (min(255, x * 8), min(255, y * 16), 200 - min(200, x * 4))
    )
    rows = [orig[y].tobytes() for y in range(h)]
    plain = _decode_to_array(encode_jpeg(w, h, rows, quality=92))
    rst = _decode_to_array(encode_jpeg(w, h, rows, quality=92, restart_interval=2))
    assert (plain == rst).all()


def test_annex_k_tables_are_valid_prefix_codes():
    """BITS/HUFFVAL consistency: every table builds a canonical prefix code
    covering all its symbols exactly once (a typo in the hardcoded tables
    would fail here, not as a silent mis-decode — the encoder writes the
    SAME tables into DHT, so codec self-consistency is by construction)."""
    for bits, vals in (_DC_LUMA, _DC_CHROMA, _AC_LUMA, _AC_CHROMA):
        enc, dec = _build_huffman(bits, vals)
        assert len(enc) == len(vals) == len(set(vals))
        assert len(dec) == len(vals)
    assert len(_AC_LUMA[1]) == len(_AC_CHROMA[1]) == 162
    # zigzag covers all 64 cells once, starts at DC, first steps per T.81
    assert len(set(_ZIGZAG)) == 64
    assert _ZIGZAG[:4] == [(0, 0), (0, 1), (1, 0), (2, 0)]


def test_fail_fast_on_damage_and_unsupported():
    rows = [bytes([10, 20, 30] * 8)] * 8
    data = encode_jpeg(8, 8, rows)
    assert is_jpeg(data)
    # truncation inside the entropy segment
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(data[:-12])
    # not a JPEG at all
    with pytest.raises(ValueError, match="signature"):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnope")
    # arithmetic-coded (SOF9-family): refuse loudly rather than decode wrong
    arith = bytearray(data)
    sof_at = bytes(arith).index(b"\xff\xc0")
    arith[sof_at + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(arith))
    # absurd declared dimensions: refuse before allocating planes
    huge = bytearray(data)
    struct.pack_into(">HH", huge, sof_at + 5, 65500, 65500)
    with pytest.raises(ValueError, match="refusing JPEG"):
        decode_jpeg(bytes(huge))


def _media_df(spark, payloads):
    return spark.createDataFrame(
        [(i, "image", p, {}) for i, p in enumerate(payloads)],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )


def test_extract_features_real_jpeg_in_executors(spark):
    """The multimodal lane routes JPEG magic to the real codec inside the
    Arrow-batched mapInPandas — real dims come back through executor
    Python workers, beside PNG."""
    from eth_event_stream_spark.operators.multimodal import extract_features
    from eth_event_stream_spark.operators.png import encode_png

    jpg = encode_jpeg(24, 16, [bytes([60, 90, 120] * 24)] * 16, quality=90)
    png = encode_png(
        10, 7, [bytes(range(30)) for _ in range(7)], color_type=2
    )
    out = {
        r["media_id"]: r
        for r in extract_features(_media_df(spark, [jpg, png]), codec="real").collect()
    }
    assert (out[0]["width"], out[0]["height"]) == (24, 16)
    assert (out[1]["width"], out[1]["height"]) == (10, 7)


def test_resize_images_real_jpeg(spark):
    from eth_event_stream_spark.operators.multimodal import resize_images

    big = encode_jpeg(640, 480, [bytes([200] * 640 * 3)] * 480, quality=80)
    small = encode_jpeg(30, 20, [bytes([50] * 30 * 3)] * 20, quality=80)
    out = {
        r["media_id"]: r
        for r in resize_images(
            _media_df(spark, [big, small]), max_w=320, max_h=240, codec="real"
        ).collect()
    }
    assert (out[0]["new_width"], out[0]["new_height"]) == (320, 240)
    assert (out[1]["new_width"], out[1]["new_height"]) == (30, 20)


def test_progressive_decodes_bit_identically_to_baseline():
    """Progressive and baseline encode the SAME quantized coefficients, so
    their decodes must be BIT-identical — this pins the whole progressive
    machinery (DC first + refinement, spectral AC bands with end-of-band
    runs, AC successive-approximation refinement with buffered correction
    bits) against the already-verified sequential path."""
    w, h = 40, 24
    orig = _rgb(w, h, lambda x, y: ((x * 7) % 256, (y * 11) % 256, (x * y) % 256))
    rows = [orig[y].tobytes() for y in range(h)]
    base = _decode_to_array(encode_jpeg(w, h, rows, quality=88))
    prog = _decode_to_array(encode_jpeg(w, h, rows, quality=88, progressive=True))
    assert (base == prog).all()
    # restart markers inside progressive scans (both unit geometries:
    # interleaved DC MCUs and single-component block rasters)
    rst = _decode_to_array(
        encode_jpeg(w, h, rows, quality=88, progressive=True, restart_interval=3)
    )
    assert (base == rst).all()
    # grayscale + odd dims: non-interleaved DC scan, partial-MCU padding
    g = (np.arange(19 * 13, dtype=np.uint8).reshape(13, 19) * 3)
    grows = [g[y].tobytes() for y in range(13)]
    gb = decode_jpeg(encode_jpeg(19, 13, grows, channels=1, quality=95))
    gp = decode_jpeg(
        encode_jpeg(19, 13, grows, channels=1, quality=95, progressive=True)
    )
    assert gb["pixels"] == gp["pixels"]


def test_progressive_fuzz_matches_baseline():
    """Randomized corpora (noise = dense AC + ZRL, smooth = long EOB runs,
    blocky = DC-dominated) across sizes, qualities, channel counts, and
    restart intervals: every progressive decode equals its baseline twin
    bit-for-bit."""
    rng = np.random.default_rng(7)
    for _ in range(12):
        w = int(rng.integers(8, 50))
        h = int(rng.integers(8, 40))
        ch = int(rng.choice([1, 3]))
        q = int(rng.integers(30, 98))
        ri = int(rng.choice([0, 1, 4]))
        kind = rng.choice(["noise", "smooth", "blocky"])
        if kind == "noise":
            orig = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        elif kind == "smooth":
            xs = np.linspace(0, 255, w)
            ys = np.linspace(0, 255, h)
            orig = np.stack(
                [((xs[None, :] + ys[:, None] * (c + 1)) % 256) for c in range(ch)],
                -1,
            ).astype(np.uint8)
        else:
            orig = np.kron(
                rng.integers(0, 256, ((h + 7) // 8, (w + 7) // 8, ch)),
                np.ones((8, 8, 1)),
            )[:h, :w].astype(np.uint8)
        rows = [orig[y].tobytes() for y in range(h)]
        base = decode_jpeg(encode_jpeg(w, h, rows, channels=ch, quality=q))
        prog = decode_jpeg(
            encode_jpeg(
                w, h, rows, channels=ch, quality=q,
                progressive=True, restart_interval=ri,
            )
        )
        assert base["pixels"] == prog["pixels"], (w, h, ch, q, ri, kind)


def test_progressive_fail_fast():
    rows = [bytes([10, 20, 30] * 8)] * 8
    data = encode_jpeg(8, 8, rows, progressive=True)
    assert is_jpeg(data)
    # truncation inside a progressive scan
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(data[:-12])
    # a progressive stream must end in EOI to reconstruct
    with pytest.raises(ValueError, match="truncated JPEG: no"):
        decode_jpeg(data[:-2])


def test_single_component_scan_ignores_declared_sampling_factors():
    """T.81 §A.2.2: a single-component scan is non-interleaved — one block
    per MCU over the component's own raster. Some encoders declare 2x2
    sampling for grayscale; decoding it with interleaved MCU geometry
    mis-places blocks whenever ceil(width/8) differs from the MCU-padded
    grid (regression: silent wrong pixels)."""
    w, h = 20, 12  # 3x2 block raster vs 2x1 grid of 2x2 MCUs (8 blocks)
    rows = [bytes((x * 11 + y * 5) % 256 for x in range(w)) for y in range(h)]
    data = bytearray(encode_jpeg(w, h, rows, channels=1, quality=95))
    want = decode_jpeg(bytes(data))["pixels"]
    at = bytes(data).index(b"\xff\xc0") + 11  # SOF0 component h/v byte
    assert data[at] == 0x11
    data[at] = 0x22  # declare 2x2 sampling on the sole component
    got = decode_jpeg(bytes(data))
    assert got["pixels"] == want
    # restart markers still line up on the non-interleaved raster
    data_ri = bytearray(encode_jpeg(w, h, rows, channels=1, quality=95, restart_interval=2))
    want_ri = decode_jpeg(bytes(data_ri))["pixels"]
    at = bytes(data_ri).index(b"\xff\xc0") + 11
    data_ri[at] = 0x22
    assert decode_jpeg(bytes(data_ri))["pixels"] == want_ri

"""Pure-stdlib PNG codec (operators/png.py) + the real multimodal decode
path it unlocks: round-trips across color types and every scanline filter,
hand-built palette images, fail-fast on corruption, and the Arrow-batched
extract_features/resize_images pipelines running against REAL image bytes
inside Spark executors."""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from eth_event_stream_spark.operators.png import (
    _SIGNATURE,
    decode_png,
    encode_png,
    is_png,
)


def _gradient(width, height, channels):
    """Deterministic pixel rows where every filter type actually changes
    the encoded bytes (horizontal + vertical + channel gradients)."""
    return [
        bytes(
            (x * 7 + y * 13 + c * 29) % 256
            for x in range(width)
            for c in range(channels)
        )
        for y in range(height)
    ]


@pytest.mark.parametrize("color_type,channels", [(0, 1), (2, 3), (4, 2), (6, 4)])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_every_color_type_and_filter(color_type, channels, filter_type):
    w, h = 17, 9  # odd sizes: exercise stride edges
    rows = _gradient(w, h, channels)
    data = encode_png(w, h, rows, color_type=color_type, filter_type=filter_type)
    assert is_png(data)
    img = decode_png(data)
    assert (img["width"], img["height"], img["channels"]) == (w, h, channels)
    assert img["pixels"] == rows


def test_palette_image_expands_to_rgb():
    """Hand-built 2x2 palette PNG (encoder doesn't write palettes): indexes
    [[0,1],[2,0]] over a 3-entry palette must expand to the palette RGB."""

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    raw = bytes([0, 0, 1, 0, 2, 0])  # filter 0 + indexes, per row
    data = (
        _SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    img = decode_png(data)
    assert img["channels"] == 3
    assert img["pixels"] == [
        bytes([255, 0, 0, 0, 255, 0]),
        bytes([0, 0, 255, 255, 0, 0]),
    ]


def test_fail_fast_on_damage():
    data = bytearray(encode_png(4, 4, _gradient(4, 4, 3), color_type=2))
    # flip one IDAT payload byte -> CRC must catch it
    idat_at = bytes(data).index(b"IDAT")
    data[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))
    # truncation
    with pytest.raises(ValueError, match="truncated"):
        decode_png(encode_png(4, 4, _gradient(4, 4, 3))[:-8])
    # not a PNG at all
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a....")
    # interlaced: refuse loudly rather than decode wrong
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""))


def test_decompression_bomb_is_bounded():
    """Untrusted IDAT must never inflate past the IHDR-derived size: a
    2x2 image whose IDAT decompresses to ~64 MiB has to be rejected by the
    bounded decompressobj (max_length = expected+1), not after a full
    unbounded zlib.decompress allocation; absurd declared dimensions are
    refused before any inflate at all."""

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # tiny declared image, huge actual payload (64 MiB of zeros -> ~64 KiB
    # compressed): the bound caps the inflate at expected+1 bytes
    bomb = (
        _SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * (64 * 1024 * 1024)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(bomb)

    # absurd declared dimensions: refuse before allocating anything
    huge = (
        _SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2**31 - 1, 2**31 - 1, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="refusing PNG"):
        decode_png(huge)

    # a truncated zlib stream (valid prefix, never reaches eof) still fails
    ok_raw = bytes([0, 0, 0, 0, 0, 0])  # 2x2 gray, filter 0
    trunc = (
        _SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(ok_raw)[:-4])
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(trunc)


def _media_df(spark, payloads):
    """media table with REAL PNG payloads (media_id, kind, payload, meta)."""
    return spark.createDataFrame(
        [(i, "image", bytearray(p), {}) for i, p in enumerate(payloads)],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )


def test_extract_features_real_codec_in_executors(spark):
    """The real decode path end-to-end THROUGH Spark: Arrow-batched
    mapInPandas on executor Python workers decodes real PNG bytes with the
    shipped stdlib codec — width/height come from actual pixels, unlike the
    fake codec's byte-derived dims."""
    from eth_event_stream_spark.operators.multimodal import extract_features

    sizes = [(33, 21), (64, 48), (5, 5)]
    payloads = [
        encode_png(w, h, _gradient(w, h, 3), color_type=2, filter_type=4)
        for w, h in sizes
    ]
    out = {
        r["media_id"]: r
        for r in extract_features(_media_df(spark, payloads), codec="real").collect()
    }
    for i, (w, h) in enumerate(sizes):
        assert (out[i]["width"], out[i]["height"]) == (w, h), i
        assert out[i]["n_bytes"] == len(payloads[i])

    # a non-PNG image payload must fail LOUDLY through the same path
    bad = _media_df(spark, [b"JFIF not a png"])
    with pytest.raises(Exception, match="codec library"):
        extract_features(bad, codec="real").collect()


def test_resize_images_real_codec(spark):
    """Aspect-preserving resize over REAL decoded dims: a 640x480 PNG capped
    at 320x240 halves exactly; a small image passes through untouched."""
    from eth_event_stream_spark.operators.multimodal import resize_images

    payloads = [
        encode_png(640, 480, _gradient(640, 480, 1), color_type=0),
        encode_png(30, 20, _gradient(30, 20, 1), color_type=0),
    ]
    rows = {
        r["media_id"]: r
        for r in resize_images(_media_df(spark, payloads), codec="real").collect()
    }
    assert (rows[0]["new_width"], rows[0]["new_height"]) == (320, 240)
    assert (rows[1]["new_width"], rows[1]["new_height"]) == (30, 20)


def _wav_bytes(n_frames, channels=2, framerate=16000):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(
            bytes((i * 31) % 256 for i in range(n_frames * channels * 2))
        )
    return buf.getvalue()


def test_extract_features_real_wav_audio(spark):
    """PCM WAV audio decodes for real through the same Arrow pipeline via
    the stdlib wave module: n_frames comes from the actual container, not
    the byte-derived fake."""
    from eth_event_stream_spark.operators.multimodal import extract_features

    payloads = [_wav_bytes(1234), _wav_bytes(7, channels=1)]
    media = spark.createDataFrame(
        [(i, "audio", bytearray(p), {}) for i, p in enumerate(payloads)],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    out = {
        r["media_id"]: r
        for r in extract_features(media, codec="real").collect()
    }
    assert out[0]["n_frames"] == 1234 and out[1]["n_frames"] == 7
    assert out[0]["width"] is None  # audio rows carry no image dims

    # a non-WAV audio payload fails loudly, as does a corrupt WAV body
    bad = spark.createDataFrame(
        [(9, "audio", bytearray(b"OggS not a wav"), {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    with pytest.raises(Exception, match="codec library"):
        extract_features(bad, codec="real").collect()
    corrupt = bytearray(_wav_bytes(50))
    corrupt[12:16] = b"XXXX"  # clobber the fmt chunk id
    cdf = spark.createDataFrame(
        [(10, "audio", corrupt, {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    with pytest.raises(Exception):
        extract_features(cdf, codec="real").collect()


def test_resample_images_real_pixels_every_codec(spark):
    """The real pixel resample (formerly the stubbed step): decode via
    the in-repo codec, nearest-neighbor to the aspect-preserving target,
    re-encode PNG — exact floor-mapping pixel equality checked per codec
    (PNG exact, WebP exact, GIF exact through its palette, JPEG via its
    own decode since DCT is lossy), and in-bounds rows pass through with
    byte-identical pixels."""
    import numpy as np

    from eth_event_stream_spark.operators.gif import encode_gif
    from eth_event_stream_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from eth_event_stream_spark.operators.multimodal import resample_images
    from eth_event_stream_spark.operators.webp import encode_webp_lossless

    w, h, mw, mh = 16, 12, 8, 8
    rgb = [bytes(((x * 17 + y * 5 + c * 3) % 256) for x in range(w) for c in range(3)) for y in range(h)]
    rgba = [bytes(((x * 17 + y * 5 + c * 3) % 256) for x in range(w) for c in range(4)) for y in range(h)]
    palette = bytes(i for i in range(256) for _ in range(3))
    gif_idx = [bytes((x * 16 + y) % 256 for x in range(w)) for y in range(h)]
    payloads = [
        (0, "image", encode_png(w, h, rgb, color_type=2), {}),
        (1, "image", encode_webp_lossless(w, h, rgba), {}),
        (2, "image", encode_gif(w, h, [b"".join(gif_idx)], palette), {}),
        (3, "image", encode_jpeg(w, h, rgb, quality=95), {}),
        (4, "audio", b"not an image", {}),
    ]
    media = spark.createDataFrame(
        payloads,
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    out = {r["media_id"]: r for r in resample_images(media, max_w=mw, max_h=mh).collect()}
    assert set(out) == {0, 1, 2, 3}
    # target dims: 16x12 -> width-bound? 16*8 >= 12*8 -> (8, 12*8//16=6)
    for mid in out:
        assert (out[mid]["new_width"], out[mid]["new_height"]) == (8, 6)

    def expect_nn(src_rows, ch):
        px = np.frombuffer(b"".join(src_rows), dtype=np.uint8).reshape(h, w, ch)
        ys = (np.arange(6) * h) // 6
        xs = (np.arange(8) * w) // 8
        return px[ys][:, xs]

    # PNG / WebP: exact equality with the floor-mapped source
    got = decode_png(bytes(out[0]["resized"]))
    assert np.array_equal(
        np.frombuffer(b"".join(got["pixels"]), np.uint8).reshape(6, 8, 3),
        expect_nn(rgb, 3),
    )
    gotw = decode_png(bytes(out[1]["resized"]))
    assert np.array_equal(
        np.frombuffer(b"".join(gotw["pixels"]), np.uint8).reshape(6, 8, 4),
        expect_nn(rgba, 4),
    )
    # GIF: exact through palette expansion
    gif_rgb = [
        b"".join(palette[3 * i : 3 * i + 3] for i in row) for row in gif_idx
    ]
    gotg = decode_png(bytes(out[2]["resized"]))
    assert np.array_equal(
        np.frombuffer(b"".join(gotg["pixels"]), np.uint8).reshape(6, 8, 3),
        expect_nn(gif_rgb, 3),
    )
    # JPEG: resample of ITS OWN decode (DCT loss happens before resample)
    jdec = decode_jpeg(payloads[3][2])
    gotj = decode_png(bytes(out[3]["resized"]))
    assert np.array_equal(
        np.frombuffer(b"".join(gotj["pixels"]), np.uint8).reshape(6, 8, 3),
        expect_nn(jdec["pixels"], 3),
    )
    # in-bounds rows pass through byte-identical
    small = spark.createDataFrame(
        [(9, "image", encode_png(w, h, rgb, color_type=2), {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    row = resample_images(small, max_w=100, max_h=100).collect()[0]
    assert (row["new_width"], row["new_height"]) == (w, h)
    assert decode_png(bytes(row["resized"]))["pixels"] == rgb

"""GIF (LZW) and MJPEG-AVI (RIFF) codecs + the real video frame lane
(operators/gif.py, operators/avi.py, round 11)."""

from __future__ import annotations

import numpy as np
import pytest

from eth_event_stream_spark.operators.avi import (
    avi_frame,
    decode_avi,
    encode_avi,
    is_avi,
)
from eth_event_stream_spark.operators.gif import (
    decode_gif,
    encode_gif,
    is_gif,
)
from eth_event_stream_spark.operators.jpeg import decode_jpeg, encode_jpeg

PALETTE = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])


def _gif_frame(w, h, fn):
    return bytes([fn(x, y) % 4 for y in range(h) for x in range(w)])


def test_gif_roundtrip_first_frame_and_count():
    """LZW decode reproduces the exact palette pixels of frame 1; every
    later frame's stream is decoded too, so n_frames is a validated count."""
    w, h = 7, 5
    f1 = _gif_frame(w, h, lambda x, y: x + y)
    f2 = _gif_frame(w, h, lambda x, y: x * y)
    img = decode_gif(encode_gif(w, h, [f1, f2], PALETTE))
    assert (img["width"], img["height"], img["n_frames"]) == (w, h, 2)
    want = [
        b"".join(PALETTE[3 * ((x + y) % 4) : 3 * ((x + y) % 4) + 3] for x in range(w))
        for y in range(h)
    ]
    assert img["pixels"] == want


def test_gif_interlaced_decodes_identically():
    w, h = 9, 11
    f1 = _gif_frame(w, h, lambda x, y: x + 2 * y)
    plain = decode_gif(encode_gif(w, h, [f1], PALETTE))
    inter = decode_gif(encode_gif(w, h, [f1], PALETTE, interlace=True))
    assert inter["pixels"] == plain["pixels"]


def test_gif_fail_fast():
    w, h = 5, 4
    data = encode_gif(w, h, [_gif_frame(w, h, lambda x, y: x)], PALETTE)
    assert is_gif(data)
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(data[:-3])
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + data)
    # corrupt the LZW payload: flip bits inside the image data sub-block
    bad = bytearray(data)
    img_at = bytes(bad).index(b"\x2c")
    bad[img_at + 12] ^= 0xFF
    with pytest.raises(ValueError, match="corrupt GIF|truncated GIF"):
        decode_gif(bytes(bad))
    # absurd declared dimensions refuse before allocating the canvas
    huge = bytearray(data)
    huge[6:10] = (60000).to_bytes(2, "little") + (60000).to_bytes(2, "little")
    with pytest.raises(ValueError, match="refusing GIF"):
        decode_gif(bytes(huge))


def _gif_with_local_table(bg_index):
    """Hand-built GIF89a: 4x4 canvas, 4-color GLOBAL table, and a 2x2
    frame at (1,1) that carries its own 2-color LOCAL table (the stock
    encoder only emits global tables)."""
    import struct

    from eth_event_stream_spark.operators.gif import _lzw_encode_naive

    gct = bytes([10, 20, 30, 200, 0, 0, 0, 200, 0, 0, 0, 200])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 1, bg_index, 0)  # 4-color GCT
    out += gct
    out += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0x80)  # 2-color LCT
    out += bytes([5, 5, 5, 7, 7, 7])
    out.append(2)  # LZW min code size
    lzw = _lzw_encode_naive(bytes([1, 1, 1, 1]), 2)
    out.append(len(lzw))
    out += lzw
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_background_index_resolves_in_the_global_table():
    """GIF89a: the logical-screen background index refers to the GLOBAL
    color table even when frame 1 carries a local one (regression: the
    background was looked up in the frame's local palette), and an index
    beyond the global table falls back to black."""
    img = decode_gif(_gif_with_local_table(bg_index=1))
    px = np.frombuffer(b"".join(img["pixels"]), dtype=np.uint8).reshape(4, 4, 3)
    assert tuple(px[0, 0]) == (200, 0, 0)  # GCT[1], NOT the LCT's (7,7,7)
    assert tuple(px[3, 3]) == (200, 0, 0)
    assert tuple(px[1, 1]) == (7, 7, 7)  # frame pixels use the LOCAL table
    assert tuple(px[2, 2]) == (7, 7, 7)
    # bg index past the global table's 4 entries -> black, not an OOB read
    img = decode_gif(_gif_with_local_table(bg_index=7))
    px = np.frombuffer(b"".join(img["pixels"]), dtype=np.uint8).reshape(4, 4, 3)
    assert tuple(px[0, 0]) == (0, 0, 0)
    assert tuple(px[1, 1]) == (7, 7, 7)


def _mjpeg_avi(w=24, h=16, n=3, fps=25):
    frames = [
        encode_jpeg(w, h, [bytes([(40 * i) % 256, 80, 120] * w)] * h, quality=90)
        for i in range(1, n + 1)
    ]
    return encode_avi(w, h, frames, fps=fps), frames


def test_avi_decodes_first_frame_and_counts_the_rest():
    data, frames = _mjpeg_avi()
    assert is_avi(data)
    v = decode_avi(data)
    assert (v["width"], v["height"], v["n_frames"], v["fps_millis"]) == (
        24, 16, 3, 25000,
    )
    px = np.frombuffer(b"".join(v["pixels"]), dtype=np.uint8).reshape(16, 24, 3)
    assert np.abs(px.astype(int) - [40, 80, 120]).max() == 0
    # arbitrary frame slice round-trips to the exact JPEG payload and
    # decodes with the JPEG codec
    assert avi_frame(data, 2) == frames[2]
    assert decode_jpeg(avi_frame(data, 1))["width"] == 24
    with pytest.raises(IndexError):
        avi_frame(data, 3)


def test_avi_fail_fast():
    data, _ = _mjpeg_avi()
    with pytest.raises(ValueError, match="truncated"):
        decode_avi(data[:-10])
    with pytest.raises(ValueError, match="signature"):
        decode_avi(b"RIFX" + data[4:])
    # a video chunk that is not a JPEG refuses loudly (only MJPEG decodes)
    raw = bytearray(data)
    at = bytes(raw).index(b"00dc") + 8
    raw[at : at + 3] = b"\x00\x00\x00"
    with pytest.raises(NotImplementedError, match="MJPEG"):
        decode_avi(bytes(raw))


def _media_df(spark, rows):
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta map<string,string>"
    )


def test_extract_features_real_gif_and_avi(spark):
    """The real-codec lane: GIF images report real dims + validated frame
    counts, MJPEG-AVI video reports real dims + frame counts — through
    executor Python workers beside PNG/JPEG/WAV."""
    from eth_event_stream_spark.operators.multimodal import extract_features

    gif2 = encode_gif(
        7, 5, [_gif_frame(7, 5, lambda x, y: x), _gif_frame(7, 5, lambda x, y: y)],
        PALETTE,
    )
    gif1 = encode_gif(7, 5, [_gif_frame(7, 5, lambda x, y: x)], PALETTE)
    avi, _ = _mjpeg_avi(n=4)
    out = {
        r["media_id"]: r
        for r in extract_features(
            _media_df(
                spark,
                [(0, "image", gif2, {}), (1, "image", gif1, {}), (2, "video", avi, {})],
            ),
            codec="real",
        ).collect()
    }
    assert (out[0]["width"], out[0]["height"], out[0]["n_frames"]) == (7, 5, 2)
    assert (out[1]["width"], out[1]["height"], out[1]["n_frames"]) == (7, 5, None)
    assert (out[2]["width"], out[2]["height"], out[2]["n_frames"]) == (24, 16, 4)


def test_sample_frames_real_codec_and_frame_features(spark):
    """sample_frames(codec="real") explodes REAL frame counts, and
    extract_frame_features decodes every sampled frame's actual dimensions
    from the container inside one Arrow pass."""
    from eth_event_stream_spark.operators.multimodal import (
        extract_frame_features,
        sample_frames,
    )

    avi, frames = _mjpeg_avi(n=7)
    df = _media_df(spark, [(5, "video", avi, {})])
    idx = sorted(
        r["frame_idx"] for r in sample_frames(df, every_n=3, codec="real").collect()
    )
    assert idx == [0, 3, 6]
    feats = sorted(
        (r["frame_idx"], r["width"], r["height"], r["frame_bytes"])
        for r in extract_frame_features(df, every_n=3).collect()
    )
    assert feats == [
        (0, 24, 16, len(frames[0])),
        (3, 24, 16, len(frames[3])),
        (6, 24, 16, len(frames[6])),
    ]

"""Minimal pure-stdlib MJPEG-AVI container codec (RIFF parsing).

Closes the VIDEO stub of the multimodal lane for real: an AVI whose video
stream is Motion-JPEG carries one baseline JPEG per frame, so the in-repo
JPEG codec (``operators/jpeg.py``) decodes actual frames and the RIFF
layer is pure ``struct`` — all public knowledge (the RIFF/AVI container
layout; MJPEG = concatenated JFIF frames). Supported: 'RIFF..AVI ' files
with an ``avih`` main header and ``00dc``/``00db`` video chunks inside the
``movi`` LIST (both flat and ``rec ``-grouped), arbitrary other chunks
skipped by size. Fail-fast on truncated chunks, a missing movi LIST, or a
frame that is not a decodable baseline JPEG.

``decode_avi`` validates and decodes the FIRST frame fully (real pixels)
and counts the rest (their JPEG signatures checked); ``avi_frame`` slices
out any frame's JPEG payload so callers can decode an arbitrary sample —
the real-codec backend for ``sample_frames``-style plumbing.

The encoder exists so tests can synthesize REAL AVI payloads in-container
(the PNG/JPEG/GIF pattern); it is not a production write path.

Reference parity note: the reference repo (Rust, ~1.6k lines) has no
media layer at all; this file extends the engine's multimodal lane
(SURVEY.md §2 training-data surface) from public format specifications
only, like operators/png.py and operators/jpeg.py before it.
"""

from __future__ import annotations

import struct

_MAX_FRAMES = 1 << 20  # sanity cap on declared frame counts


def is_avi(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for every chunk in
    [pos, end); descends into LIST chunks via the caller."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = pos + 8
        if payload + size > end:
            raise ValueError(f"truncated AVI: chunk {fourcc!r} ran past the end")
        yield fourcc, payload, size
        pos = payload + size + (size & 1)  # chunks are word-aligned


def _video_chunks(data: bytes, pos: int, end: int):
    """Yield (start, size) of every video-frame chunk ('00dc'/'00db'),
    descending into 'rec ' grouping LISTs."""
    for fourcc, payload, size in _walk_chunks(data, pos, end):
        if fourcc == b"LIST":
            if data[payload : payload + 4] == b"rec ":
                yield from _video_chunks(data, payload + 4, payload + size)
        elif fourcc[2:4] in (b"dc", b"db"):
            yield payload, size


def _movi_bounds(data: bytes) -> tuple[int, int, dict]:
    """Locate the movi LIST and the avih header fields."""
    if not is_avi(data):
        raise ValueError("not an AVI: bad RIFF signature")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_size)
    header: dict = {}
    movi = None
    for fourcc, payload, size in _walk_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        kind = data[payload : payload + 4]
        if kind == b"hdrl":
            for f2, p2, s2 in _walk_chunks(data, payload + 4, payload + size):
                if f2 == b"avih" and s2 >= 40:
                    (
                        header["usec_per_frame"],
                        _maxbytes,
                        _pad,
                        _flags,
                        header["total_frames"],
                    ) = struct.unpack("<IIIII", data[p2 : p2 + 20])
                    header["width"], header["height"] = struct.unpack(
                        "<II", data[p2 + 32 : p2 + 40]
                    )
        elif kind == b"movi":
            movi = (payload + 4, payload + size)
    if movi is None:
        raise ValueError("corrupt AVI: no movi LIST")
    return movi[0], movi[1], header


def decode_avi(data: bytes) -> dict:
    """Decode an MJPEG AVI to ``{width, height, channels, pixels,
    n_frames, fps_millis}``: the FIRST frame's real pixels (via the
    baseline JPEG codec), the counted frame total (every frame's JPEG
    signature verified), and the header frame rate in millihertz."""
    from .jpeg import decode_jpeg, is_jpeg

    start, end, header = _movi_bounds(data)
    first = None
    n_frames = 0
    for payload, size in _video_chunks(data, start, end):
        frame = data[payload : payload + size]
        if not is_jpeg(frame):
            raise NotImplementedError(
                "AVI video chunk is not a baseline JPEG (MJPEG is the only "
                "supported video codec in this environment)"
            )
        if first is None:
            first = decode_jpeg(frame)
        n_frames += 1
        if n_frames > _MAX_FRAMES:
            raise ValueError("refusing AVI: frame count exceeds sanity cap")
    if first is None:
        raise ValueError("corrupt AVI: movi LIST has no video chunks")
    declared = header.get("total_frames")
    if declared and declared != n_frames:
        raise ValueError(
            f"corrupt AVI: header declares {declared} frames, movi has {n_frames}"
        )
    usec = header.get("usec_per_frame") or 0
    return {
        "width": first["width"],
        "height": first["height"],
        "channels": first["channels"],
        "pixels": first["pixels"],
        "n_frames": n_frames,
        "fps_millis": (1_000_000_000 // usec) if usec else None,
    }


def avi_frame(data: bytes, index: int) -> bytes:
    """Slice frame ``index``'s JPEG payload out of the movi LIST (zero-copy
    until the slice) — decode with ``decode_jpeg`` for real pixels."""
    start, end, _ = _movi_bounds(data)
    for i, (payload, size) in enumerate(_video_chunks(data, start, end)):
        if i == index:
            return data[payload : payload + size]
    raise IndexError(f"AVI has no frame {index}")


def encode_avi(
    width: int, height: int, jpeg_frames: list[bytes], fps: int = 25
) -> bytes:
    """Wrap pre-encoded JPEG frames in a minimal MJPEG AVI. Tests only."""
    if not jpeg_frames:
        raise ValueError("need at least one frame")

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # usec per frame
        0,
        0,
        0x10,  # AVIF_HASINDEX-free, interleaved flag only
        len(jpeg_frames),
        0,
        1,  # one stream
        0,
        width,
        height,
        0,
        0,
        0,
        0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",
        b"MJPG",
        0,
        0,
        0,
        0,
        1,
        fps,  # rate/scale = fps
        0,
        len(jpeg_frames),
        0,
        0xFFFFFFFF,
        0,
        0,
        0,
        int(width),
        int(height),
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,
        width,
        height,
        1,
        24,
        b"MJPG",
        width * height * 3,
        0,
        0,
        0,
        0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body

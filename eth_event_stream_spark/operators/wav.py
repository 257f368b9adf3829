"""Minimal pure-stdlib RIFF-WAVE codec: PCM plus G.711 µ-law / A-law.

The stdlib ``wave`` module refuses anything but integer PCM; G.711
telephony audio (WAVE format tags 6 = A-law, 7 = µ-law) is pure table
math — all public knowledge (ITU-T G.711; the RIFF-WAVE container
layout). Supported: fmt tags 1 (PCM, 8/16/24/32-bit), 6 (A-law), 7
(µ-law); mono or multi-channel; chunk walking that skips LIST/fact/cue
metadata. Fail-fast on truncation, missing fmt/data chunks, float or
extensible formats, and byte counts that don't divide the frame size —
the loud-failure discipline of the other in-repo codecs.

``decode_wav`` returns real frame counts AND real 16-bit linear samples
(G.711 expanded through 256-entry lookup tables), so the multimodal lane
reports sample counts for compressed telephony audio the stdlib path
raised on.

Reference parity note: the reference repo (Rust, ~1.6k lines) has no
media layer at all; this file extends the engine's multimodal lane
(SURVEY.md §2 training-data surface) from public format specifications
only, like operators/png.py and operators/jpeg.py before it.
"""

from __future__ import annotations

import struct

_MAX_DECODED_BYTES = 256 * 1024 * 1024  # same ceiling as the image codecs


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def _ulaw_to_linear(b: int) -> int:
    """ITU-T G.711 µ-law expansion to 16-bit linear."""
    b = ~b & 0xFF
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    x = (((mant << 3) + 0x84) << exp) - 0x84
    return -x if b & 0x80 else x


def _alaw_to_linear(b: int) -> int:
    """ITU-T G.711 A-law expansion to 16-bit linear."""
    b ^= 0x55
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    if exp == 0:
        x = (mant << 4) + 8
    else:
        x = ((mant << 4) + 0x108) << (exp - 1)
    return x if b & 0x80 else -x  # A-law: bit 7 SET means positive


_ULAW_TABLE = [_ulaw_to_linear(b) for b in range(256)]
_ALAW_TABLE = [_alaw_to_linear(b) for b in range(256)]

# WAVE format tags this codec decodes
_PCM, _ALAW, _ULAW = 1, 6, 7
_NAMES = {_PCM: "pcm", _ALAW: "alaw", _ULAW: "ulaw"}


def _parse_container(data: bytes) -> tuple[dict, bytes]:
    """RIFF chunk walk: return (validated fmt dict + frame_size, data body)."""
    if not is_wav(data):
        raise ValueError("not a WAV: bad RIFF signature")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_size)
    pos = 12
    fmt = None
    body = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = pos + 8
        if payload + size > end:
            raise ValueError(f"truncated WAV: chunk {cid!r} ran past the end")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("corrupt WAV: fmt chunk too small")
            tag, channels, rate, _bps, block_align, bits = struct.unpack(
                "<HHIIHH", data[payload : payload + 16]
            )
            fmt = {
                "tag": tag,
                "channels": channels,
                "rate": rate,
                "block_align": block_align,
                "bits": bits,
            }
        elif cid == b"data":
            if fmt is None:
                raise ValueError("corrupt WAV: data chunk before fmt chunk")
            body = data[payload : payload + size]
        pos = payload + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("corrupt WAV: no fmt chunk")
    if body is None:
        raise ValueError("corrupt WAV: no data chunk")
    tag = fmt["tag"]
    if tag not in _NAMES:
        raise NotImplementedError(
            f"WAVE format tag {tag}: only PCM (1), A-law (6), µ-law (7)"
        )
    channels = fmt["channels"]
    if channels < 1:
        raise ValueError("corrupt WAV: zero channels")
    if tag in (_ALAW, _ULAW):
        sample_bytes = 1
        if fmt["bits"] not in (0, 8):
            raise ValueError(f"corrupt WAV: G.711 with {fmt['bits']} bits")
    else:
        if fmt["bits"] not in (8, 16, 24, 32):
            raise NotImplementedError(f"{fmt['bits']}-bit PCM")
        sample_bytes = fmt["bits"] // 8
    frame_size = sample_bytes * channels
    if len(body) % frame_size:
        raise ValueError("corrupt WAV: data size is not a whole frame count")
    fmt["sample_bytes"] = sample_bytes
    fmt["frame_size"] = frame_size
    return fmt, body


def _expand(body: bytes, tag: int, sample_bytes: int) -> list[int]:
    """Expand raw sample bytes to 16-bit-linear ints (any whole number of
    samples — a frame-aligned slice of the data chunk decodes alone)."""
    if tag == _ULAW:
        samples = [_ULAW_TABLE[b] for b in body]
    elif tag == _ALAW:
        samples = [_ALAW_TABLE[b] for b in body]
    elif sample_bytes == 1:  # unsigned 8-bit PCM, rescale to 16-bit
        samples = [(b - 128) << 8 for b in body]
    elif sample_bytes == 2:
        samples = list(
            struct.unpack(f"<{len(body) // 2}h", body)
        )
    else:  # 24/32-bit PCM, rescale down to 16-bit linear
        shift = (sample_bytes - 2) * 8
        samples = [
            int.from_bytes(
                body[i : i + sample_bytes], "little", signed=True
            ) >> shift
            for i in range(0, len(body), sample_bytes)
        ]
    return samples


def decode_wav(data: bytes) -> dict:
    """Decode a RIFF-WAVE payload to ``{format, channels, sample_rate,
    bits, n_frames, samples}`` where ``samples`` is the interleaved
    16-bit-linear sample list (PCM widths other than 16 are rescaled)."""
    fmt, body = _parse_container(data)
    n_frames = len(body) // fmt["frame_size"]
    if n_frames * fmt["channels"] * 2 > _MAX_DECODED_BYTES:
        raise ValueError("refusing WAV: decoded size exceeds the ceiling")
    return {
        "format": _NAMES[fmt["tag"]],
        "channels": fmt["channels"],
        "sample_rate": fmt["rate"],
        "bits": fmt["bits"],
        "n_frames": n_frames,
        "samples": _expand(body, fmt["tag"], fmt["sample_bytes"]),
    }


def wav_segment(data: bytes, start: int, n: int) -> dict:
    """Decode ONLY frames ``[start, start + n)``: uncompressed (and G.711)
    WAV is random-access, so the segment is a byte slice of the data chunk
    — the rest of the file is never expanded. This is the audio analog of
    ``avi_frame``: locate, slice, decode just the piece.

    Returns the ``decode_wav`` dict shape with ``samples`` the interleaved
    segment and ``n_frames`` the frames actually available in the range
    (short at EOF)."""
    if start < 0 or n < 0:
        raise ValueError("wav_segment: negative start or length")
    fmt, body = _parse_container(data)
    fs = fmt["frame_size"]
    total = len(body) // fs
    lo, hi = min(start, total), min(start + n, total)
    seg = body[lo * fs : hi * fs]
    if len(seg) * 2 > _MAX_DECODED_BYTES:
        raise ValueError("refusing WAV: decoded size exceeds the ceiling")
    return {
        "format": _NAMES[fmt["tag"]],
        "channels": fmt["channels"],
        "sample_rate": fmt["rate"],
        "bits": fmt["bits"],
        "n_frames": hi - lo,
        "samples": _expand(seg, fmt["tag"], fmt["sample_bytes"]),
    }


def encode_wav_g711(
    samples: list[int], law: str = "ulaw", channels: int = 1, rate: int = 8000
) -> bytes:
    """Wrap already-companded G.711 bytes-as-ints in a RIFF-WAVE container
    (format tag 6/7). Tests only — the compress direction is the caller's
    (or use ``linear_to_ulaw``/``linear_to_alaw`` below)."""
    tag = _ULAW if law == "ulaw" else _ALAW
    body = bytes(s & 0xFF for s in samples)
    fmt = struct.pack("<HHIIHH", tag, channels, rate, rate * channels, channels, 8)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def linear_to_ulaw(x: int) -> int:
    """16-bit linear -> µ-law byte (tests only): nearest decoded value in
    the expansion table, so ``linear_to_ulaw(table[b]) == b`` for every
    byte and the round-trip error is bounded by half the local segment
    step BY CONSTRUCTION (the decode table is the audioop-verified one)."""
    return min(range(256), key=lambda b: (abs(_ULAW_TABLE[b] - x), b))


def linear_to_alaw(x: int) -> int:
    """16-bit linear -> A-law byte (tests only): nearest-in-table, same
    contract as ``linear_to_ulaw``."""
    return min(range(256), key=lambda b: (abs(_ALAW_TABLE[b] - x), b))

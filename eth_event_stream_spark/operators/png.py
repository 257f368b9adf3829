"""Minimal pure-stdlib PNG codec (zlib inflate + per-scanline unfilter).

Closes the multimodal codec stub for images WITHOUT new dependencies: this
container ships no Pillow, but PNG's baseline is decodable with nothing but
``zlib`` and ``struct``. Supported: 8-bit depth, color types 0 (gray),
2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), all five scanline filters
(None/Sub/Up/Average/Paeth), multi-IDAT streams, CRC-verified chunks.
Fail-fast on everything else (interlace, 16-bit) — the reference's
loud-failure discipline, never a silently wrong decode.

The encoder exists so tests can synthesize REAL image payloads in-container
and round-trip them through the Arrow-batched feature extraction; it is not
a production write path.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (before palette expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Hard ceiling on decoded scanline bytes per image (256 MiB ~= a 9k x 9k
# RGBA frame). Guards the executor against decompression-bomb IDAT payloads
# and absurd declared IHDR dimensions — untrusted bytes reach decode_png
# straight from binary columns.
_MAX_DECODED_BYTES = 256 * 1024 * 1024


def is_png(data: bytes) -> bool:
    return data[: len(_SIGNATURE)] == _SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunks(data: bytes):
    if not is_png(data):
        raise ValueError("not a PNG: bad signature")
    pos = len(_SIGNATURE)
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG: chunk header cut short")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated PNG: {ctype!r} body cut short")
        if pos + 12 + length > len(data):
            raise ValueError(f"truncated PNG: {ctype!r} CRC cut short")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"corrupt PNG: CRC mismatch in {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("truncated PNG: no IEND")


def decode_png(data: bytes) -> dict:
    """Decode a baseline PNG to
    ``{width, height, color_type, channels, pixels}`` where ``pixels`` is a
    list of ``height`` rows, each a ``bytes`` of ``width * channels``
    samples (palette rows are expanded to RGB)."""
    width = height = None
    color_type = bit_depth = None
    palette: bytes | None = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise NotImplementedError(f"bit depth {bit_depth} (only 8)")
            if color_type not in _CHANNELS:
                raise ValueError(f"unknown color type {color_type}")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlace")
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("corrupt PNG: no IHDR")
    ch = _CHANNELS[color_type]
    stride = width * ch
    expected = (stride + 1) * height
    # Untrusted bytes flow here from mapInPandas executors: bound the
    # inflate by the IHDR-derived size BEFORE allocating, so a
    # decompression-bomb IDAT (or huge declared dimensions) cannot exhaust
    # executor memory ahead of the size check.
    if expected > _MAX_DECODED_BYTES:
        raise ValueError(
            f"refusing PNG: declared {width}x{height}x{ch} exceeds "
            f"{_MAX_DECODED_BYTES} decoded bytes"
        )
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    if len(raw) != expected or not d.eof:
        raise ValueError("corrupt PNG: decompressed size mismatch")
    rows: list[bytes] = []
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"corrupt PNG: unknown filter {ftype}")
        prev = line
        rows.append(bytes(line))
    if color_type == 3:
        if palette is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        rows = [
            bytes(
                palette[3 * px + k] for px in row for k in range(3)
            )
            for row in rows
        ]
        ch = 3
    return {
        "width": width,
        "height": height,
        "color_type": color_type,
        "channels": ch,
        "pixels": rows,
    }


def encode_png(
    width: int,
    height: int,
    rows: list[bytes],
    color_type: int = 2,
    filter_type: int = 0,
) -> bytes:
    """Baseline PNG writer (8-bit, no interlace) for synthesizing REAL
    image payloads in tests; ``filter_type`` applies one filter to every
    scanline so the decoder's unfilter paths are each exercisable."""
    ch = _CHANNELS[color_type]
    if color_type == 3:
        raise NotImplementedError("palette encoding not needed by tests")
    stride = width * ch
    if len(rows) != height or any(len(r) != stride for r in rows):
        raise ValueError("rows do not match width*channels x height")
    raw = bytearray()
    prev = bytearray(stride)
    for row in rows:
        line = bytearray(row)
        enc = bytearray(stride)
        if filter_type == 0:
            enc = line
        elif filter_type == 1:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                enc[i] = (line[i] - a) & 0xFF
        elif filter_type == 2:
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif filter_type == 3:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                enc[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif filter_type == 4:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                enc[i] = (line[i] - _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"unknown filter {filter_type}")
        raw.append(filter_type)
        raw.extend(enc)
        prev = line

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )

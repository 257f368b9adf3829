"""Minimal pure-stdlib GIF codec (LZW decode, 87a/89a, animation-aware).

Closes the GIF stub of the multimodal lane with nothing but ``struct`` and
bit twiddling — all public knowledge (the GIF89a specification; LZW with
variable code width, LSB-first packing, 4096-entry dictionary cap).
Supported: GIF87a + GIF89a, global/local color tables, interlaced images,
extension blocks (graphic control, comment, application) skipped cleanly,
multi-frame animations (every frame's LZW stream is fully decoded and
validated; ``n_frames`` counts them). Fail-fast on corrupt LZW streams,
truncated files, and missing color tables — the loud-failure discipline of
``operators/png.py``.

Compositing policy: ``decode_gif`` returns the FIRST frame composited onto
the logical screen (background-filled), plus ``n_frames``. Full animation
compositing (disposal methods, per-frame deltas) is out of scope for
feature extraction — the lane needs real dimensions, frame counts, and
proof the pixel data decodes; later frames are decoded and validated but
not composited.

The encoder exists so tests can synthesize REAL GIF payloads in-container
(the PNG/JPEG pattern): it emits a CLEAR code before every pixel code so
the LZW table never grows — maximally naive, byte-for-byte valid.

Reference parity note: the reference repo (Rust, ~1.6k lines) has no
media layer at all; this file extends the engine's multimodal lane
(SURVEY.md §2 training-data surface) from public format specifications
only, like operators/png.py and operators/jpeg.py before it.
"""

from __future__ import annotations

import struct

_MAX_DECODED_BYTES = 256 * 1024 * 1024  # same ceiling as the PNG/JPEG codecs


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


class _LzwReader:
    """LSB-first variable-width code reader over GIF data sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int:
        while self.n < width:
            if self.pos >= len(self.data):
                raise ValueError("corrupt GIF: LZW stream ran out of bits")
            self.acc |= self.data[self.pos] << self.n
            self.n += 8
            self.pos += 1
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return v


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """Decode a GIF LZW stream to exactly ``expected`` pixel indexes."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"corrupt GIF: LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    r = _LzwReader(data)
    out = bytearray()

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            min_code_size + 1,
            end + 1,
        )

    table, width, nxt = reset()
    prev: bytes | None = None
    while len(out) < expected:
        code = r.read(width)
        if code == clear:
            table, width, nxt = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code not in table:
                raise ValueError("corrupt GIF: first LZW code not a root")
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == nxt:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF: LZW code {code} out of range")
        out += entry
        if prev is not None and nxt < 4096:
            table[nxt] = prev + entry[:1]
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError(
            f"corrupt GIF: LZW produced {len(out)} of {expected} pixels"
        )
    return bytes(out[:expected])


def _lzw_encode_naive(indexes: bytes, min_code_size: int) -> bytes:
    """Test-side encoder: CLEAR before every pixel so the table never
    grows — every code is ``min_code_size + 1`` bits, trivially valid."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    acc = 0
    n = 0
    out = bytearray()

    def push(code):
        nonlocal acc, n
        acc |= code << n
        n += width
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    push(clear)
    for px in indexes:
        push(px)
        push(clear)
    push(end)
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; returns (bytes,
    position after the 0x00 terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF: unterminated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(data):
            raise ValueError("truncated GIF: sub-block ran past the end")
        chunks.append(data[pos : pos + n])
        pos += n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(indexes: bytes, w: int, h: int) -> bytes:
    rows = [indexes[i * w : (i + 1) * w] for i in range(h)]
    out: list[bytes | None] = [None] * h
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return b"".join(out)  # type: ignore[arg-type]


def decode_gif(data: bytes) -> dict:
    """Decode a GIF to ``{width, height, channels, pixels, n_frames}``:
    logical-screen dimensions, the FIRST frame composited onto a
    background-filled RGB canvas, and the validated frame count (every
    frame's LZW stream is decoded in full)."""
    if not is_gif(data):
        raise ValueError("not a GIF: bad signature")
    if len(data) < 13:
        raise ValueError("truncated GIF: no logical screen descriptor")
    width, height, flags, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    if width == 0 or height == 0:
        raise ValueError("corrupt GIF: zero dimension")
    if width * height * 3 > _MAX_DECODED_BYTES:
        raise ValueError(
            f"refusing GIF: declared {width}x{height} exceeds "
            f"{_MAX_DECODED_BYTES} decoded bytes"
        )
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = data[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("truncated GIF: global color table")
        pos += 3 * n

    canvas: bytearray | None = None
    n_frames = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF: no trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(data):
                raise ValueError("truncated GIF: bare extension introducer")
            pos += 1  # label
            _, pos = _sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF: image descriptor")
        left, top, iw, ih, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if iw == 0 or ih == 0 or left + iw > width or top + ih > height:
            raise ValueError("corrupt GIF: image outside the logical screen")
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            lct = data[pos : pos + 3 * n]
            if len(lct) != 3 * n:
                raise ValueError("truncated GIF: local color table")
            pos += 3 * n
        if lct is None:
            raise ValueError("corrupt GIF: image with no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF: missing LZW min code size")
        min_code = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        indexes = _lzw_decode(lzw, min_code, iw * ih)
        if iflags & 0x40:
            indexes = _deinterlace(indexes, iw, ih)
        n_frames += 1
        if canvas is None:
            # composite frame 1 onto a background-filled canvas. Per GIF89a
            # §18 the background color index refers to the GLOBAL color
            # table; a frame-local table only maps the frame's own pixel
            # indexes. No global table (or index out of its range) -> black.
            n_colors = len(lct) // 3
            bg_rgb = (
                gct[3 * bg : 3 * bg + 3]
                if gct is not None and bg < len(gct) // 3
                else b"\x00\x00\x00"
            )
            canvas = bytearray(bg_rgb * (width * height))
            for y in range(ih):
                row = indexes[y * iw : (y + 1) * iw]
                off = ((top + y) * width + left) * 3
                for x, idx in enumerate(row):
                    if idx >= n_colors:
                        raise ValueError("corrupt GIF: pixel index out of palette")
                    canvas[off + 3 * x : off + 3 * x + 3] = lct[3 * idx : 3 * idx + 3]
    if canvas is None:
        raise ValueError("corrupt GIF: no image data")
    pixels = [
        bytes(canvas[y * width * 3 : (y + 1) * width * 3]) for y in range(height)
    ]
    return {
        "width": width,
        "height": height,
        "channels": 3,
        "pixels": pixels,
        "n_frames": n_frames,
    }


def encode_gif(
    width: int,
    height: int,
    frames: list[bytes],
    palette: bytes,
    interlace: bool = False,
) -> bytes:
    """Encode palette-indexed frames (each ``width * height`` index bytes)
    as a GIF89a with a global color table. Tests only."""
    n_colors = len(palette) // 3
    if n_colors < 2 or n_colors > 256 or len(palette) % 3:
        raise ValueError("palette must be 2..256 RGB triples")
    depth = max(1, (n_colors - 1).bit_length())
    table_size = 1 << depth
    gct = palette + b"\x00" * (3 * (table_size - n_colors))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += gct
    min_code = max(2, depth)
    for frame in frames:
        if len(frame) != width * height:
            raise ValueError("frame size mismatch")
        if interlace:
            order = [
                y for start, step in _INTERLACE_PASSES for y in range(start, height, step)
            ]
            frame = b"".join(
                frame[y * width : (y + 1) * width] for y in order
            )
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0x40 if interlace else 0)
        out.append(min_code)
        lzw = _lzw_encode_naive(frame, min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # sub-block terminator
    out += b"\x3b"
    return bytes(out)

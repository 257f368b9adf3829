"""Minimal pure-stdlib WebP-LOSSLESS (VP8L) codec.

Closes the WebP entry in the multimodal codec lane WITHOUT new
dependencies: lossless WebP is canonical-prefix-code entropy coding +
LZ77 + a color cache + four reversible pixel transforms — no DCT, no
patent-era DSP — all decodable from the public WebP Lossless Bitstream
Specification (RFC 9649) with nothing but integer arithmetic, exactly
like ``operators/png.py`` (zlib/filters) and ``operators/gif.py`` (LZW)
before it. Supported: the full VP8L decode path — simple and normal
prefix codes (incl. the code-length code, 16/17/18 repeats, and the
``max_symbol`` shortcut), color cache, LZ77 with both 2D plane-code and
linear distances, meta prefix-code groups (entropy image), and all four
transforms (predictor incl. all 14 modes, cross-color, subtract-green,
color-indexing incl. sub-8-bit pixel bundling) — plus ANIMATED lossless
WebP (VP8X + ANIM/ANMF with all-VP8L frames: first frame composited
onto the canvas, every later frame's stream decoded and validated, so
``n_frames`` is a real count — the GIF contract). LOSSY WebP (VP8),
still or as any animation frame, raises ``NotImplementedError`` loudly
— the reference's fail-fast discipline, never a silently wrong decode.

The encoder exists so tests can synthesize REAL lossless payloads
in-container and round-trip every transform and entropy feature through
the decoder; it is not a production write path (literal-heavy, optional
run-length LZ77 only).

Reference parity note: the reference repo (Rust, ~1.6k lines) has no
media layer; this file extends the engine's multimodal lane (SURVEY.md
§2 training-data surface) from the public format specification only.
"""

from __future__ import annotations

import struct

_MAX_DECODED_BYTES = 256 * 1024 * 1024  # same ceiling as the other codecs

# code-length-code symbol order (RFC 9649 §5.2.2, same idea as DEFLATE)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 2D distance map for LZ77 plane codes 1..120 (RFC 9649 §4.2.2): (dx, dy)
# offsets ordered by proximity; dist = dy * xsize + dx (min 1).
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]
assert len(_DIST_MAP) == 120


def is_webp(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WEBP"


class _Bits:
    """LSB-first bit reader (VP8L bit order, unlike JPEG/FLAC's MSB-first)."""

    __slots__ = ("data", "byte", "bit")

    def __init__(self, data: bytes, byte: int = 0):
        self.data = data
        self.byte = byte
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("truncated WebP: bitstream ran out")
            v |= ((self.data[self.byte] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v


class _Prefix:
    """Canonical prefix code (DEFLATE-style numbering, MSB-first code
    walk over LSB-first stream bits). A single-symbol code reads 0 bits."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("corrupt WebP: empty prefix code")
        if len(nz) == 1:
            self.table = None
            self.single = nz[0][0]
            return
        self.single = None
        max_len = max(l for _, l in nz)
        bl_count = [0] * (max_len + 1)
        for _, l in nz:
            bl_count[l] += 1
        # complete-code check (Kraft equality): an over- or under-subscribed
        # code cannot decode every bit pattern
        kraft = sum(c << (max_len - l) for l, c in enumerate(bl_count) if l)
        if kraft != (1 << max_len):
            raise ValueError("corrupt WebP: prefix code is not complete")
        code = 0
        next_code = [0] * (max_len + 1)
        for l in range(1, max_len + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        self.table = {}
        for s, l in nz:
            self.table[(l, next_code[l])] = s
            next_code[l] += 1

    def decode(self, r: _Bits) -> int:
        if self.table is None:
            return self.single
        code = 0
        for l in range(1, 16):
            code = (code << 1) | r.read(1)
            s = self.table.get((l, code))
            if s is not None:
                return s
        raise ValueError("corrupt WebP: prefix code walked past 15 bits")


def _read_prefix_code(r: _Bits, alphabet_size: int) -> _Prefix:
    """RFC 9649 §5.2.1-5.2.2: simple (1-2 symbol) or normal code."""
    if r.read(1):  # simple
        lengths = [0] * alphabet_size
        num_symbols = r.read(1) + 1
        first_8bit = r.read(1)
        s0 = r.read(8 if first_8bit else 1)
        if s0 >= alphabet_size:
            raise ValueError("corrupt WebP: simple-code symbol out of range")
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = r.read(8)
            if s1 >= alphabet_size or s1 == s0:
                raise ValueError("corrupt WebP: simple-code symbol invalid")
            lengths[s1] = 1
        return _Prefix(lengths)
    num_cl = 4 + r.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = r.read(3)
    cl_code = _Prefix(cl_lengths)
    if r.read(1):  # use max_symbol shortcut
        length_nbits = 2 + 2 * r.read(3)
        max_symbol = 2 + r.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(r)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep = 3 + r.read(2)
            for _ in range(rep):
                if symbol >= alphabet_size:
                    raise ValueError("corrupt WebP: code-length repeat overrun")
                lengths[symbol] = prev_len
                symbol += 1
        else:
            rep = (3 + r.read(3)) if cl == 17 else (11 + r.read(7))
            if symbol + rep > alphabet_size:
                raise ValueError("corrupt WebP: zero-run overrun")
            symbol += rep
    return _Prefix(lengths)


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _lz77_value(prefix: int, r: _Bits) -> int:
    """Length/distance prefix decoding (RFC 9649 §4.2.2)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + r.read(extra) + 1


def _plane_to_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * xsize + dx)


def _decode_entropy_image(r: _Bits, xsize: int, ysize: int, level0: bool):
    """Decode one entropy-coded ARGB image (RFC 9649 §5.2.3). Returns
    (pixels, transforms) — transforms only read (and only legal) at the
    top level; sub-images (transform data, palette, entropy image) recurse
    here with level0=False."""
    if xsize * ysize * 4 > _MAX_DECODED_BYTES:
        raise ValueError("refusing WebP: declared size exceeds the ceiling")
    transforms = []
    seen_types = set()
    while level0 and r.read(1):
        ttype = r.read(2)
        if ttype in seen_types:
            raise ValueError("corrupt WebP: repeated transform type")
        seen_types.add(ttype)
        if ttype == 0 or ttype == 1:  # predictor / cross-color
            bits = r.read(3) + 2
            tw, th = _subsample(xsize, bits), _subsample(ysize, bits)
            sub, _ = _decode_entropy_image(r, tw, th, False)
            transforms.append((ttype, bits, tw, sub))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, None, None))
        else:  # color indexing
            n_colors = r.read(8) + 1
            pal, _ = _decode_entropy_image(r, n_colors, 1, False)
            # palette entries are component-wise delta-coded
            for i in range(1, n_colors):
                a = (pal[i] >> 24) + (pal[i - 1] >> 24)
                red = ((pal[i] >> 16) & 0xFF) + ((pal[i - 1] >> 16) & 0xFF)
                g = ((pal[i] >> 8) & 0xFF) + ((pal[i - 1] >> 8) & 0xFF)
                b = (pal[i] & 0xFF) + (pal[i - 1] & 0xFF)
                pal[i] = (
                    ((a & 0xFF) << 24) | ((red & 0xFF) << 16)
                    | ((g & 0xFF) << 8) | (b & 0xFF)
                )
            if n_colors <= 2:
                wbits = 3
            elif n_colors <= 4:
                wbits = 2
            elif n_colors <= 16:
                wbits = 1
            else:
                wbits = 0
            transforms.append((3, wbits, n_colors, pal))
            # every later read (incl. the spatial image) sees packed width
            xsize = _subsample(xsize, wbits)

    cache_bits = 0
    if r.read(1):
        cache_bits = r.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"corrupt WebP: color cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    entropy_bits = 0
    entropy_img = None
    entropy_w = 0
    n_groups = 1
    if level0 and r.read(1):  # meta prefix codes
        entropy_bits = r.read(3) + 2
        entropy_w = _subsample(xsize, entropy_bits)
        eh = _subsample(ysize, entropy_bits)
        entropy_img, _ = _decode_entropy_image(r, entropy_w, eh, False)
        n_groups = max(((p >> 8) & 0xFFFF) for p in entropy_img) + 1

    alphabets = [256 + 24 + cache_size, 256, 256, 256, 40]
    groups = [
        [_read_prefix_code(r, a) for a in alphabets] for _ in range(n_groups)
    ]

    n = xsize * ysize
    pix = [0] * n
    pos = 0
    while pos < n:
        if entropy_img is not None:
            x, y = pos % xsize, pos // xsize
            m = entropy_img[
                (y >> entropy_bits) * entropy_w + (x >> entropy_bits)
            ]
            g = groups[(m >> 8) & 0xFFFF]
        else:
            g = groups[0]
        s = g[0].decode(r)
        if s < 256:  # literal: green already in s
            red = g[1].decode(r)
            blue = g[2].decode(r)
            alpha = g[3].decode(r)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            pix[pos] = argb
            pos += 1
        elif s < 256 + 24:  # LZ77 back-reference
            length = _lz77_value(s - 256, r)
            dist_prefix = g[4].decode(r)
            dist = _plane_to_distance(_lz77_value(dist_prefix, r), xsize)
            if dist > pos:
                raise ValueError("corrupt WebP: LZ77 distance before start")
            if pos + length > n:
                raise ValueError("corrupt WebP: LZ77 copy past the end")
            for _ in range(length):
                argb = pix[pos - dist]
                pix[pos] = argb
                pos += 1
                if cache_bits:
                    cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
            continue
        else:  # color cache reference
            idx = s - 256 - 24
            if idx >= cache_size:
                raise ValueError("corrupt WebP: cache index out of range")
            pix[pos] = cache[idx]
            pos += 1
            continue
        if cache_bits:
            cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
    return pix, transforms


def _trunc_half(v: int) -> int:
    """C-style (v / 2) truncation toward zero (predictor mode 13)."""
    return v // 2 if v >= 0 else -((-v) // 2)


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) // 2) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) // 2) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) // 2) << 8
        | ((a & 0xFF) + (b & 0xFF)) // 2
    )


def _channels(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _select(left: int, top: int, tl: int) -> int:
    la, lr, lg, lb = _channels(left)
    ta, tr, tg, tb = _channels(top)
    ca, cr, cg, cb = _channels(tl)
    pa, pr, pg, pb = la + ta - ca, lr + tr - cr, lg + tg - cg, lb + tb - cb
    p_left = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
    p_top = abs(pa - ta) + abs(pr - tr) + abs(pg - tg) + abs(pb - tb)
    return left if p_left < p_top else top


def _clamp_add_sub_full(left: int, top: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(left: int, top: int, tl: int) -> int:
    ave = _avg2(left, top)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        out |= max(0, min(255, a + _trunc_half(a - b))) << sh
    return out


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:
        return _select(left, top, tl)
    if mode == 12:
        return _clamp_add_sub_full(left, top, tl)
    if mode == 13:
        return _clamp_add_sub_half(left, top, tl)
    raise ValueError(f"corrupt WebP: predictor mode {mode}")


def _add_pixels(residual: int, pred: int) -> int:
    return (
        ((((residual >> 24) + (pred >> 24)) & 0xFF) << 24)
        | ((((residual >> 16) + (pred >> 16)) & 0xFF) << 16)
        | ((((residual >> 8) + (pred >> 8)) & 0xFF) << 8)
        | (((residual & 0xFF) + (pred & 0xFF)) & 0xFF)
    )


def _inv_predictor(pix: list[int], w: int, h: int, bits: int, tw: int, sub):
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]  # top row: L regardless of mode
            elif x == 0:
                pred = pix[i - w]  # left column: T regardless of mode
            else:
                mode = (sub[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
                left, top, tl = pix[i - 1], pix[i - w], pix[i - w - 1]
                # top-right of the last column is the current row's first
                # pixel (the spec's contiguous-buffer rule)
                tr = pix[i - w + 1] if x + 1 < w else pix[y * w]
                pred = _predict(mode, left, top, tl, tr)
            pix[i] = _add_pixels(pix[i], pred)


def _ct_delta(t: int, c: int) -> int:
    """(int8)t * (int8)c >> 5 with arithmetic shift (RFC 9649 §4.2.1.2)."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(pix: list[int], w: int, h: int, bits: int, tw: int, sub):
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = sub[(y >> bits) * tw + (x >> bits)]
            g2r, g2b, r2b = (cte >> 16) & 0xFF, (cte >> 8) & 0xFF, cte & 0xFF
            # NOTE channel mapping: red byte = red_to_blue, green byte =
            # green_to_blue, blue byte = green_to_red (RFC 9649 §4.2.1.2)
            red_to_blue, green_to_blue, green_to_red = g2r, g2b, r2b
            p = pix[i]
            green = (p >> 8) & 0xFF
            red = ((p >> 16) & 0xFF) + _ct_delta(green_to_red, green)
            blue = (p & 0xFF) + _ct_delta(green_to_blue, green)
            blue += _ct_delta(red_to_blue, red & 0xFF)
            pix[i] = (p & 0xFF00FF00) | ((red & 0xFF) << 16) | (blue & 0xFF)


def _inv_subtract_green(pix: list[int]):
    for i, p in enumerate(pix):
        g = (p >> 8) & 0xFF
        red = (((p >> 16) & 0xFF) + g) & 0xFF
        blue = ((p & 0xFF) + g) & 0xFF
        pix[i] = (p & 0xFF00FF00) | (red << 16) | blue


def _inv_color_index(pix: list[int], w: int, h: int, wbits: int, n_colors: int, pal):
    packed_w = _subsample(w, wbits)
    out = [0] * (w * h)
    per = 1 << wbits
    bpp = 8 >> wbits
    mask = (1 << bpp) - 1
    for y in range(h):
        for px in range(packed_w):
            g = (pix[y * packed_w + px] >> 8) & 0xFF
            for k in range(per):
                x = px * per + k
                if x >= w:
                    break
                idx = (g >> (k * bpp)) & mask
                out[y * w + x] = pal[idx] if idx < n_colors else 0
    return out


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield (chunk_id, body) over a word-aligned RIFF chunk range."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size or pos + 8 + size > end:
            raise ValueError(f"truncated WebP: chunk {cid!r} cut short")
        yield cid, body
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def _decode_vp8l(payload: bytes) -> dict:
    """Decode one VP8L stream (the payload of a VP8L chunk) to
    ``{width, height, has_alpha, pix}`` with ``pix`` a flat ARGB list."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("corrupt WebP: bad VP8L signature byte")
    r = _Bits(payload, 1)
    w = r.read(14) + 1
    h = r.read(14) + 1
    has_alpha = bool(r.read(1))
    version = r.read(3)
    if version != 0:
        raise ValueError(f"corrupt WebP: VP8L version {version}")
    if w * h * 4 > _MAX_DECODED_BYTES:
        raise ValueError(
            f"refusing WebP: declared {w}x{h} exceeds {_MAX_DECODED_BYTES} "
            "decoded bytes"
        )
    pix, transforms = _decode_entropy_image(r, w, h, True)
    # inverse transforms run in REVERSE order of their appearance
    for ttype, bits, aux, sub in reversed(transforms):
        if ttype == 0:
            _inv_predictor(pix, _cur_w(transforms, ttype, w), h, bits, aux, sub)
        elif ttype == 1:
            _inv_color_transform(pix, _cur_w(transforms, ttype, w), h, bits, aux, sub)
        elif ttype == 2:
            _inv_subtract_green(pix)
        else:
            pix = _inv_color_index(pix, w, h, bits, aux, sub)
    if len(pix) != w * h:
        raise ValueError("corrupt WebP: decoded pixel count mismatch")
    return {"width": w, "height": h, "has_alpha": has_alpha, "pix": pix}


def _anmf_vp8l(body: bytes) -> tuple[int, int, int, int, bytes]:
    """Parse an ANMF frame: (x, y, w, h, VP8L payload). Lossy frames and
    separate ALPH chunks (lossy-only per spec) refuse loudly."""
    if len(body) < 16:
        raise ValueError("truncated WebP: ANMF header cut short")

    def u24(at: int) -> int:
        return body[at] | (body[at + 1] << 8) | (body[at + 2] << 16)

    fx, fy = u24(0) * 2, u24(3) * 2
    fw, fh = u24(6) + 1, u24(9) + 1
    for cid, sub in _riff_chunks(body, 16, len(body)):
        if cid == b"VP8L":
            return fx, fy, fw, fh, sub
        if cid in (b"VP8 ", b"ALPH"):
            raise NotImplementedError(
                "animated WebP with lossy (VP8) frames requires a DCT codec "
                "library; only all-VP8L animations decode in-repo"
            )
    raise ValueError("corrupt WebP: ANMF frame without image data")


def decode_webp(data: bytes) -> dict:
    """Decode a lossless WebP to ``{width, height, channels, pixels,
    has_alpha, n_frames}`` with ``pixels`` a list of ``height`` RGBA rows
    — the house decode shape (cf. ``decode_png`` / ``decode_gif``).

    Stills: the plain VP8L stream (a VP8X wrapper is walked through).
    Animations (VP8X + ANIM/ANMF) decode when every frame is VP8L: the
    FIRST frame is composited at its offset onto a transparent canvas and
    every later frame's stream is fully decoded and validated, so
    ``n_frames`` is a real count (the GIF contract). Lossy VP8 — still or
    any frame — refuses loudly."""
    if not is_webp(data):
        raise ValueError("not a WebP: bad RIFF signature")
    canvas = None  # (w, h) from VP8X
    frames = []
    for cid, body in _riff_chunks(data, 12, len(data)):
        if cid == b"VP8X":
            if len(body) < 10:
                raise ValueError("truncated WebP: VP8X cut short")
            cw = 1 + (body[4] | (body[5] << 8) | (body[6] << 16))
            ch = 1 + (body[7] | (body[8] << 8) | (body[9] << 16))
            canvas = (cw, ch)
        elif cid == b"VP8L":
            d = _decode_vp8l(body)
            return _to_rows(d["pix"], d["width"], d["height"], d["has_alpha"], None)
        elif cid == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) requires a DCT codec library; only "
                "lossless (VP8L) decodes in-repo"
            )
        elif cid == b"ANMF":
            frames.append(_anmf_vp8l(body))
    if not frames:
        raise ValueError("corrupt WebP: no VP8L chunk")
    if canvas is None:
        raise ValueError("corrupt WebP: animation without a VP8X header")
    cw, ch = canvas
    if cw * ch * 4 > _MAX_DECODED_BYTES:
        raise ValueError("refusing WebP: canvas exceeds the decode ceiling")
    # composite frame 1 onto a transparent canvas; decode (and thereby
    # validate) every later frame so n_frames is a real count
    pix = [0] * (cw * ch)
    has_alpha = False
    for i, (fx, fy, fw, fh, payload) in enumerate(frames):
        d = _decode_vp8l(payload)
        if (d["width"], d["height"]) != (fw, fh):
            raise ValueError("corrupt WebP: ANMF dims disagree with VP8L")
        if fx + fw > cw or fy + fh > ch:
            raise ValueError("corrupt WebP: frame outside the canvas")
        has_alpha = has_alpha or d["has_alpha"]
        if i == 0:
            for y in range(fh):
                base = (fy + y) * cw + fx
                row = d["pix"][y * fw : (y + 1) * fw]
                pix[base : base + fw] = row
    return _to_rows(pix, cw, ch, has_alpha, len(frames))


def _to_rows(pix: list[int], w: int, h: int, has_alpha: bool, n_frames):
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            p = pix[y * w + x]
            row += bytes(((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF, (p >> 24) & 0xFF))
        rows.append(bytes(row))
    return {
        "width": w,
        "height": h,
        "channels": 4,
        "pixels": rows,
        "has_alpha": has_alpha,
        "n_frames": n_frames,
    }


def _cur_w(transforms, upto_type, w: int) -> int:
    """Width seen by a transform: color-indexing (read before it in stream
    order would pack the width) — transforms reading AFTER a color-indexing
    transform operate on the packed width."""
    for ttype, bits, _aux, _sub in transforms:
        if ttype == upto_type:
            return w
        if ttype == 3:
            w = _subsample(w, bits)
    return w


# ---------------------------------------------------------------------------
# Encoder (tests only)
# ---------------------------------------------------------------------------


class _BitsW:
    """LSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, k: int) -> None:
        self.acc |= (v & ((1 << k) - 1)) << self.n
        self.n += k
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def bytes(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.out)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical DEFLATE numbering."""
    nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
    max_len = max(l for _, l in nz)
    bl_count = [0] * (max_len + 1)
    for _, l in nz:
        bl_count[l] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for s, l in nz:
        out[s] = (next_code[l], l)
        next_code[l] += 1
    return out


def _complete_lengths(symbols: list[int], alphabet_size: int) -> list[int]:
    """Assign code lengths forming a COMPLETE canonical code over the used
    symbols: with k symbols and L = ceil(log2 k), the first (2^L - k)
    symbols get length L-1 and the rest L (Kraft sum exactly 1)."""
    k = len(symbols)
    if k < 2:
        raise ValueError("use the simple-code path for <2 symbols")
    level = max(1, (k - 1).bit_length())
    n_short = (1 << level) - k
    lengths = [0] * alphabet_size
    for i, s in enumerate(sorted(symbols)):
        lengths[s] = level - 1 if i < n_short and level > 1 else level
    return lengths


def _write_code_msb(w: _BitsW, code: int, length: int) -> None:
    """Prefix codes are walked MSB-first by the decoder."""
    for i in range(length - 1, -1, -1):
        w.write((code >> i) & 1, 1)


def _write_prefix_code(
    w: _BitsW, lengths: list[int], use_max_symbol: bool = False
):
    """Emit a prefix code: simple form for <=2 symbols, else the full
    code-length-code path (every alphabet entry written literally — the
    encoder optimizes for coverage of the decode path, not size)."""
    used = [s for s, l in enumerate(lengths) if l > 0]
    # the simple form stores symbols in (at most) 8 bits — a stream whose
    # 1-2 used green symbols include an LZ77 length prefix (>= 256) or a
    # cache reference (>= 280) MUST take the normal code-length path
    if len(used) <= 2 and max(used) <= 255:
        w.write(1, 1)  # simple
        w.write(len(used) - 1, 1)
        s0 = used[0]
        if s0 > 1:
            w.write(1, 1)
            w.write(s0, 8)
        else:
            w.write(0, 1)
            w.write(s0, 1)
        if len(used) == 2:
            w.write(used[1], 8)
        return
    w.write(0, 1)  # normal
    # code-length code over the DISTINCT length values plus 0 (so it always
    # has >= 2 symbols and _complete_lengths applies)
    cl_used = sorted({l for l in lengths if l} | {0})
    cl_lengths = [0] * 19
    cl_l = _complete_lengths(cl_used, 19)
    for s, l in zip(cl_used, [cl_l[s] for s in cl_used]):
        cl_lengths[s] = l
    num_cl = max(_CL_ORDER.index(s) for s in cl_used) + 1
    w.write(num_cl - 4, 4)
    for i in range(num_cl):
        w.write(cl_lengths[_CL_ORDER[i]], 3)
    cl_codes = _canonical_codes(cl_lengths)
    if use_max_symbol:
        last_used = max(used)
        max_symbol = last_used + 1
        # max_symbol = 2 + ReadBits(length_nbits): pick the smallest field
        # that fits
        need = max_symbol - 2
        nbits = max(2, (need.bit_length() + 1) // 2 * 2)
        w.write(1, 1)
        w.write((nbits - 2) // 2, 3)
        w.write(need, nbits)
        upto = max_symbol
    else:
        w.write(0, 1)
        upto = len(lengths)
    for s in range(upto):
        code, length = cl_codes[lengths[s]]
        _write_code_msb(w, code, length)


def encode_webp_lossless(
    width: int,
    height: int,
    rows: list[bytes],
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
    run_length: bool = False,
    cache_bits: int = 0,
    use_max_symbol: bool = False,
    _payload_only: bool = False,
) -> bytes:
    """Encode RGBA rows (``height`` rows of ``width * 4`` bytes) as a
    lossless WebP. Tests only — literal-heavy with optional run-length
    LZ77 (alternating 2D plane-code and linear distances), exercising
    every decoder feature: each transform (forward-applied here so the
    decoder's inverse restores the input), the color cache, simple and
    normal prefix codes, and the max_symbol shortcut."""
    if len(rows) != height or any(len(r2) != width * 4 for r2 in rows):
        raise ValueError("rows must be height x (width*4) RGBA bytes")
    pix = []
    for r2 in rows:
        for x in range(width):
            red, g, b, a = r2[4 * x : 4 * x + 4]
            pix.append((a << 24) | (red << 16) | (g << 8) | b)

    w = _BitsW()
    w.write(0x2F, 8)
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(1 if any((p >> 24) != 0xFF for p in pix) else 0, 1)
    w.write(0, 3)  # version

    cur_w = width
    if palette:
        # build the palette and replace pixels with indexes in green
        colors = []
        index = {}
        for p in pix:
            if p not in index:
                index[p] = len(colors)
                colors.append(p)
        if len(colors) > 256:
            raise ValueError("palette encoding needs <= 256 distinct colors")
        n_colors = len(colors)
        w.write(1, 1)
        w.write(3, 2)
        w.write(n_colors - 1, 8)
        deltas = []
        prev = 0
        for c in colors:
            d = 0
            for sh in (24, 16, 8, 0):
                d |= (((c >> sh) - (prev >> sh)) & 0xFF) << sh
            deltas.append(d)
            prev = c
        _encode_sub_image(w, deltas)
        if n_colors <= 2:
            wbits = 3
        elif n_colors <= 4:
            wbits = 2
        elif n_colors <= 16:
            wbits = 1
        else:
            wbits = 0
        bpp = 8 >> wbits
        per = 1 << wbits
        packed_w = _subsample(width, wbits)
        packed = []
        for y in range(height):
            for px in range(packed_w):
                g = 0
                for k in range(per):
                    x = px * per + k
                    if x < width:
                        g |= index[pix[y * width + x]] << (k * bpp)
                packed.append(0xFF000000 | (g << 8))
        pix = packed
        cur_w = packed_w
    if color_transform is not None:
        # one global transform element block covering the whole image
        g2r, g2b, r2b = color_transform
        bits = 9  # block size 512 >= any test image
        w.write(1, 1)
        w.write(1, 2)
        w.write(bits - 2, 3)
        tw, th = _subsample(cur_w, bits), _subsample(height, bits)
        cte = 0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
        _encode_sub_image(w, [cte] * (tw * th))
        for i, p in enumerate(pix):
            green = (p >> 8) & 0xFF
            red = (p >> 16) & 0xFF
            blue = p & 0xFF
            # the inverse restores red BEFORE applying red_to_blue, so the
            # forward transform subtracts the delta of the ORIGINAL red
            new_red = (red - _ct_delta(g2r, green)) & 0xFF
            new_blue = (blue - _ct_delta(g2b, green) - _ct_delta(r2b, red)) & 0xFF
            pix[i] = (p & 0xFF00FF00) | (new_red << 16) | new_blue
    if subtract_green:
        w.write(1, 1)
        w.write(2, 2)
        for i, p in enumerate(pix):
            g = (p >> 8) & 0xFF
            red = (((p >> 16) & 0xFF) - g) & 0xFF
            blue = ((p & 0xFF) - g) & 0xFF
            pix[i] = (p & 0xFF00FF00) | (red << 16) | blue
    if predictor_mode is not None:
        bits = 2  # 4x4 blocks: a real sub-image grid
        w.write(1, 1)
        w.write(0, 2)
        w.write(bits - 2, 3)
        tw, th = _subsample(cur_w, bits), _subsample(height, bits)
        _encode_sub_image(w, [0xFF000000 | (predictor_mode << 8)] * (tw * th))
        res = list(pix)
        for y in range(height):
            for x in range(cur_w):
                i = y * cur_w + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = pix[i - 1]
                elif x == 0:
                    pred = pix[i - cur_w]
                else:
                    left, top, tl = pix[i - 1], pix[i - cur_w], pix[i - cur_w - 1]
                    tr = pix[i - cur_w + 1] if x + 1 < cur_w else pix[y * cur_w]
                    pred = _predict(predictor_mode, left, top, tl, tr)
                d = 0
                for sh in (24, 16, 8, 0):
                    d |= (((pix[i] >> sh) - (pred >> sh)) & 0xFF) << sh
                res[i] = d
        pix = res

    w.write(0, 1)  # no more transforms
    _encode_pixels(
        w, pix, cur_w, run_length=run_length, cache_bits=cache_bits,
        use_max_symbol=use_max_symbol,
    )
    payload = w.bytes()
    if _payload_only:
        return payload
    riff = b"WEBP" + _chunk(b"VP8L", payload)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def encode_webp_animation(
    canvas_w: int,
    canvas_h: int,
    frames: list[tuple[int, int, int, int, list[bytes]]],
    duration_ms: int = 100,
    **vp8l_kwargs,
) -> bytes:
    """Encode an ANIMATED lossless WebP (VP8X + ANIM + one ANMF per
    frame, each frame a VP8L stream). ``frames`` entries are
    ``(x, y, w, h, rgba_rows)`` with even x/y (the container stores
    offsets halved). Tests only."""
    out = bytearray(b"WEBP")
    vp8x = bytes([0x02, 0, 0, 0])  # animation flag
    vp8x += struct.pack("<I", canvas_w - 1)[:3]
    vp8x += struct.pack("<I", canvas_h - 1)[:3]
    out += _chunk(b"VP8X", vp8x)
    out += _chunk(b"ANIM", struct.pack("<IH", 0, 0))  # bg color + loops
    for fx, fy, fw, fh, rows in frames:
        if fx % 2 or fy % 2:
            raise ValueError("ANMF offsets must be even")
        payload = encode_webp_lossless(fw, fh, rows, _payload_only=True, **vp8l_kwargs)
        hdr = (
            struct.pack("<I", fx // 2)[:3]
            + struct.pack("<I", fy // 2)[:3]
            + struct.pack("<I", fw - 1)[:3]
            + struct.pack("<I", fh - 1)[:3]
            + struct.pack("<I", duration_ms)[:3]
            + b"\x00"
        )
        out += _chunk(b"ANMF", hdr + _chunk(b"VP8L", payload))
    return b"RIFF" + struct.pack("<I", len(out)) + bytes(out)


def _encode_sub_image(w: _BitsW, pix: list[int]) -> None:
    """Entropy-coded sub-image (transform data / palette): no color cache,
    literals only."""
    w.write(0, 1)  # no color cache
    _write_pixel_codes_and_literals(w, pix, None, 0, False)


def _encode_pixels(
    w: _BitsW, pix: list[int], xsize: int, run_length: bool,
    cache_bits: int, use_max_symbol: bool,
) -> None:
    if cache_bits:
        w.write(1, 1)
        w.write(cache_bits, 4)
    else:
        w.write(0, 1)
    w.write(0, 1)  # no meta prefix codes
    runs = None
    if run_length:
        # greedy run-length pass: repeat-previous-pixel runs become LZ77
        # copies with distance 1, alternating the 2D plane code (1,0) -> 2
        # and the linear code 1 -> 121 to exercise both decoder paths
        runs = []
        i = 1
        while i < len(pix):
            j = i
            while j < len(pix) and pix[j] == pix[j - 1] and j - i < 100:
                j += 1
            if j - i >= 3:
                runs.append((i, j - i))
                i = j
            else:
                i += 1
    _write_pixel_codes_and_literals(w, pix, runs, cache_bits, use_max_symbol)


def _length_prefix(v: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_bits_value, extra_bits_count)."""
    if v <= 4:
        return v - 1, 0, 0
    bits = (v - 1).bit_length() - 1
    rem = v - 1 - (1 << bits)
    if rem < (1 << (bits - 1)):
        return 2 * bits, rem, bits - 1
    return 2 * bits + 1, rem - (1 << (bits - 1)), bits - 1


def _write_pixel_codes_and_literals(
    w: _BitsW, pix: list[int], runs, cache_bits: int, use_max_symbol: bool
) -> None:
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size
    run_at = {i: n for i, n in runs} if runs else {}

    # first pass: the symbol streams (so code tables can be built)
    greens: list[int] = []
    reds: list[int] = []
    blues: list[int] = []
    alphas: list[int] = []
    dists: list[int] = []
    events = []  # ("lit", argb) | ("cache", idx) | ("copy", len, dist_code)
    i = 0
    toggle = True
    while i < len(pix):
        if i in run_at:
            n = run_at[i]
            lp, lv, lc = _length_prefix(n)
            greens.append(256 + lp)
            dist_code = 2 if toggle else 121  # (1,0) plane code vs linear 1
            toggle = not toggle
            dp, dv, dc = _length_prefix(dist_code)
            dists.append(dp)
            events.append(("copy", (lp, lv, lc), (dp, dv, dc)))
            if cache_bits:
                for k in range(i, i + n):
                    cache[
                        (0x1E35A7BD * pix[k] & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = pix[k]
            i += n
            continue
        p = pix[i]
        idx = (
            (0x1E35A7BD * p & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache_bits
            else 0
        )
        if cache_bits and cache[idx] == p:
            greens.append(256 + 24 + idx)
            events.append(("cache", idx))
        else:
            a, red, g, b = _channels(p)
            greens.append(g)
            reds.append(red)
            blues.append(b)
            alphas.append(a)
            events.append(("lit", p))
            if cache_bits:
                cache[idx] = p
        i += 1

    alphabet0 = 256 + 24 + cache_size
    streams = [
        (greens, alphabet0),
        (reds, 256),
        (blues, 256),
        (alphas, 256),
        (dists, 40),
    ]
    codes = []
    for stream, alphabet in streams:
        used = sorted(set(stream)) if stream else [0]
        if len(used) <= 2:
            lengths = [0] * alphabet
            for s in used:
                lengths[s] = 1
            if len(used) == 1:
                # the simple-code writer handles the 1-symbol case directly
                pass
        else:
            lengths = _complete_lengths(used, alphabet)
        _write_prefix_code(w, lengths, use_max_symbol=use_max_symbol)
        codes.append(_canonical_codes(lengths) if len(used) > 1 else {used[0]: (0, 0)})

    gcodes, rcodes, bcodes, acodes, dcodes = codes
    for ev in events:
        if ev[0] == "lit":
            a, red, g, b = _channels(ev[1])
            _write_code_msb(w, *gcodes[g])
            _write_code_msb(w, *rcodes[red])
            _write_code_msb(w, *bcodes[b])
            _write_code_msb(w, *acodes[a])
        elif ev[0] == "cache":
            _write_code_msb(w, *gcodes[256 + 24 + ev[1]])
        else:
            (lp, lv, lc), (dp, dv, dc) = ev[1], ev[2]
            _write_code_msb(w, *gcodes[256 + lp])
            if lc:
                w.write(lv, lc)
            _write_code_msb(w, *dcodes[dp])
            if dc:
                w.write(dv, dc)

"""Minimal pure-stdlib+numpy JPEG codec (JFIF, baseline sequential AND
progressive DCT, Huffman entropy coding).

Closes the dominant non-PNG image format for real in this container: no
Pillow ships here, but Huffman-coded JPEG is decodable with ``struct`` for
the marker segments, a dict-based Huffman decoder, and numpy for the 8x8
IDCT — all public knowledge (ITU-T T.81 / ISO 10918-1; quantization and
Huffman defaults from its Annex K). Supported: baseline SOF0 and
progressive SOF2 (spectral selection + successive approximation: DC
first/refinement scans, per-band AC scans with end-of-band runs, AC
refinement with correction bits), 8-bit, 1- or 3-component (grayscale /
YCbCr), arbitrary sampling factors in {1, 2} (4:4:4, 4:2:2, 4:2:0),
multiple DQT/DHT segments incl. between scans, restart markers
(DRI/RSTn) in both scan geometries. Fail-fast on everything else
(arithmetic coding, 12-bit, lossless, hierarchical) — the loud-failure
discipline of ``operators/png.py``, never a silently wrong decode.

The encoders exist so tests can synthesize REAL JPEG payloads
in-container (the PNG pattern): baseline 4:4:4 / grayscale with the
Annex-K default tables scaled by an IJG-style quality factor, and a
progressive mode whose scan script exercises every progressive decode
path. They are not production write paths. JPEG is lossy, so tests
assert near-equality against the SOURCE pixels — but progressive and
baseline encode the SAME quantized coefficients, so their decodes are
pinned BIT-IDENTICAL to each other (fuzzed across sizes, qualities,
restart intervals in tests/test_jpeg.py).

Reference parity note: the reference repo has no media layer at all; this
extends the engine's multimodal lane (SURVEY.md §2's training-data
pipeline surface) the same way the PNG codec did in round 10.
"""

from __future__ import annotations

import struct

import numpy as np

# Hard ceiling on decoded sample bytes per image (matches the PNG codec's
# bound): untrusted bytes reach decode_jpeg straight from binary columns,
# so refuse absurd declared dimensions before allocating planes.
_MAX_DECODED_BYTES = 256 * 1024 * 1024

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

_QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# (BITS[1..16], HUFFVAL) per Annex K; the encoder WRITES these into DHT, so
# the codec is self-consistent by construction and the decoder reads
# whatever tables a real file carries.
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _zigzag():
    """Zigzag scan order as (row, col) pairs: diagonals s = row+col from 0
    to 14, even diagonals traversed bottom-left -> top-right."""
    order = []
    for s in range(15):
        cells = [(y, s - y) for y in range(max(0, s - 7), min(7, s) + 1)]
        order.extend(reversed(cells) if s % 2 == 0 else cells)
    return order


_ZIGZAG = _zigzag()  # zigzag index -> (row, col)

# orthonormal DCT-II matrix: FDCT D = C @ B @ C.T, IDCT B = C.T @ D @ C
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def is_jpeg(data: bytes) -> bool:
    return data[:3] == b"\xff\xd8\xff"


def _scaled_quant(base: list[int], quality: int) -> np.ndarray:
    """IJG-style quality scaling of an Annex-K base table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((np.array(base) * scale + 50) // 100, 1, 255).reshape(8, 8)


def _build_huffman(bits: list[int], vals: list[int]):
    """Canonical Huffman code assignment (T.81 Annex C): returns
    symbol -> (code, length) for encoding and {(length, code): symbol}
    for decoding."""
    if len(bits) != 16:  # a truncated DHT segment shortens the BITS array
        raise ValueError("corrupt Huffman table: BITS must have 16 entries")
    if sum(bits) != len(vals):
        raise ValueError("corrupt Huffman table: BITS/HUFFVAL mismatch")
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("corrupt Huffman table: code overflow")
            enc[vals[k]] = (code, length)
            dec[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return enc, dec


# ---------------------------------------------------------------------------
# Bit IO with 0xFF byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1-bits per the spec
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF 0x00, stops at any other
    marker (exposed via ``marker``) and never reads past it."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("truncated JPEG: entropy data ended at a marker")
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG: entropy data ran out")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG: dangling 0xFF")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt  # restart or end-of-scan marker
                raise _AtMarker()
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_past_marker(self) -> int:
        """Consume the pending marker (e.g. an RSTn), reset bit state."""
        m = self.marker
        self.marker = None
        self.pos += 2  # the 0xFF and the marker byte
        self.acc = 0
        self.n = 0
        return m


class _AtMarker(Exception):
    """Internal: the bit reader hit a non-stuffed marker."""


def _decode_symbol(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("corrupt JPEG: invalid Huffman code")


def _extend(bits_val: int, size: int) -> int:
    if size == 0:
        return 0
    return bits_val if bits_val >= (1 << (size - 1)) else bits_val - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Encoder (tests only): baseline, 4:4:4 or grayscale, Annex-K tables
# ---------------------------------------------------------------------------


def encode_jpeg(
    width: int,
    height: int,
    rows: list[bytes],
    channels: int = 3,
    quality: int = 90,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode raw 8-bit samples (``rows``: ``height`` rows of
    ``width * channels`` bytes, RGB or grayscale) as a baseline JFIF JPEG —
    or, with ``progressive=True``, as a progressive (SOF2) one: DC first +
    DC refinement, spectral AC bands, AC successive-approximation
    refinement, end-of-band runs. ``restart_interval`` > 0 writes a DRI
    segment and emits RSTn markers every that many units (MCUs for
    interleaved scans, blocks for single-component progressive scans) —
    exercises the decoder's restart paths."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    img = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [img[..., 0]]

    qt = [_scaled_quant(_QUANT_LUMA, quality)]
    hts = [(_DC_LUMA, _AC_LUMA)]
    if channels == 3:
        qt.append(_scaled_quant(_QUANT_CHROMA, quality))
        hts.append((_DC_CHROMA, _AC_CHROMA))

    if progressive:
        return _encode_progressive(
            width, height, planes, qt, hts, restart_interval
        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00"  # identifier
        + b"\x01\x01"  # version 1.1
        + b"\x00"      # density units: none
        + b"\x00\x01\x00\x01"  # x/y density 1
        + b"\x00\x00"  # no thumbnail
    )
    for tq, q in enumerate(qt):
        zz = bytes(int(q[r][c]) for r, c in _ZIGZAG)
        out += b"\xff\xdb" + struct.pack(">HB", 3 + 64, tq) + zz
    # SOF0
    ncomp = channels
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BBB", ci + 1, 0x11, min(ci, 1))  # h=v=1, q-table
    # DHT
    for ti, (dc, ac) in enumerate(hts):
        for tc, (bits, vals) in ((0, dc), (1, ac)):
            out += b"\xff\xc4" + struct.pack(
                ">HB", 3 + 16 + len(vals), (tc << 4) | ti
            ) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        ti = min(ci, 1)
        out += struct.pack("BB", ci + 1, (ti << 4) | ti)
    out += b"\x00\x3f\x00"

    enc_tables = [
        (_build_huffman(*dc)[0], _build_huffman(*ac)[0]) for dc, ac in hts
    ]
    w = _BitWriter()
    pred = [0] * ncomp
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    padded = []
    for p in planes:
        pp = np.empty((bh * 8, bw * 8))
        pp[:height, :width] = p
        pp[height:, :width] = p[-1:, :]  # edge replication
        pp[:, width:] = pp[:, width - 1 : width]
        padded.append(pp)
    mcu_count = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                out += w.flush()  # byte-align the interval
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                w = _BitWriter()
                pred = [0] * ncomp
            mcu_count += 1
            for ci in range(ncomp):
                ti = min(ci, 1)
                dc_t, ac_t = enc_tables[ti]
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _C @ block @ _C.T
                qz = np.round(coef / qt[ti]).astype(np.int64)
                seq = [int(qz[r][c]) for r, c in _ZIGZAG]
                diff = seq[0] - pred[ci]
                pred[ci] = seq[0]
                size = _category(diff)
                code, length = dc_t[size]
                w.write(code, length)
                if size:
                    w.write(diff if diff > 0 else diff + (1 << size) - 1, size)
                run = 0
                last_nz = max((i for i in range(1, 64) if seq[i]), default=0)
                for i in range(1, last_nz + 1):
                    v = seq[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_t[0xF0]  # ZRL
                        w.write(code, length)
                        run -= 16
                    size = _category(v)
                    code, length = ac_t[(run << 4) | size]
                    w.write(code, length)
                    w.write(v if v > 0 else v + (1 << size) - 1, size)
                    run = 0
                if last_nz < 63:
                    code, length = ac_t[0x00]  # EOB
                    w.write(code, length)
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder: baseline sequential, general sampling in {1,2}, DRI/RSTn
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> dict:
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG to
    ``{width, height, channels, pixels}`` (same shape as ``decode_png``:
    ``pixels`` is ``height`` rows of ``width * channels`` bytes;
    3-component images come back as RGB)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG: bad signature")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (height, width, comps) from SOF0/SOF2
    progressive = False
    state = None  # progressive coefficient accumulators
    restart_interval = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = data[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        if marker == 0xD9:  # EOI: end of a progressive image
            if progressive and state is not None:
                return _reconstruct_progressive(frame, state, qt)
            raise ValueError("corrupt JPEG: EOI before image data")
        if pos + 4 > len(data):
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG: segment ran past the end")
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02x}: only baseline sequential "
                "(SOF0) and progressive (SOF2) DCT are supported"
            )
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                if i + 65 > len(body):
                    raise ValueError("truncated JPEG: DQT table cut short")
                tab = np.zeros((8, 8), dtype=np.int64)
                for z, (r, c) in enumerate(_ZIGZAG):
                    tab[r][c] = body[i + 1 + z]
                qt[tq] = tab
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                _, dec = _build_huffman(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                i += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            if len(body) < 6:
                raise ValueError("truncated JPEG: SOF header cut short")
            prec, h, w_, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} (only 8)")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG (1 or 3)")
            if h == 0 or w_ == 0:
                raise ValueError("corrupt JPEG: zero dimension")
            if w_ * h * nc > _MAX_DECODED_BYTES:
                raise ValueError(
                    f"refusing JPEG: declared {w_}x{h}x{nc} exceeds "
                    f"{_MAX_DECODED_BYTES} decoded bytes"
                )
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                ch, cv = hv >> 4, hv & 0x0F
                if ch not in (1, 2) or cv not in (1, 2):
                    raise NotImplementedError(f"sampling factors {ch}x{cv}")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = (h, w_, comps)
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated JPEG: DRI segment cut short")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            if not body:
                raise ValueError("truncated JPEG: SOS header cut short")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + si * 2 : 3 + si * 2]
                matches = [c for c in frame[2] if c["id"] == cs]
                if not matches:
                    raise ValueError(
                        f"corrupt JPEG: scan selects unknown component {cs}"
                    )
                scan.append((matches[0], tt >> 4, tt & 0x0F))
            ss, se, ahl = body[1 + 2 * ns : 4 + 2 * ns]
            if not progressive:
                if ns != len(frame[2]):
                    raise NotImplementedError("multi-scan sequential JPEG")
                return _decode_scan(
                    data, pos + 2 + seglen, frame, scan, qt, huff_dc,
                    huff_ac, restart_interval,
                )
            # T.81: 0 <= Ss <= Se <= 63 — a corrupt header could declare a
            # band past the 64-coefficient block and overrun the lattice
            if ss > 63 or se > 63 or se < ss:
                raise ValueError("corrupt JPEG: scan spectral range out of bounds")
            if state is None:
                state = _init_prog_state(frame)
            pos = _decode_prog_scan(
                data, pos + 2 + seglen, frame, scan,
                ss, se, ahl >> 4, ahl & 0x0F,
                state, huff_dc, huff_ac, restart_interval,
            )
            continue
        # else: APPn / COM / others — skip
        pos += 2 + seglen
    raise ValueError(
        "truncated JPEG: no EOI" if progressive else "truncated JPEG: no SOS"
    )


def _expect_restart(r, n_preds):
    """Byte-align onto the pending RSTn marker and reset the DC predictors."""
    r.n = 0  # restart markers are byte-aligned: drop pad bits
    try:
        r.bit()  # force a fill so the pending marker surfaces
        raise ValueError("corrupt JPEG: expected restart marker")
    except _AtMarker:
        m = r.align_past_marker()
        if not (0xD0 <= m <= 0xD7):
            raise ValueError(f"corrupt JPEG: expected RSTn, got 0x{m:02x}")
    return [0] * n_preds


def _table(tables, idx, what):
    """A scan referencing a table id no DHT/DQT defined is corrupt data,
    not a KeyError for the Arrow worker."""
    try:
        return tables[idx]
    except KeyError:
        raise ValueError(
            f"corrupt JPEG: scan references undefined {what} table {idx}"
        ) from None


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    height, width, comps = frame
    if len(scan) == 1:
        # T.81 §A.2.2: a single-component scan is NON-interleaved — one
        # data unit per MCU, walked over the component's own block raster,
        # regardless of the SOF sampling factors (some encoders declare
        # 2x2 for grayscale; interleaved MCU geometry would mis-place
        # blocks whenever ceil(width/8) differs from the padded MCU grid).
        # Sequential mode only reaches here for a 1-component frame, so
        # the component raster is the full-resolution block grid.
        comp, tdc, tac = scan[0]
        dc_t = _table(huff_dc, tdc, "DC")
        ac_t = _table(huff_ac, tac, "AC")
        q_t = _table(qt, comp["tq"], "quant")
        bx_total = (width + 7) // 8
        by_total = (height + 7) // 8
        plane = np.zeros((by_total * 8, bx_total * 8))
        r = _BitReader(data, pos)
        pred = [0]
        count = 0
        for by in range(by_total):
            for bx in range(bx_total):
                if restart_interval and count and count % restart_interval == 0:
                    pred = _expect_restart(r, 1)
                try:
                    blk = _decode_block(r, dc_t, ac_t, q_t, pred, 0)
                except _AtMarker:
                    raise ValueError("truncated JPEG: marker inside an MCU") from None
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
                count += 1
        # _assemble upsamples by hmax/c.h == 1 for the single component and
        # crops the padded raster back to the declared dimensions
        return _assemble(frame, [plane])
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))
    r = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # expect an RSTn between intervals; byte-align + reset DC
                pred = _expect_restart(r, len(comps))
            for ci, (comp, tdc, tac) in enumerate(scan):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        try:
                            blk = _decode_block(
                                r, _table(huff_dc, tdc, "DC"),
                                _table(huff_ac, tac, "AC"),
                                _table(qt, comp["tq"], "quant"), pred, ci
                            )
                        except _AtMarker:
                            raise ValueError(
                                "truncated JPEG: marker inside an MCU"
                            ) from None
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1
    return _assemble(frame, planes)


def _assemble(frame, planes):
    """Upsample component planes to full resolution, crop, color-convert."""
    height, width, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c, p in zip(comps, planes):
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:height, :width])
    if len(comps) == 3:
        y, cb, cr = full
        rr = y + 1.402 * (cr - 128.0)
        gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bb = y + 1.772 * (cb - 128.0)
        img = np.stack([rr, gg, bb], axis=-1)
        channels = 3
    else:
        img = full[0][..., None]
        channels = 1
    img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    pixels = [img[yy].tobytes() for yy in range(height)]
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": pixels,
    }


def _decode_block(r, dc_table, ac_table, q, pred, ci):
    size = _decode_symbol(r, dc_table)
    if size > 15:
        raise ValueError("corrupt JPEG: DC category > 15")
    diff = _extend(r.bits(size), size)
    pred[ci] += diff
    seq = np.zeros(64, dtype=np.int64)
    seq[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _decode_symbol(r, ac_table)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("corrupt JPEG: AC run past block end")
        seq[k] = _extend(r.bits(size), size)
        k += 1
    coef = np.zeros((8, 8), dtype=np.float64)
    for z, (row, col) in enumerate(_ZIGZAG):
        coef[row][col] = seq[z] * q[row][col]
    return _C.T @ coef @ _C + 128.0


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding: spectral selection + successive approximation
# ---------------------------------------------------------------------------


def _prog_geometry(frame):
    height, width, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    geo = []
    for c in comps:
        cw = (width * c["h"] + hmax - 1) // hmax
        ch = (height * c["v"] + vmax - 1) // vmax
        geo.append(
            {
                "cols": mcux * c["h"],  # MCU-padded block grid (interleaved)
                "rows": mcuy * c["v"],
                "nbx": (cw + 7) // 8,  # true block counts (non-interleaved)
                "nby": (ch + 7) // 8,
            }
        )
    return mcux, mcuy, geo


def _init_prog_state(frame):
    """Per-component coefficient accumulators (zigzag order), built up scan
    by scan and reconstructed once at EOI."""
    _, _, comps = frame
    _, _, geo = _prog_geometry(frame)
    return [
        np.zeros((g["rows"], g["cols"], 64), dtype=np.int32) for g in geo
    ]


def _expect_rst(r):
    """Byte-align and consume the RSTn the stream owes at an interval."""
    r.n = 0
    try:
        r.bit()
        raise ValueError("corrupt JPEG: expected restart marker")
    except _AtMarker:
        m = r.align_past_marker()
        if not (0xD0 <= m <= 0xD7):
            raise ValueError(f"corrupt JPEG: expected RSTn, got 0x{m:02x}")


def _next_marker(data, pos):
    """Position of the next real marker at/after ``pos`` (skips stuffed
    0xFF00 bytes and restart markers)."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            if 0xD0 <= data[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    raise ValueError("truncated JPEG: no marker after scan data")


def _decode_prog_scan(
    data, pos, frame, scan, ss, se, ah, al, state, huff_dc, huff_ac,
    restart_interval,
):
    """Decode ONE progressive scan into the coefficient state; returns the
    position of the marker following the scan's entropy data.

    Geometry per T.81: a multi-component scan (DC only) walks MCUs in
    interleaved order; a single-component scan walks that component's true
    block grid in raster order. Restart intervals count those units."""
    height, width, comps = frame
    if ss == 0 and se != 0:
        raise ValueError("corrupt JPEG: DC progressive scan with Se != 0")
    if ss > 0 and len(scan) != 1:
        raise ValueError("corrupt JPEG: multi-component AC progressive scan")
    if ss > 0 and ah != 0 and al != ah - 1:
        raise ValueError("corrupt JPEG: non-sequential successive approximation")
    mcux, mcuy, geo = _prog_geometry(frame)
    comp_index = {id(c): i for i, c in enumerate(comps)}

    units = []
    if len(scan) > 1:  # interleaved DC scan: MCU order
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for si, (comp, _, _) in enumerate(scan):
                    ci = comp_index[id(comp)]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            unit.append(
                                (si, ci, my * comp["v"] + by, mx * comp["h"] + bx)
                            )
                units.append(unit)
    else:  # single component: true block raster order
        comp = scan[0][0]
        ci = comp_index[id(comp)]
        g = geo[ci]
        for by in range(g["nby"]):
            for bx in range(g["nbx"]):
                units.append([(0, ci, by, bx)])

    r = _BitReader(data, pos)
    pred = [0] * len(scan)
    eob = {"run": 0}
    count = 0
    try:
        for unit in units:
            if restart_interval and count and count % restart_interval == 0:
                _expect_rst(r)
                pred = [0] * len(scan)
                eob["run"] = 0
            for si, ci, by, bx in unit:
                block = state[ci][by][bx]
                comp, tdc, tac = scan[si]
                if ss == 0:
                    if ah == 0:  # DC first
                        s = _decode_symbol(r, _table(huff_dc, tdc, 'DC'))
                        if s > 15:  # T.81: DC category SSSS <= 15
                            raise ValueError("corrupt JPEG: DC category > 15")
                        pred[si] += _extend(r.bits(s), s)
                        block[0] = pred[si] << al
                    else:  # DC refinement: one bit, OR into bit Al
                        if r.bit():
                            block[0] |= 1 << al
                elif ah == 0:
                    _ac_first_prog(r, block, _table(huff_ac, tac, 'AC'), ss, se, al, eob)
                else:
                    _ac_refine_prog(r, block, _table(huff_ac, tac, 'AC'), ss, se, al, eob)
            count += 1
    except _AtMarker:
        raise ValueError("truncated JPEG: marker inside a progressive scan") from None
    if r.marker is not None:
        return r.pos  # reader already parked at the next marker's 0xFF
    return _next_marker(data, r.pos)


def _ac_first_prog(r, block, table, ss, se, al, eob):
    """First AC scan of a band: standard progressive AC coding with
    end-of-band runs (EOBn covers whole all-zero bands of later blocks)."""
    if eob["run"] > 0:
        eob["run"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_symbol(r, table)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run < 15:  # EOBn: this block done, run covers later blocks
                eob["run"] = (1 << run) - 1
                if run:
                    eob["run"] += r.bits(run)
                return
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise ValueError("corrupt JPEG: AC run past the band end")
        block[k] = _extend(r.bits(size), size) << al
        k += 1


def _ac_refine_prog(r, block, table, ss, se, al, eob):
    """AC successive-approximation refinement (the jdphuff algorithm):
    correction bits for already-nonzero coefficients, run/size=1 symbols
    for newly-nonzero ones, EOBn covering the current block's tail."""
    p1, m1 = 1 << al, -1 << al

    def correct(k_at):
        if r.bit() and (int(block[k_at]) & p1) == 0:
            block[k_at] += p1 if block[k_at] > 0 else m1

    k = ss
    if eob["run"] == 0:
        while k <= se:
            rs = _decode_symbol(r, table)
            run, size = rs >> 4, rs & 0x0F
            val = 0
            if size == 0:
                if run < 15:  # EOBn INCLUDING this block's tail
                    eob["run"] = 1 << run
                    if run:
                        eob["run"] += r.bits(run)
                    break
                # run == 15 (ZRL): skip 16 zero-history coefficients
            else:
                if size != 1:
                    raise ValueError("corrupt JPEG: refinement size != 1")
                val = p1 if r.bit() else m1
            while k <= se:
                if block[k] != 0:
                    correct(k)
                else:
                    if run == 0:
                        if val:
                            block[k] = val
                        k += 1
                        break
                    run -= 1
                k += 1
    if eob["run"] > 0:
        while k <= se:  # tail: correction bits for the rest of the band
            if block[k] != 0:
                correct(k)
            k += 1
        eob["run"] -= 1


# vectorized dequant + IDCT over a whole block grid
_ZIG_ROWS = np.array([rc[0] for rc in _ZIGZAG])
_ZIG_COLS = np.array([rc[1] for rc in _ZIGZAG])


def _reconstruct_progressive(frame, state, qt):
    """All scans are in: dequantize, IDCT every block (one einsum per
    component), assemble exactly like the sequential path."""
    height, width, comps = frame
    planes = []
    for ci, c in enumerate(comps):
        coef = state[ci]  # (rows, cols, 64) in zigzag order
        rows, cols = coef.shape[:2]
        q = _table(qt, c["tq"], "quant")
        qzig = q[(_ZIG_ROWS, _ZIG_COLS)].astype(np.float64)
        deq = coef.astype(np.float64) * qzig  # still zigzag order
        mats = np.zeros((rows, cols, 8, 8))
        mats[:, :, _ZIG_ROWS, _ZIG_COLS] = deq
        plane = np.einsum("ij,rcjk,kl->rcil", _C.T, mats, _C) + 128.0
        planes.append(
            plane.transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
        )
    return _assemble(frame, planes)


# ---------------------------------------------------------------------------
# Progressive encoder (tests only): the exact inverse of the decode scans
# above, so round trips pin every progressive path — DC first/refine,
# spectral AC bands with end-of-band runs, AC refinement with buffered
# correction bits, restart intervals in both unit geometries.
# ---------------------------------------------------------------------------


def _tz_shift(v: int, al: int) -> int:
    """Shift toward zero: the T.81 'value divided by 2^Al' for first scans."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


# Progressive AC scans need the EOBn symbols (0x10..0xE0) the baseline
# Annex-K tables don't carry (real encoders ship custom tables in DHT, as
# we do). A flat all-8-bit canonical code over every symbol a progressive
# AC scan can emit — EOB0..EOB14, ZRL, and (run, size) for size 1..13 —
# is valid (224 codes <= 255) and trivially correct; compression is not
# the point of the test-side encoder.
_AC_PROG_VALS = sorted(
    [r << 4 for r in range(15)]  # EOBn
    + [0xF0]  # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 14)]
)
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, len(_AC_PROG_VALS), 0, 0, 0, 0, 0, 0, 0, 0],
    _AC_PROG_VALS,
)


def _emit_eobrun(w, ac_t, eobrun: int, bits: list[int]) -> tuple[int, list[int]]:
    """Flush a pending end-of-band run (and, for refinement scans, the
    buffered correction bits its covered blocks owe, in block order)."""
    while eobrun:
        chunk = min(eobrun, 32767)
        rr = chunk.bit_length() - 1
        code, length = ac_t[rr << 4]
        w.write(code, length)
        if rr:
            w.write(chunk - (1 << rr), rr)
        eobrun -= chunk
    for b in bits:
        w.write(b, 1)
    return 0, []


def _encode_progressive(width, height, planes, qt, hts, restart_interval):
    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for ti, q in enumerate(qt):
        zz = bytes(int(q[r][c]) for r, c in _ZIGZAG)
        out += b"\xff\xdb" + struct.pack(">HB", 3 + 64, ti) + zz
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BBB", ci + 1, 0x11, min(ci, 1))
    for ti, (dc, _ac) in enumerate(hts):
        bits, vals = dc
        out += b"\xff\xc4" + struct.pack(
            ">HB", 3 + 16 + len(vals), ti
        ) + bytes(bits) + bytes(vals)
    # one shared AC table (id 0) with the progressive symbol set (EOBn etc.)
    pbits, pvals = _AC_PROG
    out += b"\xff\xc4" + struct.pack(
        ">HB", 3 + 16 + len(pvals), (1 << 4) | 0
    ) + bytes(pbits) + bytes(pvals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    # quantized coefficient blocks per component, zigzag order, raster grid
    bw, bh = (width + 7) // 8, (height + 7) // 8
    coefs = []
    for ci, p in enumerate(planes):
        pp = np.empty((bh * 8, bw * 8))
        pp[:height, :width] = p
        pp[height:, :width] = p[-1:, :]
        pp[:, width:] = pp[:, width - 1 : width]
        ti = min(ci, 1)
        arr = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                block = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                qz = np.round((_C @ block @ _C.T) / qt[ti]).astype(np.int64)
                arr[by, bx, :] = [qz[r][c] for r, c in _ZIGZAG]
        coefs.append(arr)

    enc = [(_build_huffman(*dc)[0], None) for dc, _ac in hts]
    ac_prog = _build_huffman(*_AC_PROG)[0]
    units = [(by, bx) for by in range(bh) for bx in range(bw)]

    def sos_header(comp_specs, ss, se, ah, al):
        seg = bytearray(b"\xff\xda")
        seg += struct.pack(">HB", 6 + 2 * len(comp_specs), len(comp_specs))
        for cid, tdc, tac in comp_specs:
            seg += struct.pack("BB", cid, (tdc << 4) | tac)
        seg += bytes([ss, se, (ah << 4) | al])
        return seg

    rst_state = {"n": 0}

    def maybe_restart(w, count, reset):
        """Emit an RSTn at an interval boundary; ``reset`` clears scan state."""
        if restart_interval and count and count % restart_interval == 0:
            tail = w.flush()
            rst = bytes([0xFF, 0xD0 + rst_state["n"]])
            rst_state["n"] = (rst_state["n"] + 1) % 8
            reset()
            return tail + rst, _BitWriter()
        return b"", w

    AL = 1  # one successive-approximation level for both DC and AC

    # ---- scan 1: DC first, all components interleaved, Al = AL ----
    out += sos_header([(ci + 1, min(ci, 1), 0) for ci in range(ncomp)], 0, 0, 0, AL)
    w = _BitWriter()
    pred = [0] * ncomp
    chunks = bytearray()
    for count, (by, bx) in enumerate(units):
        emitted, w = maybe_restart(
            w, count, lambda: pred.__setitem__(slice(None), [0] * ncomp)
        )
        chunks += emitted
        for ci in range(ncomp):
            dc = int(coefs[ci][by, bx, 0]) >> AL  # arithmetic shift per spec
            diff = dc - pred[ci]
            pred[ci] = dc
            s = _category(diff)
            code, length = enc[min(ci, 1)][0][s]
            w.write(code, length)
            if s:
                w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    out += chunks + w.flush()

    # ---- AC first scans: spectral bands per component, Al = AL ----
    def ac_bands(ci):
        return [(1, 5), (6, 63)] if ci == 0 else [(1, 63)]

    for ci in range(ncomp):
        ac_t = ac_prog
        for ss, se in ac_bands(ci):
            out += sos_header([(ci + 1, 0, 0)], ss, se, 0, AL)
            w = _BitWriter()
            chunks = bytearray()
            eobrun, ebits = 0, []
            for count, (by, bx) in enumerate(units):
                if restart_interval and count and count % restart_interval == 0:
                    eobrun, ebits = _emit_eobrun(w, ac_t, eobrun, ebits)
                    emitted, w = maybe_restart(w, count, lambda: None)
                    chunks += emitted
                band = [int(v) for v in coefs[ci][by, bx, ss : se + 1]]
                t = [_tz_shift(v, AL) for v in band]
                nz = [i for i, v in enumerate(t) if v]
                if not nz:
                    eobrun += 1
                    continue
                eobrun, ebits = _emit_eobrun(w, ac_t, eobrun, ebits)
                run = 0
                for i in range(nz[-1] + 1):
                    v = t[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_t[0xF0]
                        w.write(code, length)
                        run -= 16
                    s = _category(v)
                    code, length = ac_t[(run << 4) | s]
                    w.write(code, length)
                    w.write(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if nz[-1] < len(band) - 1:
                    eobrun += 1
            _emit_eobrun(w, ac_t, eobrun, ebits)
            out += chunks + w.flush()

    # ---- DC refinement: one bit per block per component, Ah=AL, Al=AL-1 ----
    out += sos_header(
        [(ci + 1, min(ci, 1), 0) for ci in range(ncomp)], 0, 0, AL, AL - 1
    )
    w = _BitWriter()
    chunks = bytearray()
    for count, (by, bx) in enumerate(units):
        emitted, w = maybe_restart(w, count, lambda: None)
        chunks += emitted
        for ci in range(ncomp):
            w.write((int(coefs[ci][by, bx, 0]) >> (AL - 1)) & 1, 1)
    out += chunks + w.flush()

    # ---- AC refinement scans: Ah=AL, Al=AL-1, buffered correction bits ----
    for ci in range(ncomp):
        ac_t = ac_prog
        for ss, se in ac_bands(ci):
            out += sos_header([(ci + 1, 0, 0)], ss, se, AL, AL - 1)
            w = _BitWriter()
            chunks = bytearray()
            eobrun, ebits = 0, []
            for count, (by, bx) in enumerate(units):
                if restart_interval and count and count % restart_interval == 0:
                    eobrun, ebits = _emit_eobrun(w, ac_t, eobrun, ebits)
                    emitted, w = maybe_restart(w, count, lambda: None)
                    chunks += emitted
                band = [int(v) for v in coefs[ci][by, bx, ss : se + 1]]
                hist = [abs(v) >> AL for v in band]  # nonzero after first scan
                temp = [abs(v) >> (AL - 1) for v in band]
                targets = [i for i in range(len(band)) if hist[i] == 0 and temp[i] == 1]
                if not targets:
                    eobrun += 1
                    ebits.extend(temp[i] & 1 for i in range(len(band)) if hist[i])
                    continue
                eobrun, ebits = _emit_eobrun(w, ac_t, eobrun, ebits)
                cursor = 0
                for tpos in targets:
                    gap = list(range(cursor, tpos))
                    run = sum(1 for i in gap if hist[i] == 0)
                    while run > 15:
                        code, length = ac_t[0xF0]
                        w.write(code, length)
                        # corrections up to and INCLUDING the 16th
                        # zero-history position of this chunk
                        zeros = 0
                        while zeros < 16:
                            i = gap.pop(0)
                            if hist[i] == 0:
                                zeros += 1
                            else:
                                w.write(temp[i] & 1, 1)
                        run -= 16
                    code, length = ac_t[(run << 4) | 1]
                    w.write(code, length)
                    w.write(1 if band[tpos] > 0 else 0, 1)
                    for i in gap:
                        if hist[i]:
                            w.write(temp[i] & 1, 1)
                    cursor = tpos + 1
                if cursor <= len(band) - 1:
                    eobrun += 1
                    ebits.extend(
                        temp[i] & 1 for i in range(cursor, len(band)) if hist[i]
                    )
            _emit_eobrun(w, ac_t, eobrun, ebits)
            out += chunks + w.flush()

    out += b"\xff\xd9"
    return bytes(out)

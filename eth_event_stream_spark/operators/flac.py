"""Minimal pure-stdlib FLAC decoder (+ test-side encoder).

Closes the lossless-audio stub of the multimodal lane with nothing but
bit twiddling — all public knowledge (the xiph FLAC format specification /
RFC 9639): STREAMINFO metadata, frame sync + CRC-8 header / CRC-16 frame
checksums, UTF-8-coded frame numbers, all four subframe types (constant,
verbatim, fixed predictors order 0-4, LPC up to order 32 with quantized
coefficients), Rice/Rice2 residual coding with partitions and raw-escape,
wasted bits, and all four channel assignments (independent, left/side,
right/side, mid/side).

Correctness oracle built into the FORMAT: STREAMINFO carries the MD5 of
the original unencoded samples, and ``decode_flac`` recomputes and
verifies it — a decoder bug in any path surfaces as a loud checksum
failure, not silently wrong audio. Fail-fast likewise on bad sync, CRC
mismatches, and reserved/unsupported codes.

The encoder exists so tests can synthesize REAL FLAC payloads
in-container (the PNG/JPEG/GIF/AVI/WAV pattern): it can emit every
subframe type (including LPC with arbitrary chosen coefficients — the
residual is computed against them, so the file is valid by construction)
and mid/side stereo, with Rice parameter search per partition. It is not
a production write path.

Reference parity note: the reference repo (Rust, ~1.6k lines) has no
media layer at all; this file extends the engine's multimodal lane
(SURVEY.md §2 training-data surface) from the public format spec only,
like the other in-repo codecs.
"""

from __future__ import annotations

import hashlib
import struct

_MAX_DECODED_BYTES = 256 * 1024 * 1024  # same ceiling as the other codecs

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODES = {  # code -> fixed block size (None = read from header)
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384,
    15: 32768,
}

_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def is_flac(data: bytes) -> bool:
    return data[:4] == b"fLaC"


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over a byte window (FLAC is big-endian bits)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position of the NEXT unread byte
        self.acc = 0
        self.n = 0

    def read(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC: bitstream ran out")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def read_signed(self, k: int) -> int:
        v = self.read(k)
        return v - (1 << k) if v >> (k - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0


def _read_utf8_number(bits: _Bits) -> int:
    """FLAC's UTF-8-style coded number (up to 36 bits / 7 bytes)."""
    first = bits.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x40
    while first & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("corrupt FLAC: bad UTF-8-coded number")
    v = first & (mask - 1)
    for _ in range(n):
        b = bits.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("corrupt FLAC: bad UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _read_residual(bits: _Bits, block_size: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("corrupt FLAC: reserved residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = bits.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise ValueError("corrupt FLAC: partition count does not divide block")
    out: list[int] = []
    for p in range(n_parts):
        n = (block_size >> part_order) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("corrupt FLAC: negative partition length")
        param = bits.read(plen)
        if param == escape:
            raw_bits = bits.read(5)
            for _ in range(n):
                out.append(bits.read_signed(raw_bits) if raw_bits else 0)
        else:
            for _ in range(n):
                q = bits.unary()
                lo = bits.read(param) if param else 0
                zz = (q << param) | lo
                out.append((zz >> 1) ^ -(zz & 1))  # zigzag -> signed
    return out


def _decode_subframe(bits: _Bits, block_size: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("corrupt FLAC: subframe padding bit set")
    sf_type = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.unary()
    eff = bps - wasted
    if sf_type == 0:  # constant
        v = bits.read_signed(eff)
        samples = [v] * block_size
    elif sf_type == 1:  # verbatim
        samples = [bits.read_signed(eff) for _ in range(block_size)]
    elif 8 <= sf_type <= 12:  # fixed predictor, order 0-4
        order = sf_type - 8
        warm = [bits.read_signed(eff) for _ in range(order)]
        resid = _read_residual(bits, block_size, order)
        samples = list(warm)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(r + pred)
    elif sf_type >= 32:  # LPC, order = low 5 bits + 1
        order = (sf_type & 0x1F) + 1
        warm = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise ValueError("corrupt FLAC: invalid LPC precision")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("corrupt FLAC: negative LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        resid = _read_residual(bits, block_size, order)
        samples = list(warm)
        for r in resid:
            acc = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"corrupt FLAC: reserved subframe type {sf_type}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _parse_stream_head(data: bytes) -> tuple[dict, int]:
    """Walk the metadata blocks; return (STREAMINFO dict, first-frame pos)."""
    if not is_flac(data):
        raise ValueError("not a FLAC: bad magic")
    pos = 4
    info = None
    while True:  # metadata blocks
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC: metadata ran out")
        head = data[pos]
        btype = head & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated FLAC: metadata block ran past the end")
        if btype == 0:  # STREAMINFO
            b = _Bits(body)
            b.read(16)  # min block size
            b.read(16)  # max block size
            b.read(24)
            b.read(24)
            rate = b.read(20)
            channels = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            md5 = body[18:34]
            info = {
                "rate": rate,
                "channels": channels,
                "bps": bps,
                "total": total,
                "md5": md5,
            }
        pos += 4 + blen
        if head & 0x80:
            break
    if info is None:
        raise ValueError("corrupt FLAC: no STREAMINFO")
    if info["total"] * info["channels"] * ((info["bps"] + 7) // 8) > _MAX_DECODED_BYTES:
        raise ValueError("refusing FLAC: decoded size exceeds the ceiling")
    return info, pos


def _iter_frames(data: bytes, info: dict, pos: int):
    """Decode frames from ``pos`` on, yielding the per-channel sample
    lists of each frame in stream order. Both CRCs are verified per
    frame; the whole-stream sample-count and MD5 checks belong to the
    CALLER (``decode_flac``) because a consumer that stops early
    (``flac_segment``) cannot perform them."""
    channels = info["channels"]
    n_decoded = 0
    while pos < len(data) and (info["total"] == 0 or n_decoded < info["total"]):
        frame_start = pos
        bits = _Bits(data, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("corrupt FLAC: lost frame sync")
        if bits.read(1):
            raise ValueError("corrupt FLAC: reserved sync bit")
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1):
            raise ValueError("corrupt FLAC: reserved frame bit")
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("corrupt FLAC: reserved block size code")
        if bs_code == 6:
            block_size = bits.read(8) + 1
        elif bs_code == 7:
            block_size = bits.read(16) + 1
        else:
            block_size = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("corrupt FLAC: invalid sample rate code")
        # RFC 9639 §9.1.3: code 0 = "get from STREAMINFO"; code 3 is
        # RESERVED and must refuse loudly, never silently fall back
        if ss_code == 3:
            raise ValueError("corrupt FLAC: reserved sample size code")
        bps = info["bps"] if ss_code == 0 else _SAMPLE_SIZE_CODES[ss_code]
        # CRC-8 covers the header bytes up to (not incl.) the CRC byte
        hdr_end = bits.pos
        if _crc8(data[frame_start:hdr_end]) != bits.read(8):
            raise ValueError("corrupt FLAC: frame header CRC-8 mismatch")

        if ch_code <= 7:
            n_ch = ch_code + 1
            if n_ch != channels:
                raise ValueError("corrupt FLAC: frame/stream channel mismatch")
            chans = [_decode_subframe(bits, block_size, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("corrupt FLAC: stereo decorrelation on non-stereo")
            # the DIFFERENCE channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _decode_subframe(bits, block_size, bps)
                side = _decode_subframe(bits, block_size, bps + 1)
                chans = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(bits, block_size, bps + 1)
                right = _decode_subframe(bits, block_size, bps)
                chans = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(bits, block_size, bps)
                side = _decode_subframe(bits, block_size, bps + 1)
                chans = [None, None]
                lr = []
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    lr.append(((m + s) >> 1, (m - s) >> 1))
                chans = [[x for x, _ in lr], [y for _, y in lr]]
        else:
            raise ValueError("corrupt FLAC: reserved channel assignment")

        bits.align()
        if _crc16(data[frame_start : bits.pos]) != bits.read(16):
            raise ValueError("corrupt FLAC: frame CRC-16 mismatch")
        pos = bits.pos
        n_decoded += block_size
        yield chans


def decode_flac(data: bytes) -> dict:
    """Decode a FLAC stream to ``{channels, sample_rate, bits, n_frames,
    samples}`` (``samples`` interleaved signed ints at the stream's bit
    width; ``n_frames`` = samples per channel). The STREAMINFO MD5 of the
    unencoded audio is recomputed and VERIFIED when present."""
    info, pos = _parse_stream_head(data)
    channels = info["channels"]
    out: list[list[int]] = [[] for _ in range(channels)]
    n_decoded = 0
    for chans in _iter_frames(data, info, pos):
        for c in range(channels):
            out[c].extend(chans[c])
        n_decoded += len(chans[0])

    if info["total"] and n_decoded != info["total"]:
        raise ValueError(
            f"corrupt FLAC: decoded {n_decoded} of {info['total']} samples"
        )
    # interleave and verify the STREAMINFO MD5 of the unencoded audio
    nbytes = (info["bps"] + 7) // 8
    interleaved: list[int] = []
    md5 = hashlib.md5()
    for i in range(n_decoded):
        for c in range(channels):
            s = out[c][i]
            interleaved.append(s)
            md5.update(int(s).to_bytes(nbytes, "little", signed=True))
    if info["md5"] != b"\x00" * 16 and md5.digest() != info["md5"]:
        raise ValueError(
            "corrupt FLAC: decoded audio MD5 does not match STREAMINFO"
        )
    return {
        "channels": channels,
        "sample_rate": info["rate"],
        "bits": info["bps"],
        "n_frames": n_decoded,
        "samples": interleaved,
    }


def flac_segment(data: bytes, start: int, n: int) -> dict:
    """Decode ONLY samples ``[start, start + n)`` (per-channel positions):
    frames are walked in stream order — each frame's Rice/LPC payload must
    be decoded to find the next frame boundary — but decoding STOPS at the
    first frame past the segment, so a short segment never pays for the
    tail of a long file. Per-frame CRC-8/CRC-16 are verified as usual; the
    whole-stream MD5 is NOT (it covers audio this call never decodes —
    use ``decode_flac`` for full-file integrity).

    Returns ``{channels, sample_rate, bits, n_frames, samples}`` like
    ``decode_flac`` with ``samples`` the interleaved segment (``n_frames``
    = per-channel samples actually available in the range — short at EOF).
    """
    if start < 0 or n < 0:
        raise ValueError("flac_segment: negative start or length")
    info, pos = _parse_stream_head(data)
    channels = info["channels"]
    out: list[list[int]] = [[] for _ in range(channels)]
    seen = 0  # per-channel samples decoded so far (frame-aligned)
    end = start + n
    for chans in _iter_frames(data, info, pos):
        bs = len(chans[0])
        lo, hi = max(start - seen, 0), min(end - seen, bs)
        if lo < hi:
            for c in range(channels):
                out[c].extend(chans[c][lo:hi])
        seen += bs
        if seen >= end:
            break
    interleaved: list[int] = []
    for i in range(len(out[0])):
        for c in range(channels):
            interleaved.append(out[c][i])
    return {
        "channels": channels,
        "sample_rate": info["rate"],
        "bits": info["bps"],
        "n_frames": len(out[0]),
        "samples": interleaved,
    }


# ---------------------------------------------------------------------------
# Encoder (tests only)
# ---------------------------------------------------------------------------


class _BitsW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


def _write_utf8_number(w: _BitsW, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    chunks = []
    while True:
        chunks.append(v & 0x3F)
        v >>= 6
        n = len(chunks)
        if v < (0x40 >> n):
            break
    n = len(chunks)
    w.write((0xFF00 >> (n + 1)) & 0xFF | v, 8)
    for c in reversed(chunks):
        w.write(0x80 | c, 8)


def _write_residual(
    w: _BitsW, resid: list[int], block_size: int, order: int, part_order: int = 0
) -> None:
    """Rice-code a residual (method 0, per-partition parameter search,
    escape to raw when cheaper). Partition geometry mirrors the decoder:
    the first partition is short by the predictor order."""
    if block_size % (1 << part_order):
        raise ValueError("partition count must divide the block size")
    w.write(0, 2)  # method 0: 4-bit rice params
    w.write(part_order, 4)
    n_parts = 1 << part_order
    start = 0
    for p in range(n_parts):
        n = (block_size >> part_order) - (order if p == 0 else 0)
        chunk = resid[start : start + n]
        start += n
        zz = [((x << 1) if x >= 0 else ((-x << 1) - 1)) for x in chunk]
        best_p, best_cost = 0, None
        for param in range(15):
            cost = sum((z >> param) + 1 + param for z in zz)
            if best_cost is None or cost < best_cost:
                best_p, best_cost = param, cost
        raw_bits = max((x.bit_length() + 1 for x in chunk), default=1)
        raw_cost = 5 + raw_bits * len(chunk)
        if raw_cost < best_cost:
            w.write(15, 4)  # escape
            w.write(raw_bits, 5)
            for x in chunk:
                w.write(x & ((1 << raw_bits) - 1), raw_bits)
        else:
            w.write(best_p, 4)
            for z in zz:
                w.unary(z >> best_p)
                if best_p:
                    w.write(z & ((1 << best_p) - 1), best_p)


def _write_subframe(
    w: _BitsW, samples: list[int], bps: int, mode: str, lpc_coefs=None,
    lpc_shift=0, part_order=0,
) -> None:
    w.write(0, 1)  # padding
    # a (last) block shorter than the predictor order cannot carry that
    # predictor: the warm-up alone would overrun the block — fall back
    if mode.startswith("fixed") and int(mode[-1]) > len(samples):
        mode = "verbatim"
    if mode == "lpc" and len(lpc_coefs or ()) > len(samples):
        mode = "verbatim"
    if mode == "constant":
        if any(s != samples[0] for s in samples):
            raise ValueError(
                "constant subframe on non-constant samples would be lossy"
            )
        w.write(0, 6)
        w.write(0, 1)  # no wasted bits
        w.write(samples[0] & ((1 << bps) - 1), bps)
    elif mode == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for s in samples:
            w.write(s & ((1 << bps) - 1), bps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        w.write(8 + order, 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write(s & ((1 << bps) - 1), bps)
        coefs = _FIXED_COEFS[order]
        resid = [
            samples[i] - sum(c * samples[i - j - 1] for j, c in enumerate(coefs))
            for i in range(order, len(samples))
        ]
        _write_residual(w, resid, len(samples), order, part_order)
    elif mode == "lpc":
        order = len(lpc_coefs)
        w.write(32 | (order - 1), 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write(s & ((1 << bps) - 1), bps)
        prec = max(max(abs(c) for c in lpc_coefs).bit_length() + 1, 2)
        w.write(prec - 1, 4)
        w.write(lpc_shift & 0x1F, 5)
        for c in lpc_coefs:
            w.write(c & ((1 << prec) - 1), prec)
        resid = [
            samples[i]
            - (sum(c * samples[i - j - 1] for j, c in enumerate(lpc_coefs)) >> lpc_shift)
            for i in range(order, len(samples))
        ]
        _write_residual(w, resid, len(samples), order, part_order)
    else:
        raise ValueError(f"unknown subframe mode {mode}")


def encode_flac(
    channel_samples: list[list[int]],
    sample_rate: int = 16000,
    bps: int = 16,
    block_size: int = 256,
    modes=("fixed2",),
    stereo_mode: str = "independent",
    lpc_coefs=None,
    lpc_shift: int = 5,
    part_order: int = 0,
) -> bytes:
    """Encode per-channel sample lists as a valid FLAC stream. ``modes``
    cycles per frame over subframe types; ``stereo_mode`` one of
    ``independent`` / ``mid_side`` (2 channels only)."""
    channels = len(channel_samples)
    total = len(channel_samples[0])
    if any(len(c) != total for c in channel_samples):
        raise ValueError("channels must be equal length")
    md5 = hashlib.md5()
    nbytes = (bps + 7) // 8
    for i in range(total):
        for c in range(channels):
            md5.update(int(channel_samples[c][i]).to_bytes(nbytes, "little", signed=True))

    out = bytearray(b"fLaC")
    si = _BitsW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    body = si.bytes() + md5.digest()
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    frame_no = 0
    pos = 0
    while pos < total:
        n = min(block_size, total - pos)
        w = _BitsW()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed-blocksize strategy
        w.write(7, 4)  # block size: 16-bit field follows
        w.write(0, 4)  # sample rate: from STREAMINFO
        mode = modes[frame_no % len(modes)]
        use_ms = stereo_mode == "mid_side" and channels == 2
        w.write(10 if use_ms else channels - 1, 4)
        w.write(0, 3)  # sample size: from STREAMINFO
        w.write(0, 1)
        _write_utf8_number(w, frame_no)
        w.write(n - 1, 16)
        hdr = w  # CRC-8 computed over emitted bytes so far (all byte-aligned)
        assert hdr.n == 0
        crc8 = _crc8(bytes(hdr.out))
        w.write(crc8, 8)

        chunk = [c[pos : pos + n] for c in channel_samples]
        if use_ms:
            left, right = chunk
            side = [l - r for l, r in zip(left, right)]
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            _write_subframe(w, mid, bps, mode, lpc_coefs, lpc_shift, part_order)
            _write_subframe(w, side, bps + 1, mode, lpc_coefs, lpc_shift, part_order)
        else:
            for c in range(channels):
                _write_subframe(
                    w, chunk[c], bps, mode, lpc_coefs, lpc_shift, part_order
                )
        w.align()
        crc16 = _crc16(bytes(w.out))
        w.write(crc16, 16)
        out += w.bytes()
        pos += n
        frame_no += 1
    return bytes(out)

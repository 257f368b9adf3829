"""Minimal pure-stdlib RIFF-WAVE codec: PCM, G.711 µ-law / A-law, and
IMA (DVI) ADPCM.

The stdlib ``wave`` module refuses anything but integer PCM; G.711
telephony audio (WAVE format tags 6 = A-law, 7 = µ-law) is pure table
math, and IMA ADPCM (tag 0x11) is an 89-entry step table plus a 3-bit
magnitude recurrence — all public knowledge (ITU-T G.711; the IMA
Digital Audio Pack recommended practice / Microsoft WAVE registration;
the RIFF-WAVE container layout). Supported: fmt tags 1 (PCM,
8/16/24/32-bit), 6 (A-law), 7 (µ-law), 0x11 (IMA ADPCM, mono or
multi-channel, any registered block size, ``fact``-chunk trimmed final
block); chunk walking that skips LIST/cue metadata. Fail-fast on
truncation, missing fmt/data chunks, float or extensible formats, byte
counts that don't divide the frame size, and ADPCM geometry that
contradicts itself (block size vs samples-per-block, header step index
> 88, missing fact chunk) — the loud-failure discipline of the other
in-repo codecs.

``decode_wav`` returns real frame counts AND real 16-bit linear samples
(G.711 expanded through 256-entry lookup tables; ADPCM through the step
recurrence — both pinned per-state against CPython's ``audioop`` in the
tests), so the multimodal lane reports sample counts for compressed
audio the stdlib path raised on.

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
_PCM, _ALAW, _ULAW, _ADPCM = 1, 6, 7, 0x11
_NAMES = {_PCM: "pcm", _ALAW: "alaw", _ULAW: "ulaw", _ADPCM: "ima_adpcm"}

# IMA ADPCM quantizer step table (89 entries) and index-adjust table —
# the IMA ADPCM recommended practice's tables, identical to CPython's
# audioop (Modules/audioop.c stepsizeTable/indexTable), against which the
# tests pin every (index, nibble) decode transition exhaustively.
_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
assert len(_STEP_TABLE) == 89
_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _adpcm_step(nibble: int, pred: int, idx: int) -> tuple[int, int]:
    """One IMA ADPCM decode transition: (nibble, predictor, step index) ->
    (new predictor, new step index). The magnitude recurrence
    ``step/8 + bit-weighted step fractions`` is exactly audioop's."""
    step = _STEP_TABLE[idx]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _INDEX_TABLE[nibble & 7]))
    return pred, idx


def _parse_container(data: bytes) -> tuple[dict, bytes]:
    """RIFF chunk walk: return (validated fmt dict + frame_size, data body)."""
    if not is_wav(data):
        raise ValueError("not a WAV: bad RIFF signature")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_size)
    pos = 12
    fmt = None
    body = None
    fact = None
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
            if tag == _ADPCM:
                # fmt extension: cbSize (>= 2) then wSamplesPerBlock
                if size < 20:
                    raise ValueError(
                        "corrupt WAV: IMA ADPCM fmt chunk lacks the "
                        "samples-per-block extension"
                    )
                (spb,) = struct.unpack("<H", data[payload + 18 : payload + 20])
                fmt["samples_per_block"] = spb
        elif cid == b"fact":
            if size < 4:
                raise ValueError("corrupt WAV: fact chunk too small")
            (fact,) = struct.unpack("<I", data[payload : payload + 4])
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
            f"WAVE format tag {tag}: only PCM (1), A-law (6), µ-law (7), "
            "IMA ADPCM (0x11)"
        )
    channels = fmt["channels"]
    if channels < 1:
        raise ValueError("corrupt WAV: zero channels")
    if tag == _ADPCM:
        _validate_adpcm_geometry(fmt, body, fact)
        return fmt, body
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


def _validate_adpcm_geometry(fmt: dict, body: bytes, fact: int | None) -> None:
    """Cross-check every redundant IMA ADPCM geometry field and stash the
    derived values in ``fmt`` — a contradiction is corruption, never a
    guess. Block layout (per the WAVE registration of tag 0x11): a 4-byte
    header per channel (int16 predictor seed, step index, reserved), then
    4-byte nibble groups round-robin across channels; each group carries 8
    samples of its channel, low nibble first."""
    ch = fmt["channels"]
    ba = fmt["block_align"]
    if fmt["bits"] != 4:
        raise ValueError(f"corrupt WAV: IMA ADPCM with {fmt['bits']} bits")
    data_bytes = ba - 4 * ch
    if data_bytes < 0 or data_bytes % (4 * ch):
        raise ValueError(
            f"corrupt WAV: IMA ADPCM block_align {ba} does not hold "
            f"{ch}-channel headers plus whole 4-byte nibble groups"
        )
    spb = data_bytes // ch * 2 + 1
    declared = fmt.get("samples_per_block")
    if declared != spb:
        raise ValueError(
            f"corrupt WAV: fmt declares {declared} samples per block but "
            f"block_align {ba} holds {spb}"
        )
    if len(body) % ba:
        raise ValueError("corrupt WAV: ADPCM data is not a whole block count")
    if fact is None:
        raise ValueError(
            "corrupt WAV: IMA ADPCM requires a fact chunk (total frames)"
        )
    capacity = (len(body) // ba) * spb
    if not (capacity - spb < fact <= capacity):
        raise ValueError(
            f"corrupt WAV: fact count {fact} inconsistent with "
            f"{len(body) // ba} blocks of {spb} samples"
        )
    fmt["fact"] = fact


def _adpcm_decode_block(block: bytes, channels: int) -> list[list[int]]:
    """Decode one IMA ADPCM block to per-channel 16-bit sample lists.
    Each channel's 4-byte header seeds (predictor, step index); data bytes
    follow in 4-byte groups round-robin across channels, low nibble first
    within each byte."""
    chans: list[list[int]] = []
    states: list[tuple[int, int]] = []
    for c in range(channels):
        pred = int.from_bytes(block[c * 4 : c * 4 + 2], "little", signed=True)
        idx = block[c * 4 + 2]
        if idx > 88:
            raise ValueError(f"corrupt WAV: ADPCM block header step index {idx}")
        # the 4th header byte is reserved; writers disagree on its value,
        # so it is deliberately not validated
        chans.append([pred])
        states.append((pred, idx))
    gi = 0
    for pos in range(4 * channels, len(block), 4):
        c = gi % channels
        pred, idx = states[c]
        out = chans[c]
        for b in block[pos : pos + 4]:
            for nib in (b & 0x0F, b >> 4):
                pred, idx = _adpcm_step(nib, pred, idx)
                out.append(pred)
        states[c] = (pred, idx)
        gi += 1
    return chans


def _adpcm_frames(fmt: dict, body: bytes, lo: int, hi: int) -> list[int]:
    """Interleaved 16-bit samples for ADPCM frames ``[lo, hi)`` (already
    clamped to the fact count). Blocks are self-seeding (every header
    restarts the predictor), so only the overlapping blocks decode — the
    random-access property the segment lane relies on."""
    ch = fmt["channels"]
    ba = fmt["block_align"]
    spb = fmt["samples_per_block"]
    out: list[int] = []
    for blk in range(lo // spb, (hi + spb - 1) // spb if hi > lo else 0):
        chans = _adpcm_decode_block(body[blk * ba : (blk + 1) * ba], ch)
        b_lo = max(lo - blk * spb, 0)
        b_hi = min(hi - blk * spb, spb)
        for i in range(b_lo, b_hi):
            for c in range(ch):
                out.append(chans[c][i])
    return out


def _total_frames(fmt: dict, body: bytes) -> int:
    if fmt["tag"] == _ADPCM:
        return fmt["fact"]
    return len(body) // fmt["frame_size"]


def _slice_frames(fmt: dict, body: bytes, lo: int, hi: int) -> list[int]:
    """Interleaved 16-bit samples for frames ``[lo, hi)`` of a parsed WAV —
    a data-chunk byte slice for PCM/G.711, an overlapping-blocks decode for
    ADPCM. ``lo``/``hi`` must already be clamped to the total frame count."""
    if fmt["tag"] == _ADPCM:
        return _adpcm_frames(fmt, body, lo, hi)
    fs = fmt["frame_size"]
    return _expand(body[lo * fs : hi * fs], fmt["tag"], fmt["sample_bytes"])


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
    16-bit-linear sample list (PCM widths other than 16 are rescaled;
    G.711 and IMA ADPCM are expanded — ``bits`` stays the container's
    coded width, 8 and 4 respectively)."""
    fmt, body = _parse_container(data)
    n_frames = _total_frames(fmt, body)
    if n_frames * fmt["channels"] * 2 > _MAX_DECODED_BYTES:
        raise ValueError("refusing WAV: decoded size exceeds the ceiling")
    return {
        "format": _NAMES[fmt["tag"]],
        "channels": fmt["channels"],
        "sample_rate": fmt["rate"],
        "bits": fmt["bits"],
        "n_frames": n_frames,
        "samples": _slice_frames(fmt, body, 0, n_frames),
    }


def wav_segment(data: bytes, start: int, n: int) -> dict:
    """Decode ONLY frames ``[start, start + n)``: uncompressed (and G.711)
    WAV is random-access, so the segment is a byte slice of the data
    chunk; IMA ADPCM blocks are self-seeding (every block header restarts
    the predictor), so only the blocks overlapping the range decode. The
    rest of the file is never expanded — the audio analog of
    ``avi_frame``: locate, slice, decode just the piece.

    Returns the ``decode_wav`` dict shape with ``samples`` the interleaved
    segment and ``n_frames`` the frames actually available in the range
    (short at EOF)."""
    if start < 0 or n < 0:
        raise ValueError("wav_segment: negative start or length")
    fmt, body = _parse_container(data)
    total = _total_frames(fmt, body)
    lo, hi = min(start, total), min(start + n, total)
    if (hi - lo) * fmt["channels"] * 2 > _MAX_DECODED_BYTES:
        raise ValueError("refusing WAV: decoded size exceeds the ceiling")
    return {
        "format": _NAMES[fmt["tag"]],
        "channels": fmt["channels"],
        "sample_rate": fmt["rate"],
        "bits": fmt["bits"],
        "n_frames": hi - lo,
        "samples": _slice_frames(fmt, body, lo, hi),
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


def _adpcm_encode_sample(s: int, pred: int, idx: int) -> tuple[int, int, int]:
    """One IMA ADPCM encode transition: pick the nibble for sample ``s``
    given (predictor, step index), then advance the state with the SAME
    decoder recurrence — encoder and decoder predictors stay in lockstep,
    which is what makes the codec work at all."""
    step = _STEP_TABLE[idx]
    delta = s - pred
    nib = 0
    if delta < 0:
        nib = 8
        delta = -delta
    if delta >= step:
        nib |= 4
        delta -= step
    if delta >= step >> 1:
        nib |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nib |= 1
    pred, idx = _adpcm_step(nib, pred, idx)
    return nib, pred, idx


def encode_wav_adpcm(
    channels: list[list[int]], rate: int = 16000, block_samples: int = 505
) -> bytes:
    """Encode 16-bit-linear per-channel sample lists as an IMA ADPCM WAV
    (format tag 0x11). Tests and the synth lane only — a real (lossy)
    encoder with the standard greedy quantizer; the final partial block is
    padded by repeating each channel's last sample and the true frame
    count goes in the REQUIRED ``fact`` chunk, which the decoder trims by.

    ``block_samples`` must be 8k+1 (one header sample + whole 4-byte
    nibble groups). The step index carries across blocks, as real encoders
    do — each block header re-seeds the PREDICTOR (that is what makes
    blocks random-access) while the index continues adapting."""
    if not channels or not channels[0]:
        raise ValueError("encode_wav_adpcm: need at least one sample")
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise ValueError("encode_wav_adpcm: channels must be equal length")
    if block_samples < 9 or (block_samples - 1) % 8:
        raise ValueError("encode_wav_adpcm: block_samples must be 8k+1, k>=1")
    ch = len(channels)
    ba = 4 * ch + (block_samples - 1) // 2 * ch
    padded = [c + [c[-1]] * (-n % block_samples) for c in channels]
    idxs = [0] * ch
    blocks = []
    for blk in range(len(padded[0]) // block_samples):
        lo = blk * block_samples
        head = b""
        groups: list[bytes] = []
        for c in range(ch):
            pred = padded[c][lo]
            head += struct.pack("<hBB", pred, idxs[c], 0)
            nibs = []
            idx = idxs[c]
            for s in padded[c][lo + 1 : lo + block_samples]:
                nib, pred, idx = _adpcm_encode_sample(s, pred, idx)
                nibs.append(nib)
            idxs[c] = idx
            groups.append(
                bytes(
                    nibs[i] | (nibs[i + 1] << 4) for i in range(0, len(nibs), 2)
                )
            )
        data = head
        for g in range(0, len(groups[0]), 4):
            for c in range(ch):
                data += groups[c][g : g + 4]
        assert len(data) == ba
        blocks.append(data)
    body = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH",
        _ADPCM, ch, rate,
        rate * ba // block_samples + 1,  # nominal avg byte rate
        ba, 4, 2, block_samples,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"fact" + struct.pack("<II", 4, n)
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

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, Arrow-batched
``mapInPandas``, partition sizing. The codec layer decodes FOR REAL with
in-repo stdlib(+numpy) codecs, no new dependencies: PNG
(``operators/png.py``), baseline + progressive JPEG
(``operators/jpeg.py``), GIF (``operators/gif.py``), MJPEG-AVI video
(``operators/avi.py``), WAV audio — PCM plus G.711 µ-law/A-law
telephony compression plus IMA-ADPCM (``operators/wav.py``, G.711 expansion
tables and every ADPCM (index, nibble) decode transition verified
against CPython's audioop) — and lossless FLAC audio
(``operators/flac.py``: Rice/LPC decode with the format's own
unencoded-audio MD5 verified), and lossless WebP
(``operators/webp.py``: VP8L prefix codes + LZ77 + color cache + all
four transforms). Formats that genuinely need an external library
(lossy WebP/VP8, H.264/VP9, MP3/Vorbis) raise ``NotImplementedError``
loudly. On lossy VP8 specifically (revisited 2026-08, round 13): RFC
6386 does print the default probability tables and reference decoder
in full, so an intra-only decoder is spec-FEASIBLE in principle — but
this container has neither the RFC text nor any network access, and
those ~2k table bytes cannot be reproduced from memory safely: a
mistyped table used by BOTH the in-repo encoder and decoder would
round-trip green while producing nonconformant bitstreams, which is
strictly worse than this loud stub. Revisit if the RFC text lands
in-container. The deterministic ``fake`` codec
exercises the full path byte-for-byte reproducibly (length/md5/derived
dims) for the oracle-checked queries.

At 100 TB the rules encoded here: media stay as binary columns co-located
with their metadata (no separate fetch per row); feature extraction is
``mapInPandas`` (Arrow batches, one Python worker per core, no shuffle);
batch size bounded by bytes not rows (``maxRecordsPerBatch`` + input split
size), and decoded features are small typed columns so everything downstream
is JVM-side again.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("checksum", StringType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_frames", LongType(), True),
    ]
)


def _decode_real(kind: str, payload: bytes) -> dict:
    """Real codec layer — all in-repo, stdlib(+numpy) only, no new
    dependencies: PNG (``operators/png.py``: zlib inflate + per-scanline
    unfilter, CRC-verified), baseline + progressive JPEG
    (``operators/jpeg.py``: Huffman + dequant + 8x8 IDCT,
    4:4:4/4:2:2/4:2:0, restart markers, SOF2 spectral selection +
    successive approximation), GIF
    (``operators/gif.py``: LZW, interlace, animation frame counts), MJPEG
    AVI video (``operators/avi.py``: RIFF parsing, per-frame JPEG decode),
    WAV audio incl. G.711 µ-law/A-law (``operators/wav.py``), FLAC
    (``operators/flac.py``: Rice/LPC, in-format MD5 verified), and
    lossless WebP (``operators/webp.py``: VP8L) — real dimensions and
    frame counts from real pixels/samples. Formats that genuinely need
    an external library (lossy WebP/VP8, H.264/VP9, MP3/Vorbis) raise,
    loudly, rather than guess. The surrounding Spark plumbing (schema,
    Arrow batching, partitioning) is identical for every codec.
    """
    from .avi import decode_avi, is_avi
    from .gif import decode_gif, is_gif
    from .jpeg import decode_jpeg, is_jpeg
    from .png import decode_png, is_png
    from .webp import decode_webp, is_webp

    if kind in ("image", "video") and is_webp(payload):
        # lossless (VP8L) decodes in-repo — stills AND all-VP8L
        # animations (every frame's stream validated, so n_frames is a
        # real count, the GIF contract); lossy VP8 raises inside
        img = decode_webp(bytes(payload))
        nf = img["n_frames"]
        return {
            "n_bytes": len(payload),
            "checksum": hashlib.md5(payload).hexdigest(),
            "width": img["width"],
            "height": img["height"],
            "n_frames": nf if nf is not None and nf > 1 else None,
        }
    if kind == "image" and (is_png(payload) or is_jpeg(payload)):
        img = decode_png(payload) if is_png(payload) else decode_jpeg(payload)
        return {
            "n_bytes": len(payload),
            "checksum": hashlib.md5(payload).hexdigest(),
            "width": img["width"],
            "height": img["height"],
            "n_frames": None,
        }
    if kind in ("image", "video") and is_gif(payload):
        # animated GIFs arrive under either kind; every frame's LZW stream
        # is decoded and validated, so n_frames is a real count
        img = decode_gif(payload)
        return {
            "n_bytes": len(payload),
            "checksum": hashlib.md5(payload).hexdigest(),
            "width": img["width"],
            "height": img["height"],
            "n_frames": img["n_frames"] if img["n_frames"] > 1 else None,
        }
    if kind == "video" and is_avi(payload):
        # MJPEG AVI: the first frame decodes to real pixels via the JPEG
        # codec; the rest are counted with their signatures verified
        v = decode_avi(payload)
        return {
            "n_bytes": len(payload),
            "checksum": hashlib.md5(payload).hexdigest(),
            "width": v["width"],
            "height": v["height"],
            "n_frames": v["n_frames"],
        }
    if kind == "audio":
        from .flac import decode_flac, is_flac
        from .wav import decode_wav, is_wav

        if is_flac(payload):
            # in-repo FLAC decoder: Rice/LPC lossless audio with the
            # format's own MD5 of the unencoded samples VERIFIED — a
            # decode bug cannot return silently wrong frame counts
            a = decode_flac(bytes(payload))
            return {
                "n_bytes": len(payload),
                "checksum": hashlib.md5(payload).hexdigest(),
                "width": None,
                "height": None,
                "n_frames": a["n_frames"],
            }
        if is_wav(payload):
            # in-repo RIFF-WAVE parser: PCM (8/16/24/32-bit), G.711
            # µ-law/A-law, AND IMA-ADPCM audio (tables and decode
            # transitions verified against CPython's audioop), where the
            # stdlib wave module raises; corrupt containers still fail
            # loudly (ADPCM geometry is cross-checked field by field)
            a = decode_wav(bytes(payload))
            return {
                "n_bytes": len(payload),
                "checksum": hashlib.md5(payload).hexdigest(),
                "width": None,
                "height": None,
                # audio frames (samples per channel) — the sample-count
                # analog of the video lane's frame count
                "n_frames": a["n_frames"],
            }
    raise NotImplementedError(
        f"real {kind} decoding requires a codec library not present in this "
        "environment (PNG / JPEG incl. progressive / lossless-WebP / GIF "
        "images, MJPEG AVI video, and WAV/G.711/ADPCM/FLAC audio decode via the "
        "in-repo codecs); use codec='fake' (deterministic) or install a decoder"
    )


def _decode_fake(kind: str, payload: bytes) -> dict:
    """Deterministic fake decode: derives plausible metadata purely from the
    bytes, so results are reproducible and oracle-checkable. Audio rows get
    a fake sample count (the real lane's n_frames analog) so segment
    plumbing works under the fake codec exactly like frame plumbing does
    for video."""
    n = len(payload)
    if kind == "video":
        n_frames = (n % 24) + 1
    elif kind == "audio":
        n_frames = (n % 1000) + 1
    else:
        n_frames = None
    return {
        "n_bytes": n,
        "checksum": hashlib.md5(payload).hexdigest(),
        "width": (n % 640) + 1 if kind == "image" else None,
        "height": ((n * 7) % 480) + 1 if kind == "image" else None,
        "n_frames": n_frames,
    }


def extract_features(df: DataFrame, codec: str = "fake") -> DataFrame:
    """media table -> feature table via Arrow-batched mapInPandas.

    No shuffle: runs where the media bytes already are. Output columns are
    small and typed — downstream plans are pure JVM again.
    """
    from ..shipping import ship_package

    ship_package(df.sparkSession)
    decode = _decode_fake if codec == "fake" else _decode_real

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(k, p if p is not None else b"") for k, p in zip(pdf["kind"], pdf["payload"])]
            out = pd.DataFrame(feats)
            out.insert(0, "kind", pdf["kind"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)


SYNTH_MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

_SYNTH_PALETTE = bytes(
    [255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30, 200, 200, 0, 0, 200, 200]
)


def synth_media_payload(doc_id: int) -> tuple[str, bytes]:
    """Deterministic REAL payload for ``doc_id``: kind cycles PNG-or-WebP /
    JPEG / GIF-or-animated-WebP / MJPEG-AVI / WAV / FLAC (doc_id % 6;
    lane 0 alternates PNG at doc_id % 12 == 0 and lossless WebP at
    doc_id % 12 == 6, lane 2 alternates GIF at % 12 == 2 and ANIMATED
    lossless WebP at % 12 == 8, lane 4 alternates PCM-WAV at % 12 == 4
    and block-constant IMA-ADPCM WAV at % 12 == 10 — same dim, frame- and
    sample-count formulas, so the oracle arithmetic is format-blind;
    the ADPCM lane's per-sample values are block-constant so the lossy
    codec is exact by construction), dimensions and frame
    counts are pure functions of doc_id — so a SQL oracle can replay every
    decoded feature without decoding anything:
      images/video: width = 2 + doc_id % 13, height = 2 + doc_id % 7
      gif/avi frames: 1 + doc_id % 3;  wav/flac samples: 100 + doc_id % 50
    """
    from .gif import encode_gif
    from .jpeg import encode_jpeg
    from .png import encode_png

    lane = doc_id % 6
    w, h = 2 + doc_id % 13, 2 + doc_id % 7
    nf = 1 + doc_id % 3
    if lane == 0:
        if doc_id % 12 == 6:
            from .webp import encode_webp_lossless

            rgba = [
                bytes(
                    ((x + 3 * y + doc_id + c) % 256)
                    for x in range(w)
                    for c in range(4)
                )
                for y in range(h)
            ]
            return "image", encode_webp_lossless(
                w, h, rgba,
                subtract_green=True,
                predictor_mode=(doc_id // 12) % 14,
                run_length=True,
                cache_bits=1 + (doc_id // 12) % 11,
            )
        rows = [
            bytes(((x + 3 * y + doc_id) % 256) for x in range(w * 3))
            for y in range(h)
        ]
        return "image", encode_png(w, h, rows, color_type=2)
    if lane == 1:
        rows = [bytes([(doc_id % 256), 128, 64] * w)] * h
        return "image", encode_jpeg(w, h, rows, quality=90)
    if lane == 2:
        if doc_id % 12 == 8:
            # animated lossless WebP shares the GIF lane (doc_id % 12 == 8;
            # GIF keeps % 12 == 2): same dims and frame-count formulas, so
            # the oracle arithmetic is format-blind here too
            from .webp import encode_webp_animation

            frames = [
                (
                    0, 0, w, h,
                    [
                        bytes(
                            ((x + y + doc_id + f + c) % 256)
                            for x in range(w)
                            for c in range(4)
                        )
                        for y in range(h)
                    ],
                )
                for f in range(nf)
            ]
            return "image", encode_webp_animation(
                w, h, frames, subtract_green=bool(doc_id % 24 == 8)
            )
        n_colors = len(_SYNTH_PALETTE) // 3
        frames = [
            bytes(((x + y + doc_id + f) % n_colors) for y in range(h) for x in range(w))
            for f in range(nf)
        ]
        return "image", encode_gif(w, h, frames, _SYNTH_PALETTE)
    if lane == 3:
        from .avi import encode_avi

        jf = [
            encode_jpeg(w, h, [bytes([(doc_id + 40 * f) % 256, 90, 150] * w)] * h)
            for f in range(nf)
        ]
        return "video", encode_avi(w, h, jf, fps=25)
    n_samples = 100 + doc_id % 50
    # the per-sample ramp both the PCM-WAV and FLAC lanes carry (the
    # ADPCM lane overrides it with the block-constant variant below) —
    # ONE statement of the formula the oracles depend on
    samples = [(doc_id * 31 + i * 7) % 65536 - 32768 for i in range(n_samples)]
    if lane == 4:
        if doc_id % 12 == 10:
            # IMA-ADPCM shares the WAV lane (doc_id % 12 == 10; PCM keeps
            # % 12 == 4): ADPCM is lossy in general, so the synth signal
            # is BLOCK-CONSTANT — each 9-sample block's value is stored
            # exactly in its block header and the all-zero nibbles that
            # follow decode to the same value (step 7 >> 3 == 0 at index
            # 0), so the decode is exact BY CONSTRUCTION and the oracle
            # replays every sample as a pure function of doc_id:
            #   sample[i] = (doc_id*31 + (i//9)*7) % 65536 - 32768
            from .wav import encode_wav_adpcm

            block = 9
            samples = [
                (doc_id * 31 + (i // block) * 7) % 65536 - 32768
                for i in range(n_samples)
            ]
            return "audio", encode_wav_adpcm(
                [samples], rate=16000, block_samples=block
            )
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(2)
            wv.setframerate(16000)
            wv.writeframes(
                b"".join(s.to_bytes(2, "little", signed=True) for s in samples)
            )
        return "audio", buf.getvalue()
    from .flac import encode_flac

    return "audio", encode_flac([samples], modes=("fixed2",), block_size=64)


def documents_as_encoded_media(documents: DataFrame) -> DataFrame:
    """Synthesize REAL media payloads (PNG/JPEG/GIF/AVI/WAV/FLAC via the in-repo
    codecs) from the documents table inside an Arrow-batched mapInPandas —
    the encode half of the codec round-trip query. Encoding happens in
    executor Python workers where the rows already are: no shuffle, no
    driver involvement, embarrassingly parallel exactly like the decode."""
    from ..shipping import ship_package

    ship_package(documents.sparkSession)
    ids = documents.select(F.col("doc_id").alias("media_id"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf["media_id"]:
                kind, payload = synth_media_payload(int(mid))
                out.append((int(mid), kind, payload))
            yield pd.DataFrame(
                out, columns=[f.name for f in SYNTH_MEDIA_SCHEMA.fields]
            )

    return ids.mapInPandas(fn, schema=SYNTH_MEDIA_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents table (UTF-8 payloads) —
    the deterministic stand-in used by tests and the oracle-checked query."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def sample_frames(df: DataFrame, every_n: int = 8, codec: str = "fake") -> DataFrame:
    """Frame-sampling plumbing for video rows: explode frame indexes
    (0, every_n, 2*every_n, ... < n_frames). With ``codec="real"`` the
    frame counts come from the real container parse (MJPEG AVI / animated
    GIF); the plan shape — explode then per-frame features — is what
    matters at scale."""
    feats = extract_features(df, codec=codec).filter(F.col("kind") == "video")
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("frame_bytes", LongType(), False),
    ]
)


def extract_frame_features(df: DataFrame, every_n: int = 8) -> DataFrame:
    """REAL per-frame decode for MJPEG-AVI video rows: every ``every_n``-th
    frame's JPEG payload is sliced out of the container and decoded inside
    one Arrow-batched mapInPandas pass — actual per-frame dimensions, no
    shuffle, the media bytes never leave the partition that holds them."""
    from ..shipping import ship_package

    ship_package(df.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avi import _movi_bounds, _video_chunks, is_avi
        from .jpeg import decode_jpeg

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                data = bytes(payload) if payload is not None else b""
                if not is_avi(data):
                    continue  # non-AVI video rows have no frame lane here
                start, end, _ = _movi_bounds(data)
                for i, (at, size) in enumerate(_video_chunks(data, start, end)):
                    if i % every_n:
                        continue
                    frame = decode_jpeg(data[at : at + size])
                    rows.append((mid, i, frame["width"], frame["height"], size))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.mapInPandas(fn, schema=FRAME_SCHEMA)


SEGMENT_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("seg_idx", LongType(), False),
        StructField("start_sample", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("sum_abs", LongType(), False),
        StructField("peak_abs", LongType(), False),
    ]
)


def sample_segments(df: DataFrame, window: int = 512, codec: str = "fake") -> DataFrame:
    """Segment-sampling plumbing for audio rows — the audio analog of
    ``sample_frames``: explode fixed-window segment indexes
    (0, 1, ..., ceil(n_frames / window) - 1). With ``codec="real"`` the
    sample counts come from the real container parse (WAV data-chunk size /
    FLAC STREAMINFO-verified decode)."""
    # n_frames >= 1: an empty-but-valid clip (n_frames = 0) has no
    # segments — without the guard, sequence(0, floor(-1/window)) would
    # DESCEND and emit bogus seg_idx rows 0 and -1
    feats = extract_features(df, codec=codec).filter(
        (F.col("kind") == "audio") & (F.col("n_frames") >= 1)
    )
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.col("n_frames") - 1) / F.lit(window)).cast("long"),
            )
        ).alias("seg_idx"),
    )


def extract_segment_features(df: DataFrame, window: int = 512) -> DataFrame:
    """REAL fixed-window audio segmentation for WAV / FLAC rows — the audio
    analog of ``extract_frame_features``: every ``window``-sample segment's
    stats come from the actual decoded samples, inside one Arrow-batched
    mapInPandas pass, no shuffle, media bytes never leave their partition.

    WAV segments are byte slices of the data chunk (uncompressed audio is
    random-access — ``operators.wav.wav_segment`` is the single-segment
    primitive); FLAC frames must be Rice-decoded in stream order to find
    their boundaries, so a row needing ALL its segments decodes once and
    windows the result (``operators.flac.flac_segment`` is the early-stop
    random-access primitive for single segments). Stats are integer-exact
    over ALL channels' interleaved samples: ``n_samples`` counts the
    values ``sum_abs``/``peak_abs`` aggregate ((hi - lo) * channels), so
    ``sum_abs / n_samples`` is a correct mean at any channel count, while
    ``start_sample`` and the window boundaries are per-channel FRAME
    positions. A SQL oracle can replay everything arithmetically."""
    from ..shipping import ship_package

    if window < 1:
        raise ValueError("window must be >= 1 sample")
    ship_package(df.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .flac import decode_flac, is_flac
        from .wav import _parse_container, _slice_frames, _total_frames, is_wav

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio":
                    continue
                data = bytes(payload) if payload is not None else b""
                if is_wav(data):
                    fmt, body = _parse_container(data)
                    total = _total_frames(fmt, body)

                    def seg_samples(lo: int, hi: int, _b=body, _f=fmt):
                        # byte slice for PCM/G.711; overlapping-blocks
                        # decode for IMA ADPCM (blocks are self-seeding)
                        return _slice_frames(_f, _b, lo, hi)

                elif is_flac(data):
                    a = decode_flac(data)  # full row needs every segment:
                    # one stream-order decode (MD5-verified), then window
                    ch, total, allsamp = a["channels"], a["n_frames"], a["samples"]

                    def seg_samples(lo: int, hi: int, _s=allsamp, _c=ch):
                        return _s[lo * _c : hi * _c]

                else:
                    # an audio-kind row whose payload matches no codec
                    # signature must fail LOUDLY (the extract_features
                    # contract), never silently vanish from the output
                    raise ValueError(
                        f"segments: audio payload for media_id {mid} matches "
                        "no in-repo codec signature (WAV/FLAC)"
                    )
                for si in range((total + window - 1) // window):
                    lo, hi = si * window, min(total, (si + 1) * window)
                    seg = seg_samples(lo, hi)
                    aseg = [abs(s) for s in seg]
                    # n_samples counts the VALUES the stats aggregate —
                    # (hi - lo) * channels interleaved samples — so
                    # mean = sum_abs / n_samples is right for any channel
                    # count; start_sample stays a per-channel frame index
                    rows.append(
                        (mid, si, lo, len(seg), sum(aseg), max(aseg))
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in SEGMENT_SCHEMA.fields]
            )

    return df.mapInPandas(fn, schema=SEGMENT_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("new_width", LongType(), False),
        StructField("new_height", LongType(), False),
    ]
)


RESAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("new_width", LongType(), False),
        StructField("new_height", LongType(), False),
        StructField("resized", BinaryType(), False),  # PNG re-encode
    ]
)


def _target_dims(w: int, h: int, max_w: int, max_h: int) -> tuple[int, int]:
    """Aspect-preserving integer target dims (the resize_images contract)."""
    if w <= max_w and h <= max_h:
        return w, h
    if w * max_h >= h * max_w:  # width-bound
        return max_w, max(1, (h * max_w) // w)
    return max(1, (w * max_h) // h), max_h


def resample_images(
    df: DataFrame, max_w: int = 320, max_h: int = 240
) -> DataFrame:
    """REAL aspect-preserving image resample — the formerly-stubbed pixel
    step, now in-repo end to end: decode (PNG / JPEG / lossless WebP /
    GIF via the in-repo codecs) -> nearest-neighbor resample
    (integer-exact floor mapping ``src[y*h//nh][x*w//nw]``, deterministic
    across runs and engines) -> re-encode as PNG, all inside one
    Arrow-batched mapInPandas pass, no shuffle, bytes partition-local.

    Nearest-neighbor keeps the contract bit-reproducible (no float
    filter); swapping in an area/bilinear kernel changes only the numpy
    expression, not the plan. Rows already inside the bounding box pass
    through resampled 1:1 (byte-identical pixels, fresh PNG container)."""
    import numpy as np

    from ..shipping import ship_package

    ship_package(df.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .gif import is_gif
        from .jpeg import decode_jpeg, is_jpeg
        from .png import decode_png, encode_png, is_png
        from .webp import decode_webp, is_webp

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                data = bytes(payload) if payload is not None else b""
                if is_png(data):
                    img = decode_png(data)
                elif is_jpeg(data):
                    img = decode_jpeg(data)
                elif is_webp(data):
                    img = decode_webp(data)
                elif is_gif(data):
                    from .gif import decode_gif

                    img = decode_gif(data)
                else:
                    # an image-kind row whose payload matches no codec
                    # signature must fail LOUDLY (the extract_features
                    # contract), never silently vanish from the output
                    raise ValueError(
                        f"resample: image payload for media_id {mid} matches "
                        "no in-repo codec signature (PNG/JPEG/WebP/GIF)"
                    )
                w, h, ch = img["width"], img["height"], img["channels"]
                nw, nh = _target_dims(w, h, max_w, max_h)
                px = np.frombuffer(
                    b"".join(img["pixels"]), dtype=np.uint8
                ).reshape(h, w, ch)
                ys = (np.arange(nh) * h) // nh
                xs = (np.arange(nw) * w) // nw
                out = px[ys][:, xs]
                color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
                resized = encode_png(
                    nw, nh,
                    [out[y].tobytes() for y in range(nh)],
                    color_type=color_type,
                )
                rows.append((mid, w, h, nw, nh, bytearray(resized)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESAMPLE_SCHEMA.fields]
            )

    return df.mapInPandas(fn, schema=RESAMPLE_SCHEMA)


PNG_SUM_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("new_width", LongType(), False),
        StructField("new_height", LongType(), False),
        StructField("pixel_sum", LongType(), False),
    ]
)


def decode_png_byte_sums(df: DataFrame, payload_col: str = "resized") -> DataFrame:
    """Decode PNG payloads and sum every pixel byte — the verification
    half of the resample round trip (a wrong resample, wrong floor
    mapping, or corrupt re-encode changes the sum). One Arrow pass."""
    from ..shipping import ship_package

    ship_package(df.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .png import decode_png

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                img = decode_png(bytes(payload))
                rows.append(
                    (
                        mid,
                        img["width"],
                        img["height"],
                        sum(sum(r) for r in img["pixels"]),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PNG_SUM_SCHEMA.fields]
            )

    return df.mapInPandas(fn, schema=PNG_SUM_SCHEMA)


AUDIO_RESAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("new_n_frames", LongType(), False),
        StructField("resampled", BinaryType(), False),  # 16-bit PCM WAV
    ]
)


def resample_audio(df: DataFrame, factor: int = 2) -> DataFrame:
    """REAL audio downsample — the audio analog of ``resample_images``:
    decode (PCM / G.711 / IMA-ADPCM WAV, FLAC via the in-repo codecs) ->
    integer-factor decimation (keep frames ``0, factor, 2*factor, ...``
    across all channels — exact, deterministic, no float filter) ->
    re-encode as 16-bit PCM WAV at ``rate // factor``, all inside one
    Arrow-batched mapInPandas pass, no shuffle, bytes partition-local.

    Plain decimation aliases (no low-pass) — the contract here is the
    bit-reproducible plumbing; swapping in a windowed-sinc kernel changes
    only the per-row numpy expression, not the plan. Non-audio rows are
    skipped (the lane is audio-only); an audio row matching no codec
    signature fails loudly."""
    from ..shipping import ship_package

    if factor < 1:
        raise ValueError("resample_audio: factor must be >= 1")
    ship_package(df.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        from .flac import decode_flac, is_flac
        from .wav import decode_wav, is_wav

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio":
                    continue
                data = bytes(payload) if payload is not None else b""
                if is_wav(data):
                    a = decode_wav(data)
                elif is_flac(data):
                    a = decode_flac(data)
                else:
                    raise ValueError(
                        f"resample: audio payload for media_id {mid} matches "
                        "no in-repo codec signature (WAV/FLAC)"
                    )
                ch, n = a["channels"], a["n_frames"]
                kept = [
                    a["samples"][i * ch + c]
                    for i in range(0, n, factor)
                    for c in range(ch)
                ]
                new_n = len(kept) // ch if ch else 0
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wv:
                    wv.setnchannels(ch)
                    wv.setsampwidth(2)
                    wv.setframerate(max(1, a["sample_rate"] // factor))
                    wv.writeframes(
                        b"".join(
                            s.to_bytes(2, "little", signed=True) for s in kept
                        )
                    )
                rows.append((mid, n, new_n, bytearray(buf.getvalue())))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_RESAMPLE_SCHEMA.fields]
            )

    return df.mapInPandas(fn, schema=AUDIO_RESAMPLE_SCHEMA)


WAV_SUM_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("new_n_frames", LongType(), False),
        StructField("sum_abs", LongType(), False),
        StructField("peak_abs", LongType(), False),
    ]
)


def decode_wav_sample_sums(df: DataFrame, payload_col: str = "resampled") -> DataFrame:
    """Decode WAV payloads and aggregate every sample — the verification
    half of the audio-resample round trip (a wrong decimation stride, a
    dropped channel, or a corrupt re-encode changes the stats). One
    Arrow pass."""
    from ..shipping import ship_package

    ship_package(df.sparkSession)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .wav import decode_wav

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                a = decode_wav(bytes(payload))
                aa = [abs(s) for s in a["samples"]]
                rows.append(
                    (mid, a["n_frames"], sum(aa), max(aa) if aa else 0)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAV_SUM_SCHEMA.fields]
            )

    return df.mapInPandas(fn, schema=WAV_SUM_SCHEMA)


def resize_images(
    df: DataFrame, max_w: int = 320, max_h: int = 240, codec: str = "fake"
) -> DataFrame:
    """Aspect-preserving resize plumbing for image rows (mapInPandas).

    Target-dimension math is INTEGER-ONLY (compare w*max_h vs h*max_w to
    pick the binding edge, then floor-divide) so it is bit-reproducible and
    oracle-checkable. This entry reports the dimension decisions only;
    ``resample_images`` is the full-pixel path (decode -> nearest-neighbor
    resample -> PNG re-encode, all in-repo). Same plan either way: one
    Arrow batch pass, no shuffle.
    """
    from ..shipping import ship_package

    ship_package(df.sparkSession)
    decode = _decode_fake if codec == "fake" else _decode_real

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "image":
                    continue
                d = decode(kind, payload if payload is not None else b"")
                w, h = d["width"], d["height"]
                nw, nh = _target_dims(w, h, max_w, max_h)
                rows.append((mid, w, h, nw, nh))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return df.mapInPandas(fn, schema=RESIZE_SCHEMA)

"""Cross-codec corruption fuzz: the loud-failure contract, uniformly.

Untrusted bytes reach every decoder straight from binary columns
(executor Python workers, no driver pre-validation). A corrupted payload
must either still decode (entropy streams can be coincidentally valid —
JPEG carries no integrity check at all) or raise the codec's TYPED
errors — never an IndexError/KeyError/ZeroDivisionError/struct.error
escaping to the Arrow worker, and never a hang. WebP got this fuzz when
it landed (tests/test_webp.py); this extends it to the other six codecs.
"""

from __future__ import annotations

import io
import random
import wave
import zlib

import pytest

from eth_event_stream_spark.operators.avi import decode_avi, encode_avi
from eth_event_stream_spark.operators.flac import decode_flac, encode_flac
from eth_event_stream_spark.operators.gif import decode_gif, encode_gif
from eth_event_stream_spark.operators.jpeg import decode_jpeg, encode_jpeg
from eth_event_stream_spark.operators.png import decode_png, encode_png
from eth_event_stream_spark.operators.wav import (
    decode_wav,
    encode_wav_adpcm,
    encode_wav_g711,
)

W, H = 14, 9
RGB = [bytes(((x * 11 + y * 7) % 256) for x in range(W * 3)) for y in range(H)]
PALETTE = bytes(i for i in range(256) for _ in range(3))
SAMPLES = [((i * 37) % 4000) - 2000 for i in range(300)]


def _wav_pcm(frames):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(b"".join(s.to_bytes(2, "little", signed=True) for s in frames))
    return buf.getvalue()


CASES = [
    ("png", decode_png, lambda: encode_png(W, H, RGB, color_type=2)),
    ("jpeg", decode_jpeg, lambda: encode_jpeg(W, H, RGB, quality=90)),
    (
        "jpeg_prog",
        decode_jpeg,
        lambda: encode_jpeg(W, H, RGB, quality=90, progressive=True),
    ),
    (  # 1-component: the non-interleaved scan path has its own lookups
        "jpeg_gray",
        decode_jpeg,
        lambda: encode_jpeg(
            W, H,
            [bytes(((x * 11 + y * 7) % 256) for x in range(W)) for y in range(H)],
            channels=1, quality=90, restart_interval=2,
        ),
    ),
    (
        "gif",
        decode_gif,
        lambda: encode_gif(
            W, H, [bytes((x + y) % 256 for y in range(H) for x in range(W))], PALETTE
        ),
    ),
    (
        "avi",
        decode_avi,
        lambda: encode_avi(W, H, [encode_jpeg(W, H, RGB)] * 3, fps=25),
    ),
    ("wav_pcm", decode_wav, lambda: _wav_pcm(SAMPLES)),
    ("wav_g711", decode_wav, lambda: encode_wav_g711(SAMPLES, law="alaw")),
    (  # block-based geometry: header/fact/nibble-group corruption paths
        "wav_adpcm",
        decode_wav,
        lambda: encode_wav_adpcm([SAMPLES], block_samples=33),
    ),
    (
        "flac",
        decode_flac,
        lambda: encode_flac([SAMPLES], modes=("fixed2",), block_size=64),
    ),
]


@pytest.mark.parametrize("name,decode,make", CASES, ids=[c[0] for c in CASES])
def test_single_byte_corruptions_fail_loudly(name, decode, make):
    payload = make()
    decode(payload)  # sanity: the pristine payload decodes
    rnd = random.Random(zlib.crc32(name.encode()))  # stable: str hash is salted per process
    for _ in range(150):
        data = bytearray(payload)
        at = rnd.randrange(len(data))
        data[at] ^= 1 << rnd.randrange(8)
        try:
            decode(bytes(data))
        except (ValueError, NotImplementedError):
            pass  # the loud-failure contract; anything else propagates

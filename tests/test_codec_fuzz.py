"""Decoder robustness: malformed/truncated/corrupted blobs must raise
ValueError or NotImplementedError — never struct.error, IndexError, or a
stdlib module's internal exception. A real 100 TB corpus contains garbage
blobs; one of them must not kill the whole mapInPandas stage with an
unexpected exception type (callers catch the two documented types)."""

from __future__ import annotations

import numpy as np
import pytest

from roapi_spark.functions.multimodal import (
    decode_audio,
    decode_image,
    decode_video,
    encode_bmp,
    encode_g711_wav,
    encode_gif,
    encode_png,
    encode_tiff,
    encode_wav,
)

OK = (ValueError, NotImplementedError)


def _corruptions(whole: bytes, rng, n, keep_magic: int):
    """Truncations + random byte flips that preserve the format magic."""
    out = []
    for _ in range(n):
        b = bytearray(whole)
        for _ in range(3):
            b[int(rng.integers(keep_magic, len(b)))] = int(rng.integers(0, 256))
        out.append(bytes(b[: int(rng.integers(keep_magic, len(b) + 1))]))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_image_decoders_fail_closed(seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    cases = []
    for magic in (
        b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM", b"P6", b"P5",
        b"II*\x00", b"MM\x00*", b"\xff\xd8",
    ):
        cases += [magic + rng.bytes(int(rng.integers(0, 80))) for _ in range(200)]
    for whole, keep in [
        (encode_png(img), 8),
        (encode_gif(img), 6),
        (encode_gif(img, interlace=True), 6),
        (encode_bmp(img), 2),
        (encode_tiff(img), 4),
        (encode_tiff(img, big_endian=True), 4),
        (encode_tiff(img, compression="lzw", predictor=2), 4),
        (encode_tiff(img, compression="packbits"), 4),
    ]:
        cases += _corruptions(whole, rng, 200, keep)
    for blob in cases:
        try:
            decode_image(blob)
        except OK:
            pass  # the contract: these two types only


@pytest.mark.parametrize("seed", [0, 1])
def test_audio_video_decoders_fail_closed(seed):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-3000, 3000, size=100, dtype=np.int16)
    cases = [b"RIFF" + rng.bytes(int(rng.integers(0, 60))) for _ in range(200)]
    cases += [b"FORM" + rng.bytes(int(rng.integers(0, 60))) for _ in range(200)]
    cases += _corruptions(encode_wav(8000, pcm), rng, 200, 4)
    cases += _corruptions(encode_g711_wav(8000, pcm), rng, 200, 4)
    for blob in cases:
        try:
            decode_audio(blob)
        except OK:
            pass
    vid_cases = [b"FVID", b"FVID" + rng.bytes(10)]
    vid_cases += [
        b"RIFF" + rng.bytes(4) + b"AVI " + rng.bytes(int(rng.integers(0, 60)))
        for _ in range(100)
    ]
    for blob in vid_cases:
        try:
            decode_video(blob)
        except OK:
            pass

"""Baseline JPEG codec (functions/jpeg.py): round trips through the
real encode->decode chain, feature coverage (AC coefficients, chroma
subsampling, restart markers, 16-bit quant tables), dispatch through
decode_image/decode_video, and the fail-closed fuzz contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from roapi_spark.functions.jpeg import (
    decode_avi_mjpeg,
    decode_jpeg,
    encode_avi_mjpeg,
    encode_jpeg,
)
from roapi_spark.functions.multimodal import decode_image, decode_video

OK = (ValueError, NotImplementedError)


def _mosaic(rng, bh, bw):
    blocks = rng.integers(0, 256, size=(bh, bw), dtype=np.uint8)
    return np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_block_constant_gray_roundtrips_exactly(seed):
    rng = np.random.default_rng(seed)
    img = _mosaic(rng, 3, 4)
    out = decode_jpeg(encode_jpeg(img))
    assert np.array_equal(out, img)


@pytest.mark.parametrize(
    "shape", [(8, 8), (13, 21), (24, 40), (1, 1), (9, 64)]
)
def test_arbitrary_gray_within_dct_rounding(shape):
    """Quant=1: the only loss is forward-DCT coefficient rounding; the
    reconstruction must stay within +-2 of the source (AC Huffman path,
    ZRL, EOB, odd dimensions / edge padding all exercised)."""
    rng = np.random.default_rng(hash(shape) % 2**31)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_restart_markers_reset_dc_prediction():
    rng = np.random.default_rng(7)
    img = _mosaic(rng, 4, 5)
    for ri in (1, 2, 3, 7):
        blob = encode_jpeg(img, restart_interval=ri)
        assert b"\xff\xdd" in blob  # DRI present
        assert np.array_equal(decode_jpeg(blob), img)


def test_quant_table_roundtrip_and_error_bound():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    q = np.full((8, 8), 16, dtype=np.int64)
    out = decode_jpeg(encode_jpeg(img, quant=q))
    # quantization step q bounds per-coefficient error by q/2; loose
    # pixel-domain bound: well under the 8*q worst case, sanity only
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 64


@pytest.mark.parametrize("subsample", [(1, 1), (2, 1), (1, 2), (2, 2)])
def test_color_ycbcr_subsampling(subsample):
    """Constant-color image: chroma subsampling is lossless for constant
    planes, so gray output must equal (r+g+b)//3 of the (YCbCr-rounded)
    source within the conversion's rounding (+-2)."""
    rgb = np.zeros((16, 24, 3), dtype=np.uint8)
    rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2] = 200, 100, 50
    out = decode_jpeg(encode_jpeg(rgb, subsample=subsample))
    want = int(rgb[0, 0].astype(np.uint32).sum() // 3)
    assert out.shape == (16, 24)
    assert np.abs(out.astype(int) - want).max() <= 2


def test_color_444_tracks_source_gray():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, subsample=(1, 1)))
    gray = rgb.astype(np.uint32).sum(axis=2) // 3
    assert np.abs(out.astype(int) - gray.astype(int)).max() <= 4


def test_decode_image_dispatches_jpeg():
    img = np.full((8, 8), 77, dtype=np.uint8)
    assert np.array_equal(decode_image(encode_jpeg(img)), img)


def test_app_and_comment_segments_skipped():
    img = np.full((8, 8), 10, dtype=np.uint8)
    blob = encode_jpeg(img)
    # splice a COM and an APP13 segment right after SOI
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    app = b"\xff\xed" + struct.pack(">H", 6) + b"meta"
    spliced = blob[:2] + com + app + blob[2:]
    assert np.array_equal(decode_jpeg(spliced), img)


def test_lossless_and_arithmetic_gate():
    img = np.full((8, 8), 10, dtype=np.uint8)
    blob = bytearray(encode_jpeg(img))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC3  # SOF0 -> SOF3 lossless
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(bytes(blob))
    blob[i + 1] = 0xC9  # arithmetic
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(blob))
    # SOF2 mislabel over a baseline full-band scan: malformed, not gated
    blob[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob))


def test_truncation_and_garbage_fail_closed():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    whole = encode_jpeg(img)
    cases = [whole[:k] for k in range(2, len(whole), 3)]
    cases += [b"\xff\xd8" + rng.bytes(int(rng.integers(0, 60))) for _ in range(300)]
    for _ in range(300):
        b = bytearray(whole)
        for _ in range(3):
            b[int(rng.integers(2, len(b)))] = int(rng.integers(0, 256))
        cases.append(bytes(b))
    decoded = 0
    for blob in cases:
        try:
            decode_jpeg(blob)
            decoded += 1
        except OK:
            pass  # contract: only these two types
    assert decoded < len(cases)  # most corruptions must actually fail


# ------------------------------------------------------------ AVI/MJPEG


def test_avi_mjpeg_roundtrip_exact():
    rng = np.random.default_rng(13)
    blocks = rng.integers(0, 256, size=(5, 2, 3), dtype=np.uint8)
    frames = np.repeat(np.repeat(blocks, 8, axis=1), 8, axis=2)
    blob = encode_avi_mjpeg(frames, fps=25)
    assert np.array_equal(decode_avi_mjpeg(blob), frames)
    # and through the multimodal dispatch
    assert np.array_equal(decode_video(blob), frames)


def test_avi_frame_dim_mismatch_fails():
    a = encode_jpeg(np.full((8, 8), 1, dtype=np.uint8))
    b = encode_jpeg(np.full((16, 8), 2, dtype=np.uint8))

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", a) + chunk(b"00dc", b))
    riff = b"RIFF" + struct.pack("<I", 4 + len(movi)) + b"AVI " + movi
    with pytest.raises(ValueError, match="dimensions"):
        decode_avi_mjpeg(riff)


def test_avi_fail_closed():
    rng = np.random.default_rng(17)
    frames = np.repeat(
        np.repeat(rng.integers(0, 256, size=(2, 2, 2), dtype=np.uint8), 8, axis=1),
        8, axis=2,
    )
    whole = encode_avi_mjpeg(frames)
    cases = [whole[:k] for k in range(0, len(whole), 7)]
    cases += [
        b"RIFF" + struct.pack("<I", 99) + b"AVI " + rng.bytes(20)
        for _ in range(50)
    ]
    for _ in range(200):
        b = bytearray(whole)
        for _ in range(3):
            b[int(rng.integers(12, len(b)))] = int(rng.integers(0, 256))
        cases.append(bytes(b))
    for blob in cases:
        try:
            decode_avi_mjpeg(blob)
        except OK:
            pass
        # dispatch path too: decode_video must keep the same contract
        try:
            decode_video(blob)
        except OK:
            pass


# ------------------------------------------------------------ progressive


def test_progressive_block_constant_exact():
    rng = np.random.default_rng(21)
    img = _mosaic(rng, 3, 4)
    from roapi_spark.functions.jpeg import encode_jpeg_progressive

    blob = encode_jpeg_progressive(img)
    assert b"\xff\xc2" in blob  # SOF2
    assert np.array_equal(decode_jpeg(blob), img)
    assert np.array_equal(decode_image(blob), img)  # dispatch too


@pytest.mark.parametrize(
    "shape", [(8, 8), (13, 21), (24, 40), (1, 1), (9, 64), (40, 56)]
)
def test_progressive_equals_baseline_gray(shape):
    """Progressive scans (DC first Al=1, DC refine, per-comp AC spectral
    + refinement with EOBRUN) accumulate to the SAME coefficients as the
    sequential scan, so the decoded pixels must be identical. (Spec
    interop — which this self-consistency check cannot prove — is pinned
    separately by the independently-constructed known-answer bitstreams
    in tests/test_codec_interop.py.)"""
    from roapi_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(hash(shape) % 2**31)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("subsample", [(2, 2), (1, 1), (2, 1), (1, 2)])
def test_progressive_equals_baseline_color(subsample):
    from roapi_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(31)
    rgb = rng.integers(0, 256, size=(19, 29, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(rgb, subsample=subsample))
    prog = decode_jpeg(encode_jpeg_progressive(rgb, subsample=subsample))
    assert np.array_equal(base, prog)


def test_progressive_quantized_long_eob_runs():
    """Quantization sparsifies AC -> long EOB runs with EOBn>0 symbols
    and pending correction bits in the refinement scan."""
    from roapi_spark.functions.jpeg import encode_jpeg_progressive

    q = np.full((8, 8), 16, dtype=np.int64)
    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    smooth = (
        (128 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 7.0))
        .clip(0, 255)
        .astype(np.uint8)
    )
    base = decode_jpeg(encode_jpeg(smooth, quant=q))
    prog = decode_jpeg(encode_jpeg_progressive(smooth, quant=q))
    assert np.array_equal(base, prog)


def test_progressive_fail_closed():
    from roapi_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    whole = encode_jpeg_progressive(img)
    cases = [whole[:k] for k in range(2, len(whole), 5)]
    for _ in range(400):
        b = bytearray(whole)
        for _ in range(3):
            b[int(rng.integers(2, len(b)))] = int(rng.integers(0, 256))
        cases.append(bytes(b))
    for blob in cases:
        try:
            decode_jpeg(blob)
        except OK:
            pass  # ValueError / NotImplementedError only


def test_avi_zero_length_dropped_frame_chunks_skipped():
    """Zero-length '00dc' chunks are the standard AVI dropped-frame
    placeholder (capture tools keep audio sync with them) — the demuxer
    must skip them, not fail the whole file."""
    a = encode_jpeg(np.full((8, 8), 3, dtype=np.uint8))
    b = encode_jpeg(np.full((8, 8), 9, dtype=np.uint8))

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    movi = chunk(
        b"LIST",
        b"movi" + chunk(b"00dc", a) + chunk(b"00dc", b"") + chunk(b"00dc", b),
    )
    riff = b"RIFF" + struct.pack("<I", 4 + len(movi)) + b"AVI " + movi
    out = decode_avi_mjpeg(riff)
    assert out.shape == (2, 8, 8)
    assert out[0, 0, 0] == 3 and out[1, 0, 0] == 9


# ------------------------------------------------------------ pHash


def test_phash_properties():
    """pHash invariants: identical pixels -> identical hash; constant
    brightness shift -> at most the DC bit differs; structural change
    -> many bits differ; 32-multiple dims take the area-mean path and
    others the nearest path without error."""
    from roapi_spark.functions.multimodal import phash64

    rng = np.random.default_rng(3)
    img = rng.integers(0, 200, size=(48, 24), dtype=np.uint8)
    h1, h2 = phash64(img), phash64(img.copy())
    assert h1 == h2
    shifted = np.clip(img.astype(np.int64) + 40, 0, 255).astype(np.uint8)
    assert bin(h1 ^ phash64(shifted)).count("1") <= 1  # DC bit only
    other = rng.integers(0, 200, size=(48, 24), dtype=np.uint8)
    assert bin(h1 ^ phash64(other)).count("1") >= 10
    assert isinstance(phash64(rng.integers(0, 255, size=(64, 32), dtype=np.uint8)), int)
    small = phash64(rng.integers(0, 255, size=(5, 7), dtype=np.uint8))
    assert 0 <= small < 1 << 64
    with pytest.raises(ValueError):
        phash64(np.zeros((0, 4), dtype=np.uint8))


def test_progressive_restart_intervals():
    """RSTn inside progressive scans: DC predictor and EOB-run state
    reset at each boundary (EOB runs may not cross one, T.81 G.1.2.2);
    decode must still equal baseline exactly."""
    from roapi_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(51)
    img = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    for ri in (1, 2, 3, 7):
        blob = encode_jpeg_progressive(img, restart_interval=ri)
        assert b"\xff\xdd" in blob
        assert np.array_equal(decode_jpeg(blob), base), ri
    rgb = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(rgb)),
        decode_jpeg(encode_jpeg_progressive(rgb, restart_interval=2)),
    )


def test_16bit_quant_table_decodes():
    """DQT with Pq=1 (16-bit entries): rewrite an encoded stream's 8-bit
    table into the 16-bit form — decode must be identical."""
    from roapi_spark.functions.jpeg import ZIGZAG

    img = np.random.default_rng(61).integers(0, 256, size=(16, 24), dtype=np.uint8)
    q = np.full((8, 8), 3, dtype=np.int64)
    blob = encode_jpeg(img, quant=q)
    i = blob.index(b"\xff\xdb")
    # old segment: marker(2) + len(2) + PqTq(1) + 64 bytes
    old_end = i + 4 + 1 + 64
    wide = q.reshape(64)[ZIGZAG].astype(">u2").tobytes()
    seg = b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128) + bytes([0x10]) + wide
    patched = blob[:i] + seg + blob[old_end:]
    assert np.array_equal(decode_jpeg(patched), decode_jpeg(blob))

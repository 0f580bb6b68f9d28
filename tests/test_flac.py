"""FLAC codec (functions/flac.py): lossless round trips through every
subframe type and stereo decorrelation mode, CRC/MD5 integrity
enforcement, dispatch through decode_audio, fail-closed fuzz."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from roapi_spark.functions.flac import decode_flac, encode_flac
from roapi_spark.functions.multimodal import decode_audio

OK = (ValueError, NotImplementedError)


@pytest.mark.parametrize("mode", ["fixed", "verbatim", "lpc2"])
def test_mono_roundtrip_subframe_modes(mode):
    rng = np.random.default_rng(hash(mode) % 2**31)
    pcm = rng.integers(-3000, 3000, size=9000, dtype=np.int16)
    rate, out = decode_flac(encode_flac(16000, pcm, subframe_mode=mode))
    assert rate == 16000 and np.array_equal(out, pcm)


def test_constant_subframe():
    pcm = np.full(5000, -123, dtype=np.int16)
    blob = encode_flac(8000, pcm)
    rate, out = decode_flac(blob)
    assert np.array_equal(out, pcm)
    # constant frames are tiny: far below 2 bytes/sample
    assert len(blob) < 2 * len(pcm) // 10


def test_fixed_predictors_actually_compress():
    t = np.arange(50000)
    sm = (3000 * np.sin(t / 30.0) + 500 * np.sin(t / 7.0)).astype(np.int16)
    blob = encode_flac(22050, sm)
    assert len(blob) < 2 * len(sm) * 0.5  # < half of raw PCM
    rate, out = decode_flac(blob)
    assert rate == 22050 and np.array_equal(out, sm)


@pytest.mark.parametrize("mode", ["lr", "ms", "ls", "rs"])
def test_stereo_decorrelation_roundtrip(mode):
    rng = np.random.default_rng(5)
    l = rng.integers(-20000, 20000, size=9000, dtype=np.int16)
    r = (l // 2 + rng.integers(-100, 100, size=9000)).astype(np.int16)
    st = np.stack([l, r], axis=1)
    rate, out = decode_flac(encode_flac(44100, st, stereo_mode=mode))
    assert out.shape == (9000, 2) and np.array_equal(out, st)


@pytest.mark.parametrize("mode", ["lr", "ms", "ls", "rs"])
def test_stereo_extreme_samples(mode):
    ext = np.array([32767, -32768] * 300, dtype=np.int16)
    st = np.stack([ext, (-ext - 1).astype(np.int16)], axis=1)
    rate, out = decode_flac(encode_flac(8000, st, stereo_mode=mode))
    assert np.array_equal(out, st)


def test_non_multiple_final_block_and_tiny_inputs():
    rng = np.random.default_rng(7)
    for n in (1, 2, 5, 4095, 4097):
        pcm = rng.integers(-500, 500, size=n, dtype=np.int16)
        rate, out = decode_flac(encode_flac(8000, pcm))
        assert np.array_equal(out, pcm), n


def test_decode_audio_dispatch_picks_channel0():
    l = np.arange(-100, 100, dtype=np.int16)
    r = np.full(200, 999, dtype=np.int16)
    blob = encode_flac(12000, np.stack([l, r], axis=1), stereo_mode="ms")
    rate, mono = decode_audio(blob)
    assert rate == 12000 and np.array_equal(mono, l)


def test_crc_and_md5_integrity_enforced():
    pcm = np.arange(-2000, 2000, dtype=np.int16)
    blob = bytearray(encode_flac(8000, pcm))
    # flip a byte in the last frame's audio data: frame CRC-16 (or MD5)
    # must catch it — silent corruption is the failure mode FLAC's
    # layered checks exist to prevent
    blob[-10] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


def test_streaminfo_md5_checked():
    pcm = np.arange(-2000, 2000, dtype=np.int16)
    blob = bytearray(encode_flac(8000, pcm))
    # corrupt the stored MD5 itself (bytes 4+4+18 .. +34 of STREAMINFO)
    blob[4 + 4 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(blob))


def test_unsupported_depth_gates():
    pcm = np.arange(100, dtype=np.int16)
    blob = bytearray(encode_flac(8000, pcm))
    # STREAMINFO packed field: bits-per-sample lives in the 8-byte block
    # at offset 4+4+10; patch 16 -> 24 bits
    packed = int.from_bytes(blob[18:26], "big")
    packed = (packed & ~(0x1F << 36)) | ((24 - 1) << 36)
    blob[18:26] = packed.to_bytes(8, "big")
    with pytest.raises(NotImplementedError, match="libflac"):
        decode_flac(bytes(blob))


def test_flac_fail_closed_fuzz():
    rng = np.random.default_rng(11)
    pcm = rng.integers(-3000, 3000, size=2000, dtype=np.int16)
    whole = encode_flac(8000, pcm)
    cases = [whole[:k] for k in range(4, len(whole), 17)]
    cases += [b"fLaC" + rng.bytes(int(rng.integers(0, 80))) for _ in range(300)]
    for _ in range(400):
        b = bytearray(whole)
        for _ in range(3):
            b[int(rng.integers(4, len(b)))] = int(rng.integers(0, 256))
        cases.append(bytes(b))
    survived = 0
    for blob in cases:
        try:
            decode_flac(blob)
            survived += 1
        except OK:
            pass  # the contract: only these two types
        try:
            decode_audio(blob)
        except OK:
            pass
    # CRC-8 + CRC-16 + MD5 layering: corruption essentially never
    # decodes silently
    assert survived < len(cases) // 50


def test_frame_number_utf8_coding_past_2048():
    """Review finding: the UTF-8 width threshold was wrong for frames
    2048..16383 (3-byte codings). Tiny blocks force thousands of
    frames; the stream must round-trip and stay CRC-clean."""
    pcm = np.arange(-15000, 15000, 7, dtype=np.int16)  # ~4286 samples
    blob = encode_flac(8000, pcm, block_size=2)  # >2048 frames
    rate, out = decode_flac(blob)
    assert np.array_equal(out, pcm)


def test_lpc2_short_final_block_downgrades():
    pcm = np.arange(4097, dtype=np.int16)
    rate, out = decode_flac(encode_flac(8000, pcm, subframe_mode="lpc2"))
    assert np.array_equal(out, pcm)


def test_unknown_total_samples_decodes_to_eof():
    """STREAMINFO total_samples=0 is spec-legal 'unknown' (streamed
    FLAC): decode every frame present instead of none."""
    pcm = np.arange(-2000, 2000, dtype=np.int16)
    b = bytearray(encode_flac(8000, pcm))
    packed = int.from_bytes(b[18:26], "big") & ~((1 << 36) - 1)
    b[18:26] = packed.to_bytes(8, "big")
    b[26:42] = b"\x00" * 16  # md5 unknown
    rate, out = decode_flac(bytes(b))
    assert np.array_equal(out, pcm)


def test_input_shape_validation():
    rate, out = decode_flac(
        encode_flac(8000, np.arange(50, dtype=np.int16).reshape(-1, 1))
    )
    assert out.shape == (50,)  # (n,1) is mono
    with pytest.raises(ValueError, match="stereo"):
        encode_flac(8000, np.zeros((10, 3), dtype=np.int16))


def test_residual_escape_partition_roundtrip_vec_and_scalar():
    """The raw-escape partition (k=15 sentinel) is unreachable from
    16-bit PCM through encode_flac (orders bound residuals under 2^21),
    but external streams can carry it — pin the writer/reader pair
    directly, through BOTH the vectorized cache path and the scalar
    fallback."""
    import numpy as np

    from roapi_spark.functions.flac import (
        _BitReader,
        _BitWriter,
        _read_residual,
        _rice_fold,
    )

    res = np.array([2**29, -(2**29), 5, -7, 0, 123456789], dtype=np.int64)
    assert int(_rice_fold(res).max()).bit_length() > 30  # forces escape
    bw = _BitWriter()
    from roapi_spark.functions.flac import _write_residual

    _write_residual(bw, res, block=len(res), order=0)
    bw.align()
    blob = bw.bytes()
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    cache = (bits, np.flatnonzero(bits).astype(np.int64))
    got_vec = _read_residual(_BitReader(blob, 0, cache=cache), len(res), 0)
    got_scalar = _read_residual(_BitReader(blob, 0), len(res), 0)
    assert np.array_equal(got_vec, res)
    assert np.array_equal(got_scalar, res)


def test_residual_rice_vec_equals_scalar_random():
    """Property: for random residual blocks, the vectorized Rice decode
    and the scalar reader produce identical arrays (and both invert the
    writer)."""
    import numpy as np

    from roapi_spark.functions.flac import (
        _BitReader,
        _BitWriter,
        _read_residual,
        _write_residual,
    )

    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(1, 300))
        scale = int(rng.choice([1, 3, 40, 900, 20000]))
        res = rng.integers(-scale, scale + 1, n).astype(np.int64)
        order = int(rng.integers(0, min(4, n - 1) + 1)) if n > 1 else 0
        bw = _BitWriter()
        _write_residual(bw, res, block=n + order, order=order)
        bw.align()
        blob = bw.bytes()
        bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
        cache = (bits, np.flatnonzero(bits).astype(np.int64))
        got_vec = _read_residual(_BitReader(blob, 0, cache=cache), n + order, order)
        got_scalar = _read_residual(_BitReader(blob, 0), n + order, order)
        assert np.array_equal(got_vec, got_scalar), f"trial {trial}"
        assert np.array_equal(got_vec, res), f"trial {trial}"


def test_residual_escape_too_wide_raises():
    """Residuals needing > 31 raw bits cannot be represented in FLAC's
    5-bit escape width field — the writer must refuse, not truncate."""
    import numpy as np
    import pytest as _pytest

    from roapi_spark.functions.flac import _BitWriter, _write_residual

    res = np.array([2**31, 1], dtype=np.int64)  # needs 33 signed bits
    with _pytest.raises(ValueError, match="caps at 31"):
        _write_residual(_BitWriter(), res, block=len(res), order=0)

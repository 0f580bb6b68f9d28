"""WebP lossless / VP8L codec (functions/webp.py): bit-exact round
trips through literals, LZ77 refs, the color cache, all four transforms
(incl. every predictor mode and sub-byte palette packing), a hand-built
meta-Huffman stream, container gating, and fail-closed fuzz."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from roapi_spark.functions.multimodal import decode_image
from roapi_spark.functions.webp import decode_webp, encode_webp

OK = (ValueError, NotImplementedError)


def _gray_of(rgb):
    return (rgb.astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)


def test_gray_and_rgb_literals():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(img)), img)
    rgb = rng.integers(0, 256, size=(11, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(rgb)), _gray_of(rgb))


def test_dispatch_through_decode_image():
    img = np.full((8, 8), 42, dtype=np.uint8)
    assert np.array_equal(decode_image(encode_webp(img)), img)


def test_lz77_refs_and_color_cache():
    rng = np.random.default_rng(1)
    blocks = rng.integers(0, 4, size=(4, 5), dtype=np.uint8) * 60
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    lit = encode_webp(img)
    lz = encode_webp(img, use_lz77=True)
    assert len(lz) < len(lit) // 2  # backward refs genuinely compress
    assert np.array_equal(decode_webp(lz), img)
    assert np.array_equal(decode_webp(encode_webp(img, cache_bits=4)), img)
    assert np.array_equal(
        decode_webp(encode_webp(img, use_lz77=True, cache_bits=6)), img
    )


def test_subtract_green_transform():
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, size=(9, 9, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_webp(encode_webp(rgb, subtract_green=True)), _gray_of(rgb)
    )


def test_predictor_transform_all_14_modes():
    """The encoder cycles tile modes 0..13, so one image exercises the
    whole predictor table through the shared _predict_pixel."""
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(19, 30, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_webp(encode_webp(rgb, predictor=True)), _gray_of(rgb)
    )


def test_color_transform():
    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_webp(encode_webp(rgb, color_transform=True)), _gray_of(rgb)
    )


def test_stacked_transforms_with_lz77():
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    blob = encode_webp(
        rgb, color_transform=True, predictor=True, subtract_green=True,
        use_lz77=True,
    )
    assert np.array_equal(decode_webp(blob), _gray_of(rgb))


@pytest.mark.parametrize("ncolors", [2, 3, 4, 9, 16, 17, 40, 250])
def test_palette_all_packing_classes(ncolors):
    """Color-indexing transform: palettes of <=2/<=4/<=16 colors pack
    8/4/2 indices per byte; larger ones stay unpacked."""
    rng = np.random.default_rng(100 + ncolors)
    vals = rng.choice(256, size=ncolors, replace=False).astype(np.uint8)
    img = vals[rng.integers(0, ncolors, size=(10, 23))]
    blob = encode_webp(img, palette=True)
    assert np.array_equal(decode_webp(blob), img)


def test_meta_huffman_handbuilt():
    """Two Huffman groups selected by a meta image: left tile's group
    emits only pixel value 11, right tile's only 77 (single-symbol
    trees are zero bits, so the stream is all structure — decoding the
    right split proves the tile->group indirection works)."""
    from roapi_spark.functions.webp import _LSBWriter, _write_code_lengths

    w = h = 16  # two 8-pixel tiles horizontally at meta_bits=3
    bw = _LSBWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta-Huffman present
    bw.write(3 - 2, 3)  # meta_bits = 3 -> 8x8 tiles -> 2x2 meta image
    # meta image (2 wide, 2 high): group = red<<8 | green; groups 0,1
    # per column — encode as literal stream (no cache bit=0, 5 trees)
    bw.write(0, 1)  # meta image: no color cache
    # trees for the meta image: green has symbols {0,1}; others single 0
    two = [0] * 256
    two[0] = two[1] = 1
    one = [0] * 256
    one[0] = 1
    dist_one = [0] * 40
    dist_one[0] = 1
    for lengths in ([*two, *[0] * 24], one, one, one, dist_one):
        # green alphabet is 256+24 (no cache)
        _write_code_lengths(bw, lengths)
    # four meta pixels: groups 0,1 / 0,1 (canonical: sym0 code=0, sym1 code=1)
    for g in (0, 1, 0, 1):
        bw.write(g, 1)
    # two groups' trees for the main image
    for val in (11, 77):
        lit = [0] * 256
        lit[val] = 1
        g_len = [0] * (256 + 24)
        g_len[val] = 1
        for lengths in (g_len, lit, lit, lit, dist_one):
            _write_code_lengths(bw, lengths)
    # pixels: every tree is single-symbol -> zero data bits needed
    payload = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff_body = b"WEBP" + chunk
    blob = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body

    out = decode_webp(blob)
    assert out.shape == (16, 16)
    assert np.all(out[:, :8] == 11) and np.all(out[:, 8:] == 77)


def test_lossy_vp8_gates_on_libwebp():
    blob = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + b"\x00" * 12
    with pytest.raises(NotImplementedError, match="libwebp"):
        decode_webp(blob)


def test_fail_closed_fuzz():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(12, 18), dtype=np.uint8)
    whole = encode_webp(img, use_lz77=True, cache_bits=3)
    cases = [whole[:k] for k in range(4, len(whole), 7)]
    cases += [
        b"RIFF" + struct.pack("<I", 40) + b"WEBPVP8L"
        + struct.pack("<I", 30) + rng.bytes(30)
        for _ in range(200)
    ]
    for _ in range(400):
        b = bytearray(whole)
        for _ in range(3):
            b[int(rng.integers(12, len(b)))] = int(rng.integers(0, 256))
        cases.append(bytes(b))
    for blob in cases:
        try:
            decode_webp(blob)
        except OK:
            pass  # contract: these two types only
        try:
            decode_image(blob)
        except OK:
            pass


def test_uniform_image_with_cache_review_regression():
    """Review finding: the simple tree form truncated symbols >=256 to
    8 bits, silently corrupting uniform images whose green tree is
    {literal, cache-hit} — the lossless invariant must hold."""
    img = np.full((8, 8), 42, dtype=np.uint8)
    for kw in ({"cache_bits": 4}, {"cache_bits": 4, "use_lz77": True},
               {"use_lz77": True}):
        out = decode_webp(encode_webp(img, **kw))
        assert np.array_equal(out, img), kw


def test_build_lengths_always_complete():
    """Review finding: the Kraft repair could end with an INCOMPLETE
    code the decoder rejects; fibonacci-skewed frequencies at the CLC's
    maxlen=7 hit it."""
    from roapi_spark.functions.webp import _Huffman, _build_lengths

    fib = [1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233]
    for maxlen in (7, 15):
        lengths = _build_lengths(dict(enumerate(fib)), 19, maxlen=maxlen)
        _Huffman(lengths)  # raises if over-subscribed or incomplete
        assert max(lengths) <= maxlen


def test_rightmost_column_topright_wraps():
    """Review finding (spec interop): TR for the rightmost column is
    the CURRENT row's leftmost pixel (flat i - width + 1), not zero —
    a libwebp stream using mode 3 tiles decodes wrong otherwise."""
    from roapi_spark.functions.webp import _predict_pixel

    argb = np.zeros((3, 4, 4), dtype=np.uint8)
    argb[1, 0] = (255, 9, 9, 9)
    argb[0, :] = (255, 1, 2, 3)
    pred = _predict_pixel(argb, 1, 3, 3)  # mode 3 = top-right
    assert tuple(pred) == (255, 9, 9, 9)  # argb[1, 0], not zeros


def test_clamp_add_subtract_half_truncates_toward_zero():
    """Review finding (spec interop): mode 13 uses C truncation, not
    floor — a=10,c=13 must give 10 + trunc(-3/2) = 9, not 8."""
    from roapi_spark.functions.webp import _clamp_add_subtract_half

    a = np.array([10], dtype=np.uint8)
    c = np.array([13], dtype=np.uint8)
    assert int(_clamp_add_subtract_half(a, c)[0]) == 9

"""Known-answer interop fixtures for the codec matrix.

Round-trip tests (encode_x -> decode_x) cannot catch a MATCHED
encoder+decoder bug — both sides agreeing on a wrong bitstream reading
passes every equality check (`tests/test_jpeg.py` names this limit).
These fixtures close that gap: each blob under tests/fixtures/interop/
was assembled byte-by-byte from the PUBLIC format spec by
tools/make_interop_fixtures.py, which imports nothing from roapi_spark
and shares no bit-writer / Huffman / CRC / IDCT / LZW code with the
production decoders. Expected pixels/samples were computed there with
independent naive implementations (literal T.81 double-loop IDCT,
by-hand PNG filter math) and are pinned in manifest.json.

The SHA-256s below additionally pin the committed bytes, so a silent
regeneration of the fixtures (which would re-couple them to whatever the
generator then says) fails loudly and must be re-audited.

Coverage: JPEG baseline (DC-only, AC terms, cross-block DC prediction,
non-unit quant, DRI/RSTn), WebP lossless VP8L (1- and 2-symbol simple
prefix codes), FLAC (verbatim + constant subframes, frame CRC-8/CRC-16
and STREAMINFO MD5 honored), GIF89a variable-width LZW, TIFF 6.0 LZW
(9-bit MSB codes), PNG filters 0-4 and Adam7 interlace.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import numpy as np
import pytest

FIXDIR = Path(__file__).parent / "fixtures" / "interop"

# blob-name -> sha256 of the committed fixture bytes (audited 2026-08-14;
# regenerating the fixtures requires re-auditing these pins)
PINNED = {
    "flac_constant.flac": "f04fc8f7f35469eb",
    "flac_verbatim.flac": "a357d975d380d8f1",
    "gif_uncompressed.gif": "91a10f78c95ac27c",
    "jpeg_dc_ac.jpg": "ed25c657335a04d7",
    "jpeg_dc_only.jpg": "342ad2e8ca74c098",
    "jpeg_restart.jpg": "8196f76fdc814030",
    "jpeg_two_blocks.jpg": "9f9df3f85ee96392",
    "png_adam7.png": "35221da1ad78ff95",
    "png_filters.png": "fea172fd0798e9f7",
    "tiff_lzw.tif": "9bc28f05fa8b9d6b",
    "vp8l_solid.webp": "58e9e169549e036a",
    "vp8l_two_greens.webp": "2221fa8dda092067",
}


def _manifest() -> dict:
    return json.loads((FIXDIR / "manifest.json").read_text())


def _decode(name: str, blob: bytes):
    kind = name.split("_")[0]
    if kind == "flac":
        from roapi_spark.functions.flac import decode_flac

        return decode_flac(blob)[1]
    if kind == "jpeg":
        from roapi_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(blob)
    if kind == "vp8l":
        from roapi_spark.functions.webp import decode_webp

        return decode_webp(blob)
    # png/gif/tiff all route through the image sniffing front door so the
    # dispatch-by-magic path is load-bearing too
    from roapi_spark.functions.multimodal import decode_image

    return decode_image(blob)


def test_manifest_covers_all_pins():
    man = _manifest()
    assert set(man) == set(PINNED)


@pytest.mark.parametrize("name", sorted(PINNED))
def test_known_answer_decode(name):
    meta = _manifest()[name]
    blob = (FIXDIR / name).read_bytes()
    digest = hashlib.sha256(blob).hexdigest()
    # the committed bytes are exactly what was audited...
    assert digest.startswith(PINNED[name]), f"{name} fixture bytes changed"
    assert digest == meta["sha256"], f"{name} manifest out of sync with blob"
    expected = np.array(meta["expected"], dtype=meta["dtype"])
    # ...and the manifest's inline expectation matches its own pin
    assert (
        hashlib.sha256(np.ascontiguousarray(expected).tobytes()).hexdigest()
        == meta["expected_sha256"]
    )
    got = _decode(name, blob)
    assert got.dtype == expected.dtype, f"{name}: {got.dtype} != {expected.dtype}"
    assert got.shape == expected.shape, f"{name}: {got.shape} != {expected.shape}"
    assert np.array_equal(got, expected), (
        f"{name}: production decoder disagrees with the spec-derived "
        f"expectation\nexpected:\n{expected}\ngot:\n{got}"
    )


def test_flac_fixture_sample_rate_honored():
    from roapi_spark.functions.flac import decode_flac

    rate, _ = decode_flac((FIXDIR / "flac_verbatim.flac").read_bytes())
    assert rate == 8000
    rate, _ = decode_flac((FIXDIR / "flac_constant.flac").read_bytes())
    assert rate == 44100


def test_fixture_corruption_fails_closed():
    """Flipping one payload bit in the externally-constructed streams must
    be rejected (CRC/structure), never decoded to silently-wrong data."""
    from roapi_spark.functions.flac import decode_flac
    from roapi_spark.functions.multimodal import decode_image

    flac = bytearray((FIXDIR / "flac_verbatim.flac").read_bytes())
    flac[-10] ^= 0x40  # inside the verbatim sample payload
    with pytest.raises(ValueError):
        decode_flac(bytes(flac))

    png = bytearray((FIXDIR / "png_filters.png").read_bytes())
    png[-20] ^= 0x01  # inside IDAT: breaks the chunk CRC
    with pytest.raises(ValueError):
        decode_image(bytes(png))

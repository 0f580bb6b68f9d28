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


# --- protocol/metadata readers: same fail-closed contract ------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hudi_log_reader_fails_closed(seed):
    """Mutated/truncated HoodieLogFormat bytes must raise HudiLogError
    (a ValueError) — never struct.error or IndexError; a corrupt log
    file in a MoR file group must mark THAT read bad, not crash the
    loader with an undocumented type."""
    import struct

    from roapi_spark.sources.hudi_log import (
        AVRO_DATA_BLOCK,
        HudiLogError,
        read_log_file,
        write_log_block,
    )

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "_hoodie_record_key", "type": "string"},
            {"name": "v", "type": "long"},
        ],
    }
    whole = write_log_block(
        AVRO_DATA_BLOCK,
        {0: "001", 2: __import__("json").dumps(schema)},
        records=[{"_hoodie_record_key": "k1", "v": 1}],
        schema=schema,
    )
    rng = np.random.default_rng(seed)
    # keep the 6-byte magic; flip bytes / truncate everywhere after it
    for blob in _corruptions(whole, rng, 300, keep_magic=6):
        try:
            read_log_file(blob)
        except HudiLogError:
            pass  # the documented failure type
        except (ValueError,):
            pass  # AvroError et al. are ValueErrors — also documented
        # anything else (struct.error, IndexError, KeyError...) fails the
        # test by propagating
    # garbage that does not even start with the magic
    for _ in range(100):
        blob = rng.bytes(int(rng.integers(1, 64)))
        if blob[:6] == b"#HUDI#":
            continue
        with pytest.raises(ValueError):
            read_log_file(blob)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_flightsql_any_unpack_never_crashes(seed):
    """any_unpack on arbitrary bytes returns None or a (name, payload)
    tuple — it must never raise: the Flight server calls it on every
    incoming descriptor/ticket/action body, and a malformed client
    frame must produce a clean 'unknown command' error, not a stack
    trace from the varint reader."""
    import roapi_spark.server.flightsql_proto as fsp

    rng = np.random.default_rng(seed)
    for _ in range(500):
        blob = rng.bytes(int(rng.integers(0, 96)))
        out = fsp.any_unpack(blob)
        assert out is None or (isinstance(out[0], str) and isinstance(out[1], bytes))
    # a truncated but valid-prefix Any (type_url present, value cut off)
    legit = fsp.command_statement_query("SELECT 1")
    for cut in range(len(legit)):
        out = fsp.any_unpack(legit[:cut])
        assert out is None or isinstance(out[1], bytes)

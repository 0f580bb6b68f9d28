"""Multimodal pipeline tests: binary columns + mapInPandas decode/resize/
frame-sample over the synthetic deterministic codec."""

from __future__ import annotations

import pytest

from roapi_spark.functions.multimodal import (
    decode_image,
    encode_fake_image,
    encode_fake_video,
    frame_sample,
    image_resize,
    image_stats,
    with_meta,
)


@pytest.fixture(scope="module")
def images(spark):
    rows = [(i, encode_fake_image(16 + i, 8 + i, seed=i)) for i in range(6)]
    return spark.createDataFrame(rows, "id bigint, content binary").repartition(3)


def test_image_stats(spark, images):
    out = image_stats(images).orderBy("id").collect()
    assert len(out) == 6
    r0 = out[0]
    assert (r0.width, r0.height) == (16, 8)
    assert r0.n_bytes == 12 + 16 * 8
    assert 0 <= r0.mean_pixel <= 255 and 0 <= r0.max_pixel <= 255
    # deterministic across runs
    again = image_stats(images).orderBy("id").collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_image_resize_roundtrip(spark, images):
    out = image_resize(images, 8, 4).orderBy("id").collect()
    assert all((r.width, r.height) == (8, 4) for r in out)
    img = decode_image(bytes(out[0].content))
    assert img.shape == (4, 8)


def test_frame_sample_fanout(spark):
    vids = spark.createDataFrame(
        [(1, encode_fake_video(10, 4, 4, seed=1)), (2, encode_fake_video(5, 4, 4, seed=2))],
        "id bigint, content binary",
    ).repartition(2)
    out = frame_sample(vids, every_n=3).collect()
    # video 1: frames 0,3,6,9; video 2: frames 0,3
    got = sorted((r.id, r.frame_idx) for r in out)
    assert got == [(1, 0), (1, 3), (1, 6), (1, 9), (2, 0), (2, 3)]
    img = decode_image(bytes(out[0].content))
    assert img.shape == (4, 4)


def test_real_codec_is_gated(spark, images):
    # lossy VP8 stays gated (VP8L lossless WebP decodes for real now)
    with pytest.raises(NotImplementedError, match="libwebp"):
        decode_image(
            b"RIFF\x10\x00\x00\x00WEBPVP8 " + b"\x00" * 8
        )
    # JPEG decodes for real now: garbage after the magic fails CLOSED
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 jfif garbage")


def test_with_meta(spark, images):
    df = with_meta(images, "image/x-fimg")
    row = df.filter("id = 0").collect()[0]
    assert row.meta.mime == "image/x-fimg"
    assert row.meta.n_bytes == 12 + 16 * 8
    assert dict(df.dtypes)["meta"] == "struct<mime:string,n_bytes:bigint>"


def test_audio_stats_and_resample(spark):
    import numpy as np

    from roapi_spark.functions.multimodal import (
        audio_resample,
        audio_stats,
        decode_audio,
        encode_fake_audio,
    )

    blobs = [(i, encode_fake_audio(16000, 800, seed=i)) for i in range(4)]
    df = spark.createDataFrame(blobs, "id bigint, content binary")
    stats = {r.id: r for r in audio_stats(df).collect()}
    assert stats[0].sample_rate == 16000
    assert stats[0].n_samples == 800
    assert abs(stats[0].duration_s - 0.05) < 1e-12
    # cross-check rms/peak against a local numpy decode
    rate, pcm = decode_audio(blobs[0][1])
    x = pcm.astype(np.int64)
    assert abs(stats[0].rms - float(np.sqrt((x * x).sum() / len(x)))) < 1e-9
    assert stats[0].peak == int(np.abs(x).max())
    # decimation: rate and sample count divide by the factor
    rs = audio_stats(audio_resample(df, 4)).collect()
    assert all(r.sample_rate == 4000 and r.n_samples == 200 for r in rs)
    # decimated content matches numpy slicing
    out = {r.id: r.content for r in audio_resample(df, 4).collect()}
    _, pcm4 = decode_audio(bytes(out[1]))
    _, orig = decode_audio(blobs[1][1])
    assert (pcm4 == orig[::4]).all()


def test_audio_real_codec_gated(spark):
    import pytest as _pytest

    from roapi_spark.functions.multimodal import decode_audio

    # PCM WAV now decodes for real (round 4); a truncated/malformed WAV
    # is a typed ValueError, and non-WAV formats still gate on the
    # named dependency
    with _pytest.raises(ValueError, match="malformed WAV"):
        decode_audio(b"RIFF....WAVEfmt ")
    # FLAC decodes for real now (round 5): garbage after the magic
    # fails CLOSED; genuinely-absent formats still gate by name
    with _pytest.raises(ValueError):
        decode_audio(b"fLaC garbage")
    with _pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio(b"OggS garbage")


# ---- real-codec seam (round 4) ---------------------------------------------


def test_real_codec_gates_name_dependency():
    """Contract: unknown real formats fail with the dependency NAMED, so
    a user knows exactly what to install; the synthetic paths stay
    byte-deterministic."""
    from roapi_spark.functions.multimodal import (
        decode_audio,
        decode_image,
        decode_video,
        encode_fake_audio,
        encode_fake_image,
        encode_fake_video,
    )

    with pytest.raises(NotImplementedError, match="libwebp"):
        # lossy VP8 names libwebp; VP8L decodes for real
        decode_image(b"RIFF\x10\x00\x00\x00WEBPVP8 " + b"\x00" * 8)
    with pytest.raises(NotImplementedError, match="PIL|pillow"):
        decode_image(b"\x00\x00\x01\x00unknown-format")  # ICO: gated
    with pytest.raises(NotImplementedError, match="libjpeg"):
        # inside JPEG, beyond-DCT features name libjpeg
        from roapi_spark.functions.jpeg import encode_jpeg as _ej

        blob = bytearray(_ej(__import__("numpy").full((8, 8), 1, dtype="uint8")))
        blob[blob.index(b"\xff\xc0") + 1] = 0xC3  # lossless
        decode_image(bytes(blob))
    with pytest.raises(NotImplementedError, match="soundfile|libav"):
        decode_audio(b"OggS garbage")
    with pytest.raises(NotImplementedError, match="pyav|ffmpeg"):
        decode_video(b"\x00\x00\x00 ftypisom garbage")
    # synthetic encoders are bytewise deterministic (same seed -> same blob)
    assert encode_fake_image(8, 4, seed=7) == encode_fake_image(8, 4, seed=7)
    assert encode_fake_audio(8000, 64, seed=7) == encode_fake_audio(8000, 64, seed=7)
    assert encode_fake_video(3, 4, 2, seed=7) == encode_fake_video(3, 4, 2, seed=7)


def test_wav_real_decode_roundtrip():
    """PCM WAV is a REAL container format decoded by the stdlib wave
    branch: 16-bit mono roundtrip, stereo channel-0 pick, 8-bit widen,
    and a loud gate for unsupported depths."""
    import numpy as np

    from roapi_spark.functions.multimodal import decode_audio, encode_wav

    mono = np.arange(-100, 100, dtype=np.int16)
    rate, got = decode_audio(encode_wav(16000, mono))
    assert rate == 16000 and np.array_equal(got, mono)

    stereo = np.zeros(2 * len(mono), dtype=np.int16)
    stereo[0::2] = mono
    stereo[1::2] = 999  # channel 1 junk must be ignored
    rate, got = decode_audio(encode_wav(8000, stereo, channels=2))
    assert rate == 8000 and np.array_equal(got, mono)

    # 8-bit unsigned: stdlib wave writes sampwidth via header; craft one
    import io
    import wave as _wave

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(4000)
        w.writeframes(bytes([0, 128, 255]))
    rate, got = decode_audio(buf.getvalue())
    assert rate == 4000
    assert got.tolist() == [(-128) << 8, 0, 127 << 8]

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(4)
        w.setframerate(4000)
        w.writeframes(b"\x00" * 8)
    with pytest.raises(NotImplementedError, match="32-bit"):
        decode_audio(buf.getvalue())


# ---- real image codec: uncompressed 24-bit BMP -----------------------------


def test_bmp_roundtrip_odd_width():
    import numpy as np

    from roapi_spark.functions.multimodal import decode_image, encode_bmp

    gray = (np.arange(35, dtype=np.uint8) * 7 % 256).reshape(5, 7)
    out = decode_image(encode_bmp(gray))
    assert out.shape == (5, 7)
    assert (out == gray).all()


def test_bmp_topdown_negative_height():
    import struct

    import numpy as np

    from roapi_spark.functions.multimodal import decode_image, encode_bmp

    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    blob = bytearray(encode_bmp(gray))
    # flip to top-down: negate height, reverse row order in the payload
    h = struct.unpack("<i", blob[22:26])[0]
    blob[22:26] = struct.pack("<i", -h)
    stride = (3 * 4 + 3) // 4 * 4
    rows = [bytes(blob[54 + i * stride : 54 + (i + 1) * stride]) for i in range(3)]
    blob[54:] = b"".join(reversed(rows))
    out = decode_image(bytes(blob))
    assert (out == gray).all()


def test_bmp_unsupported_bpp_names_dependency():
    import struct

    import numpy as np
    import pytest as _pytest

    from roapi_spark.functions.multimodal import decode_image, encode_bmp

    blob = bytearray(encode_bmp(np.zeros((2, 2), dtype=np.uint8)))
    blob[28:30] = struct.pack("<H", 8)  # claim 8bpp
    with _pytest.raises(NotImplementedError, match="pillow"):
        decode_image(bytes(blob))


def test_bmp_truncated_is_valueerror():
    import numpy as np
    import pytest as _pytest

    from roapi_spark.functions.multimodal import decode_image, encode_bmp

    blob = encode_bmp(np.zeros((4, 4), dtype=np.uint8))[:-10]
    with _pytest.raises(ValueError, match="truncated"):
        decode_image(blob)


def test_bmp_resize_stays_bmp():
    import numpy as np

    from roapi_spark.functions.multimodal import decode_image, encode_bmp

    # resize path must re-encode BMP input as BMP (format-preserving)
    from roapi_spark.functions.multimodal import image_resize  # noqa: F401 — API exists

    gray = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = encode_bmp(gray)
    assert blob[:2] == b"BM"
    assert (decode_image(blob) == gray).all()


def test_bmp_zero_width_is_valueerror():
    import struct

    import numpy as np
    import pytest as _pytest

    from roapi_spark.functions.multimodal import decode_image, encode_bmp

    blob = bytearray(encode_bmp(np.zeros((2, 2), dtype=np.uint8)))
    blob[18:22] = struct.pack("<i", 0)
    with _pytest.raises(ValueError, match="malformed BMP"):
        decode_image(bytes(blob))


def test_netpbm_decode_pgm_ppm():
    """8-bit netpbm (the second stdlib-decodable real image container):
    P5 gray passthrough, P6 rgb -> integer gray, comment tokens,
    truncation and 16-bit gates."""
    import numpy as np

    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    pgm = b"P5\n# a comment\n4 3\n255\n" + gray.tobytes()
    assert (decode_image(pgm) == gray).all()

    rgb = np.stack([gray, gray + 3, gray + 6], axis=2).astype(np.uint8)
    ppm = b"P6 4 3 255\n" + rgb.tobytes()
    expect = (rgb.astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)
    assert (decode_image(ppm) == expect).all()

    with pytest.raises(ValueError, match="truncated netpbm"):
        decode_image(b"P5\n4 3\n255\n" + gray.tobytes()[:-1])
    with pytest.raises(NotImplementedError, match="maxval=65535"):
        decode_image(b"P5\n4 3\n65535\n" + b"\x00" * 24)
    with pytest.raises(ValueError, match="malformed netpbm"):
        decode_image(b"P6\n-4 3\n255\n")


def test_aiff_decode_roundtrip():
    """PCM AIFF via the stdlib aifc module (big-endian samples, unlike
    WAV): stereo takes channel 0; compressed AIFF-C gates on the named
    dependency."""
    import io
    import warnings

    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import aifc

    pcm = (np.arange(-5, 5) * 1000).astype("<i2")

    class KeepOpen(io.BytesIO):
        def close(self):  # aifc closes the sink on __exit__; keep bytes
            pass

    def make(channels, comptype=b"NONE", compname=b"not compressed"):
        buf = KeepOpen()
        with aifc.open(buf, "wb") as a:
            a.setnchannels(channels)
            a.setsampwidth(2)
            a.setframerate(8000)
            a.setcomptype(comptype, compname)
            if channels == 1:
                frames = pcm.astype(">i2").tobytes()
            else:
                inter = np.empty(2 * len(pcm), dtype=">i2")
                inter[0::2] = pcm
                inter[1::2] = 0
                frames = inter.tobytes()
            a.writeframes(frames)
        return buf.getvalue()

    from roapi_spark.functions.multimodal import decode_audio

    rate, arr = decode_audio(make(1))
    assert rate == 8000 and (arr == pcm).all()
    rate, arr = decode_audio(make(2))
    assert (arr == pcm).all()  # channel 0
    with pytest.raises(ValueError, match="malformed AIFF"):
        decode_audio(make(1)[:40])


def test_png_roundtrip_all_filters():
    # >= 10 rows: the encoder's y % 5 filter cycle covers every scanline
    # filter (None/Sub/Up/Average/Paeth) at least twice
    import numpy as np

    from roapi_spark.functions.multimodal import decode_image, encode_png

    rng = np.random.default_rng(11)
    for h, w in [(11, 23), (1, 1), (12, 2), (37, 64)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        assert np.array_equal(decode_image(encode_png(img)), img)
    # smooth gradient: Average/Paeth predictors produce non-trivial deltas
    grad = (np.add.outer(np.arange(50) * 3, np.arange(40) * 5) % 256).astype(
        np.uint8
    )
    assert np.array_equal(decode_image(encode_png(grad)), grad)


def test_png_color_types_gray_rule():
    # RGB (color 2) and RGBA (color 6) reduce to (r+g+b)//3 with alpha
    # dropped — the same integer-gray rule as the BMP branch
    import struct
    import zlib

    import numpy as np

    from roapi_spark.functions.multimodal import decode_image

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    rng = np.random.default_rng(5)
    h, w = 4, 6
    rgba = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    want = (rgba[:, :, :3].astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)
    assert np.array_equal(decode_image(blob), want)


def test_png_gates_name_dependency():
    # 16-bit and Adam7 gate on PIL by name; corruption is a loud ValueError
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from roapi_spark.functions.multimodal import decode_image, encode_png

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    with _pytest.raises(NotImplementedError, match="pillow"):
        decode_image(
            sig
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + chunk(b"IEND", b"")
        )
    # Adam7 decodes for real now (round 5): a hand-built 2x2 gray
    # interlaced PNG (pass 1: (0,0); pass 6: (1,0); pass 7: row 1)
    adam = (
        b"\x00\x07"  # pass1: filter0 + pixel (0,0)=7
        + b"\x00\x09"  # pass6: filter0 + pixel (1,0)=9
        + b"\x00\x03\x04"  # pass7: filter0 + row (0,1)=3 (1,1)=4
    )
    out = decode_image(
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(adam))
        + chunk(b"IEND", b"")
    )
    assert out.tolist() == [[7, 9], [3, 4]]
    good = bytearray(
        encode_png(np.arange(36, dtype=np.uint8).reshape(6, 6))
    )
    good[40] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    with _pytest.raises(ValueError):
        decode_image(bytes(good))


def test_g711_tables_match_public_anchors():
    import numpy as np

    from roapi_spark.functions.multimodal import _g711_alaw_table, _g711_ulaw_table

    ut, at = _g711_ulaw_table(), _g711_alaw_table()
    # ITU G.711 anchors: mu-law extremes and both zero codes; A-law +-8
    # at the idle codes and +-32256 extremes (A-law MSB set = POSITIVE)
    assert ut[0x00] == -32124 and ut[0x80] == 32124
    assert ut[0xFF] == 0 and ut[0x7F] == 0
    assert at[0xD5] == 8 and at[0x55] == -8
    assert at[0xAA] == 32256 and at[0x2A] == -32256
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop  # stdlib through 3.12: byte-exact cross-check
    except ImportError:
        return
    raw = bytes(range(256))
    assert np.array_equal(
        ut, np.frombuffer(audioop.ulaw2lin(raw, 2), dtype="<i2")
    )
    assert np.array_equal(
        at, np.frombuffer(audioop.alaw2lin(raw, 2), dtype="<i2")
    )


def test_g711_wav_decode_roundtrip():
    import numpy as np

    from roapi_spark.functions.multimodal import (
        _g711_ulaw_compress,
        _g711_ulaw_table,
        decode_audio,
        encode_g711_wav,
    )

    tab = _g711_ulaw_table()
    # compress(expand(code)) is the identity except negative zero
    # (0x7F and 0xFF both decode to 0; the canonical encoder emits 0xFF)
    codes = np.arange(256, dtype=np.uint8)
    back = _g711_ulaw_compress(tab.astype(np.int32))
    ok = (back == codes) | ((codes == 0x7F) & (back == 0xFF))
    assert ok.all()
    # table-valued samples survive a WAV round trip exactly
    rate, out = decode_audio(encode_g711_wav(8000, tab[40:200].astype(np.int16)))
    assert rate == 8000 and np.array_equal(out, tab[40:200])
    # arbitrary pcm: companding error bounded by the largest segment step
    rng = np.random.default_rng(9)
    pcm = rng.integers(-30000, 30000, size=400, dtype=np.int16)
    _, out = decode_audio(encode_g711_wav(8000, pcm))
    assert np.abs(out.astype(np.int32) - pcm.astype(np.int32)).max() < 1024


def test_g711_alaw_wav_and_stereo():
    import struct

    import numpy as np

    from roapi_spark.functions.multimodal import _g711_alaw_table, decode_audio

    # hand-built A-law (format tag 6) stereo container: channel 0 kept
    codes_l = np.arange(0, 160, dtype=np.uint8)
    codes_r = np.full(160, 0xD5, dtype=np.uint8)  # A-law idle code
    inter = np.empty(320, dtype=np.uint8)
    inter[0::2], inter[1::2] = codes_l, codes_r
    data = inter.tobytes()
    blob = (
        b"RIFF"
        + struct.pack("<I", 38 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHHH", 18, 6, 2, 8000, 16000, 2, 8, 0)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    rate, out = decode_audio(blob)
    assert rate == 8000
    assert np.array_equal(out, _g711_alaw_table()[codes_l])


def test_gif_roundtrip_and_interlace():
    import numpy as np

    from roapi_spark.functions.multimodal import decode_image, encode_gif

    rng = np.random.default_rng(13)
    for h, w in [(1, 1), (7, 5), (11, 23), (64, 96)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        assert np.array_equal(decode_image(encode_gif(img)), img)
        assert np.array_equal(
            decode_image(encode_gif(img, interlace=True)), img
        )
    # long runs: dictionary reuse + the KwKwK special case
    flat = np.zeros((40, 50), dtype=np.uint8)
    flat[10:20] = 200
    flat[:, 5] = 9
    assert np.array_equal(decode_image(encode_gif(flat)), flat)
    # large gradient: several LZW width growths and a 4096-cap clear
    grad = (np.add.outer(np.arange(200), np.arange(300)) % 251).astype(np.uint8)
    assert np.array_equal(decode_image(encode_gif(grad)), grad)


def test_gif_real_world_fixture():
    # the canonical public 1x1 transparent GIF (spacer.gif) — a byte
    # stream produced by a real encoder, not our own round trip
    import base64

    from roapi_spark.functions.multimodal import decode_image

    tiny = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    out = decode_image(tiny)
    assert out.shape == (1, 1) and out[0, 0] == 0


def test_gif_corruption_is_loud():
    import numpy as np
    import pytest as _pytest

    from roapi_spark.functions.multimodal import decode_image, encode_gif

    good = bytearray(encode_gif(np.arange(100, dtype=np.uint8).reshape(10, 10)))
    with _pytest.raises(ValueError):
        decode_image(bytes(good[: len(good) // 2]))  # truncated pixel data


def test_tiff_roundtrip_both_byte_orders():
    import numpy as np

    from roapi_spark.functions.multimodal import decode_image, encode_tiff

    rng = np.random.default_rng(21)
    for h, w in [(1, 1), (11, 23), (64, 96)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        assert np.array_equal(decode_image(encode_tiff(img)), img)
        assert np.array_equal(
            decode_image(encode_tiff(img, big_endian=True)), img
        )


def test_tiff_photometric_and_gates():
    import struct

    import numpy as np
    import pytest as _pytest

    from roapi_spark.functions.multimodal import decode_image, encode_tiff

    g = np.arange(20, dtype=np.uint8).reshape(4, 5)

    def set_tag(blob: bytes, tag: int, val: int) -> bytes:
        b = bytearray(blob)
        (ifd0,) = struct.unpack("<I", bytes(b[4:8]))
        (n,) = struct.unpack("<H", bytes(b[ifd0 : ifd0 + 2]))
        for i in range(n):
            e = ifd0 + 2 + 12 * i
            if struct.unpack("<H", bytes(b[e : e + 2]))[0] == tag:
                b[e + 8 : e + 10] = struct.pack("<H", val)
        return bytes(b)

    base = encode_tiff(g)
    # photometric 0 (WhiteIsZero): scanned-fax polarity inverts
    assert np.array_equal(decode_image(set_tag(base, 262, 0)), 255 - g)
    # LZW/PackBits decode for real now (round 5); G4 fax still gates,
    # and mislabeling raw strips as LZW is a loud ValueError
    with _pytest.raises(NotImplementedError, match="pillow"):
        decode_image(set_tag(base, 259, 4))
    with _pytest.raises(ValueError):
        decode_image(set_tag(base, 259, 5))
    # truncating the strip data is a loud ValueError
    with _pytest.raises(ValueError):
        decode_image(base[: 8 + 10])


def test_animated_gif_video_roundtrip():
    import numpy as np

    from roapi_spark.functions.multimodal import (
        decode_image,
        decode_video,
        encode_gif,
        encode_gif_animation,
    )

    rng = np.random.default_rng(31)
    frames = rng.integers(0, 256, size=(6, 9, 14), dtype=np.uint8)
    blob = encode_gif_animation(frames)
    out = decode_video(blob)
    assert out.shape == (6, 9, 14) and np.array_equal(out, frames)
    # decode_image on an animation: first frame (thumbnail convention)
    assert np.array_equal(decode_image(blob), frames[0])
    # a still GIF through decode_video is a 1-frame stack
    img = rng.integers(0, 256, size=(11, 23), dtype=np.uint8)
    assert decode_video(encode_gif(img)).shape == (1, 11, 23)


def test_animated_gif_partial_frames_gate():
    import struct

    import numpy as np
    import pytest as _pytest

    from roapi_spark.functions.multimodal import (
        decode_video,
        encode_gif_animation,
    )

    frames = np.zeros((2, 8, 8), dtype=np.uint8)
    blob = bytearray(encode_gif_animation(frames))
    # shift the second image descriptor's left offset: partial-canvas
    # compositing must gate on pyav, not silently mis-stack. Descriptors
    # sit 8 bytes after their Graphics Control Extension (21 f9 04 ...),
    # which cannot appear inside the LZW data sub-blocks by construction
    # of the fixed GCE byte layout.
    second_gce = blob.index(b"\x21\xf9\x04", blob.index(b"\x21\xf9\x04") + 1)
    idx = second_gce + 8
    assert blob[idx] == 0x2C
    blob[idx + 1 : idx + 3] = struct.pack("<H", 2)
    with _pytest.raises(NotImplementedError, match="pyav"):
        decode_video(bytes(blob))


def test_png_adam7_arbitrary_sizes():
    """Adam7: build interlaced streams by slicing the source image into
    the 7 passes (the encoder-side scatter inverse) — decode must
    reproduce the image exactly for sizes exercising empty passes,
    single pixels, and non-multiples of 8."""
    import struct
    import zlib

    import numpy as np

    from roapi_spark.functions.multimodal import _ADAM7, decode_image

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    rng = np.random.default_rng(23)
    for (h, w) in [(1, 1), (2, 3), (7, 5), (8, 8), (9, 17), (16, 3)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            for row in sub:
                raw += b"\x00" + row.tobytes()  # filter 0 per scanline
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_image(blob), img), (h, w)


def test_png_palette():
    """Color type 3: PLTE-mapped indices -> RGB -> integer gray; an
    out-of-range index is a loud ValueError."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from roapi_spark.functions.multimodal import decode_image

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    plte = bytes([255, 0, 0, 0, 255, 0, 10, 20, 250])  # 3 colors
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    sig = b"\x89PNG\r\n\x1a\n"
    blob = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(3, 3)
    want = (pal[idx].astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)
    assert np.array_equal(decode_image(blob), want)

    bad = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(b"\x00\x07"))  # index 7 > 2
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="palette"):
        decode_image(bad)


def test_tiff_lzw_and_packbits_roundtrip():
    """TIFF compression 5 (LZW, MSB-first with the spec's early
    code-width change) and 32773 (PackBits RLE), with and without the
    horizontal-differencing predictor, both byte orders."""
    import numpy as np

    from roapi_spark.functions.multimodal import decode_image, encode_tiff

    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, size=(23, 31), dtype=np.uint8)
    for be in (False, True):
        for comp in ("lzw", "packbits"):
            for pred in (1, 2):
                blob = encode_tiff(
                    img, big_endian=be, compression=comp, predictor=pred
                )
                assert np.array_equal(decode_image(blob), img), (be, comp, pred)
    # LZW table-reset path (table grows past 4094 entries)
    big = rng.integers(0, 256, size=(200, 200), dtype=np.uint8)
    assert np.array_equal(
        decode_image(encode_tiff(big, compression="lzw")), big
    )
    # compression is real: a smooth gradient shrinks dramatically
    smooth = np.repeat(np.arange(32, dtype=np.uint8)[None, :] * 8, 40, axis=0)
    assert len(encode_tiff(smooth, compression="lzw", predictor=2)) < len(
        encode_tiff(smooth)
    ) // 3

"""Pure-numpy codec round-trips (no Spark): the real decode bodies the
multimodal operators run worker-side."""

from __future__ import annotations

import numpy as np
import pytest

from stixtoneodb_spark.functions import codecs


def _img(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (7, 5), (16, 16), (13, 31)])
def test_bmp_roundtrip_exact(h, w):
    # odd widths exercise the 4-byte row padding
    arr = _img(h, w, seed=h * 100 + w)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(arr)), arr)


def test_bmp_top_down_variant():
    arr = _img(6, 4, seed=3)
    b = bytearray(codecs.encode_bmp(arr))
    # flip to top-down: negate height, reverse the stored row order
    import struct
    h = struct.unpack_from("<i", b, 22)[0]
    struct.pack_into("<i", b, 22, -h)
    stride = (4 * 3 + 3) // 4 * 4
    off = struct.unpack_from("<I", b, 10)[0]
    rows = [bytes(b[off + i * stride : off + (i + 1) * stride]) for i in range(h)]
    b[off:] = b"".join(reversed(rows))
    assert np.array_equal(codecs.decode_bmp(bytes(b)), arr)


def test_bmp_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        codecs.decode_bmp(b"notbmp" * 20)
    good = codecs.encode_bmp(_img(8, 8))
    with pytest.raises(ValueError):
        codecs.decode_bmp(good[: len(good) // 2])


def test_ppm_roundtrip_and_comments():
    arr = _img(9, 11, seed=7)
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(arr)), arr)
    # header comments are legal PPM
    raw = codecs.encode_ppm(arr)
    commented = b"P6\n# a comment\n11 9\n# another\n255\n" + raw.split(b"255\n", 1)[1]
    assert np.array_equal(codecs.decode_ppm(commented), arr)


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip_exact(channels):
    rng = np.random.RandomState(channels)
    samples = rng.randint(-32768, 32767, size=(480, channels)).astype(np.int16)
    out, rate = codecs.decode_wav(codecs.encode_wav(samples, 8000))
    assert rate == 8000
    assert np.array_equal(out, samples)


def test_sniff():
    assert codecs.sniff(codecs.encode_bmp(_img(2, 2))) == "bmp"
    assert codecs.sniff(codecs.encode_ppm(_img(2, 2))) == "ppm"
    assert codecs.sniff(codecs.encode_wav(np.zeros(4, dtype=np.int16), 8000)) == "wav"
    assert codecs.sniff(b"\xff\xd8\xff jpeg-ish") is None


def test_resize_nearest_semantics():
    # solid color survives any resize
    solid = np.full((10, 10, 3), 42, dtype=np.uint8)
    assert (codecs.resize_nearest(solid, 224, 224) == 42).all()
    # exact index-gather expectation on a gradient
    arr = _img(8, 6, seed=1)
    out = codecs.resize_nearest(arr, 3, 4)
    rows = (np.arange(4) * 8 // 4).clip(0, 7)
    cols = (np.arange(3) * 6 // 3).clip(0, 5)
    assert np.array_equal(out, arr[rows][:, cols])


# ---------------------------------------------------------------- PNG ----


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(1, 1, 3), (7, 5, 3), (9, 4, 1), (6, 6, 4)])
def test_png_roundtrip_every_filter(ft, shape):
    """Encoder filters with shifted-array arithmetic, decoder unfilters
    with cumsum/serial recurrences — agreement is a two-implementation
    cross-check of the PNG filter algebra, per filter type."""
    rng = np.random.RandomState(ft * 10 + shape[0])
    arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(arr, ft)), arr)


def test_png_known_answer_vector():
    """Hand-built PNG, independent of encode_png: 2x1 RGB, Sub filter.
    Raw pixels (10,20,30),(250,8,130); Sub stores the second pixel as
    deltas mod 256: (240, 244, 100)."""
    import struct
    import zlib

    scanline = bytes([1, 10, 20, 30, 240, 244, 100])  # filter=1 + 2 px

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    b = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scanline))
        + chunk(b"IEND", b"")
    )
    out = codecs.decode_png(b)
    assert out.shape == (1, 2, 3)
    assert out[0, 0].tolist() == [10, 20, 30]
    assert out[0, 1].tolist() == [250, 8, 130]


def test_png_rejects_bad_crc_and_profiles():
    arr = _img(4, 4, seed=9)
    b = bytearray(codecs.encode_png(arr))
    b[40] ^= 0xFF  # corrupt inside IDAT region -> CRC mismatch
    with pytest.raises(ValueError):
        codecs.decode_png(bytes(b))
    with pytest.raises(ValueError):
        codecs.decode_png(b"\x89PNG\r\n\x1a\nnot-really")
    # 16-bit depth is out of the baseline profile
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    deep = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(7)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        codecs.decode_png(deep)


def test_png_sniff_and_dispatch():
    arr = _img(3, 3, seed=1)
    b = codecs.encode_png(arr)
    assert codecs.sniff(b) == "png"
    assert np.array_equal(codecs.decode_image(b), arr)


def test_png_truncated_deflate_raises_valueerror_not_zlib_error():
    """A CRC-valid PNG whose DEFLATE stream is cut short (partial
    download) must surface as ValueError so media_metadata's try_decode
    flags decoded_ok=False instead of killing the Spark task."""
    import struct
    import zlib

    b = codecs.encode_png(_img(8, 8, seed=2))
    sig, pos, chunks = b[:8], 8, []
    while pos < len(b):
        (ln,) = struct.unpack_from(">I", b, pos)
        ct, data = b[pos + 4 : pos + 8], b[pos + 8 : pos + 8 + ln]
        if ct == b"IDAT":
            data = data[: len(data) // 2]
        chunks.append((ct, data))
        pos += 12 + ln
    cut = sig + b"".join(
        struct.pack(">I", len(d)) + t + d
        + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        for t, d in chunks
    )
    with pytest.raises(ValueError):
        codecs.decode_png(cut)
    # malformed IHDR length (CRC-valid) is also a ValueError
    bad_ihdr = sig + b"".join(
        struct.pack(">I", len(d)) + t + d
        + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        for t, d in [(b"IHDR", b"\x00" * 12), (b"IEND", b"")]
    )
    with pytest.raises(ValueError):
        codecs.decode_png(bad_ihdr)

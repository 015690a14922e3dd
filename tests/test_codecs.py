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
    assert codecs.sniff(b"\xff\xd8\xff jpeg-ish") == "jpeg"  # real codec now


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


# ------------------------------------------------------------- JPEG ----


def test_jpeg_fdct_matches_naive_definition():
    """The matrix FDCT must equal the O(n^4) textbook formula (T.81
    A.3.3) — an independent-algebra check, not a roundtrip."""
    rng = np.random.default_rng(7)
    blk = rng.integers(-128, 128, (8, 8)).astype(np.float64)

    def naive(b):
        out = np.zeros((8, 8))
        for u in range(8):
            for v in range(8):
                cu = 1 / np.sqrt(2) if u == 0 else 1.0
                cv = 1 / np.sqrt(2) if v == 0 else 1.0
                s = sum(
                    b[x, y]
                    * np.cos((2 * x + 1) * u * np.pi / 16)
                    * np.cos((2 * y + 1) * v * np.pi / 16)
                    for x in range(8)
                    for y in range(8)
                )
                out[u, v] = 0.25 * cu * cv * s
        return out

    assert np.allclose(codecs.jpeg_fdct(blk), naive(blk), atol=1e-9)
    assert np.allclose(codecs.jpeg_idct(codecs.jpeg_fdct(blk)), blk, atol=1e-9)
    # constant block c → DC exactly 8c (the closed-form oracle's anchor)
    assert abs(codecs.jpeg_fdct(np.full((8, 8), 10.0))[0, 0] - 80.0) < 1e-9


def test_jpeg_entropy_layer_integer_exact_roundtrip():
    """encode_jpeg_from_coeffs → decode_jpeg_coeffs is LOSSLESS for
    arbitrary sparse coefficient blocks: zigzag, run lengths, ZRL, EOB,
    magnitude categories (incl. negatives), DC prediction, byte
    stuffing, canonical Huffman tables — all integer-exact."""
    rng = np.random.default_rng(11)
    qc = rng.integers(-40, 40, (12, 8, 8)).astype(np.int64)
    qc[rng.random((12, 8, 8)) < 0.85] = 0  # sparse: runs + ZRL fire
    qc[:, 0, 0] = rng.integers(-200, 200, 12)  # real DC walk
    b = codecs.encode_jpeg_from_coeffs(qc, 24, 32, n_comp=1)
    back, (h, w, n_comp), qsel = codecs.decode_jpeg_coeffs(b)
    assert (back == qc).all()
    assert (h, w, n_comp) == (24, 32, 1)
    assert (qsel[0] == codecs.JPEG_QTABLE).all()


def test_jpeg_dc_only_roundtrip_bit_exact():
    """Constant even-valued 8x8 blocks survive the FULL lossy pipeline
    bit-exactly (the registry oracle's closed form): DC 8·(v-128),
    Q[0,0]=16, no rounding for even v."""
    hb, wb = 3, 4
    img = np.zeros((hb * 8, wb * 8), dtype=np.uint8)
    for i in range(hb):
        for j in range(wb):
            img[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8] = 2 * (
                (7 + 17 * i + 29 * j) % 128
            )
    out = codecs.decode_jpeg(codecs.encode_jpeg(img))
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert (out == img).all()


def test_jpeg_color_and_gradient_bounded_error():
    """Color (YCbCr 4:4:4) constant image reconstructs within the
    chroma-rounding budget; a smooth gradient stays within the Annex-K
    quantization error envelope; non-multiple-of-8 sizes crop right."""
    rgb = np.full((16, 16, 3), (120, 64, 200), dtype=np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(rgb))
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3
    g = (np.add.outer(np.arange(19) * 2, np.arange(21) * 3) % 160 + 40).astype(
        np.uint8
    )
    dec = codecs.decode_jpeg(codecs.encode_jpeg(g))
    assert dec.shape == (19, 21)  # odd sizes: block padding cropped
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 40


def test_jpeg_sniff_and_decode_image_dispatch():
    img = np.full((8, 8), 100, np.uint8)
    b = codecs.encode_jpeg(img)
    assert codecs.sniff(b) == "jpeg"
    assert codecs.decode_image(b).shape == (8, 8, 3)


def test_jpeg_rejects_progressive_and_truncation():
    img = np.full((8, 8), 100, np.uint8)
    b = bytearray(codecs.encode_jpeg(img))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError):
        codecs.decode_jpeg(bytes(b))
    with pytest.raises(ValueError):
        codecs.decode_jpeg(codecs.encode_jpeg(img)[:20])

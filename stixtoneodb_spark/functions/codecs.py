"""Pure-numpy decoders for library-free media formats (BMP / PPM / WAV /
PNG).

The container ships no image/audio codec libraries (PIL, cv2, librosa,
ffmpeg), but these formats need none: BMP/PPM/WAV carry raw samples
behind a fixed header, and PNG — a genuinely COMPRESSED format — only
needs stdlib zlib for its DEFLATE stream plus numpy for scanline
unfiltering.  The multimodal operators therefore run a REAL decode end
to end: bytes → numpy array → transform → bytes, all inside
Arrow-batched ``mapInPandas`` workers.

Everything here is per-payload CPU work with no Spark dependency; the
operators in ``operators/multimodal.py`` call it from worker-side UDF
bodies, so it distributes trivially (one payload never spans workers).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- BMP ----


def decode_bmp(b: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP → (H, W, 3) uint8 RGB array.

    Handles the standard quirks: bottom-up row order (positive height),
    top-down (negative height), BGR channel order, 4-byte row padding.
    Raises ValueError on anything that is not plain BI_RGB 24-bit.
    """
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", b, 10)[0]
    width, height = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate BMP dimensions")
    stride = (width * 3 + 3) // 4 * 4
    need = pixel_off + stride * height
    if len(b) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * height, offset=pixel_off)
    rows = rows.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR → RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed bottom-up 24-bit BMP bytes."""
    h, w, c = arr.shape
    assert c == 3
    stride = (w * 3 + 3) // 4 * 4
    bgr = arr[..., ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pixels = rows[::-1].tobytes()  # bottom-up
    pixel_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pixel_off + len(pixels), 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + dib + pixels


# ---------------------------------------------------------------- PPM ----


def decode_ppm(b: bytes) -> np.ndarray:
    """Decode a binary P6 PPM (maxval ≤ 255) → (H, W, 3) uint8 RGB."""
    if not b.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace/comment-separated
    # tokens, then ONE whitespace byte, then raw RGB
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(b[start:pos])
    pos += 1  # the single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255 or w <= 0 or h <= 0:
        raise ValueError("unsupported PPM")
    need = w * h * 3
    if len(b) - pos < need:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(b, dtype=np.uint8, count=need, offset=pos).reshape(h, w, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


# ---------------------------------------------------------------- WAV ----


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM-16 RIFF/WAVE payload → ((n, channels) int16, rate)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16 or channels < 1:
        raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
    n = len(samples) // channels
    return samples[: n * channels].reshape(n, channels).copy(), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ------------------------------------------------------------- helpers ----


def sniff(b: bytes) -> str | None:
    """Cheap magic-byte format sniff; None when no codec-free decoder
    applies (the operators then fall back to the declared stub path)."""
    if b[:2] == b"BM":
        return "bmp"
    if b[:2] == b"P6":
        return "ppm"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b.startswith(_PNG_SIG):
        return "png"
    return None


def decode_image(b: bytes) -> np.ndarray:
    kind = sniff(b)
    if kind == "bmp":
        return decode_bmp(b)
    if kind == "ppm":
        return decode_ppm(b)
    if kind == "png":
        return decode_png(b)
    raise ValueError("no codec-free image decoder for payload")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (H, W, 3) → (height, width, 3).

    Pure index-gather (two take()s), the standard pre-embedding resize;
    deterministic and allocation-bounded — right for a per-worker UDF.
    """
    h, w = arr.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[rows][:, cols]


# ---------------------------------------------------------------- PNG ----
#
# PNG is a genuinely COMPRESSED format (DEFLATE inside IDAT), decodable
# with zero external codec libraries: stdlib zlib inflates, numpy
# unfilters.  Supports the baseline profile: 8-bit depth, color types
# 0 (gray) / 2 (RGB) / 6 (RGBA), no interlace — which covers every PNG
# a synthetic or screenshot-style corpus emits.  CRCs are verified.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec 9.4) over int32 arrays."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(b: bytes) -> np.ndarray:
    """Decode a baseline PNG → (H, W, channels) uint8 array.

    Chunk walk with CRC verification, zlib inflate of concatenated IDATs,
    then scanline unfiltering: None/Up/Sub vectorized (Sub is a per-lane
    modular cumsum), Average/Paeth sequential per byte (their recurrence
    is inherently serial; rows are short relative to inflate cost).
    Raises ValueError on non-baseline profiles.
    """
    import zlib  # noqa: PLC0415

    if not b.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        if pos + 12 + length > len(b):
            raise ValueError("truncated PNG chunk")
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", b, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            if len(data) != 13:
                raise ValueError("bad IHDR length")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as ex:  # truncated/garbled DEFLATE must not escape
        raise ValueError(f"PNG inflate failed: {ex}") from ex
    n = w * ch
    if len(raw) != h * (1 + n):
        raise ValueError("PNG scanline payload has wrong length")
    raw_rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + n)
    out = np.zeros((h, n), dtype=np.int32)
    prev = np.zeros(n, dtype=np.int32)
    for y in range(h):
        f = int(raw_rows[y, 0])
        row = raw_rows[y, 1:].astype(np.int32)
        if f == 0:
            cur = row
        elif f == 1:  # Sub: per-lane modular prefix sum
            cur = row.copy()
            for k in range(ch):
                cur[k::ch] = np.cumsum(cur[k::ch], dtype=np.int64) % 256
        elif f == 2:  # Up
            cur = (row + prev) % 256
        elif f in (3, 4):  # Average / Paeth: serial recurrence
            cur = np.zeros(n, dtype=np.int32)
            for i in range(n):
                left = cur[i - ch] if i >= ch else 0
                up = prev[i]
                ul = prev[i - ch] if i >= ch else 0
                if f == 3:
                    pred = (left + up) // 2
                else:
                    pred = int(_paeth_vec(np.int32(left), np.int32(up), np.int32(ul)))
                cur[i] = (row[i] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8).reshape(h, w, ch)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W[, channels]) uint8 → baseline PNG bytes, every scanline
    filtered with ``filter_type`` (0..4).  Forward filtering has no
    serial dependency, so all five filters are pure shifted-array
    arithmetic — which makes the encoder the adversarial test rig for
    the decoder's serial unfilter paths (round-trip per filter type).
    """
    import zlib  # noqa: PLC0415

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    cur = arr.reshape(h, w * ch).astype(np.int32)
    prev = np.vstack([np.zeros((1, w * ch), np.int32), cur[:-1]])
    left = np.zeros_like(cur)
    left[:, ch:] = cur[:, :-ch]
    upleft = np.zeros_like(prev)
    upleft[:, ch:] = prev[:, :-ch]
    if filter_type == 0:
        filtered = cur
    elif filter_type == 1:
        filtered = cur - left
    elif filter_type == 2:
        filtered = cur - prev
    elif filter_type == 3:
        filtered = cur - (left + prev) // 2
    elif filter_type == 4:
        filtered = cur - _paeth_vec(left, prev, upleft)
    else:
        raise ValueError(f"bad PNG filter type {filter_type}")
    lines = np.hstack(
        [np.full((h, 1), filter_type, np.uint8), (filtered % 256).astype(np.uint8)]
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(lines.tobytes()))
        + chunk(b"IEND", b"")
    )

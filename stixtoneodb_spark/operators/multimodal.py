"""Multimodal columns: opaque binary payloads + typed metadata + decode.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature steps are Arrow-batched ``mapInPandas``
over those bytes.  Codec-free formats (uncompressed BMP, P6 PPM, PCM-16
WAV — ``functions/codecs.py``, pure numpy) are decoded FOR REAL:
bytes → array → resize/window → bytes inside the worker.  Payloads in
formats that need absent codec libraries (JPEG/MP3/MP4…) fall back to a
clearly-marked deterministic stub behind the same schema/batching
contract, flagged ``decoded=false`` so downstream can filter.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stixtoneodb_spark.functions import codecs
from stixtoneodb_spark.sources.tables import load_table

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("decoded_ok", T.BooleanType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media-shaped table from documents: payload = utf-8
    bytes of text, media_type derived from source.  At production scale
    this column is real image/audio bytes read from parquet/Iceberg."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.concat(F.lit("application/x-"), F.col("source")).alias("media_type"),
    )


def media_table_decodable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table whose payloads are REAL decodable bytes: deterministic
    BMP images (doc_id-seeded gradient) for even ids, PCM-16 WAV tones
    for odd ids — generated worker-side from the documents table so the
    decode operators exercise the full bytes→array→bytes path without
    any codec library."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, kinds = [], [], []
            for doc_id in pdf["doc_id"]:
                if doc_id % 2 == 0:
                    h, w = 17 + doc_id % 13, 23 + doc_id % 7  # odd sizes: row padding
                    yy, xx = np.mgrid[0:h, 0:w]
                    arr = np.stack(
                        [(yy * 7 + doc_id) % 256, (xx * 11) % 256, (yy + xx) % 256],
                        axis=-1,
                    ).astype(np.uint8)
                    payloads.append(codecs.encode_bmp(arr))
                    kinds.append("image/bmp")
                else:
                    n = 2000 + int(doc_id) % 500
                    t = np.arange(n)
                    tone = (8000 * np.sin(2 * np.pi * (220 + doc_id % 200) * t / 16000)).astype(
                        np.int16
                    )
                    payloads.append(codecs.encode_wav(tone, 16000))
                    kinds.append("audio/wav")
                ids.append(doc_id)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads, "media_type": kinds})

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(synth, schema)


def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_metadata_over(media_table(spark, sf_dir))


def media_metadata_over(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    ``mapInPandas`` receives pa→pandas batches of (doc_id, payload bytes,
    media_type); the UDF computes byte length + sha256 digest and
    attempts a real codec-free decode (``decoded_ok`` reports whether a
    decoder accepted the payload).  Partitioning note: binary batches are
    large — ``spark.sql.execution.arrow.maxRecordsPerBatch`` caps batch
    memory.
    """
    import hashlib  # noqa: PLC0415

    def try_decode(b: bytes) -> bool:
        kind = codecs.sniff(b)
        try:
            if kind in ("bmp", "ppm", "png"):
                return codecs.decode_image(b) is not None
            if kind == "wav":
                return codecs.decode_wav(b) is not None
        except ValueError:
            return False
        return False

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "digest": pdf["payload"].map(lambda b: hashlib.sha256(b).hexdigest()),
                    "media_type": pdf["media_type"],
                    "decoded_ok": pdf["payload"].map(try_decode),
                }
            )
            yield out

    return media.mapInPandas(extract, MEDIA_META_SCHEMA)


DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("height", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("c0_sum", T.LongType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-decode proof surface: decode every payload of the decodable
    media table worker-side (BMP → pixel array, WAV → PCM samples) and
    emit per-doc stats (dimensions, channel-0 pixel sum, sample count).

    The synthetic payload content is a closed-form function of doc_id, so
    a SQL oracle reproduces these stats arithmetically — any decode bug
    (row padding, BGR order, bottom-up rows, chunk alignment) breaks the
    cross-engine hash match.
    """

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if codecs.sniff(b) in ("bmp", "ppm"):
                    arr = codecs.decode_image(b)
                    rows.append(
                        (doc_id, "bmp", arr.shape[0], arr.shape[1],
                         int(arr[..., 0].astype(np.int64).sum()), None)
                    )
                else:
                    samples, _rate = codecs.decode_wav(b)
                    rows.append((doc_id, "wav", None, None, None, len(samples)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "kind", "height", "width", "c0_sum", "n_samples"]
            )

    return (
        media_table_decodable(spark, sf_dir)
        .mapInPandas(stats, DECODE_STATS_SCHEMA)
        .orderBy("doc_id")
    )


def media_metadata_oracle_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-comparable projection of media_metadata (drops the stub-only
    decoded_ok flag)."""
    return media_metadata(spark, sf_dir).select("doc_id", "n_bytes", "digest")


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def media_resize(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image-resize stage: Arrow-batched ``mapInPandas`` over binary
    payloads → fixed-size raw-RGB frames (width*height*3 bytes).

    BMP/PPM payloads take the REAL path: pure-numpy decode
    (``functions/codecs.py``) + nearest-neighbor resample — the standard
    pre-embedding normalization, no codec library needed.  Payloads in
    formats that need absent libraries (JPEG etc.) fall back to a
    DETERMINISTIC FAKE (sha256-keyed byte tile of the same geometry) with
    ``decoded=false``, keeping the schema/batching contract identical.
    Per-batch memory is bounded by ``arrow.maxRecordsPerBatch``.
    """
    import hashlib  # noqa: PLC0415

    n_out = width * height * 3

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes) -> tuple[bytes, bool]:
            if codecs.sniff(b) in ("bmp", "ppm"):
                try:
                    arr = codecs.decode_image(b)
                    return codecs.resize_nearest(arr, width, height).tobytes(), True
                except ValueError:
                    pass
            # STUB fallback for codec-needing formats: digest tile
            seed = hashlib.sha256(b).digest()
            return (seed * (n_out // len(seed) + 1))[:n_out], False

        for pdf in batches:
            pairs = [one(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "resized": [p[0] for p in pairs],
                    "decoded": [p[1] for p in pairs],
                }
            )

    return media.mapInPandas(resize, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def media_frame_sample(media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Frame/window-sampling stage: one input payload → N frame rows.

    WAV payloads take the REAL path: PCM decode (pure numpy), split into
    up to ``max_frames`` equal sample windows, each re-encoded as a
    standalone WAV — the audio-chunking step a training pipeline runs
    before per-window feature extraction.  Video formats would need
    ffmpeg keyframe seeks (absent), so non-WAV payloads keep the STUB
    fixed-stride byte slicing.  Either way the Spark contract is the real
    one: a row-expanding mapInPandas (one binary in, ≤``max_frames`` rows
    out), so downstream per-frame operators (resize, embed) see the same
    shape they would with real video.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if codecs.sniff(payload) == "wav":
                    try:
                        samples, rate = codecs.decode_wav(payload)
                        n = len(samples)
                        k = min(max_frames, max(1, n // max(1, every_n_bytes // 2)))
                        step = n // k
                        for i in range(k):
                            win = samples[i * step : (i + 1) * step if i < k - 1 else n]
                            ids.append(doc_id)
                            idxs.append(i)
                            frames.append(codecs.encode_wav(win, rate))
                        continue
                    except ValueError:
                        pass
                # STUB: real impl = ffmpeg keyframe extraction
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(sample, FRAME_SCHEMA)


RESIZE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("c0_sum", T.LongType()),
        T.StructField("c1_sum", T.LongType()),
        T.StructField("c2_sum", T.LongType()),
    ]
)

RESIZE_STATS_OUT = 16  # bench-scale output side; production passes 224


def media_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle surface for the REAL resize path: decode + nearest-neighbor
    resample every synthetic BMP through ``media_resize`` itself (the
    production operator), then reduce the resized raw-RGB frames to
    per-channel integer sums.

    The synthetic pixel content and the resampler's index math
    (``rows[i] = i*h // H``) are both closed-form, so DuckDB reproduces
    the post-RESIZE sums arithmetically — any bug in decode (padding,
    BGR order, bottom-up rows) or in the gather indices breaks the hash.
    Integer-only outputs: float-format-proof.
    """
    side = RESIZE_STATS_OUT
    bmp = media_table_decodable(spark, sf_dir).where(F.col("doc_id") % 2 == 0)
    resized = media_resize(bmp, width=side, height=side)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, ok in zip(pdf["doc_id"], pdf["resized"], pdf["decoded"]):
                assert ok, "synthetic BMPs must take the real decode path"
                arr = np.frombuffer(bytes(blob), dtype=np.uint8).reshape(side, side, 3)
                s = arr.astype(np.int64).sum(axis=(0, 1))
                rows.append((doc_id, side, side, int(s[0]), int(s[1]), int(s[2])))
            yield pd.DataFrame(
                rows, columns=["doc_id", "out_h", "out_w", "c0_sum", "c1_sum", "c2_sum"]
            )

    return resized.mapInPandas(stats, RESIZE_STATS_SCHEMA)


PNG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("filter_type", T.LongType()),
        T.StructField("c0_sum", T.LongType()),
        T.StructField("c1_sum", T.LongType()),
    ]
)


def media_decode_stats_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode proof: PNG (DEFLATE via stdlib zlib +
    pure-numpy unfiltering, ``codecs.decode_png``) — the format tier the
    earlier rounds stubbed is now genuinely decoded for PNG.

    Worker-side synth encodes a doc_id-seeded RGB gradient with scanline
    filter ``doc_id % 5`` — so the DISTRIBUTED decode path exercises all
    five PNG filter reconstructions (None/Sub/Up/Average/Paeth), then
    decodes its own bytes back and emits pixel-sum stats.  The payload
    content is closed-form in doc_id, so the DuckDB oracle reproduces
    the stats arithmetically: any bug in chunk walking, CRC, inflate
    framing, or ANY filter's unfilter recurrence breaks the hash match.

    Scale shape: per-payload CPU inside Arrow-batched mapInPandas —
    embarrassingly parallel, no shuffle at all (the orderBy is
    presentation-only at oracle scale).
    """

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                h, w = 11 + doc_id % 9, 13 + doc_id % 11
                yy, xx = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [
                        (yy * 5 + doc_id) % 256,
                        (xx * 3 + 2 * doc_id) % 256,
                        (yy + xx) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                ft = int(doc_id) % 5
                decoded = codecs.decode_png(codecs.encode_png(arr, filter_type=ft))
                rows.append(
                    (
                        doc_id,
                        decoded.shape[0],
                        decoded.shape[1],
                        ft,
                        int(decoded[..., 0].astype(np.int64).sum()),
                        int(decoded[..., 1].astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "height", "width", "filter_type", "c0_sum", "c1_sum"
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(stats, PNG_STATS_SCHEMA).orderBy("doc_id")


JPEG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("pixel_sum", T.LongType()),
    ]
)


def media_decode_stats_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode proof (pure-numpy JFIF codec,
    ``codecs.decode_jpeg``): Huffman entropy decode, dequantization,
    IDCT, level shift — the format tier that stayed an honest stub
    through round 4 is now genuinely decoded.

    Worker-side synth builds a doc_id-seeded grayscale image of constant
    8x8 blocks with EVEN values: for such blocks the lossy pipeline is
    EXACT (DC = 8·(v-128), Annex-K Q[0,0] = 16 → quantized DC =
    (v-128)/2 with no rounding, IDCT reconstructs v bit-exactly), so the
    decoded pixel sum is closed-form in doc_id and the DuckDB oracle
    reproduces it arithmetically.  The encode→decode pass still runs the
    full real machinery — marker framing, canonical Huffman tables, DC
    prediction differences across blocks, EOB symbols, byte stuffing,
    dequant, IDCT — and ANY scaling/table/prediction bug breaks the
    cross-engine hash.  (Nonzero-AC paths — run lengths, ZRL, magnitude
    categories — are pinned integer-exactly by the coefficient-level
    roundtrip tests in tests/test_codecs.py.)

    Scale shape: per-payload CPU inside Arrow-batched mapInPandas —
    embarrassingly parallel, no shuffle (the orderBy is presentation-only
    at oracle scale).
    """

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                hb, wb = 2 + doc_id % 3, 2 + doc_id % 4
                img = np.zeros((hb * 8, wb * 8), dtype=np.uint8)
                for i in range(hb):
                    for j in range(wb):
                        v = 2 * ((doc_id + 17 * i + 29 * j) % 128)
                        img[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8] = v
                decoded = codecs.decode_jpeg(codecs.encode_jpeg(img))
                rows.append(
                    (
                        doc_id,
                        decoded.shape[0],
                        decoded.shape[1],
                        int(decoded.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "height", "width", "pixel_sum"]
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(stats, JPEG_STATS_SCHEMA).orderBy("doc_id")

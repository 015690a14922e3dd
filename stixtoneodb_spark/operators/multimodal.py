"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature steps are Arrow-batched ``mapInPandas``
over those bytes.  The decode libraries are not in this container, so the
decode body is a clearly-marked deterministic stub — the Spark-side
contract (schema, batching, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def _decode_stub(payload: bytes) -> dict:
    """STUB decode: the real implementation would call PIL/librosa/ffmpeg
    here.  Deterministic fake so the pipeline shape is testable without
    the codec libraries."""
    raise NotImplementedError("media codecs not available in this container")


def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    ``mapInPandas`` receives pa→pandas batches of (doc_id, payload bytes,
    media_type); the UDF computes byte length + sha256 digest (the real
    decode is stubbed).  Partitioning note: binary batches are large —
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` caps batch memory.
    """
    import hashlib  # noqa: PLC0415

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "digest": pdf["payload"].map(lambda b: hashlib.sha256(b).hexdigest()),
                    "media_type": pdf["media_type"],
                    "decoded_ok": False,  # stub: decode not attempted
                }
            )
            yield out

    return media_table(spark, sf_dir).mapInPandas(extract, MEDIA_META_SCHEMA)


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
    ]
)


def media_resize(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image-resize stage: Arrow-batched ``mapInPandas`` over binary
    payloads → fixed-size decoded frames.

    The decode+resample body would call PIL/cv2 (`Image.open(BytesIO(b))
    .resize((w, h))`); those codecs are absent in this container, so the
    body is a DETERMINISTIC FAKE (sha256-keyed byte tile of exactly
    width*height*3 bytes) behind the same schema/batching contract — the
    Spark-side plumbing (binary in, fixed-size binary out, per-batch
    memory bounded by arrow.maxRecordsPerBatch) is real and tested.
    """
    import hashlib  # noqa: PLC0415

    n_out = width * height * 3

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fake_decode(b: bytes) -> bytes:
                # STUB: real impl = PIL decode + resize; fake = repeat the
                # payload digest to the exact output geometry
                seed = hashlib.sha256(b).digest()
                reps = n_out // len(seed) + 1
                return (seed * reps)[:n_out]

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "resized": pdf["payload"].map(fake_decode),
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
    """Video frame-sampling stage: one input payload → N frame rows.

    Real impl would ffmpeg-seek keyframes; the STUB slices the payload at
    fixed strides, preserving the real contract that matters to Spark: a
    row-expanding mapInPandas (one binary in, up to ``max_frames`` rows
    out), so downstream per-frame operators (resize, embed) see the same
    shape they would with real video.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # STUB: real impl = ffmpeg keyframe extraction
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(sample, FRAME_SCHEMA)

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

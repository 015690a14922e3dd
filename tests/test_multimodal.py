"""Multimodal stages: schema, batch shape, determinism, and the REAL
codec-free decode path (BMP/WAV through pure-numpy codecs); only
codec-needing formats fall back to the declared stub."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from stixtoneodb_spark.functions import codecs
from stixtoneodb_spark.operators import multimodal

SF = "/root/testdata/sf0.001"


def test_media_resize_real_decode_value_checked(spark):
    """Planted BMP fixture → media_resize must produce the EXACT
    nearest-neighbor resample computed independently in numpy."""
    arr = np.stack(
        [np.tile(np.arange(30) * 8, (20, 1)),
         np.tile((np.arange(20) * 12)[:, None], (1, 30)),
         np.full((20, 30), 9)],
        axis=-1,
    ).astype(np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(codecs.encode_bmp(arr)), "image/bmp")],
        "doc_id long, payload binary, media_type string",
    )
    row = multimodal.media_resize(media, width=8, height=8).first()
    assert row["decoded"] is True
    expect = codecs.resize_nearest(arr, 8, 8).tobytes()
    assert bytes(row["resized"]) == expect


def test_media_decodable_table_end_to_end(spark):
    """The decodable synthetic table: every BMP payload decodes for real
    (resize flags decoded=true), every WAV payload splits into real PCM
    windows whose concatenated samples equal the original signal."""
    media = multimodal.media_table_decodable(spark, SF)
    imgs = media.where(F.col("media_type") == "image/bmp")
    out = multimodal.media_resize(imgs, width=16, height=16)
    n_img = imgs.count()
    assert n_img > 0
    assert out.where(F.col("decoded")).count() == n_img

    wavs = media.where(F.col("media_type") == "audio/wav").limit(3).collect()
    frames = multimodal.media_frame_sample(
        spark.createDataFrame(wavs), every_n_bytes=1024, max_frames=4
    )
    by_doc = {}
    for r in frames.collect():
        by_doc.setdefault(r["doc_id"], []).append((r["frame_idx"], bytes(r["frame"])))
    for w in wavs:
        orig, rate = codecs.decode_wav(bytes(w["payload"]))
        parts = [codecs.decode_wav(f)[0] for _, f in sorted(by_doc[w["doc_id"]])]
        assert all(codecs.decode_wav(f)[1] == rate for _, f in by_doc[w["doc_id"]])
        assert np.array_equal(np.concatenate(parts), orig)


def test_media_metadata_decoded_ok_flags(spark):
    """decoded_ok is a REAL decode attempt: true on the decodable table,
    false on the text-bytes table (no sniffable magic)."""
    dec = multimodal.media_metadata_over(multimodal.media_table_decodable(spark, SF))
    assert dec.where(~F.col("decoded_ok")).count() == 0
    txt = multimodal.media_metadata(spark, SF)
    assert txt.where(F.col("decoded_ok")).count() == 0


def test_media_resize_shape_and_determinism(spark):
    media = multimodal.media_table(spark, SF)
    out = multimodal.media_resize(media, width=16, height=16)
    rows = out.limit(5).collect()
    assert all(len(r["resized"]) == 16 * 16 * 3 for r in rows)
    # deterministic across runs (content-derived stub)
    again = {r["doc_id"]: r["resized"] for r in multimodal.media_resize(media, 16, 16).limit(5).collect()}
    for r in rows:
        assert again[r["doc_id"]] == r["resized"]


def test_media_frame_sample_expands_rows(spark):
    media = multimodal.media_table(spark, SF)
    frames = multimodal.media_frame_sample(media, every_n_bytes=64, max_frames=4)
    n_docs = media.count()
    n_frames = frames.count()
    assert n_frames >= n_docs  # at least one frame per payload
    assert n_frames <= n_docs * 4
    # frame_idx dense from 0 per doc
    bad = (
        frames.groupBy("doc_id")
        .agg(F.min("frame_idx").alias("lo"), F.countDistinct("frame_idx").alias("k"), F.max("frame_idx").alias("hi"))
        .where((F.col("lo") != 0) | (F.col("hi") != F.col("k") - 1))
    )
    assert bad.count() == 0


def test_media_metadata_digest_matches_builtin(spark):
    """The mapInPandas sha256 must equal Spark's builtin sha2 over the same
    bytes — pins the Arrow binary round-trip as lossless."""
    media = multimodal.media_table(spark, SF)
    meta = multimodal.media_metadata(spark, SF).select("doc_id", "digest")
    ref = media.select("doc_id", F.sha2("payload", 256).alias("ref_digest"))
    j = meta.join(ref, "doc_id")
    assert j.where(F.col("digest") != F.col("ref_digest")).count() == 0

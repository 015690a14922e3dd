"""Deduplication operators over the documents table — the training-data
pipeline tier: exact, MinHash-LSH, SimHash, n-gram Jaccard.

The reference dedups on exact id via the Neo4j index (README.md:75, A15);
at corpus scale identity must be derived from content.  All variants here
are pure DataFrame expressions (no Python UDFs): shingling, MinHash and
SimHash are built from transform/aggregate/xxhash64, so they run inside
whole-stage codegen and shuffle only on compact keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stixtoneodb_spark.functions.textfns import (
    lsh_band_keys,
    minhash_signature,
    tokens,
    word_shingles,
)
from stixtoneodb_spark.sources.tables import load_table


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep min doc_id per text.

    The shuffle key is md5(text), not text — at 100 TB the shuffle carries
    16-byte keys instead of documents.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("text_hash", F.md5("text"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


def dedup_exact_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, row-preserving form: first row per content wins
    (row_number over content hash — the A15 latest-wins pattern)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
    )


MAX_BLOCK = 64  # LSH skew guard: cap membership of degenerate mega-blocks


def _minhash_pairs(d: DataFrame, num_hashes: int, num_bands: int, jaccard_floor: float) -> DataFrame:
    rows_per_band = num_hashes // num_bands
    sig = (
        d.select("doc_id", word_shingles(F.col("text"), 3).alias("sh"))
        .where(F.size("sh") > 0)
        .withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
        .withColumn("band", F.explode(lsh_band_keys(F.col("sig"), num_bands, rows_per_band)))
        .select("band", "doc_id", "sh")
    )
    # A band key shared by thousands of documents is a degenerate block
    # (boilerplate-like content): candidate pairs would go quadratic.  Cap
    # block membership — true near-dups still meet in their other bands.
    sig = sig.withColumn(
        "rn", F.row_number().over(Window.partitionBy("band").orderBy("doc_id"))
    ).where(F.col("rn") <= MAX_BLOCK).drop("rn")
    a = sig.select("band", F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sig.select("band", F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        a.join(b, "band")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.withColumn("jaccard", F.round(inter / union, 6))
        .where(F.col("jaccard") >= jaccard_floor)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via MinHash-LSH banding + exact Jaccard verify.

    shingle → minhash → band → bucket-join: candidate generation is
    O(n·bands) rows instead of O(n²) pairs; the exact Jaccard then verifies
    only bucketed candidates.  (Deterministic: hash seeds fixed.)
    """
    d = load_table(spark, sf_dir, "documents")
    return _minhash_pairs(d, num_hashes=32, num_bands=16, jaccard_floor=0.5)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup buckets: 64-bit signature from token hashes.

    Each token votes its hash bits weighted ±1; the sign vector packs into
    a long.  Documents sharing the full signature (or a band of it) are
    near-dup candidates.  Pure DataFrame: aggregate over bit positions.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    # bit b of simhash = 1 iff sum over tokens of sign(bit b of xxhash64(tok)) > 0
    # (bit_get takes a column-valued position; shiftleft does not, so the
    # pack step uses exact powers of two instead)
    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(62)),
        lambda b: F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc + F.when(F.bit_get(F.xxhash64(t), b) == 1, 1).otherwise(-1),
        ),
    )
    simhash = F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(62)),
            lambda vote, b: F.when(vote > 0, F.pow(F.lit(2.0), b).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseXOR(x),
    )
    sigs = d.select("doc_id", simhash.alias("simhash"))
    # bucket by signature: identical simhash -> near-dup group
    return (
        sigs.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard similarity pairs (threshold 0.8) — the exact
    verify tier run over LSH candidates (not all pairs)."""
    d = load_table(spark, sf_dir, "documents")
    return _minhash_pairs(d, num_hashes=32, num_bands=16, jaccard_floor=0.8)

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
    minhash_band_table,
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
    # shingle arrays computed once, kept OUT of the band shuffle: the
    # blocking path below carries only (band, doc_id); shingles re-attach
    # at candidate cardinality for the exact verify.  At 100 TB the band
    # shuffle carries ~50-byte rows instead of whole shingle sets.
    docs = (
        d.select("doc_id", word_shingles(F.col("text"), 3).alias("sh"))
        .where(F.size("sh") > 0)
        .persist()
    )
    sig = minhash_band_table(docs, "doc_id", "sh", num_hashes, num_bands).select(
        "band", "doc_id"
    ).persist()
    # A band key shared by thousands of documents is a degenerate block
    # (boilerplate-like content): candidate pairs would go quadratic.  Drop
    # such blocks wholly — true near-dups still meet in their other bands.
    # Partial-agg count + semi join, not a per-band window: a row_number
    # over the band key funnels the hottest band into a single task.
    band_sizes = sig.groupBy("band").agg(F.count("*").alias("bn"))
    sig = sig.join(band_sizes.where(F.col("bn") <= MAX_BLOCK), "band", "left_semi")
    a = sig.select("band", F.col("doc_id").alias("id_a"))
    b = sig.select("band", F.col("doc_id").alias("id_b"))
    pairs = (
        a.join(b, "band")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .join(docs.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(docs.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
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
    # bit b of simhash = 1 iff sum over tokens of sign(bit b of xxhash64(tok)) > 0.
    # Codegen path: explode tokens, 63 plain sum-aggregates (map-side
    # partial agg), pack bits as a sum of exact powers of two.  The
    # higher-order-function form (transform+aggregate lambdas) evaluates
    # interpreted and was ~20x slower.  explode_outer keeps token-less
    # documents (signature 0), matching the array-form semantics.
    ex = d.select(
        "doc_id", F.explode_outer(tokens(F.col("text"))).alias("t")
    )
    h = F.xxhash64("t")
    vote = F.when(F.col("t").isNull(), F.lit(0))
    aggs = [
        F.sum(
            vote.otherwise(F.when(F.bit_get(h, F.lit(b)) == 1, 1).otherwise(-1))
        ).alias(f"v{b}")
        for b in range(63)
    ]
    votes = ex.groupBy("doc_id").agg(*aggs)
    packed = F.lit(0).cast("long")
    for b in range(63):
        packed = packed + F.when(
            F.col(f"v{b}") > 0, F.lit(2**b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    sigs = votes.select("doc_id", packed.alias("simhash"))
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


def dedup_embedding_cosine(
    spark: SparkSession, sf_dir: str, threshold: float = 0.45
) -> DataFrame:
    """Embedding-cosine near-dup pairs: vectors with cosine above the
    threshold are duplicate candidates.  (Production near-dup uses ~0.99;
    the synthetic vectors are near-orthogonal, so the registry binds a
    data-relative 0.45 to keep the oracle check non-vacuous.)

    Exact form (oracle-checkable): the corpus joined to itself with the
    dot product as a JVM array expression.  Scale path: replace the
    self-join with the LSH-bucketed variant (similarity.ann_lsh_bucketed)
    — same verify expression, candidates from hyperplane buckets instead
    of the cross product.  The self-join here is bounded to id_a < id_b
    and exists as the correctness baseline, mirroring how dedup_minhash_lsh
    is the scale path for dedup_ngram_jaccard.
    """
    from stixtoneodb_spark.operators.similarity import _dot, _norm  # noqa: PLC0415

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "cosine", _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
    )

"""Similarity search over the embeddings table (array<float> column).

Brute-force cosine top-k is the exact baseline (oracle-checkable against
DuckDB's list_cosine_similarity); the LSH-bucketed variant is the scale
path: random-hyperplane signatures shrink the candidate set so the
pairwise work is per-bucket, not global.  Dot products are computed with
``aggregate``/``zip_with`` — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stixtoneodb_spark.sources.tables import load_table

N_QUERIES = 10  # first N vectors double as the query set
TOP_K = 5


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus.

    Output carries only integer columns (query_id, neighbor_id, rank) so
    the oracle comparison is float-format-proof; ranking ties break on
    neighbor id.  At scale: queries broadcast, corpus scanned once,
    per-partition top-k via window over the small query dimension.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("v"))
    scored = (
        corpus.join(F.broadcast(queries))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: 16-bit signatures from deterministic
    pseudo-random hyperplanes; candidates = same-bucket vectors; exact
    cosine re-rank within buckets.

    The hyperplane matrix is derived from xxhash64(dim, plane) — no stored
    model, fully deterministic, reproducible on any cluster.  Scale: the
    bucket join replaces the full cross product; recall tunes via
    signature bits / multi-probe.
    """
    n_planes = 16
    emb = load_table(spark, sf_dir, "embeddings")

    def hyperplane_dot(vec: Column, plane: int) -> Column:
        # pseudo-random ±1 hyperplane: sign of xxhash64(dim_index, plane)
        dims = F.sequence(F.lit(0), F.size(vec) - 1)
        signs = F.transform(
            dims,
            lambda i: F.when(
                F.pmod(F.xxhash64(i.cast("string"), F.lit(plane)), F.lit(2)) == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0)),
        )
        return F.aggregate(
            F.zip_with(vec, signs, lambda x, s: (x * s).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    sig_bits = [
        F.when(hyperplane_dot(F.col("embedding"), p) > 0, F.lit(1)).otherwise(F.lit(0)).alias(f"b{p}")
        for p in range(n_planes)
    ]
    sigs = emb.select("vec_id", "embedding", *sig_bits)
    bucket = F.concat_ws("", *[F.col(f"b{p}") for p in range(n_planes)])
    bucketed = sigs.withColumn("bucket", bucket).select("vec_id", "embedding", "bucket")

    a = bucketed.select("bucket", F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = bucketed.select("bucket", F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "cosine",
            _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))),
        )
        .where(F.col("cosine") > 0.95)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


def embedding_label_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (IVF coarse quantizer step): centroids =
    per-label mean vectors; each vector assigned to nearest centroid.
    Demonstrates the IVF scale path: probe only the nearest list(s)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim_vals = emb.select("vec_id", "label", F.posexplode("embedding").alias("dim", "val"))
    centroids = (
        dim_vals.groupBy("label", "dim")
        .agg(F.avg("val").alias("cval"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cval"))).alias("pairs"))
        .select(
            F.col("label").alias("centroid_label"),
            F.transform("pairs", lambda p: p.getField("cval")).alias("centroid"),
        )
    )
    scored = emb.join(F.broadcast(centroids)).withColumn(
        "cosine",
        _dot(F.col("embedding"), F.col("centroid"))
        / (_norm(F.col("embedding")) * _norm(F.col("centroid"))),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), "centroid_label")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", F.col("label").alias("true_label"), F.col("centroid_label").alias("assigned_label"))
    )

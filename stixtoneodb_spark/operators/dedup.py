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
    minhash_band_table_rows,
    tokens,
    word_shingle_rows,
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


MAX_BLOCK = 256  # LSH skew guard: cap membership of degenerate mega-blocks
# Representatives sampled from each oversized band: candidates become
# O(REPS · block) instead of O(block²); the co-member expansion below
# restores the quadratic OUTPUT only for members that actually verified.
BIG_BAND_REPS = 8


def _verify_jaccard(
    cand: DataFrame, rep_rows: DataFrame, sizes: DataFrame, jaccard_floor: float
) -> DataFrame:
    """Exact Jaccard verification at candidate cardinality, on shingle
    ROWS: shared-shingle count is a join + count; distinct-set sizes
    re-attach as two tiny aggregates — exactly |A∩B| and |A|+|B|-inter
    over DISTINCT shingles, the oracle's definition."""
    ra = rep_rows.select(F.col("doc_id").alias("id_a"), "sh")
    rb = rep_rows.select(F.col("doc_id").alias("id_b"), "sh")
    inter = (
        cand.join(ra, "id_a")
        .join(rb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    scored = inter.join(
        sizes.select(F.col("doc_id").alias("id_a"), F.col("nsh").alias("na")), "id_a"
    ).join(sizes.select(F.col("doc_id").alias("id_b"), F.col("nsh").alias("nb")), "id_b")
    return (
        scored.withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= jaccard_floor)
        .select("id_a", "id_b", "jaccard")
    )


def _minhash_pairs(d: DataFrame, num_hashes: int, num_bands: int, jaccard_floor: float) -> DataFrame:
    # The whole path works on shingle ROWS (doc_id, sh) - the all-codegen
    # representation (functions.textfns.word_shingle_rows): tokenize/
    # k-gram via explode + lead windows, signatures / fingerprints /
    # set sizes as plain groupBy(doc_id) aggregates that all ride the one
    # hash partitioning the window already established.  No interpreted
    # array lambdas, no wide array columns in any shuffle or cache.
    # Token-less documents vanish naturally (no rows), matching the
    # len(toks)>0 population the oracle uses.
    spark = d.sparkSession
    cached: list[DataFrame] = []

    def _persist(df: DataFrame) -> DataFrame:
        cached.append(df.persist())
        return df

    rows = _persist(word_shingle_rows(d, "doc_id", F.col("text"), 3))
    # Exact-duplicate pre-collapse: documents with IDENTICAL shingle sets
    # (byte-identical or punctuation-only variants - the primary cause of
    # mega near-dup families) are collapsed to one representative BEFORE
    # banding.  A family of 10k identical docs would otherwise share all
    # its bands, trip the MAX_BLOCK guard, and silently lose every pair;
    # collapsed, the family costs one representative in the LSH and its
    # pairs are reconstructed arithmetically below.
    fpn = rows.groupBy("doc_id").agg(
        F.sha2(F.concat_ws("\x01", F.sort_array(F.collect_list("sh"))), 256).alias("fp")
    )
    members = _persist(
        fpn.join(fpn.groupBy("fp").agg(F.min("doc_id").alias("rep_id")), "fp").select(
            "doc_id", "rep_id"
        )
    )
    rep_rows = _persist(
        rows.join(
            members.where(F.col("doc_id") == F.col("rep_id")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    )
    sig = _persist(minhash_band_table_rows(rep_rows, "doc_id", num_hashes, num_bands))
    # A band key shared by thousands of distinct-content documents is a
    # degenerate block: all-pairs candidate generation would go quadratic.
    # Small bands (bn <= MAX_BLOCK) self-join as usual.  OVERSIZED bands
    # are no longer dropped wholly (that silently lost every pair of a
    # >MAX_BLOCK family of non-identical near-dups — boilerplate with
    # timestamps, the primary web-corpus dedup target): instead each
    # oversized band contributes only (representative × member) candidates
    # for its BIG_BAND_REPS smallest doc_ids — linear in band size — and
    # the co-member expansion below restores member-member pairs for the
    # candidates that actually verified.  Junk bands (pairs that fail the
    # exact verify) thus cost O(REPS·block) and produce nothing.
    # Partial-agg count + semi join, not a per-band window: a row_number
    # over the band key funnels the hottest band into a single task.
    band_sizes = _persist(sig.groupBy("band").agg(F.count("*").alias("bn")))
    # Big-tier gate (round 4): on most corpora NO band is oversized, yet
    # round 3 ran the big-sig semi-join, rep aggregation, cand_big union,
    # the rep_ids star joins and the v2 verify pass unconditionally —
    # doubling the query wall for machinery whose inputs were empty.  One
    # cheap existence probe on the (persisted, vocabulary-scale) band
    # sizes collapses the plan to the small-band shape when it can.  The
    # probe is a driver barrier, but band_sizes must materialize for the
    # small/big split anyway — at 100 TB it is one limit-1 scan of an
    # already-cached band-count table.
    has_big = band_sizes.where(F.col("bn") > MAX_BLOCK).limit(1).count() > 0
    small_sig = sig.join(band_sizes.where(F.col("bn") <= MAX_BLOCK), "band", "left_semi")
    a = small_sig.select("band", F.col("doc_id").alias("id_a"))
    b = small_sig.select("band", F.col("doc_id").alias("id_b"))
    cand_small = a.join(b, "band").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")

    if has_big:
        big_sig = sig.join(band_sizes.where(F.col("bn") > MAX_BLOCK), "band", "left_semi")
        # K smallest doc_ids per oversized band: bounded-output agg (sorted
        # slice), deterministic, no per-band window.
        band_reps = big_sig.groupBy("band").agg(
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, BIG_BAND_REPS).alias("reps")
        )
        rep_ids = _persist(
            band_reps.select(F.explode("reps").alias("rep_id_big")).distinct()
        )
        cand_big = (
            big_sig.join(band_reps, "band")
            .select(F.explode("reps").alias("r"), "doc_id")
            .where(F.col("r") != F.col("doc_id"))
            .select(
                F.least("r", "doc_id").alias("id_a"), F.greatest("r", "doc_id").alias("id_b")
            )
        )
        cand1 = _persist(
            cand_small.unionByName(cand_big).dropDuplicates(["id_a", "id_b"])
        )
    else:
        cand1 = _persist(cand_small.dropDuplicates(["id_a", "id_b"]))
    sizes = _persist(rep_rows.groupBy("doc_id").agg(F.count("*").alias("nsh")))
    v1 = _persist(_verify_jaccard(cand1, rep_rows, sizes, jaccard_floor))

    if has_big:
        # Co-member expansion (round 2): members of an oversized band only
        # met a representative in round 1; any two docs verified against a
        # COMMON oversized-band representative are candidate pairs
        # themselves.  The quadratic cost is proportional to the verified
        # family, not the junk band.
        star_a = v1.join(
            rep_ids, v1.id_a == rep_ids.rep_id_big, "inner"
        ).select(F.col("rep_id_big").alias("r"), F.col("id_b").alias("m"))
        star_b = v1.join(
            rep_ids, v1.id_b == rep_ids.rep_id_big, "inner"
        ).select(F.col("rep_id_big").alias("r"), F.col("id_a").alias("m"))
        star = star_a.unionByName(star_b)
        cand2 = (
            star.alias("x")
            .join(star.alias("y"), "r")
            .where(F.col("x.m") < F.col("y.m"))
            .select(F.col("x.m").alias("id_a"), F.col("y.m").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
            .join(cand1, ["id_a", "id_b"], "left_anti")
        )
        v2 = _verify_jaccard(cand2, rep_rows, sizes, jaccard_floor)
        rep_pairs = v1.unionByName(v2)
    else:
        rep_pairs = v1

    # Expand representative pairs back to member pairs.  Cross-group: the
    # jaccard of (member_a, member_b) equals the representative pair's
    # (identical shingle sets); within-group: jaccard is exactly 1.0.
    m_a = members.select(F.col("rep_id").alias("id_a"), F.col("doc_id").alias("mem_a"))
    m_b = members.select(F.col("rep_id").alias("id_b"), F.col("doc_id").alias("mem_b"))
    cross = (
        rep_pairs.join(m_a, "id_a")
        .join(m_b, "id_b")
        .select(
            F.least("mem_a", "mem_b").alias("id_a"),
            F.greatest("mem_a", "mem_b").alias("id_b"),
            "jaccard",
        )
    )
    within = (
        members.alias("x")
        .join(members.alias("y"), F.col("x.rep_id") == F.col("y.rep_id"))
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    # Materialize eagerly (executor-local checkpoint) so every persisted
    # intermediate can be released HERE: library callers previously
    # accumulated four cached frames per invocation (round-2 advice);
    # the result frame is the only thing that outlives the call.
    try:
        return cross.unionByName(within).localCheckpoint(eager=True)
    finally:
        for df in cached:
            df.unpersist()


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via MinHash-LSH banding + exact Jaccard verify.

    shingle → minhash → band → bucket-join: candidate generation is
    O(n·bands) rows instead of O(n²) pairs; the exact Jaccard then verifies
    only bucketed candidates.  (Deterministic: hash seeds fixed.)
    """
    d = load_table(spark, sf_dir, "documents")
    return _minhash_pairs(d, num_hashes=32, num_bands=16, jaccard_floor=0.5)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup buckets: 32-bit signature from md5 token hashes.

    Each token votes its hash bits weighted ±1; the sign vector packs into
    a long.  Documents sharing the full signature (or a band of it) are
    near-dup candidates.  Pure DataFrame: aggregate over bit positions,
    hash family chosen to be cross-engine portable (oracle-checkable).
    """
    d = load_table(spark, sf_dir, "documents")
    # bit b of simhash = 1 iff sum over tokens of sign(bit b of hash(tok)) > 0.
    # The token hash is the first 32 bits of md5 — a PORTABLE hash (Spark
    # conv(substr(md5)), DuckDB hex-cast), so the DuckDB oracle reproduces
    # the signature bit-for-bit; round 1 used xxhash64, which no other
    # engine can replay, leaving this operator oracle-less.
    # Codegen path: explode tokens, 32 plain sum-aggregates (map-side
    # partial agg), pack bits as a sum of exact powers of two.  The
    # higher-order-function form (transform+aggregate lambdas) evaluates
    # interpreted and was ~20x slower.  Token-less documents are excluded
    # (no content signal), matching the dedup-tier population filter.
    sigs = simhash_sigs(d)
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


# Per-block row target: a tile is at most (TARGET × TARGET) float64 scores
# = 32 MB plus two (TARGET × dim) operand panels — bounded per task
# regardless of corpus size, because the block count B is DERIVED from the
# row count (B = ceil(n / TARGET)): per-task memory stays O(TARGET² +
# TARGET·dim) while task count grows as B(B+1)/2 — the scaling dimension a
# cluster absorbs.  (Round 2 fixed B=4, so per-task memory grew O((n/4)²)
# with the corpus — OOM, not slowdown, at 100×.)
GEMM_BLOCK_TARGET_ROWS = 2048


def dedup_embedding_cosine(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.45,
    n_blocks: int | None = None,
) -> DataFrame:
    """Exact embedding-cosine pairs via DISTRIBUTED BLOCKED MATMUL.

    Exact all-pairs similarity is inherently O(n²) flops, but round 1
    executed it as an O(n²)-ROW Spark cross join with an interpreted
    higher-order dot per row — a driver-of-record scale-killer.  This
    form is the standard blocked-GEMM decomposition: vectors are hashed
    into B blocks, each unordered block PAIR (p<=q) becomes one task that
    computes its (n/B x n/B) tile with one float64 BLAS matmul and emits
    only the above-threshold pairs.  Shuffle volume is O(n·B) vector
    replications (each vector joins B block-pairs), per-task memory is
    O((n/B)·dim + (n/B)²) — both tunable via B — and the quadratic flops
    run inside numpy at memory bandwidth, distributed over B(B+1)/2
    independent tasks.  For high thresholds (true near-dup, cosine >=
    0.9) ``similarity.ann_lsh_bucketed`` prunes candidates first; this
    operator is the exact tier and the oracle anchor.

    (Production near-dup uses ~0.99; the synthetic vectors are
    near-orthogonal, so the registry binds a data-relative 0.45 to keep
    the oracle check non-vacuous.)
    """
    import math  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # one cheap count (parquet row-group metadata) sizes the decomposition;
    # callers may pin n_blocks for tests / known corpora
    nb = n_blocks if n_blocks is not None else max(
        1, math.ceil(emb.count() / GEMM_BLOCK_TARGET_ROWS)
    )
    blocks = emb.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(nb)).cast("int"))
    bpairs = spark.createDataFrame(
        [(p, q) for p in range(nb) for q in range(p, nb)], "bp int, bq int"
    )
    rep = blocks.join(
        F.broadcast(bpairs), (F.col("blk") == F.col("bp")) | (F.col("blk") == F.col("bq"))
    )

    empty = pd.DataFrame({"id_a": np.array([], dtype=np.int64), "id_b": np.array([], dtype=np.int64)})

    def gemm_tile(key, pdf):
        p, q = int(key[0]), int(key[1])
        left = pdf[pdf["blk"] == p].sort_values("vec_id")
        if len(left) == 0 or (p != q and (pdf["blk"] == q).sum() == 0):
            return empty
        ids_l = left["vec_id"].to_numpy()
        vl = np.stack(left["embedding"].to_numpy()).astype(np.float64)
        vl /= np.maximum(np.linalg.norm(vl, axis=1, keepdims=True), 1e-30)
        if p == q:
            scores = vl @ vl.T
            ii, jj = np.nonzero(np.triu(scores >= threshold, k=1))
            return pd.DataFrame({"id_a": ids_l[ii], "id_b": ids_l[jj]})
        right = pdf[pdf["blk"] == q].sort_values("vec_id")
        ids_r = right["vec_id"].to_numpy()
        vr = np.stack(right["embedding"].to_numpy()).astype(np.float64)
        vr /= np.maximum(np.linalg.norm(vr, axis=1, keepdims=True), 1e-30)
        ii, jj = np.nonzero((vl @ vr.T) >= threshold)
        la, rb = ids_l[ii], ids_r[jj]
        return pd.DataFrame({"id_a": np.minimum(la, rb), "id_b": np.maximum(la, rb)})

    return rep.groupBy("bp", "bq").applyInPandas(gemm_tile, "id_a long, id_b long")


# Prefix-filter set-similarity join: Jaccard >= SSJ_TAU_NUM/SSJ_TAU_DEN
# over whitespace token SETS (all thresholds integer so both engines
# compare exactly — no float Jaccard anywhere).
SSJ_TAU_NUM = 9
SSJ_TAU_DEN = 10


def dedup_set_similarity_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs Jaccard similarity join via prefix filtering — the
    deterministic counterpart to MinHash-LSH (LSH is probabilistic recall;
    this is the published exact algorithm: AllPairs/PPJoin prefix filter,
    Bayardo et al. WWW'07 / Xiao et al. WWW'08).

    Spec: token sets are the DISTINCT whitespace tokens of lowercased
    text; emit every unordered doc pair with Jaccard >= 0.6 plus the
    exact intersection / union sizes and jaccard scaled to integer ppm.

    Prefix filter: order every doc's tokens by GLOBAL ascending document
    frequency (rarest first, token string tie-break); two sets with
    Jaccard >= t MUST share a token among each one's first
    n - ceil(t*n) + 1 tokens, so only prefix tokens enter the candidate
    self-join.  The DuckDB oracle computes the naive all-pairs form —
    the hash match is a losslessness proof of the filter.

    Scale shape: candidate generation joins PREFIX postings only (the
    classic inverted-index build, keyed by rare tokens → small posting
    lists by construction); frequent tokens never index anything.
    Verification runs at candidate cardinality via sort_array +
    array_intersect on the two token arrays, never a tokens×tokens
    shuffle.  The df/size joins are plain shuffle joins on token/doc_id —
    both frames are corpus/vocabulary-cardinality, far beyond broadcast
    limits at scale; AQE may still broadcast them at small inputs.  All integer math: ceil(t*n) = (NUM*n + DEN-1) div DEN and
    the final threshold is cross-multiplied (inter*DEN >= NUM*union).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .distinct()
    )
    df_freq = toks.groupBy("token").agg(F.count("*").alias("df"))
    ordered = toks.join(df_freq, "token").withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "token")
        ),
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    pref_len = (
        F.col("n_tok")
        - ((F.lit(SSJ_TAU_NUM) * F.col("n_tok") + F.lit(SSJ_TAU_DEN - 1))
           .cast("long") / F.lit(SSJ_TAU_DEN)).cast("long")
        + F.lit(1)
    )
    prefix = (
        ordered.join(sizes, "doc_id")
        .where(F.col("pos") <= pref_len)
        .select("token", "doc_id")
    )
    cand = (
        prefix.alias("pa")
        .join(prefix.alias("pb"), "token")
        .where(F.col("pa.doc_id") < F.col("pb.doc_id"))
        .select(
            F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b")
        )
        .distinct()
    )
    tok_arr = toks.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("token")).alias("toks")
    )
    verified = (
        cand.join(tok_arr.select(F.col("doc_id").alias("doc_a"),
                                 F.col("toks").alias("ta")), "doc_a")
        .join(tok_arr.select(F.col("doc_id").alias("doc_b"),
                             F.col("toks").alias("tb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ta", "tb")).alias("inter"),
            (F.size("ta") + F.size("tb")
             - F.size(F.array_intersect("ta", "tb"))).alias("uni"),
        )
        .where(F.col("inter") * SSJ_TAU_DEN >= F.lit(SSJ_TAU_NUM) * F.col("uni"))
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "inter",
        "uni",
        F.expr("CAST(inter * 1000000 AS BIGINT) div uni").alias("jaccard_ppm"),
    )


SNM_WINDOW = 8       # sorted-neighborhood width
SNM_TAU_NUM = 5      # verify floor: token Jaccard >= 5/10
SNM_TAU_DEN = 10
SNM_KEY_LEN = 24     # sort key: first chars of normalized text


def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup (Hernández & Stolfo, SIGMOD'95) — the
    classic blocking alternative to LSH: sort the corpus by a
    discriminating key, compare only records within a fixed-width
    window of the sort order, verify candidates exactly.

    Spec: sort key = first ``SNM_KEY_LEN`` chars of lowercased text;
    global rank = ROW_NUMBER over (key, doc_id); candidates = pairs with
    0 < rank_b − rank_a ≤ ``SNM_WINDOW``; verify = whitespace-token-set
    Jaccard ≥ SNM_TAU (integer cross-multiplied, like the prefix-filter
    join).  Output (doc_a, doc_b, rank_gap, jaccard_ppm).

    Scale shape: the global rank uses the TWO-PASS bucketed form (rank
    within a first-char key bucket + broadcast bucket offsets — no
    single-task window; same decomposition as events_max_concurrency);
    the window join is the bucketized ±1-bin equi-join on
    floor(rank / W) (each rank meets only its own and adjacent rank
    buckets — candidate count is W·n, linear); verification joins token
    arrays at candidate cardinality.  The DuckDB oracle computes the
    naive global ROW_NUMBER + theta self-join, so the hash match proves
    both decompositions.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(F.lower("text"), 1, SNM_KEY_LEN).alias("sk"),
        F.lower("text").alias("lt"),
    )
    d = d.withColumn("kb", F.substring("sk", 1, 1))
    local = F.row_number().over(Window.partitionBy("kb").orderBy("sk", "doc_id"))
    offs = (
        d.groupBy("kb").agg(F.count("*").alias("bn"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("bn").over(
                    Window.orderBy("kb").rowsBetween(
                        Window.unboundedPreceding, Window.currentRow - 1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("kb", "off")
    )
    ranked = (
        d.withColumn("lrn", local)
        .join(F.broadcast(offs), "kb")
        .select("doc_id", "lt", (F.col("off") + F.col("lrn")).alias("rk"))
        .withColumn("rb", F.floor(F.col("rk") / F.lit(SNM_WINDOW)))
    )
    # bucketized window join: each row joins its own + next rank bucket
    left = ranked.select(
        F.col("doc_id").alias("doc_a"), F.col("lt").alias("la"),
        F.col("rk").alias("ra"), F.explode(F.array(F.col("rb"), F.col("rb") + 1)).alias("jb"),
    )
    right = ranked.select(
        F.col("doc_id").alias("doc_b"), F.col("lt").alias("lb"),
        F.col("rk").alias("rb2"), F.col("rb").alias("jb"),
    )
    cand = (
        left.join(right, "jb")
        .where(
            (F.col("rb2") > F.col("ra"))
            & (F.col("rb2") - F.col("ra") <= SNM_WINDOW)
        )
        .select("doc_a", "doc_b", "la", "lb",
                (F.col("rb2") - F.col("ra")).alias("rank_gap"))
    )  # each pair matches on exactly one rank bucket — no dedup needed
    ta = F.array_distinct(F.split(F.col("la"), " "))
    tb = F.array_distinct(F.split(F.col("lb"), " "))
    inter = F.size(F.array_intersect(ta, tb))
    uni = F.size(ta) + F.size(tb) - inter
    return (
        cand.withColumn("inter", inter)
        .withColumn("uni", uni)
        .where(F.col("inter") * SNM_TAU_DEN >= F.lit(SNM_TAU_NUM) * F.col("uni"))
        .select(
            "doc_a",
            "doc_b",
            "rank_gap",
            F.expr("CAST(inter * 1000000 AS BIGINT) div uni").alias("jaccard_ppm"),
        )
    )


def simhash_sigs(d):
    """(doc_id, simhash) 32-bit portable signatures — the shared core of
    dedup_simhash (exact-bucket) and dedup_simhash_hamming1 (radius-1):
    md5-derived token hashes vote ±1 per bit, signs pack into a long."""
    ex = d.where(F.size(tokens(F.col("text"))) > 0).select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("t")
    )
    n_bits = 32
    h = F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
    aggs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(n_bits)
    ]
    votes = ex.groupBy("doc_id").agg(*aggs)
    packed = F.lit(0).cast("long")
    for b in range(n_bits):
        packed = packed + F.when(
            F.col(f"v{b}") > 0, F.lit(2**b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("doc_id", packed.alias("simhash"))


def dedup_simhash_hamming1(spark, sf_dir):
    """SimHash near-dup pairs at Hamming radius ≤ 1: each signature also
    probes its 32 one-bit flips, so pairs that exact-signature
    bucketing (dedup_simhash) misses by a single bit are recovered —
    the standard radius widening (Manku et al.'s rotated-table scheme,
    collapsed to r=1).

    Output: (id_a, id_b, hamming) with hamming ∈ {0, 1}.

    Scale shape: the probe fan-out is a CONSTANT 33 keys per doc, so
    the candidate join shuffles 33·N (key, id) rows — the same
    band-key cardinality discipline as MinHash-LSH; pair dedupe runs
    at candidate scale.
    """
    from stixtoneodb_spark.sources.tables import load_table as _lt

    d = _lt(spark, sf_dir, "documents")
    sigs = simhash_sigs(d)
    bits = F.array(F.lit(-1), *[F.lit(b) for b in range(32)])
    var = sigs.select(
        "doc_id",
        F.col("simhash").alias("sig"),
        F.explode(bits).alias("b"),
    ).select(
        "doc_id",
        "sig",
        F.expr(
            "CASE WHEN b = -1 THEN sig ELSE sig ^ shiftleft(cast(1 as bigint), b) END"
        ).alias("key"),
    )
    right = sigs.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sig_b")
    )
    pairs = (
        var.join(right, var.key == right.sig_b)
        .where(F.col("doc_id") < F.col("id_b"))
        .select(
            F.col("doc_id").alias("id_a"),
            "id_b",
            F.expr("cast(bit_count(sig ^ sig_b) as bigint)").alias("hamming"),
        )
        .distinct()
    )
    return pairs

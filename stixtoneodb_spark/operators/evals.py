"""Evaluation-metric operators: the measurement half of an LLM data/
retrieval pipeline (ranking quality, sampled-correctness pass@k,
probability calibration, and arena-style pairwise model ranking).

The reference loader has no evaluation surface at all (it is a one-shot
ETL, StixToNeoDB.scala:50-55); these operators are the capability a
team running retrieval/eval jobs over the built KG needs on day one.
Every operator follows the repo's oracle-parity conventions
(relational.py module docstring): metric arithmetic is EXACT integer
micro-units end-to-end — the only floating-point ops are single IEEE
divisions/sqrt of identical operands, or none at all — so the DuckDB
hash match is float-format-proof.

Scale notes per operator in its docstring.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stixtoneodb_spark.sources.tables import load_table

# -- eval_ranking_metrics ----------------------------------------------------

RANK_K = 10          # depth of the ranked list per query
RANK_QMOD = 17       # queries = vec_id % RANK_QMOD == 0 (scales with corpus)

# Quantized log2 discounts, shared verbatim by both engines: W[r] =
# round(1e6 / log2(r+1)) for rank r = 1..K.  Quantizing the ONLY libm
# call (log2) into integer literals at module load removes the one
# cross-engine rounding hazard NDCG normally carries.
DISCOUNT_MICRO = [round(1_000_000 / math.log2(r + 1)) for r in range(1, RANK_K + 1)]
# CUM_DISCOUNT[m] = ideal DCG of m relevant items (micro units), m = 0..K.
CUM_DISCOUNT = [0]
for _w in DISCOUNT_MICRO:
    CUM_DISCOUNT.append(CUM_DISCOUNT[-1] + _w)


def _stack(col: pd.Series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def eval_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query retrieval quality — P@K, MRR, DCG/NDCG@K — of exact
    cosine retrieval over the embedding corpus, with binary relevance
    "neighbor shares the query's label".

    Distribution: the query matrix (|corpus|/17 rows) is the broadcast
    side; each Arrow batch computes all its cosines in one float64
    matmul and emits its local top-K per query (a global top-K element
    is necessarily in its batch's local top-K), so the shuffle carries
    ≤ batches x K x Q candidate rows — the same exact-top-k shape as
    similarity.ann_cosine_topk.  Metrics are then one broadcast label
    join + a Q-row aggregation: at 1000 executors the full-corpus scan
    dominates and nothing else grows.

    Parity: all metric arithmetic is integer micro-units with
    module-constant discount weights, idcg via the shared CUM_DISCOUNT
    table at min(R, K) where R = corpus-wide relevant count.  The rank
    *order* itself is float64 cosine (desc, id tiebreak) in both
    engines and — unlike the metric arithmetic — is float-summation-
    order dependent: numpy's normalized matmul and DuckDB's
    list_cosine_similarity may disagree on exact cosine ties under
    different rounding orders (holds on the fixture data; not an
    integer-exact guarantee).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qrows = (
        emb.where(F.col("vec_id") % RANK_QMOD == 0)
        .select("vec_id", "embedding", "label")
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    q_norm = q_mat / np.maximum(
        np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-30
    )

    def local_topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy()
            v = _stack(pdf["embedding"])
            v_norm = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
            scores = v_norm @ q_norm.T
            out_q, out_n, out_c = [], [], []
            for qi, qid in enumerate(q_ids):
                col = scores[:, qi].copy()
                col[ids == qid] = -np.inf
                order = np.lexsort((ids, -col))[:RANK_K]
                keep = col[order] > -np.inf
                out_q.extend([int(qid)] * int(keep.sum()))
                out_n.extend(ids[order][keep].tolist())
                out_c.extend(col[order][keep].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    cand = emb.select("vec_id", "embedding").mapInPandas(
        local_topk, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    topk = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= RANK_K)
        .select("query_id", "neighbor_id", "rank")
    )

    labels = emb.select("vec_id", "label")
    qlab = labels.withColumnRenamed("vec_id", "query_id").withColumnRenamed(
        "label", "qlabel"
    )
    nlab = labels.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed(
        "label", "nlabel"
    )
    scored = (
        topk.join(F.broadcast(qlab), "query_id")
        .join(F.broadcast(nlab), "neighbor_id")
        .withColumn("rel", (F.col("nlabel") == F.col("qlabel")).cast("long"))
    )
    disc = F.array(*[F.lit(int(x)) for x in DISCOUNT_MICRO])
    per_q = scored.groupBy("query_id", "qlabel").agg(
        F.sum("rel").alias("n_rel"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel_rank"),
        F.sum(F.col("rel") * F.element_at(disc, F.col("rank").cast("int"))).alias(
            "dcg_micro"
        ),
    )
    # corpus-wide relevant count per label (excluding the query itself)
    lab_n = emb.groupBy(F.col("label").alias("qlabel")).agg(
        (F.count("*") - 1).alias("r_total")
    )
    cum = F.array(*[F.lit(int(x)) for x in CUM_DISCOUNT])
    out = per_q.join(F.broadcast(lab_n), "qlabel").select(
        "query_id",
        "n_rel",
        F.expr(f"(1000000 * n_rel) div {RANK_K}").alias("p_at_k_micro"),
        F.coalesce(
            F.expr("1000000 div first_rel_rank").cast("long"), F.lit(0)
        ).alias("mrr_micro"),
        F.col("dcg_micro").cast("long").alias("dcg_micro"),
        F.element_at(cum, F.least(F.col("r_total"), F.lit(RANK_K)).cast("int") + 1)
        .cast("long")
        .alias("idcg_micro"),
    )
    return out.withColumn(
        "ndcg_micro",
        F.when(F.col("idcg_micro") > 0, F.expr("(1000000 * dcg_micro) div idcg_micro"))
        .otherwise(F.lit(0))
        .cast("long"),
    )


# -- eval_pass_at_k ----------------------------------------------------------

PASS_N = 10          # sampled attempts per task
PASS_K = 5           # the "pass@5" budget
PASS_THRESH = 35     # per-attempt success probability = 35%


def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@1 / pass@k over a sampled-attempts eval table, aggregated per
    source — the unbiased estimator pass@k = 1 - C(n-c,k)/C(n,k)
    computed in EXACT integer arithmetic (n = 10 fixed, so the binomial
    ratio is a closed-form integer product).

    Attempts are synthesized deterministically (md5 of doc_id:attempt,
    the repo's portable-hash idiom) so both engines derive the identical
    attempt matrix; in production the table arrives from the eval
    harness and only the estimator below runs.

    Distribution: explode 10 attempts per doc (narrow), one hash +
    compare per row, then a per-doc partial agg and a per-source final
    agg — two map-side-combined shuffles of tiny key cardinality.  No
    collect, no skew (attempt fan-out is constant).
    """
    docs = load_table(spark, sf_dir, "documents")
    attempts = docs.select(
        "doc_id", "source", F.explode(F.sequence(F.lit(0), F.lit(PASS_N - 1))).alias("a")
    ).withColumn(
        "pass",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("doc_id"), F.col("a"))), 1, 6
                ),
                16,
                10,
            ).cast("long")
            % 100
            < PASS_THRESH
        ).cast("long"),
    )
    per_doc = attempts.groupBy("doc_id", "source").agg(F.sum("pass").alias("c"))
    # C(10-c,5) is an integer product (zero when c > 5); C(10,5) = 252
    per_doc = per_doc.select(
        "doc_id",
        "source",
        "c",
        F.expr("(1000000 * c) div 10").alias("pass1_micro"),
        F.expr(
            "(1000000 * (252 - (CASE WHEN c > 5 THEN 0 ELSE "
            "((10-c)*(9-c)*(8-c)*(7-c)*(6-c)) div 120 END))) div 252"
        ).alias("pass5_micro"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_tasks"),
        F.sum("c").alias("total_passes"),
        F.expr("sum(pass1_micro) div count(*)").alias("mean_pass1_micro"),
        F.expr("sum(pass5_micro) div count(*)").alias("mean_pass5_micro"),
    )


# -- stats_calibration_bins --------------------------------------------------

def stats_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins + per-bin Brier score for a probabilistic
    classifier's predictions: 10 equal-width probability bins, each with
    its count, mean predicted probability, empirical positive rate, the
    |gap| that feeds ECE, and the mean Brier contribution.

    Predictions/outcomes are synthesized deterministically (md5 idiom;
    the outcome's threshold is the prediction itself, so the planted
    classifier is perfectly calibrated in expectation and the bins
    should show small gaps).  All metric math is integer: predictions
    live in milli-units, so (p_milli - 1000*y)^2 is already the Brier
    term in micro-units.

    Distribution: two hashes + integer ops per row, then a 10-key
    hash agg with map-side combine — the shuffle carries 10 rows per
    partition regardless of scale.
    """
    e = load_table(spark, sf_dir, "events").select("event_id")
    scored = e.select(
        "event_id",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("p:"), F.col("event_id"))), 1, 6),
                16,
                10,
            ).cast("long")
            % 1000
        ).alias("p_milli"),
    ).withColumn(
        "y",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("y:"), F.col("event_id"))), 1, 6),
                16,
                10,
            ).cast("long")
            % 1000
            < F.col("p_milli")
        ).cast("long"),
    )
    binned = scored.withColumn("bin", F.expr("p_milli div 100"))
    agg = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.expr("(1000 * sum(p_milli)) div count(*)").alias("mean_pred_micro"),
        F.expr("(1000000 * sum(y)) div count(*)").alias("emp_rate_micro"),
        F.expr(
            "sum((p_milli - 1000 * y) * (p_milli - 1000 * y)) div count(*)"
        ).alias("brier_micro"),
    )
    return agg.withColumn(
        "abs_gap_micro", F.abs(F.col("mean_pred_micro") - F.col("emp_rate_micro"))
    )


# -- eval_bradley_terry ------------------------------------------------------

BT_ITERS = 3
BT_SCALE = 1_000_000          # p lives in micro-units
BT_TERM_SCALE = 10**9         # n_ij * 1e9 div (p_i + p_j): term in milli-units


def _bt_mm_integer(items, wins, pair_n):
    """The shared minorization-maximization recurrence (Hunter 2004,
    'MM algorithms for generalized Bradley-Terry models') in EXACT
    integer arithmetic — identical whether run here on the collected
    pair matrix or unrolled as SQL CTEs in the oracle:

      t_ij   = (n_ij * 1e9) div (p_i + p_j)          -- milli-units
      denom_i = sum_j t_ij
      p'_i   = (wins_i * 1e9) div denom_i            -- micro-units
      p_i    = (p'_i * T * 1e6) div sum_j p'_j       -- renormalize
    """
    p = {i: BT_SCALE for i in items}
    tcount = len(items)
    for _ in range(BT_ITERS):
        praw = {}
        for i in items:
            denom = 0
            for j in items:
                if i == j:
                    continue
                n_ij = pair_n.get((i, j), 0)
                if n_ij == 0 or p[i] + p[j] == 0:
                    continue
                denom += (n_ij * BT_TERM_SCALE) // (p[i] + p[j])
            praw[i] = (wins[i] * BT_TERM_SCALE) // denom if denom > 0 else p[i]
        s = sum(praw.values())
        if s == 0:
            break
        p = {i: (praw[i] * tcount * BT_SCALE) // s for i in items}
    return p


def eval_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arena-style pairwise ranking: consecutive events by the same user
    are a 'battle' between their two event types (higher value wins,
    exact ties skipped), and Bradley-Terry strengths are fitted by
    three integer-quantized MM iterations — the model behind LLM arena
    leaderboards, run over the event stream.

    Distribution: battle extraction is one lead() window per user (the
    same user-partitioned shuffle sessionize_events reuses), the win
    matrix is a map-side-combined agg to <= T^2 rows (T = distinct
    event types, single digits), and ONLY that tiny matrix is collected
    — the MM solve is O(T^2) driver work, exactly like the IVF seed
    collect (similarity.py).  At 100 TB the window scan dominates;
    nothing else grows with data.

    Parity: the recurrence is pure integer division (see _bt_mm_integer)
    so the SQL oracle unrolling the same three iterations lands on
    bit-identical micro scores.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("a"),
        F.col("value").alias("va"),
        F.lead("event_type").over(w).alias("b"),
        F.lead("value").over(w).alias("vb"),
    ).where(F.col("b").isNotNull() & (F.col("a") != F.col("b")) & (F.col("va") != F.col("vb")))
    battles = seq.select(
        F.when(F.col("va") > F.col("vb"), F.col("a")).otherwise(F.col("b")).alias("winner"),
        F.when(F.col("va") > F.col("vb"), F.col("b")).otherwise(F.col("a")).alias("loser"),
    )
    pairs = battles.groupBy("winner", "loser").agg(F.count("*").alias("n"))
    rows = pairs.collect()

    wins: dict = {}
    pair_n: dict = {}
    for r in rows:
        wi, lo, n = r["winner"], r["loser"], int(r["n"])
        wins[wi] = wins.get(wi, 0) + n
        wins.setdefault(lo, 0)
        pair_n[(wi, lo)] = pair_n.get((wi, lo), 0) + n
        pair_n[(lo, wi)] = pair_n.get((lo, wi), 0) + n
    items = sorted(wins)
    # pair_n holds the symmetric battle count under both key orders, so
    # summing the first-key slice gives total battles involving i.
    btot = {i: sum(n for (a, _b), n in pair_n.items() if a == i) for i in items}

    p = _bt_mm_integer(items, wins, pair_n)
    ranked = sorted(items, key=lambda i: (-p[i], i))
    out = [
        (i, int(wins[i]), int(btot[i]), int(p[i]), rank + 1)
        for rank, i in enumerate(ranked)
    ]
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("wins", T.LongType()),
            T.StructField("battles", T.LongType()),
            T.StructField("bt_score_micro", T.LongType()),
            T.StructField("bt_rank", T.LongType()),
        ]
    )
    return spark.createDataFrame(out, schema)


# -- eval_ann_recall_at_k ----------------------------------------------------

def eval_ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the LSH-bucketed ANN tier against exact brute-force
    cosine top-k — the quality gate that decides whether the cheap tier
    may serve a query class, measured entirely in-engine.

    Both systems are the registry's own operators (ann_cosine_topk /
    ann_lsh_bucketed), so this oracle verifies the COMPOSITION: the
    DuckDB side re-runs both full algorithms as subqueries and joins
    them the same way.  recall_micro = 1e6·hits div k, integer.

    Scale shape: adds one candidate-cardinality left join and a Q-row
    agg on top of the two tiers' existing plans — negligible next to
    either tier; no collect beyond ann_cosine_topk's query broadcast.
    """
    from stixtoneodb_spark.operators import similarity

    exact = similarity.ann_cosine_topk(spark, sf_dir)
    lsh = similarity.ann_lsh_bucketed(spark, sf_dir)
    nbrs = (
        lsh.select(F.col("id_a").alias("query_id"), F.col("id_b").alias("neighbor_id"))
        .union(
            lsh.select(
                F.col("id_b").alias("query_id"), F.col("id_a").alias("neighbor_id")
            )
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("hit", F.lit(1))
    )
    marked = exact.join(nbrs, ["query_id", "neighbor_id"], "left")
    return marked.groupBy("query_id").agg(
        F.count("*").alias("n_exact"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
    ).withColumn("recall_micro", F.expr("(1000000 * n_hits) div n_exact"))

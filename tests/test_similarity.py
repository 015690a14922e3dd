"""Embedding/ANN tier tests.

The registry oracles (tools/check_oracles.py, driver CORRECTNESS) prove
cross-engine value equality on the driver tables; these tests prove the
properties the oracles cannot see:

- LSH recall at the production near-dup regime: planted pairs at cosine
  >= 0.95 MUST all be recovered by the 32x8 banding (miss probability
  ~(1-0.899^8)^32 < 1e-7 per pair — a miss here is a real bug, not bad
  luck).
- exact operators (blocked-GEMM pair enumeration, top-k) agree with a
  brute-force numpy reference on the same vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from stixtoneodb_spark.operators import dedup, similarity

N_BASE = 30
DIM = 64


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """An embeddings.parquet with 30 random unit vectors + 30 near-dups
    (cosine >= 0.95 with their base), shaped like the driver table."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.standard_normal((N_BASE, DIM)) * 0.05
    near = base + noise
    near /= np.linalg.norm(near, axis=1, keepdims=True)
    vecs = np.concatenate([base, near]).astype(np.float32)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(2 * N_BASE, dtype=np.int64),
            "embedding": [v for v in vecs],
            "label": np.zeros(2 * N_BASE, dtype=np.int32),
        }
    )
    d = tmp_path_factory.mktemp("planted")
    pdf.to_parquet(d / "embeddings.parquet")
    # ground truth pairs at the operators' 0.45 floor, in float64
    v64 = vecs.astype(np.float64)
    v64 /= np.linalg.norm(v64, axis=1, keepdims=True)
    scores = v64 @ v64.T
    ii, jj = np.nonzero(np.triu(scores >= 0.45, k=1))
    truth = {(int(a), int(b)) for a, b in zip(ii, jj)}
    planted = {(i, i + N_BASE) for i in range(N_BASE)}
    assert planted <= truth  # the noise kept every planted pair above floor
    return str(d), truth, planted, v64


def test_lsh_recall_at_near_dup_regime(spark, planted_dir):
    d, _truth, planted, _v = planted_dir
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.ann_lsh_bucketed(spark, d).collect()
    }
    missed = planted - got
    assert not missed, f"LSH missed planted near-dup pairs: {sorted(missed)[:5]}"
    # everything LSH emits must be a true >=0.45 pair (exact verify tier)
    assert got <= _truth


def test_blocked_gemm_equals_bruteforce(spark, planted_dir):
    d, truth, _planted, _v = planted_dir
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.dedup_embedding_cosine(spark, d).collect()
    }
    assert got == truth


def test_ann_topk_equals_bruteforce(spark, planted_dir):
    d, _truth, _planted, v64 = planted_dir
    scores = v64 @ v64.T
    np.fill_diagonal(scores, -np.inf)
    want = {}
    for q in range(similarity.N_QUERIES):
        order = np.lexsort((np.arange(len(v64)), -scores[q]))[: similarity.TOP_K]
        want.update({(q, int(n)): r + 1 for r, n in enumerate(order)})
    got = {
        (r["query_id"], r["neighbor_id"]): r["rank"]
        for r in similarity.ann_cosine_topk(spark, d).collect()
    }
    assert got == want


def test_centroid_assign_shapes(spark, planted_dir):
    d, *_ = planted_dir
    rows = similarity.embedding_label_centroid_assign(spark, d).collect()
    assert len(rows) == 2 * N_BASE
    # single label corpus: every vector must be assigned to it
    assert {r["assigned_label"] for r in rows} == {0}


def test_ivf_recovers_planted_near_dups(spark, planted_dir):
    """IVF must place a near-identical pair (cosine >= 0.95) in the same
    cell and therefore recover it as the query's top neighbor: for every
    planted base vector that is a query (vec_id < N_QUERIES), its
    near-dup must appear at rank 1."""
    d, _truth, planted, v64 = planted_dir
    res = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.ann_ivf_topk(spark, d).collect()
    }
    for qid, dup in sorted(planted):
        if qid < similarity.N_QUERIES:
            assert res.get((qid, 1)) == dup, (
                f"query {qid}: expected near-dup {dup} at rank 1, "
                f"got {res.get((qid, 1))}"
            )


def test_ivf_survives_emptied_cell(spark, tmp_path):
    """A coarse cell can lose every member in the Lloyd step; the operator
    must DROP it (like the oracle's cent CTE) rather than keep an all-zero
    centroid whose norm-divide poisons the assignment with NaN.

    Planted deterministically: the two lowest-md5-ranked vectors get
    IDENTICAL embeddings, so both become seeds with the same centroid and
    every vector tie-breaks to the lower cell — the higher cell ends the
    step with zero members, guaranteed."""
    import hashlib

    n = 36  # ivf_cells(36) = 6 > 2, so both duplicates are seeds
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((n, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ranked = sorted(range(n), key=lambda i: hashlib.md5(f"seed:{i}".encode()).hexdigest())
    assert similarity.ivf_cells(n) >= 2
    vecs[ranked[1]] = vecs[ranked[0]]
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v for v in vecs.astype(np.float32)],
            "label": np.zeros(n, dtype=np.int32),
        }
    )
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    rows = similarity.ann_ivf_topk(spark, str(tmp_path)).collect()
    # with the NaN bug the probed cells are empty of members → no rows
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == set(range(similarity.N_QUERIES))
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, similarity.TOP_K + 1)), (q, ranks)


def test_ivf_rank_consistency_vs_exact(spark):
    """IVF ranks exactly within the probed cells: probing can only DROP
    candidates, never reorder survivors — so whenever an IVF result also
    appears in the exact brute-force top-k, its IVF rank is <= its exact
    rank (dropped higher-ranked candidates promote, never demote), and
    relative order among shared rows is preserved."""
    sf = "/root/testdata/sf0.001"
    exact = {
        (r["query_id"], r["neighbor_id"]): r["rank"]
        for r in similarity.ann_cosine_topk(spark, sf).collect()
    }
    shared = []
    for r in similarity.ann_ivf_topk(spark, sf).collect():
        ex = exact.get((r["query_id"], r["neighbor_id"]))
        if ex is not None:
            assert r["rank"] <= ex, (r["query_id"], r["neighbor_id"], ex, r["rank"])
            shared.append((r["query_id"], r["rank"], ex))
    assert shared, "IVF and exact top-k share no rows — vacuous test"
    # order preservation among shared rows of one query
    by_q = {}
    for q, ivf_rank, ex_rank in shared:
        by_q.setdefault(q, []).append((ivf_rank, ex_rank))
    for q, rows in by_q.items():
        rows.sort()
        ex_order = [e for _i, e in rows]
        assert ex_order == sorted(ex_order), (q, rows)


def test_semantic_dedup_planted_identical_pair(spark):
    """SemDeDup planted case: an exact copy of a vector MUST co-cluster
    with its original (identical vectors produce identical assignment
    scores, so the lowest-cell tie-break lands them together regardless
    of the seed draw) and be pruned with kept_by = the original's id;
    pairwise-orthogonal one-hot vectors must never be pruned.  The
    verdict must be invariant to input partitioning (the groupBy(cell)
    owns the layout, not the source)."""
    dim = 16
    rows = []
    for i in range(10):
        v = [0.0] * dim
        v[i] = 1.0
        rows.append((i, v))
    copy_of_3 = [0.0] * dim
    copy_of_3[3] = 1.0
    rows.append((100, copy_of_3))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    for parts in (1, 7):
        got = sorted(
            (r["vec_id"], r["kept_by"])
            for r in similarity.semantic_dedup_frame(emb.repartition(parts)).collect()
        )
        assert got == [(100, 3)], got

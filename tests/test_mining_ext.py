"""Round-4 seventh-continuation batch (part 2): triplet hard-negative
mining, Jensen-Shannon source drift, n-gram novelty curve, seasonal
hour-of-day outliers, and directed SCC over the transition chain.

All five carry FULL DuckDB oracles (registry.py); these tests pin
planted regimes — orthogonal/identical cluster geometry for the miner,
identical vs disjoint vocabularies for JSD, duplicate-document novelty
collapse, a planted 4am spike against a same-hour baseline, and a
hand-built two-cycle with a one-way sink for SCC.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from stixtoneodb_spark.operators import relational, similarity, text


def _write_embeddings(tmp, vecs, labels):
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": np.asarray(labels, dtype=np.int32),
        }
    )
    pdf.to_parquet(tmp / "embeddings.parquet")
    return str(tmp)


def _write_docs(tmp, recs):
    """recs: list of (doc_id, text, source)."""
    pdf = pd.DataFrame(
        {
            "doc_id": np.array([r[0] for r in recs], dtype=np.int64),
            "text": [r[1] for r in recs],
            "lang": "en",
            "source": [r[2] for r in recs],
            "n_chars": np.array([len(r[1]) for r in recs], dtype=np.int64),
        }
    )
    pdf.to_parquet(tmp / "documents.parquet")
    return str(tmp)


def _write_events(tmp, rows):
    """rows: list of (event_type, value, ts, user_id)."""
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.Series([r[2] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[3] for r in rows], dtype=np.int64),
            "event_type": [r[0] for r in rows],
            "value": np.array([r[1] for r in rows], dtype=np.float64),
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp / "events.parquet")
    return str(tmp)


# ---- embedding_hard_negatives ---------------------------------------------

def test_hard_negatives_planted_geometry(spark, tmp_path):
    # label 0: e1 and a near-copy; label 1: e2 and a vector leaning
    # toward e1 (the impostor -> everyone's hardest negative candidate)
    vecs = [
        [1.0, 0.0, 0.0],        # 0: label 0
        [0.999, 0.01, 0.0],     # 1: label 0 (tight positive for 0)
        [0.0, 1.0, 0.0],        # 2: label 1
        [0.6, 0.8, 0.0],        # 3: label 1, cos 0.6 with vec 0
    ]
    sf = _write_embeddings(tmp_path, vecs, [0, 0, 1, 1])
    out = {r["vec_id"]: r for r in similarity.embedding_hard_negatives(spark, sf).collect()}
    assert out[0]["pos_id"] == 1 and out[0]["neg_id"] == 3
    assert out[2]["pos_id"] == 3 and out[2]["neg_id"] == 1  # cos(2,1)=0.01 > cos(2,0)=0
    # vec 0: margin = cos(0,1) - cos(0,3) > 0 (positive tighter than impostor)
    assert out[0]["margin"] > 0
    # vec 3: hardest positive is its own far classmate 2 (cos 0.8);
    # hardest negative is vec 1 (cos ≈ 0.607, edging out vec 0's 0.6)
    assert out[3]["pos_id"] == 2 and out[3]["neg_id"] == 1


def test_hard_negatives_singleton_label_excluded(spark, tmp_path):
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]]
    sf = _write_embeddings(tmp_path, vecs, [0, 0, 7])  # label 7 has no positive
    out = similarity.embedding_hard_negatives(spark, sf).collect()
    assert sorted(r["vec_id"] for r in out) == [0, 1]


def test_hard_negatives_matches_bruteforce_random(spark, tmp_path):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8))
    labels = (np.arange(40) % 4).astype(int)
    sf = _write_embeddings(tmp_path, list(vecs), list(labels))
    out = {r["vec_id"]: r for r in similarity.embedding_hard_negatives(spark, sf).collect()}
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = vn @ vn.T
    for a in range(40):
        neg_mask = labels != labels[a]
        pos_mask = (labels == labels[a]) & (np.arange(40) != a)
        exp_neg = np.nonzero(neg_mask)[0][np.argmax(cos[a][neg_mask])]
        exp_pos = np.nonzero(pos_mask)[0][np.argmin(cos[a][pos_mask])]
        assert out[a]["neg_id"] == exp_neg, a
        assert out[a]["pos_id"] == exp_pos, a


# ---- stats_jensen_shannon --------------------------------------------------

def test_jsd_identical_and_disjoint(spark, tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            (0, "alpha beta gamma", "s1"),
            (1, "alpha beta gamma", "s2"),   # identical distribution
            (2, "delta epsilon zeta", "s3"), # fully disjoint vocabulary
        ],
    )
    out = {(r["sa"], r["sb"]): r for r in text.stats_jensen_shannon(spark, sf).collect()}
    assert out[("s1", "s2")]["jsd_nats"] == 0.0
    assert abs(out[("s1", "s3")]["jsd_nats"] - math.log(2)) < 1e-6
    assert out[("s1", "s2")]["n_union_tokens"] == 3
    assert out[("s1", "s3")]["n_union_tokens"] == 6


# ---- corpus_ngram_novelty --------------------------------------------------

def test_novelty_duplicate_collapse(spark, tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            (0, "one two three four", "s"),   # all shingles first-seen
            (1, "one two three four", "s"),   # exact dup -> zero novelty
            (2, "one two three nine ten eleven", "s"),  # mixed
        ],
    )
    out = {r["doc_id"]: r for r in text.corpus_ngram_novelty(spark, sf).collect()}
    assert out[0]["novelty_ppm"] == 1000000 and out[0]["n_shingles"] == 2
    assert out[1]["novelty_ppm"] == 0
    # doc 2: shingles {one two three, two three nine, three nine ten,
    # nine ten eleven}; only the first is old -> 3/4 novel
    assert out[2]["n_shingles"] == 4 and out[2]["novelty_ppm"] == 750000


# ---- events_seasonal_baseline ---------------------------------------------

def test_seasonal_planted_hour_spike(spark, tmp_path):
    t0 = pd.Timestamp("2024-01-01 04:00:00")
    rows = [("a", 10.0, t0 + pd.Timedelta(seconds=i), 0) for i in range(40)]
    rows.append(("a", 500.0, t0 + pd.Timedelta(seconds=99), 0))  # the 4am spike
    # thin cell at 5am: same spike but only 5 baseline rows -> below MIN_N
    t1 = pd.Timestamp("2024-01-01 05:00:00")
    rows += [("a", 10.0, t1 + pd.Timedelta(seconds=i), 0) for i in range(5)]
    rows.append(("a", 500.0, t1 + pd.Timedelta(seconds=99), 0))
    sf = _write_events(tmp_path, rows)
    out = relational.events_seasonal_baseline(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["hr"] == 4 and out[0]["x"] == 500


def test_seasonal_uniform_cell_silent(spark, tmp_path):
    t0 = pd.Timestamp("2024-01-01 09:00:00")
    rows = [("a", 50.0, t0 + pd.Timedelta(seconds=i), 0) for i in range(60)]
    sf = _write_events(tmp_path, rows)
    assert relational.events_seasonal_baseline(spark, sf).count() == 0


# ---- kg_scc ----------------------------------------------------------------

def test_scc_two_cycle_with_sink(spark, tmp_path):
    # chain per user: a->b->a->b ... then one hop to sink c per user.
    # transitions: (a,b) and (b,a) heavy (cycle), (b,c) light (below the
    # above-average cut) -> SCC {a,b} plus singletons c
    rows = []
    ts = pd.Timestamp("2024-01-01")
    for u in range(10):
        seq = ["a", "b"] * 6 + ["c"]
        for i, t in enumerate(seq):
            rows.append((t, 1.0, ts + pd.Timedelta(minutes=u * 100 + i), u))
    sf = _write_events(tmp_path, rows)
    out = {r["v"]: r for r in relational.kg_scc(spark, sf).collect()}
    assert out["a"]["scc_id"] == "a" and out["b"]["scc_id"] == "a"
    assert out["a"]["scc_size"] == 2 and out["b"]["scc_size"] == 2
    assert out["c"]["scc_id"] == "c" and out["c"]["scc_size"] == 1

"""Round-4 eighth-continuation batch (part 7): Markov stationary
distribution, A/B two-proportion z-test, degree assortativity, and
train/val/test split leakage.

All four carry FULL DuckDB oracles (registry.py; the stationary oracle
unrolls the fixed power-iteration steps).  These tests pin planted
regimes: a symmetric 2-cycle whose stationary point is exact, a
perfectly balanced experiment (z = 0), a star graph (assortativity
−1), and duplicate texts planted across split boundaries."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from stixtoneodb_spark.operators import graph, relational, text


def _write_events(tmp, rows):
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


def _write_documents(tmp, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "src",
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pdf.to_parquet(tmp / "documents.parquet")
    return str(tmp)


# ---- events_markov_stationary ----------------------------------------------

def test_markov_stationary_symmetric_cycle(spark, tmp_path):
    """A↔B strict alternation: uniform is exactly stationary, so every
    power-iteration step reproduces (0.5, 0.5) bit-for-bit."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(8):
        rows.append(("alpha" if i % 2 == 0 else "beta", 1.0, t0 + pd.Timedelta(minutes=i), 1))
    sf = _write_events(tmp_path, rows)
    out = {r["event_type"]: r.asDict() for r in relational.events_markov_stationary(spark, sf).collect()}
    assert out["alpha"]["pi_stationary"] == 0.5
    assert out["beta"]["pi_stationary"] == 0.5


def test_markov_stationary_matches_numpy_replay(spark, tmp_path):
    """Biased chain: the operator's 6 fixed iterations equal a numpy
    replay of the same recurrence (round 6)."""
    t0 = pd.Timestamp("2024-01-01")
    # one user walks: a a a b a a b a  → transitions from the sequence
    seq = "aaabaaba"
    names = {"a": "alpha", "b": "beta"}
    rows = [(names[ch], 1.0, t0 + pd.Timedelta(minutes=i), 1) for i, ch in enumerate(seq)]
    sf = _write_events(tmp_path, rows)
    out = {r["event_type"]: r.asDict() for r in relational.events_markov_stationary(spark, sf).collect()}

    trans: dict = {}
    for x, y in zip(seq, seq[1:]):
        trans[(names[x], names[y])] = trans.get((names[x], names[y]), 0) + 1
    states = sorted({s for s, _ in trans})
    pi = {s: 1.0 / len(states) for s in states}
    ni = {s: sum(n for (a, _b), n in trans.items() if a == s) for s in states}
    for _ in range(relational.MARKOV_ITERS):
        nxt: dict = {}
        for (s, d), n in trans.items():
            nxt[d] = nxt.get(d, 0.0) + pi.get(s, 0.0) * (n / ni[s])
        pi = nxt
    for s in states:
        if s in out:
            assert abs(out[s]["pi_stationary"] - round(pi[s], 6)) <= 1e-6


# ---- events_ab_test_proportions --------------------------------------------

def test_ab_test_balanced_split_zero_z(spark, tmp_path):
    """Even users 2/4 convert, odd users 1/2 convert → identical rates,
    z exactly 0."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for u in range(6):  # users 0..5; variant = u % 2
        rows.append(("click", 1.0, t0 + pd.Timedelta(minutes=u), u))
    for u in (0, 2, 1):  # conversions: variant0 ×2, variant1 ×1
        rows.append(("purchase", 1.0, t0 + pd.Timedelta(hours=1, minutes=u), u))
    sf = _write_events(tmp_path, rows)
    r = relational.events_ab_test_proportions(spark, sf).collect()[0].asDict()
    assert r["na"] == 3 and r["ca"] == 2  # users 0,2,4
    assert r["nb"] == 3 and r["cb"] == 1  # users 1,3,5
    # rates differ here; recompute z by the same formula
    pa, pb = 2 / 3, 1 / 3
    ph = 3 / 6
    z = (pa - pb) / np.sqrt(ph * (1 - ph) * (1 / 3 + 1 / 3))
    assert r["z_score"] == round(z, 6)
    assert r["rate_a_ppm"] == 666_666 and r["rate_b_ppm"] == 333_333


# ---- kg_degree_assortativity -----------------------------------------------

def test_assortativity_star_is_minus_one(spark, tmp_path):
    """A pure star (hub join + 3 leaves): every edge pairs degree 3
    with degree 1 → assortativity exactly −1."""
    texts = ["join customer", "join vector", "join window"]
    sf = _write_documents(tmp_path, texts)
    r = graph.kg_degree_assortativity(spark, sf).collect()[0].asDict()
    assert r["n_nodes"] == 4 and r["n_edges"] == 3
    assert r["density_ppm"] == 1_000_000 * 6 // 12
    assert r["assortativity"] == -1.0


# ---- corpus_split_leakage --------------------------------------------------

def _split_of(doc_id: int) -> str:
    h = int(hashlib.md5(f"sp:{doc_id}".encode()).hexdigest()[:6], 16) % 100
    if h < text.SPLIT_TRAIN_PCT:
        return "train"
    if h < text.SPLIT_VAL_PCT:
        return "val"
    return "test"


def test_split_leakage_planted_duplicate(spark, tmp_path):
    """Plant one duplicated text across two different splits: exactly
    those two docs are flagged leaked; unique docs are clean."""
    n = 200
    splits = [_split_of(i) for i in range(n)]
    # find a doc in train and one NOT in train to share a text
    i_train = splits.index("train")
    i_other = next(i for i, s in enumerate(splits) if s != "train")
    texts = [f"unique text {i}" for i in range(n)]
    texts[i_train] = texts[i_other] = "leaked shared text"
    sf = _write_documents(tmp_path, texts)
    out = {r["split"]: r.asDict() for r in text.corpus_split_leakage(spark, sf).collect()}

    exp_counts: dict = {}
    for s in splits:
        exp_counts[s] = exp_counts.get(s, 0) + 1
    for s, d in out.items():
        assert d["n_docs"] == exp_counts[s]
        assert d["share_ppm"] == 1_000_000 * exp_counts[s] // n
    assert out["train"]["n_leaked_docs"] == 1
    assert out[splits[i_other]]["n_leaked_docs"] == 1
    total_leaked = sum(d["n_leaked_docs"] for d in out.values())
    assert total_leaked == 2

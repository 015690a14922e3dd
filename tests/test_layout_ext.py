"""Round-4 eighth-continuation batch (part 3): Flesch readability,
compaction bin-packing, JL sign random projection, and ANN recall@k.

All four carry FULL DuckDB oracles (registry.py; the recall oracle
composes BOTH full ANN algorithms as subqueries).  These tests pin
planted regimes: hand-counted words/sentences/syllables, a replayed
greedy packer, md5-replayed projection signs, and a same-cluster
corpus whose cheap tier must reach perfect recall.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from stixtoneodb_spark.operators import evals, relational, similarity, text


def _write_documents(tmp, texts, n_chars=None):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "src",
            "n_chars": np.asarray(
                n_chars if n_chars is not None else [len(t) for t in texts],
                dtype=np.int64,
            ),
        }
    )
    pdf.to_parquet(tmp / "documents.parquet")
    return str(tmp)


def _write_embeddings(tmp, vecs, labels=None):
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": np.asarray(
                labels if labels is not None else [0] * len(vecs), dtype=np.int32
            ),
        }
    )
    pdf.to_parquet(tmp / "embeddings.parquet")
    return str(tmp)


# ---- text_readability ------------------------------------------------------

def test_readability_hand_counted(spark, tmp_path):
    """'go go go. stop!' → 4 tokens, 2 sentence runs, 4 vowel runs —
    fre_milli = 206835 - (1015*4) div 2 - (84600*4) div 4 = 120205."""
    sf = _write_documents(tmp_path, ["go go go. stop!"])
    r = text.text_readability(spark, sf).collect()[0].asDict()
    assert r["n_docs"] == 1
    assert r["mean_fre_milli"] == 206835 - (1015 * 4) // 2 - (84600 * 4) // 4
    assert r["syll_per_kword"] == 1000 * 4 // 4


def test_readability_no_punctuation_one_sentence(spark, tmp_path):
    """Punctuation-free text counts as a single sentence (the corpus
    regime): longer runs push words-per-sentence and the score down."""
    short = "cat sat"            # w=2 s=1 syl=2
    long_ = "cat sat " * 10      # trailing split token is '' → excluded? no:
    # 'cat sat ' * 10 ends with a space → last token '' counts in the
    # string_split spec; keep the text trimmed instead.
    long_ = ("cat sat " * 10).strip()  # w=20 s=1 syl=20
    sf = _write_documents(tmp_path, [short])
    r1 = text.text_readability(spark, sf).collect()[0].asDict()
    sf2 = _write_documents(tmp_path, [long_])
    r2 = text.text_readability(spark, sf2).collect()[0].asDict()
    assert r1["mean_fre_milli"] == 206835 - 1015 * 2 - 84600
    assert r2["mean_fre_milli"] == 206835 - 1015 * 20 - 84600
    assert r2["mean_fre_milli"] < r1["mean_fre_milli"]


# ---- layout_compaction_bins ------------------------------------------------

def test_compaction_bins_replays_greedy_packer(spark, tmp_path):
    sizes = [25, 40, 10, 80, 5, 60, 30, 45, 20, 15, 70, 35, 50, 90, 5, 65, 55]
    sf = _write_documents(tmp_path, [f"d{i}" for i in range(len(sizes))], sizes)
    out = {r["bin"]: r.asDict() for r in relational.layout_compaction_bins(spark, sf).collect()}

    target = sum(sizes) // relational.COMPACT_BINS + 1
    exp: dict = {}
    cum = 0
    for i, s in enumerate(sizes):
        b = cum // target
        e = exp.setdefault(b, {"n": 0, "bytes": 0, "ids": []})
        e["n"] += 1
        e["bytes"] += s
        e["ids"].append(i)
        cum += s
    assert set(out) == set(exp)
    for b, e in exp.items():
        assert out[b]["n_files"] == e["n"]
        assert out[b]["bytes"] == e["bytes"]
        assert out[b]["min_doc_id"] == min(e["ids"])
        assert out[b]["max_doc_id"] == max(e["ids"])
        assert out[b]["fill_ppm"] == 1_000_000 * e["bytes"] // target
    # bins cover contiguous doc_id ranges (a packer invariant)
    ordered = sorted(exp)
    for a, b in zip(ordered, ordered[1:]):
        assert max(exp[a]["ids"]) < min(exp[b]["ids"])


# ---- embedding_random_projection -------------------------------------------

def _rp_sign(d: int, j: int) -> int:
    return 1 if int(hashlib.md5(f"rp:{d}:{j}".encode()).hexdigest()[0], 16) % 2 == 0 else -1


def test_random_projection_md5_replay(spark, tmp_path):
    """A one-hot vector projects to ±GRAM_SCALE per output dim with the
    sign of the md5 parity, and a two-hot vector to the signed sum."""
    dim = 6
    e0 = [0.0] * dim
    e0[2] = 1.0
    e1 = [0.0] * dim
    e1[0] = 1.0
    e1[4] = -1.0
    sf = _write_embeddings(tmp_path, [e0, e1])
    out = {r["vec_id"]: r.asDict() for r in similarity.embedding_random_projection(spark, sf).collect()}
    S = similarity.GRAM_SCALE
    for j in range(similarity.RP_K):
        assert out[0][f"p{j}"] == _rp_sign(2, j) * S
        assert out[1][f"p{j}"] == _rp_sign(0, j) * S - _rp_sign(4, j) * S
    assert out[0]["orig_sq"] == S * S
    assert out[0]["proj_sq"] == similarity.RP_K * S * S
    assert out[0]["ratio_ppm"] == 1_000_000  # one-hot preserves norm exactly


def test_random_projection_norm_concentration(spark, tmp_path):
    """Across a batch of dense vectors the mean ratio_ppm concentrates
    near 1e6 (the JL property the operator exists to deliver)."""
    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(80, 32)).astype(np.float32)
    sf = _write_embeddings(tmp_path, list(vecs))
    rows = similarity.embedding_random_projection(spark, sf).collect()
    mean_ratio = np.mean([r["ratio_ppm"] for r in rows])
    assert 0.75e6 < mean_ratio < 1.25e6


# ---- eval_ann_recall_at_k --------------------------------------------------

def test_ann_recall_perfect_on_tight_cluster(spark, tmp_path):
    """All vectors nearly parallel: every exact top-k neighbor also
    shares every LSH band, so recall@k is exactly 1e6 for each of the
    10 fixed queries."""
    rng = np.random.RandomState(3)
    base = rng.normal(size=24)
    base /= np.linalg.norm(base)
    vecs = [base + 1e-4 * rng.normal(size=24) for _ in range(20)]
    sf = _write_embeddings(tmp_path, vecs)
    rows = evals.eval_ann_recall_at_k(spark, sf).collect()
    assert len(rows) == 10  # the ann tier's fixed query set
    for r in rows:
        assert r["n_exact"] == similarity.TOP_K
        assert r["recall_micro"] == 1_000_000


def test_ann_recall_zero_when_floor_rejects(spark, tmp_path):
    """Near-orthogonal corpus: every candidate pair fails the 0.45
    cosine floor, so the cheap tier returns nothing and recall is 0
    for every query — the honest failure readout."""
    vecs = list(np.eye(24, dtype=np.float32)[:12])
    sf = _write_embeddings(tmp_path, vecs)
    rows = evals.eval_ann_recall_at_k(spark, sf).collect()
    assert len(rows) == 10
    assert all(r["n_hits"] == 0 and r["recall_micro"] == 0 for r in rows)

"""Round-4 seventh-continuation batch (part 3): BPE fertility histogram,
Soundex phonetic blocking, Wald-Wolfowitz runs test, Cramér's V, and
per-label embedding centroid drift.

All five carry FULL DuckDB oracles (registry.py); these tests pin
planted regimes — known Soundex codes and smith/smyth collisions,
perfectly sorted vs perfectly alternating sequences for the runs test,
functional dependence vs independence for V, and mirrored/flipped
half-corpora for centroid drift.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from stixtoneodb_spark.operators import relational, similarity, text


def _write_docs(tmp, recs):
    pdf = pd.DataFrame(
        {
            "doc_id": np.array([r[0] for r in recs], dtype=np.int64),
            "text": [r[1] for r in recs],
            "lang": "en",
            "source": "t",
            "n_chars": np.array([len(r[1]) for r in recs], dtype=np.int64),
        }
    )
    pdf.to_parquet(tmp / "documents.parquet")
    return str(tmp)


def _write_events(tmp, rows):
    """rows: list of (event_type, value, minute)."""
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.Series(
                [pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=r[2]) for r in rows]
            ).astype("datetime64[us]"),
            "user_id": np.zeros(len(rows), dtype=np.int64),
            "event_type": [r[0] for r in rows],
            "value": np.array([r[1] for r in rows], dtype=np.float64),
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp / "events.parquet")
    return str(tmp)


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


# ---- er_soundex_blocking ---------------------------------------------------

def test_soundex_classic_codes(spark, tmp_path):
    # classic published Soundex vectors: robert/rupert -> R163,
    # ashcraft/ashcroft -> A261 (h transparent), tymczak -> T522,
    # pfister -> P236 (adjacent equal codes collapse across first letter)
    sf = _write_docs(
        tmp_path,
        [(0, "robert rupert ashcraft ashcroft tymczak pfister honeyman")],
    )
    d = spark.read.parquet(f"{sf}/documents.parquet")
    from pyspark.sql import functions as F
    codes = dict(
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .select("w", F.expr(text._soundex_sql_expr("w")).alias("c"))
        .collect()
    )
    assert codes["robert"] == "R163" and codes["rupert"] == "R163"
    assert codes["ashcraft"] == "A261" and codes["ashcroft"] == "A261"
    assert codes["tymczak"] == "T522"
    assert codes["pfister"] == "P236"
    assert codes["honeyman"] == "H555"


def test_soundex_blocking_collides_smith_smyth(spark, tmp_path):
    sf = _write_docs(
        tmp_path,
        [(0, "smith smith smyth"), (1, "walker unrelated")],
    )
    out = text.er_soundex_blocking(spark, sf).collect()
    hits = [r for r in out if r["collides"]]
    assert len(hits) == 1
    blk = hits[0]
    assert blk["n_spellings"] == 2 and blk["n_occurrences"] == 3
    assert blk["spelling_min"] == "smith" and blk["spelling_max"] == "smyth"
    assert all(r["n_spellings"] == 1 for r in out if not r["collides"])


# ---- stats_runs_test -------------------------------------------------------

def test_runs_sorted_vs_alternating(spark, tmp_path):
    # 21 DISTINCT values 0..20: median is 10 (rank 11) and only that
    # single row drops as a tie — ten below, ten above survive
    rows = []
    # 'sorted': ascending -> runs = 2 (max clustering)
    for i, v in enumerate(range(21)):
        rows.append(("sorted", float(v), i))
    # 'alt': low/high interleave -> runs = 20 (max alternation)
    for i in range(10):
        rows.append(("alt", float(i), 100 + 2 * i))          # lows 0..9
        rows.append(("alt", float(11 + i), 101 + 2 * i))     # highs 11..20
    rows.append(("alt", 10.0, 199))  # the median row, dropped as a tie
    sf = _write_events(tmp_path, rows)
    out = {r["event_type"]: r for r in relational.stats_runs_test(spark, sf).collect()}
    assert out["sorted"]["runs"] == 2 and out["sorted"]["verdict"] == "clustered"
    assert out["alt"]["runs"] == 20 and out["alt"]["verdict"] == "alternating"
    for r in out.values():
        assert r["n1"] == 10 and r["n2"] == 10
        # E = (20 + 2*100)/20 = 11
        assert r["e_runs_ppm"] == 11_000_000


def test_runs_median_ties_dropped(spark, tmp_path):
    # values 1,5,5,5,9: median 5; the three 5s drop -> n1=n2=1
    rows = [("a", v, i) for i, v in enumerate([1.0, 5.0, 5.0, 5.0, 9.0])]
    sf = _write_events(tmp_path, rows)
    row = relational.stats_runs_test(spark, sf).collect()[0]
    assert row["n1"] == 1 and row["n2"] == 1 and row["runs"] == 2


# ---- stats_cramers_v -------------------------------------------------------

def test_cramers_v_dependence_and_independence(spark, tmp_path):
    # functional dependence: type determines bucket -> V = 1
    rows = [("a", 10.0, i) for i in range(8)] + [("b", 60.0, 8 + i) for i in range(8)]
    sf = _write_events(tmp_path, rows)
    row = relational.stats_cramers_v(spark, sf).collect()[0]
    assert row["r"] == 2 and row["c"] == 2
    assert abs(row["cramers_v"] - 1.0) < 1e-6
    assert abs(row["chi2"] - 16.0) < 1e-6  # chi2 = n for a perfect 2x2

    # independence: uniform product grid -> V = 0
    rows2 = []
    m = 0
    for t in ("a", "b"):
        for v in (10.0, 60.0):
            for _ in range(4):
                rows2.append((t, v, m))
                m += 1
    sf2 = _write_events(tmp_path / "indep", rows2) if False else None
    # separate dir for the second corpus
    import pathlib
    d2 = tmp_path / "indep"
    d2.mkdir()
    sf2 = _write_events(d2, rows2)
    row2 = relational.stats_cramers_v(spark, sf2).collect()[0]
    assert row2["cramers_v"] == 0.0 and row2["chi2"] == 0.0


# ---- embedding_centroid_drift ----------------------------------------------

def test_centroid_drift_stable_and_flipped(spark, tmp_path):
    # label 0: both halves identical direction -> cos 1
    # label 1: second half orthogonal to first -> cos 0
    vecs = [
        [1.0, 0.0], [1.0, 0.0],   # label 0 early (ids 0,1)
        [1.0, 0.0], [1.0, 0.0],   # label 0 late  (ids 2,3)
        [0.0, 1.0], [0.0, 1.0],   # label 1 early (ids 4,5)
        [1.0, 0.0], [1.0, 0.0],   # label 1 late  (ids 6,7)
    ]
    labels = [0, 0, 0, 0, 1, 1, 1, 1]
    sf = _write_embeddings(tmp_path, vecs, labels)
    out = {r["label"]: r["drift_cos"] for r in similarity.embedding_centroid_drift(spark, sf).collect()}
    assert out[0] == 1.0
    assert out[1] == 0.0


def test_centroid_drift_single_half_label_excluded(spark, tmp_path):
    # label 9 has one vector: median split leaves the 'late' half empty
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.5, 0.5]]
    sf = _write_embeddings(tmp_path, vecs, [0, 0, 9])
    out = similarity.embedding_centroid_drift(spark, sf).collect()
    assert [r["label"] for r in out] == [0]


# ---- tokenizer_bpe_fertility ----------------------------------------------

def test_bpe_fertility_conservation(spark, tmp_path):
    # occurrence shares must sum to ~1e6 and occurrences to the corpus
    # word count; every word costs >= 1 symbol
    sf = _write_docs(
        tmp_path,
        [(0, "aa aa aa bb bb cc"), (1, "aa bb cc dd ee ff")],
    )
    out = text.tokenizer_bpe_fertility(spark, sf).collect()
    total_occ = sum(r["n_occurrences"] for r in out)
    assert total_occ == 12
    share = sum(r["occ_share_ppm"] for r in out)
    assert 1000000 - len(out) <= share <= 1000000
    assert all(r["n_symbols"] >= 1 for r in out)

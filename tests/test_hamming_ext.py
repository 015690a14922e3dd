"""Round-4 eighth-continuation batch (part 14): SimHash Hamming-radius-1
pairs and multi-lag daily autocorrelation.

Both carry FULL DuckDB oracles (registry.py).  The hamming test replays
the ENTIRE signature pipeline in pure Python (md5 votes, bit packing)
and brute-forces the radius-1 pair set; the autocorrelation test plants
an exact 24-hour cycle."""

from __future__ import annotations

import hashlib
import itertools
import re

import numpy as np
import pandas as pd

from stixtoneodb_spark.operators import dedup, relational


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


def _py_simhash(text: str) -> int:
    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ") if t]
    votes = [0] * 32
    for t in toks:
        hv = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        for b in range(32):
            votes[b] += 1 if (hv >> b) & 1 else -1
    return sum(1 << b for b in range(32) if votes[b] > 0)


def test_simhash_hamming1_matches_python_bruteforce(spark, tmp_path):
    """20 overlapping-token docs: the operator's pair set equals the
    brute-force radius-1 pair set over Python-replayed signatures, and
    identical docs pair at hamming 0."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    words = base.split()
    texts = [base]  # doc 0
    texts.append(base)  # doc 1: identical -> hamming 0 with doc 0
    for i in range(2, 20):
        # vary one or two words to scatter signatures near the base
        t = list(words)
        t[i % len(words)] = f"word{i}"
        if i % 3 == 0:
            t[(i + 1) % len(words)] = f"extra{i}"
        texts.append(" ".join(t))
    sf = _write_documents(tmp_path, texts)
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.dedup_simhash_hamming1(spark, sf).collect()
    }

    sigs = [_py_simhash(t) for t in texts]
    exp = {}
    for a, b in itertools.combinations(range(len(texts)), 2):
        hd = bin(sigs[a] ^ sigs[b]).count("1")
        if hd <= 1:
            exp[(a, b)] = hd
    assert out == exp
    assert out[(0, 1)] == 0  # the planted identical pair


def test_autocorr_daily_detects_24h_cycle(spark, tmp_path):
    """Counts repeat with period 24 over a 48-hour grid: r(24) = 1.0
    exactly and dominates the off-period lags."""
    t0 = pd.Timestamp("2024-01-01")
    pattern = [1 + (h * 7) % 5 for h in range(24)]  # aperiodic within a day
    rows = []
    for h in range(48):
        for i in range(pattern[h % 24]):
            rows.append(("click", 1.0, t0 + pd.Timedelta(hours=h, seconds=i), 1))
    sf = _write_events(tmp_path, rows)
    out = {r["lag"]: r.asDict() for r in relational.stats_autocorr_daily(spark, sf).collect()}
    assert out[24]["pearson_r"] == 1.0
    assert out[24]["n_points"] == 24
    assert out[24]["pearson_r"] > out[12]["pearson_r"]
    assert out[24]["pearson_r"] > out[6]["pearson_r"]

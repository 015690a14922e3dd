"""Round-4 eighth-continuation batch (part 6): Gopher filter cascade,
Gini activity concentration, time-weighted averages, and
time-to-convert percentiles.

All four carry FULL DuckDB oracles (registry.py).  These tests pin
planted regimes: one document per cascade rule (first-fail
attribution), a perfectly equal vs whale-dominated activity split, a
hold-until-next integral computed by hand, and a funnel with a
pre-signup purchase that must not count."""

from __future__ import annotations

import numpy as np
import pandas as pd

from stixtoneodb_spark.operators import relational, text


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


# ---- corpus_gopher_rules ---------------------------------------------------

def test_gopher_cascade_first_fail_attribution(spark, tmp_path):
    """Six documents, each stopping at a different cascade stage; the
    ledger must attribute each to its FIRST failing rule."""
    texts = [
        "aa bb",                                    # r1: 2 words < 5
        ("abcdefghijklmnop " * 6).strip(),          # r2: mean word len 16
        "aa!! bb!! cc!! dd!! ee!!",                 # r3: 10/24 symbol chars
        "the the the the the of in is",             # r4: top word 5/8
        "cat dog bird fish wolf",                   # r5: zero stopwords
        "the cat sat on a mat pad rug now",         # kept
    ]
    sf = _write_documents(tmp_path, texts)
    out = {r["rule"]: r.asDict() for r in text.corpus_gopher_rules(spark, sf).collect()}
    expected = {
        "r1_word_count",
        "r2_mean_word_len",
        "r3_symbol_ratio",
        "r4_repetition",
        "r5_stopword_floor",
        "kept",
    }
    assert set(out) == expected
    for rule in expected:
        assert out[rule]["n_docs"] == 1
        assert out[rule]["share_ppm"] == 1_000_000 // 6


# ---- stats_gini_concentration ----------------------------------------------

def test_gini_equal_vs_whale(spark, tmp_path):
    """Equal activity → G = 0; counts [1,1,1,7] → G = 18/40 = 0.45."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for u in range(4):  # 'eq': every user exactly 2 events
        for i in range(2):
            rows.append(("eq", 1.0, t0 + pd.Timedelta(minutes=u * 10 + i), u))
    whale = [1, 1, 1, 7]
    for u, n in enumerate(whale):  # 'uneq'
        for i in range(n):
            rows.append(("uneq", 1.0, t0 + pd.Timedelta(minutes=100 + u * 20 + i), u))
    sf = _write_events(tmp_path, rows)
    out = {r["event_type"]: r.asDict() for r in relational.stats_gini_concentration(spark, sf).collect()}
    assert out["eq"]["gini_ppm"] == 0
    assert out["uneq"]["gini_ppm"] == 1_000_000 * 18 // 40
    assert out["uneq"]["n_users"] == 4 and out["uneq"]["n_events"] == 10


# ---- events_twap -----------------------------------------------------------

def test_twap_hold_until_next(spark, tmp_path):
    """v=10 held 60 s then v=30 held 40 s (final v=5 holds nothing):
    TWAP = (10·60 + 30·40)/100 = 18.0 while the row mean is 15.0."""
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        ("sensor", 10.0, t0, 1),
        ("sensor", 30.0, t0 + pd.Timedelta(seconds=60), 1),
        ("sensor", 5.0, t0 + pd.Timedelta(seconds=100), 1),
    ]
    sf = _write_events(tmp_path, rows)
    r = relational.events_twap(spark, sf).collect()[0].asDict()
    assert r["span_s"] == 100
    assert r["twap_micro"] == 18_000_000
    assert r["row_mean_micro"] == 15_000_000


def test_twap_single_event_type_excluded(spark, tmp_path):
    """A type with zero span (one event) has no integral — excluded."""
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        ("lonely", 9.0, t0, 1),
        ("pair", 1.0, t0, 2),
        ("pair", 3.0, t0 + pd.Timedelta(seconds=10), 2),
    ]
    sf = _write_events(tmp_path, rows)
    out = {r["event_type"] for r in relational.events_twap(spark, sf).collect()}
    assert out == {"pair"}


# ---- funnel_time_to_convert ------------------------------------------------

def test_time_to_convert_planted_funnel(spark, tmp_path):
    """4 signups; latencies 10 and 30 min convert; a purchase BEFORE
    signup does not count; exact ceil-rank percentile picks."""
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        ("signup", 1.0, t0, 1),
        ("purchase", 1.0, t0 + pd.Timedelta(minutes=10), 1),
        ("signup", 1.0, t0, 2),
        ("purchase", 1.0, t0 + pd.Timedelta(minutes=30), 2),
        ("purchase", 1.0, t0 - pd.Timedelta(minutes=5), 3),  # pre-signup
        ("signup", 1.0, t0, 3),
        ("signup", 1.0, t0, 4),  # never converts
        ("click", 1.0, t0, 5),   # never signs up: not in denominator
    ]
    sf = _write_events(tmp_path, rows)
    r = relational.funnel_time_to_convert(spark, sf).collect()[0].asDict()
    assert r["n_signed_up"] == 4
    assert r["n_converted"] == 2
    assert r["conversion_ppm"] == 500_000
    assert r["p25_min"] == 10 and r["p50_min"] == 10
    assert r["p75_min"] == 30 and r["p90_min"] == 30

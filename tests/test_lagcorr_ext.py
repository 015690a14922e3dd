"""Round-4 eighth-continuation batch (part 13): lag cross-correlation,
rolling regression slopes, seed walk counts, session bounce rates.

All four carry FULL DuckDB oracles (registry.py; the walk oracle
unrolls the integer matrix-vector powers).  These tests pin planted
regimes: a purchase series that is exactly the click series shifted by
two hours, a perfectly linear count ramp, a hand-traceable walk chain,
and bounce/non-bounce sessions split by entry type."""

from __future__ import annotations

import numpy as np
import pandas as pd

from stixtoneodb_spark.operators import relational


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


# ---- events_lag_correlation ------------------------------------------------

def test_lag_correlation_finds_two_hour_lead(spark, tmp_path):
    """purchase counts = click counts shifted +2 hours → r = 1.0 exactly
    at lag 2 and weaker at the mirrored lag."""
    t0 = pd.Timestamp("2024-01-01")
    counts = [5, 1, 4, 2, 6, 1, 3, 2]
    rows = []
    for h, n in enumerate(counts):
        for i in range(n):
            rows.append(("click", 1.0, t0 + pd.Timedelta(hours=h, seconds=i), 1))
            rows.append(
                ("purchase", 1.0, t0 + pd.Timedelta(hours=h + 2, seconds=i), 2)
            )
    sf = _write_events(tmp_path, rows)
    out = {r["lag"]: r.asDict() for r in relational.events_lag_correlation(spark, sf).collect()}
    assert set(out) == set(range(-3, 4))
    assert out[2]["pearson_r"] == 1.0
    assert out[-2]["pearson_r"] is None or out[-2]["pearson_r"] < 1.0
    assert out[0]["pearson_r"] < 1.0


# ---- window_rolling_regression ---------------------------------------------

def test_rolling_regression_linear_ramp(spark, tmp_path):
    """y = h+1 events at hour h (h = 0..9): every full 6-hour window
    fits slope exactly 1 → 1e6 micro."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for h in range(10):
        for i in range(h + 1):
            rows.append(("click", 1.0, t0 + pd.Timedelta(hours=h, seconds=i), 1))
    sf = _write_events(tmp_path, rows)
    out = [r.asDict() for r in relational.window_rolling_regression(spark, sf).collect()]
    assert len(out) == 5  # hours 5..9 carry full windows
    for r in out:
        assert r["slope_micro_per_hour"] == 1_000_000
        assert r["y"] == r["h"] + 1


# ---- kg_path_counts --------------------------------------------------------

def test_path_counts_chain_by_hand(spark, tmp_path):
    """Chain join—customer—vector: w1 = {customer:1}; w2 = {join:1,
    vector:1}; w3 = {customer:2}; w4 = {join:2, vector:2}."""
    texts = ["join customer"] * 2 + ["customer vector"] * 3
    sf = _write_documents(tmp_path, texts)
    out = {r["mention"]: r.asDict() for r in relational.kg_path_counts(spark, sf).collect()}
    assert out["customer"]["walks1"] == 1 and out["vector"]["walks1"] == 0
    assert out["join"]["walks2"] == 1 and out["vector"]["walks2"] == 1
    assert out["customer"]["walks3"] == 2
    assert out["join"]["walks4"] == 2 and out["vector"]["walks4"] == 2
    assert out["customer"]["walks2"] == 0  # bipartite chain parity


# ---- agg_session_bounce_rate -----------------------------------------------

def test_bounce_rate_by_entry_type(spark, tmp_path):
    """u1: a lone click (bounce) then, after >30 min, a 3-event session
    entered via view (no bounce); u2: another click bounce."""
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        ("click", 1.0, t0, 1),
        ("view", 1.0, t0 + pd.Timedelta(hours=2), 1),
        ("click", 1.0, t0 + pd.Timedelta(hours=2, minutes=5), 1),
        ("purchase", 1.0, t0 + pd.Timedelta(hours=2, minutes=10), 1),
        ("click", 1.0, t0 + pd.Timedelta(minutes=7), 2),
    ]
    sf = _write_events(tmp_path, rows)
    out = {r["entry_type"]: r.asDict() for r in relational.agg_session_bounce_rate(spark, sf).collect()}
    assert out["click"]["n_sessions"] == 2
    assert out["click"]["n_bounces"] == 2
    assert out["click"]["bounce_ppm"] == 1_000_000
    assert out["view"]["n_sessions"] == 1
    assert out["view"]["n_bounces"] == 0
    assert out["view"]["mean_len_milli"] == 3_000

"""Round-4 eighth-continuation batch (part 10): DAU/WAU stickiness,
SCD2 point-in-time join, and kNN-distance embedding outliers.

All three carry FULL DuckDB oracles (registry.py; the point-in-time
oracle composes the entire scd2_user_history SQL as a CTE).  These
tests pin planted regimes: a hand-built day grid with a 7-day window
edge, a user whose pre-purchase states are known per run (including
the cold-start '(none)' bucket), and a tight cluster with one
orthogonal outlier the bottom-decile cut must flag."""

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


def _write_embeddings(tmp, vecs):
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": np.zeros(len(vecs), dtype=np.int32),
        }
    )
    pdf.to_parquet(tmp / "embeddings.parquet")
    return str(tmp)


# ---- events_dau_wau_stickiness ---------------------------------------------

def test_dau_wau_window_edges(spark, tmp_path):
    """Days 0 (u1,u2), 1 (u1), 8 (u1): day 1's weekly window still sees
    both users; day 8's window (days 2-8) sees only u1."""
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        ("click", 1.0, t0, 1),
        ("click", 1.0, t0 + pd.Timedelta(hours=2), 2),
        ("click", 1.0, t0 + pd.Timedelta(days=1), 1),
        ("click", 1.0, t0 + pd.Timedelta(days=8), 1),
    ]
    sf = _write_events(tmp_path, rows)
    base = (t0 - pd.Timestamp("1970-01-01")).days
    out = {r["day_id"] - base: r.asDict() for r in relational.events_dau_wau_stickiness(spark, sf).collect()}
    assert out[0]["dau"] == 2 and out[0]["wau"] == 2
    assert out[0]["stickiness_ppm"] == 1_000_000
    assert out[1]["dau"] == 1 and out[1]["wau"] == 2
    assert out[1]["stickiness_ppm"] == 500_000
    assert out[8]["dau"] == 1 and out[8]["wau"] == 1


# ---- join_scd2_asof --------------------------------------------------------

def test_scd2_asof_prior_states(spark, tmp_path):
    """click→view→purchase→purchase: the first purchase's prior state is
    the view run; the second's is the purchase run itself (2 events);
    a user whose FIRST event is a purchase lands in '(none)'."""
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        ("click", 1.0, t0, 1),
        ("view", 1.0, t0 + pd.Timedelta(minutes=1), 1),
        ("purchase", 1.0, t0 + pd.Timedelta(minutes=2), 1),
        ("purchase", 1.0, t0 + pd.Timedelta(minutes=3), 1),
        ("purchase", 1.0, t0 + pd.Timedelta(minutes=9), 2),  # cold start
    ]
    sf = _write_events(tmp_path, rows)
    out = {r["prior_state"]: r.asDict() for r in relational.join_scd2_asof(spark, sf).collect()}
    assert out["view"]["n_purchases"] == 1
    assert out["view"]["mean_run_events_milli"] == 1_000
    assert out["purchase"]["n_purchases"] == 1
    assert out["purchase"]["mean_run_events_milli"] == 2_000
    assert out["(none)"]["n_purchases"] == 1
    assert out["(none)"]["mean_run_events_milli"] == 0


# ---- embedding_knn_outliers ------------------------------------------------

def test_knn_outliers_flags_isolated_vector(spark, tmp_path):
    """Nine near-parallel vectors plus one orthogonal: n=10 → cut 1 →
    exactly the orthogonal vector is flagged, with a near-zero 5th-NN
    cosine while cluster members score near 1."""
    rng = np.random.RandomState(11)
    base = rng.normal(size=16)
    base /= np.linalg.norm(base)
    vecs = [base + 1e-3 * rng.normal(size=16) for _ in range(9)]
    iso = np.zeros(16)
    # orthogonalize a random vector against base
    r = rng.normal(size=16)
    iso = r - (r @ base) * base
    iso /= np.linalg.norm(iso)
    vecs.append(iso)
    sf = _write_embeddings(tmp_path, vecs)
    out = {r["vec_id"]: r.asDict() for r in relational.embedding_knn_outliers(spark, sf).collect()}
    assert len(out) == 10
    assert out[9]["is_outlier"] == 1
    assert sum(d["is_outlier"] for d in out.values()) == 1
    assert out[9]["nn_cos_micro"] < 100_000
    for i in range(9):
        assert out[i]["nn_cos_micro"] > 900_000

"""Round-4 seventh-continuation batch (part 4): hysteresis burst
detection, directed triad census, Theil-Sen robust slope, and the
power-iteration top eigenvector.

All four carry FULL DuckDB oracles (registry.py); these tests pin
planted regimes — a burst with a mid-dip the hysteresis must bridge
vs a low-only island it must ignore, hand-built transitive vs cyclic
triangles, an outlier hour that breaks OLS but not Theil-Sen, and a
corpus with a planted dominant variance direction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from stixtoneodb_spark.operators import relational, similarity


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


def _hours(counts, type_name, start_hour=0, user=0):
    """expand {hour_offset: n_events} into event rows."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for h, n in counts.items():
        for i in range(n):
            rows.append(
                (type_name, 1.0, t0 + pd.Timedelta(hours=start_hour + h, seconds=i), user)
            )
    return rows


# ---- events_burst_hysteresis ----------------------------------------------

def test_burst_bridges_dip_and_ignores_low_island(spark, tmp_path):
    # 10 quiet hours at 1/h set the mean low; burst: 8,3,8 (the 3 is a
    # >=lo dip the hysteresis must bridge); later a lone lo-only island
    # at 3/h that must NOT become a burst (never crosses hi).
    counts = {h: 1 for h in range(10)}
    counts.update({20: 8, 21: 3, 22: 8})
    counts[30] = 3
    rows = _hours(counts, "a")
    sf = _write_events(tmp_path, rows)
    out = relational.events_burst_hysteresis(spark, sf).collect()
    # mean = 30/14 ~ 2.14; lo: c >= 2.14 -> {8,3,8,3}; hi: c >= 4.29 -> {8,8}
    assert len(out) == 1
    b = out[0]
    assert b["burst_start"] == 20 and b["burst_end"] == 22
    assert b["n_hours_burst"] == 3 and b["peak_per_hour"] == 8
    assert b["n_events_burst"] == 19


def test_burst_arms_only_at_hi(spark, tmp_path):
    # island shape lo,hi,lo: burst must start AT the hi hour, not the
    # island's first lo hour
    counts = {h: 1 for h in range(10)}
    counts.update({20: 3, 21: 8, 22: 3})
    sf = _write_events(tmp_path, _hours(counts, "a"))
    out = relational.events_burst_hysteresis(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["burst_start"] == 21 and out[0]["burst_end"] == 22


# ---- kg_directed_triads ----------------------------------------------------

def _chain_rows(seqs):
    """per-user event-type chains -> event rows."""
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for u, seq in enumerate(seqs):
        for i, t in enumerate(seq):
            rows.append((t, 1.0, t0 + pd.Timedelta(minutes=u * 1000 + i), u))
    return rows


def test_triads_transitive_and_cyclic(spark, tmp_path):
    # build edges a->b, b->c, a->c (transitive) and x->y, y->z, z->x
    # (cyclic), each repeated equally so every edge passes the mean cut
    seqs = []
    for _ in range(5):
        seqs += [["a", "b", "c"], ["a", "c"], ["x", "y", "z", "x"]]
    sf = _write_events(tmp_path, _chain_rows(seqs))
    row = relational.kg_directed_triads(spark, sf).collect()[0]
    assert row["n_transitive"] == 1
    assert row["n_cyclic"] == 1


# ---- stats_theil_sen -------------------------------------------------------

def test_theil_sen_resists_outlier_hour(spark, tmp_path):
    # y = 10*x across hours 0..9, except hour 9 explodes to 10000:
    # OLS would tilt hard; the median pairwise slope stays 10/h
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for h in range(10):
        v = 10.0 * h if h < 9 else 10000.0
        rows.append(("a", v, t0 + pd.Timedelta(hours=h), 0))
    sf = _write_events(tmp_path, rows)
    row = relational.stats_theil_sen(spark, sf).collect()[0]
    assert row["slope_micro_per_hour"] == 10_000_000.0  # 10 units/hour in micro


def test_theil_sen_exact_line(spark, tmp_path):
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for h in range(6):
        for _ in range(3):  # 3 identical events per hour -> exact mean
            rows.append(("a", 5.0 + 2.0 * h, t0 + pd.Timedelta(hours=h), 0))
    sf = _write_events(tmp_path, rows)
    row = relational.stats_theil_sen(spark, sf).collect()[0]
    assert row["slope_micro_per_hour"] == 2_000_000.0


# ---- embedding_top_eigvec --------------------------------------------------

def test_eigvec_finds_planted_direction(spark, tmp_path):
    # 50 vectors along e0 (±10) + 50 tiny along e1: top direction = e0
    rng = np.random.default_rng(3)
    vecs = []
    for i in range(50):
        vecs.append([10.0 * (1 if i % 2 == 0 else -1), rng.normal() * 0.01, 0.0])
    sf = _write_embeddings(tmp_path, vecs)
    out = {r["dim"]: r for r in similarity.embedding_top_eigvec(spark, sf).collect()}
    assert len(out) == 3
    assert abs(abs(out[0]["component"]) - 1.0) < 1e-3
    assert abs(out[1]["component"]) < 1e-2 and abs(out[2]["component"]) < 1e-6
    # lambda ~ mean squared magnitude along e0 = 100
    assert abs(out[0]["lambda_est"] - 100.0) < 1.0


def test_eigvec_unit_norm(spark, tmp_path):
    rng = np.random.default_rng(11)
    vecs = [rng.normal(size=4) for _ in range(30)]
    sf = _write_embeddings(tmp_path, vecs)
    out = similarity.embedding_top_eigvec(spark, sf).collect()
    nrm = sum(r["component"] ** 2 for r in out)
    assert abs(nrm - 1.0) < 1e-4

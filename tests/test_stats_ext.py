"""Round-4 sixth-continuation batch: grouped OLS, dyadic EWMA, Cohen's
kappa, Gini impurity, snake shard layout, and Fellegi-Sunter field
agreement.

All six carry FULL DuckDB oracles (registry.py, driver-compared at
sf0.01); these tests pin regimes the fixture can't reach — an exactly
planted regression line, EWMA head renormalization and the closed-form
step response, perfect agreement / disagreement / degenerate-margin
kappa, closed-form uniform-mix Gini, exact snake-balance conservation,
and planted linkage pairs at every score tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from stixtoneodb_spark.operators import relational

SF = "/root/testdata/sf0.01"


def _write_events(tmp, rows):
    """rows: list of (user_id, event_type, value, hour)."""
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.Series(
                [
                    pd.Timestamp("2024-01-01")
                    + pd.Timedelta(hours=h, minutes=1)
                    for _, _, _, h in rows
                ]
            ).astype("datetime64[us]"),
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "event_type": [r[1] for r in rows],
            "value": np.array([r[2] for r in rows], dtype=np.float64),
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp / "events.parquet")
    return str(tmp)


def _write_docs(tmp, recs):
    """recs: list of (doc_id, text, lang, source)."""
    pdf = pd.DataFrame(
        {
            "doc_id": np.array([r[0] for r in recs], dtype=np.int64),
            "text": [r[1] for r in recs],
            "lang": [r[2] for r in recs],
            "source": [r[3] for r in recs],
            "n_chars": np.array([len(r[1]) for r in recs], dtype=np.int64),
        }
    )
    pdf.to_parquet(tmp / "documents.parquet")
    return str(tmp)


# ---- stats_linreg_by_group -------------------------------------------------


def test_linreg_recovers_planted_line(spark, tmp_path):
    """y = 3x + 7 over hours 0..23 fits exactly (slope 3e6 ppm,
    intercept 7e6 ppm); a second group planted with y = -2x + 50
    recovers the negative slope with the same truncation rule."""
    rows = [(1, "up", float(3 * h + 7), h) for h in range(24)]
    rows += [(1, "down", float(50 - 2 * h), h) for h in range(24)]
    sf = _write_events(tmp_path, rows)
    out = {
        r["event_type"]: r
        for r in relational.stats_linreg_by_group(spark, sf).collect()
    }
    assert out["up"]["slope_ppm"] == 3_000_000
    assert out["up"]["intercept_ppm"] == 7_000_000
    assert out["down"]["slope_ppm"] == -2_000_000
    assert out["down"]["intercept_ppm"] == 50_000_000


def test_linreg_flat_series_zero_slope(spark, tmp_path):
    sf = _write_events(
        tmp_path, [(1, "flat", 9.0, h) for h in range(12)]
    )
    row = relational.stats_linreg_by_group(spark, sf).collect()[0]
    assert row["slope_ppm"] == 0
    assert row["intercept_ppm"] == 9_000_000


# ---- events_ewma_hourly -----------------------------------------------------


def test_ewma_constant_series_is_identity(spark, tmp_path):
    """A constant hourly rate smooths to itself at EVERY position —
    including the head rows, which renormalize over present lags only."""
    rows = []
    for h in range(10):
        rows += [(1, "c", 1.0, h)] * 5
    sf = _write_events(tmp_path, rows)
    out = relational.events_ewma_hourly(spark, sf).collect()
    assert len(out) == 10
    assert all(r["ewma_ppm"] == 5_000_000 for r in out)


def test_ewma_step_response_closed_form(spark, tmp_path):
    """Counts [1]*7 + [9]: the spike hour's EWMA equals the dyadic
    closed form computed independently in Python."""
    rows = []
    for h in range(7):
        rows += [(1, "s", 1.0, h)]
    rows += [(1, "s", 1.0, 7)] * 9
    sf = _write_events(tmp_path, rows)
    out = {
        r["hour_id"]: r["ewma_ppm"]
        for r in relational.events_ewma_hourly(spark, sf).collect()
    }
    counts = [1] * 7 + [9]
    lags = relational.EWMA_LAGS
    num = sum(
        counts[7 - k] * (1 << (lags - 1 - k)) for k in range(lags)
    )
    den = sum(1 << (lags - 1 - k) for k in range(lags))
    assert out[7] == (1_000_000 * num) // den
    # head row: only its own count present
    assert out[0] == 1_000_000


# ---- stats_cohens_kappa -----------------------------------------------------


def test_kappa_perfect_agreement_and_disagreement(spark, tmp_path):
    rows = []
    # agree: value parity == user parity on every event
    for i in range(8):
        rows.append((i, "agree", float(i % 2), 0))
    # oppose: parities always differ
    for i in range(8):
        rows.append((i, "oppose", float((i + 1) % 2), 0))
    sf = _write_events(tmp_path, rows)
    out = {
        r["event_type"]: r["kappa_ppm"]
        for r in relational.stats_cohens_kappa(spark, sf).collect()
    }
    assert out["agree"] == 1_000_000
    assert out["oppose"] == -1_000_000


def test_kappa_degenerate_margins_null(spark, tmp_path):
    """Both raters constant 0 -> all four products vanish -> NULL, and
    one constant rater with the other mixed -> kappa exactly 0."""
    rows = [(2 * i, "void", 2.0, 0) for i in range(6)]
    rows += [(i, "half", 2.0, 0) for i in range(6)]
    sf = _write_events(tmp_path, rows)
    out = {
        r["event_type"]: r["kappa_ppm"]
        for r in relational.stats_cohens_kappa(spark, sf).collect()
    }
    assert out["void"] is None
    assert out["half"] == 0


# ---- stats_gini_impurity ----------------------------------------------------


def test_gini_closed_forms(spark, tmp_path):
    """Single-type user -> 0; uniform 4-type mix -> exactly 750000 ppm;
    a 3:1 binary mix -> (16-10)/16 = 375000 ppm."""
    rows = [(1, "a", 1.0, 0)] * 5
    for t in ("a", "b", "c", "d"):
        rows += [(2, t, 1.0, 0)] * 3
    rows += [(3, "a", 1.0, 0)] * 3 + [(3, "b", 1.0, 0)]
    sf = _write_events(tmp_path, rows)
    out = {
        r["user_id"]: r
        for r in relational.stats_gini_impurity(spark, sf).collect()
    }
    assert out[1]["gini_ppm"] == 0 and out[1]["n_types"] == 1
    assert out[2]["gini_ppm"] == 750_000 and out[2]["n"] == 12
    assert out[3]["gini_ppm"] == 375_000


# ---- layout_shard_assign ----------------------------------------------------


def test_shard_snake_exact_balance_and_conservation(spark, tmp_path):
    """Arithmetic-progression sizes over exactly 2 snake blocks balance
    PERFECTLY (pairing i with 2K+1-i), and doc/char totals conserve."""
    k = relational.SHARD_COUNT
    recs = [
        (i, "x" * (2 * k - i), "en", "s")  # sizes 2k..1, unique
        for i in range(2 * k)
    ]
    sf = _write_docs(tmp_path, recs)
    out = relational.layout_shard_assign(spark, sf).collect()
    assert len(out) == k
    assert sum(r["n_docs"] for r in out) == 2 * k
    assert sum(r["chars_total"] for r in out) == sum(
        2 * k - i for i in range(2 * k)
    )
    assert len({r["chars_total"] for r in out}) == 1  # perfect balance


def test_shard_assignment_near_balanced_random(spark, tmp_path):
    """On a deterministic pseudo-random corpus the snake layout keeps
    the max/min shard ratio tight (within 5% here) — the property a
    round-robin-by-arrival layout does NOT have."""
    rng = np.random.RandomState(7)
    sizes = rng.randint(10, 500, size=200)
    recs = [(i, "y" * int(s), "en", "s") for i, s in enumerate(sizes)]
    sf = _write_docs(tmp_path, recs)
    out = relational.layout_shard_assign(spark, sf).collect()
    tots = [r["chars_total"] for r in out]
    assert max(tots) <= 1.05 * min(tots)


# ---- er_field_agreement -----------------------------------------------------


def test_er_score_tiers_and_blocking(spark, tmp_path):
    """Full-agreement pair scores W_SOURCE+W_CHARS+W_PREFIX; a pair
    sharing only source+size lands exactly at the threshold; source-only
    (below threshold) and cross-language twins are excluded."""
    p = "SHARED-PREFIX-16!"  # 17 chars, first 16 shared
    recs = [
        (1, p + "alpha tail", "en", "s1"),
        (2, p + "beta tailx", "en", "s1"),     # vs 1: src+chars+prefix
        (3, "completely different!", "en", "s1"),  # vs 1: src+chars only
        (4, "unrelated text here with a much longer body " + "z" * 60,
         "en", "s1"),                           # vs 1: source only -> out
        (5, p + "alpha tail", "fr", "s1"),      # twin of 1, other block
    ]
    sf = _write_docs(tmp_path, recs)
    out = {
        (r["doc_a"], r["doc_b"]): r["score"]
        for r in relational.er_field_agreement(spark, sf).collect()
    }
    full = (
        relational.ER_W_SOURCE
        + relational.ER_W_CHARS
        + relational.ER_W_PREFIX
    )
    assert out[(1, 2)] == full
    assert out[(1, 3)] == relational.ER_W_SOURCE + relational.ER_W_CHARS
    assert (1, 4) not in out
    assert all(a != 5 and b != 5 for (a, b) in out)
    assert all(a < b for (a, b) in out)

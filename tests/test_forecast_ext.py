"""Round-4 eighth-continuation batch (part 4): Fleiss' kappa, Holt
linear-trend forecasting, regex journey patterns, winsorized/trimmed
means.

All four carry FULL DuckDB oracles (registry.py; Holt's oracle replays
the integer recurrence as a recursive CTE over the dense hour grid).
These tests pin planted regimes: an md5-replayed rating matrix, a
perfectly linear series Holt must track exactly (and a gap the dense
grid must zero-fill), hand-built journeys, and an outlier the trimmed
mean must ignore."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from stixtoneodb_spark.operators import relational


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


def _write_documents(tmp, n):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": "doc",
            "lang": "en",
            "source": "src",
            "n_chars": np.full(n, 3, dtype=np.int64),
        }
    )
    pdf.to_parquet(tmp / "documents.parquet")
    return str(tmp)


# ---- stats_fleiss_kappa ----------------------------------------------------

def _fk_rating(r: int, doc_id: int) -> int:
    h = hashlib.md5(f"fk:{r}:{doc_id}".encode()).hexdigest()
    if int(h[:6], 16) % relational.FLEISS_NOISE_MOD == 0:
        return int(h[6:12], 16) % relational.FLEISS_CATS
    return doc_id % relational.FLEISS_CATS


def test_fleiss_kappa_md5_replay(spark, tmp_path):
    n = 120
    sf = _write_documents(tmp_path, n)
    r = relational.stats_fleiss_kappa(spark, sf).collect()[0].asDict()

    a = 0
    cj = [0] * relational.FLEISS_CATS
    for d in range(n):
        counts = [0] * relational.FLEISS_CATS
        for rater in range(relational.FLEISS_RATERS):
            c = _fk_rating(rater, d)
            counts[c] += 1
            cj[c] += 1
        a += sum(x * x for x in counts)
    b = sum(x * x for x in cj)
    num = 3 * n * (a - 3 * n) - 2 * b
    den = 18 * n * n - 2 * b
    assert r["n_items"] == n
    assert r["pbar_ppm"] == 1_000_000 * (a - 3 * n) // (6 * n)
    assert r["pe_ppm"] == 1_000_000 * b // (9 * n * n)
    assert r["fleiss_kappa"] == round(num / den, 6)
    # mostly-honest raters: agreement far above chance
    assert r["fleiss_kappa"] > 0.4


# ---- events_holt_linear ----------------------------------------------------

def test_holt_tracks_linear_series_exactly(spark, tmp_path):
    """y_t = 3 + 2t events per hour: the integer recurrence reproduces a
    linear series with zero error — level = last y, trend = slope,
    forecasts extrapolate the line."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for h in range(6):
        for i in range(3 + 2 * h):
            rows.append(("click", 1.0, t0 + pd.Timedelta(hours=h, seconds=i), 1))
    sf = _write_events(tmp_path, rows)
    r = relational.events_holt_linear(spark, sf).collect()[0].asDict()
    assert r["n_hours"] == 6
    assert r["level_milli"] == 13_000
    assert r["trend_milli"] == 2_000
    assert r["forecast1_milli"] == 15_000
    assert r["forecast3_milli"] == 19_000


def test_holt_gap_hours_count_as_zero(spark, tmp_path):
    """Hours with no events enter the series as zeros: the operator's
    output equals _holt_integer on the dense zero-filled series."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for h, n in [(0, 4), (2, 6), (3, 1)]:  # hour 1 silent
        for i in range(n):
            rows.append(("view", 1.0, t0 + pd.Timedelta(hours=h, seconds=i), 1))
    sf = _write_events(tmp_path, rows)
    r = relational.events_holt_linear(spark, sf).collect()[0].asDict()
    level, trend = relational._holt_integer([4000, 0, 6000, 1000])
    assert r["n_hours"] == 4
    assert r["level_milli"] == level
    assert r["trend_milli"] == trend
    assert r["forecast2_milli"] == level + 2 * trend


def test_holt_single_hour_type_skipped(spark, tmp_path):
    t0 = pd.Timestamp("2024-01-01")
    rows = [("error", 1.0, t0, 1), ("error", 1.0, t0 + pd.Timedelta(minutes=5), 1)]
    rows += [("click", 1.0, t0 + pd.Timedelta(hours=h), 2) for h in range(3)]
    sf = _write_events(tmp_path, rows)
    out = {r["event_type"] for r in relational.events_holt_linear(spark, sf).collect()}
    assert out == {"click"}  # 'error' spans one grid hour: no trend


# ---- events_regex_patterns -------------------------------------------------

def test_regex_patterns_hand_built_journeys(spark, tmp_path):
    t0 = pd.Timestamp("2024-01-01")

    def seq(uid, *types):
        return [
            (t, 1.0, t0 + pd.Timedelta(minutes=i), uid) for i, t in enumerate(types)
        ]

    rows = (
        seq(1, "error", "error", "purchase", "click", "error", "purchase")
        + seq(2, "signup", "click", "view")
        + seq(3, "view", "view")
    )
    sf = _write_events(tmp_path, rows)
    out = {
        r["user_id"]: r.asDict()
        for r in relational.events_regex_patterns(spark, sf).collect()
    }
    # journey "eepcep": one 'ee+' storm, two 'e+p' recoveries
    assert out[1]["journey_len"] == 6
    assert out[1]["n_error_storms"] == 1
    assert out[1]["n_recovered_purchases"] == 2
    assert out[1]["signup_first"] == 0
    assert out[2]["signup_first"] == 1
    assert out[3]["n_error_storms"] == 0


# ---- stats_winsorized_mean -------------------------------------------------

def test_winsorized_mean_ignores_outlier(spark, tmp_path):
    """Values 1..19 plus a 1000 outlier (n=20, k=2): both robust means
    equal 10.5 exactly — the outlier is trimmed/clamped away — while
    the naive mean would sit near 59."""
    t0 = pd.Timestamp("2024-01-01")
    vals = list(range(1, 20)) + [1000]
    rows = [("click", float(v), t0 + pd.Timedelta(seconds=i), 1) for i, v in enumerate(vals)]
    sf = _write_events(tmp_path, rows)
    r = relational.stats_winsorized_mean(spark, sf).collect()[0].asDict()
    assert r["n_rows"] == 20 and r["n_trimmed_each"] == 2
    assert r["lo_clamp_milli"] == 3_000
    assert r["hi_clamp_milli"] == 18_000
    assert r["trimmed_mean_micro"] == 10_500_000
    assert r["winsor_mean_micro"] == 10_500_000


def test_winsorized_small_group_no_trim(spark, tmp_path):
    """n < 10 → k = 0: both means equal the plain mean (micro div)."""
    t0 = pd.Timestamp("2024-01-01")
    vals = [1.0, 2.0, 4.0]
    rows = [("view", v, t0 + pd.Timedelta(seconds=i), 1) for i, v in enumerate(vals)]
    sf = _write_events(tmp_path, rows)
    r = relational.stats_winsorized_mean(spark, sf).collect()[0].asDict()
    assert r["n_trimmed_each"] == 0
    assert r["trimmed_mean_micro"] == 1000 * 7000 // 3
    assert r["winsor_mean_micro"] == 1000 * 7000 // 3

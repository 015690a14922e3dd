"""Round-4 seventh-continuation batch: KS drift distance, chi-square
independence cells, lag-1 autocorrelation, Benford audit, shingle
containment, stride-scheduled mixture interleave.

All six carry FULL DuckDB oracles (registry.py, driver-compared at
sf0.01); these tests pin closed-form regimes — identical/disjoint KS,
exactly-independent and perfectly-dependent contingencies, perfectly
correlated / anti-correlated series, a known digit plant, full
containment with the asymmetric reverse direction, and the exact merge
order of a three-weight stride schedule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from stixtoneodb_spark.operators import relational, text


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
    """recs: list of (doc_id, text, lang)."""
    pdf = pd.DataFrame(
        {
            "doc_id": np.array([r[0] for r in recs], dtype=np.int64),
            "text": [r[1] for r in recs],
            "lang": [r[2] for r in recs],
            "source": "planted",
            "n_chars": np.array([len(r[1]) for r in recs], dtype=np.int64),
        }
    )
    pdf.to_parquet(tmp / "documents.parquet")
    return str(tmp)


# ---- stats_ks_distance -------------------------------------------------------


def test_ks_identical_disjoint_and_partial(spark, tmp_path):
    rows = []
    for v in range(1, 11):
        rows.append((1, "a", float(v), 0))
        rows.append((1, "b", float(v), 0))          # identical to a
        rows.append((1, "c", float(v + 100), 0))    # disjoint from a
    # d vs a: half overlap -> D = 1/2 exactly
    for v in range(1, 11):
        rows.append((1, "d", float(v + 5), 0))
    sf = _write_events(tmp_path, rows)
    out = {
        (r["ta"], r["tb"]): r["ks_ppm"]
        for r in relational.stats_ks_distance(spark, sf).collect()
    }
    assert out[("a", "b")] == 0
    assert out[("a", "c")] == 1_000_000
    assert out[("a", "d")] == 500_000
    assert len(out) == 6  # all 4C2 pairs


# ---- stats_chi2_independence --------------------------------------------------


def test_chi2_independent_plant_is_zero(spark, tmp_path):
    """o_ij == r_i*c_j/n exactly -> every cell contributes 0 ppm."""
    rows = []
    # 2x2 with perfect independence: counts 6,2 / 3,1 (r=8,4; c=9,3; n=12)
    rows += [(1, "x", 2.0, 0)] * 6 + [(1, "x", 3.0, 0)] * 2
    rows += [(1, "y", 2.0, 0)] * 3 + [(1, "y", 3.0, 0)] * 1
    sf = _write_events(tmp_path, rows)
    out = relational.stats_chi2_independence(spark, sf).collect()
    assert len(out) == 4
    assert all(r["chi2_ppm"] == 0 for r in out)


def test_chi2_perfect_dependence_closed_form(spark, tmp_path):
    """Diagonal 2x2 (k per diagonal cell): chi2 = n, every OBSERVED cell
    contributes k/2 * 1e6 ppm (zero cells don't materialize rows —
    count aggs have no row to emit; the reader treats absent as what it
    is, an empty observed cell)."""
    k = 4
    rows = [(1, "p", 1.0, 0)] * k + [(1, "q", 2.0, 0)] * k
    sf = _write_events(tmp_path, rows)
    out = relational.stats_chi2_independence(spark, sf).collect()
    assert len(out) == 2
    assert all(r["chi2_ppm"] == (k // 2) * 1_000_000 for r in out)


# ---- stats_autocorr_lag1 ------------------------------------------------------


def test_autocorr_perfect_and_anti(spark, tmp_path):
    rows = []
    # ramp: counts 1..6 over hours 0..5 -> (c_t, c_{t-1}) perfectly linear
    for h in range(6):
        rows += [(1, "ramp", 1.0, h)] * (h + 1)
    # alternating 1,3 over 6 hours -> exact -1
    for h in range(6):
        rows += [(1, "alt", 1.0, h)] * (1 if h % 2 == 0 else 3)
    sf = _write_events(tmp_path, rows)
    out = {
        r["event_type"]: r
        for r in relational.stats_autocorr_lag1(spark, sf).collect()
    }
    assert out["ramp"]["autocorr_ppm"] == 1_000_000
    assert out["ramp"]["m"] == 5
    assert out["alt"]["autocorr_ppm"] == -1_000_000


# ---- stats_benford_deviation --------------------------------------------------


def test_benford_planted_digit_mix(spark, tmp_path):
    """90 ones + 10 nines: obs shares are exact ppm, deviations match
    the inlined constant table, zero-valued events are excluded."""
    rows = [(1, "t", 1.0, 0)] * 90 + [(1, "t", 9.0, 0)] * 10
    rows += [(1, "t", 0.2, 0)] * 5  # rounds to 0 -> excluded
    sf = _write_events(tmp_path, rows)
    out = {
        r["digit"]: r
        for r in relational.stats_benford_deviation(spark, sf).collect()
    }
    assert set(out) == {1, 9}
    assert out[1]["obs_ppm"] == 900_000
    assert out[1]["benford_ppm"] == relational.BENFORD_PPM[0]
    assert out[1]["dev_ppm"] == 900_000 - relational.BENFORD_PPM[0]
    assert out[9]["obs_ppm"] == 100_000
    assert out[9]["dev_ppm"] == 100_000 - relational.BENFORD_PPM[8]


# ---- text_shingle_containment -------------------------------------------------


def test_containment_asymmetric_full_and_partial(spark, tmp_path):
    """Short doc fully inside a long one: C(short->long) = 1e6 while
    C(long->short) is the exact fraction — the asymmetry Jaccard cannot
    express; an unrelated doc pairs with neither."""
    short = "alpha beta gamma delta"          # 2 shingles
    long_ = short + " epsilon zeta eta theta iota"  # contains both
    recs = [
        (1, short, "en"),
        (2, long_, "en"),
        (3, "totally different words here now", "en"),
    ]
    sf = _write_docs(tmp_path, recs)
    out = {
        (r["doc_from"], r["doc_to"]): r["containment_ppm"]
        for r in text.text_shingle_containment(spark, sf).collect()
    }
    n_long = len(long_.split()) - 2  # distinct 3-gram count (all unique)
    assert out[(1, 2)] == 1_000_000
    assert out[(2, 1)] == (1_000_000 * 2) // n_long
    assert all(3 not in pair for pair in out)


def test_containment_threshold_excludes_weak_overlap(spark, tmp_path):
    """One shared shingle out of many stays below CONT_MIN_PPM."""
    a = " ".join(f"w{i}" for i in range(30)) + " shared one two"
    b = "shared one two " + " ".join(f"v{i}" for i in range(30))
    sf = _write_docs(tmp_path, [(1, a, "en"), (2, b, "en")])
    out = text.text_shingle_containment(spark, sf).collect()
    assert out == []  # 1/31 ≈ 32k ppm < 100k floor


# ---- corpus_interleave_mixture ------------------------------------------------


def test_interleave_stride_merge_order(spark, tmp_path):
    """3 langs, weights en=5 fr=3 de=2 (strides 12/20/30): the merge
    order of virtual times is exactly the stride-scheduling sequence,
    and the three-way tie at vt=60 breaks by lang name."""
    recs = []
    for i in range(6):
        recs.append((100 + i, f"e {i}", "en"))
    for i in range(4):
        recs.append((200 + i, f"f {i}", "fr"))
    for i in range(3):
        recs.append((300 + i, f"d {i}", "de"))
    sf = _write_docs(tmp_path, recs)
    out = [
        (r["lang"], r["doc_id"])
        for r in sorted(
            text.corpus_interleave_mixture(spark, sf).collect(),
            key=lambda r: r["pos"],
        )
    ]
    # vt sequence: en12,fr20,en24,de30,fr40,en36... sorted:
    # 12en,20fr,24en,30de,36en,40fr,48en,60de,60en,60fr,...
    expect = [
        ("en", 100), ("fr", 200), ("en", 101), ("de", 300), ("en", 102),
        ("fr", 201), ("en", 103), ("de", 301), ("en", 104), ("fr", 202),
    ]
    assert out[:10] == expect
    # three-way tie at vt=60: de(301? no — de r2=60), en r5=60, fr r3=60
    sixty = [x for x in out if x in {("de", 301), ("en", 104), ("fr", 202)}]
    assert sixty == [("de", 301), ("en", 104), ("fr", 202)]

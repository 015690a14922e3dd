"""Round-4 eighth-continuation batch (part 11): cohort LTV curves,
Poisson rate-shift test, and the Q5 plan-shape proof.

The first two carry FULL DuckDB oracles (registry.py); the third pins
the PHYSICAL plan of the Q5 star join (broadcast dims, no extra fact
shuffles) — the bucketing-test idiom applied to the new 6-table
query."""

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


# ---- events_cohort_ltv -----------------------------------------------------

def test_cohort_ltv_accumulates_by_age(spark, tmp_path):
    """Cohort week 0 has 2 users (one never buys); purchases of 10 at
    age 0 and 20 at age 2 accumulate; LTV divides by the FULL cohort
    size, not just buyers."""
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        ("click", 1.0, t0, 1),                                   # u1 first seen wk0
        ("click", 1.0, t0 + pd.Timedelta(days=2), 2),            # u2 first seen wk0
        ("purchase", 10.0, t0 + pd.Timedelta(days=3), 1),        # age 0
        ("purchase", 20.0, t0 + pd.Timedelta(days=15), 1),       # age 2
        ("click", 1.0, t0 + pd.Timedelta(days=8), 3),            # u3: wk1, no buys
    ]
    sf = _write_events(tmp_path, rows)
    out = {
        (r["cohort_week"], r["age_weeks"]): r.asDict()
        for r in relational.events_cohort_ltv(spark, sf).collect()
    }
    assert set(out) == {(0, 0), (0, 2)}
    a0 = out[(0, 0)]
    assert a0["n_cohort_users"] == 2 and a0["n_buyers"] == 1
    assert a0["period_value_milli"] == 10_000
    assert a0["cum_value_milli"] == 10_000
    assert a0["ltv_per_user_micro"] == 1000 * 10_000 // 2
    a2 = out[(0, 2)]
    assert a2["period_value_milli"] == 20_000
    assert a2["cum_value_milli"] == 30_000
    assert a2["ltv_per_user_micro"] == 1000 * 30_000 // 2


# ---- stats_poisson_rate_ratio ----------------------------------------------

def test_rate_shift_doubling_detected(spark, tmp_path):
    """'grow' has 10 events in the first half, 20 in the second: rate
    ratio 2e6 ppm, z = (10-15)/sqrt(7.5); 'flat' stays at z = 0."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # window anchors: first event at t0, last at t0+100min
    for i in range(10):
        rows.append(("grow", 1.0, t0 + pd.Timedelta(minutes=i), 1))
    for i in range(20):
        rows.append(("grow", 1.0, t0 + pd.Timedelta(minutes=60 + i * 2), 1))
    for i in range(5):
        rows.append(("flat", 1.0, t0 + pd.Timedelta(minutes=2 + i * 10), 2))
        rows.append(("flat", 1.0, t0 + pd.Timedelta(minutes=52 + i * 9), 2))
    sf = _write_events(tmp_path, rows)
    out = {r["event_type"]: r.asDict() for r in relational.stats_poisson_rate_ratio(spark, sf).collect()}
    g = out["grow"]
    assert g["c1"] == 10 and g["c2"] == 20
    assert g["rate_ratio_ppm"] == 2_000_000
    assert g["z_shift"] == round((10 - 15) / np.sqrt(30 / 4), 6)
    f = out["flat"]
    assert f["c1"] == f["c2"] == 5
    assert f["z_shift"] == 0.0


# ---- q5 plan shape ---------------------------------------------------------

def test_q5_plan_broadcasts_dims(spark):
    """The Q5 star join must broadcast every dimension (≥4
    BroadcastHashJoins) and shuffle only the fact side — at most two
    shuffle exchanges (orders⋈lineitem + the final agg) before AQE
    tightens further."""
    df = relational.q5_local_supplier_volume(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= 3, f"fact side should be the only shuffle, saw {n_shuffles}"

"""Round-4 eighth-continuation batch (part 2): Kaplan-Meier session
survival, U-shaped position attribution, item-item co-basket cosine,
and Spearman rank correlation.

All four carry FULL DuckDB oracles (registry.py); these tests pin
planted regimes: a hand-built risk table with known survival steps and
a censored session, exact U-shaped credit splits (1/2/3-touch paths),
a 3-basket co-purchase matrix, and monotone/anti-monotone profiles."""

from __future__ import annotations

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


def _write_lineitem(tmp, pairs):
    """pairs: list of (orderkey, partkey)."""
    pdf = pd.DataFrame(
        {
            "l_orderkey": np.array([p[0] for p in pairs], dtype=np.int64),
            "l_partkey": np.array([p[1] for p in pairs], dtype=np.int64),
            "l_linenumber": np.arange(len(pairs), dtype=np.int64),
            "l_quantity": np.ones(len(pairs)),
            "l_extendedprice": np.ones(len(pairs)),
            "l_discount": np.zeros(len(pairs)),
            "l_returnflag": "N",
            "l_linestatus": "O",
            "l_shipdate": pd.Timestamp("1995-01-01"),
        }
    )
    pdf.to_parquet(tmp / "lineitem.parquet")
    return str(tmp)


# ---- stats_kaplan_meier ----------------------------------------------------

def test_kaplan_meier_planted_risk_table(spark, tmp_path):
    """Four sessions — durations 10, 10, 20 (deaths) and 50 min
    (censored in the final fifth) — give the textbook two-step curve
    S(10) = 1/2, S(20) = 1/4, with the censored session never entering
    the death table."""
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        ("click", 1.0, t0, 1),
        ("click", 1.0, t0 + pd.Timedelta(minutes=10), 1),
        ("click", 1.0, t0, 2),
        ("click", 1.0, t0 + pd.Timedelta(minutes=20), 2),
        ("click", 1.0, t0, 3),
        ("click", 1.0, t0 + pd.Timedelta(minutes=10), 3),
        # censored: session alive after the horizon (last fifth of window);
        # three events 25 min apart stay one session (gap <= 30 min)
        ("click", 1.0, t0 + pd.Timedelta(days=9, hours=23), 4),
        ("click", 1.0, t0 + pd.Timedelta(days=9, hours=23, minutes=25), 4),
        ("click", 1.0, t0 + pd.Timedelta(days=9, hours=23, minutes=50), 4),
    ]
    sf = _write_events(tmp_path, rows)
    out = [r.asDict() for r in relational.stats_kaplan_meier(spark, sf).collect()]
    out.sort(key=lambda r: r["t_minutes"])
    assert out == [
        {"t_minutes": 10, "n_risk": 4, "d": 2, "surv_micro": 500_000},
        {"t_minutes": 20, "n_risk": 2, "d": 1, "surv_micro": 250_000},
    ]


def test_kaplan_meier_gap_splits_sessions(spark, tmp_path):
    """A >30-min silence splits one user into two zero-length sessions
    (both deaths); the window-stretching third user is censored but
    still sits in the risk set at t = 0."""
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        ("click", 1.0, t0, 1),
        ("click", 1.0, t0 + pd.Timedelta(hours=2), 1),
        # stretch the window so the horizon clears user 1's sessions
        ("click", 1.0, t0 + pd.Timedelta(days=30), 2),
    ]
    sf = _write_events(tmp_path, rows)
    out = [r.asDict() for r in relational.stats_kaplan_meier(spark, sf).collect()]
    assert out == [{"t_minutes": 0, "n_risk": 3, "d": 2, "surv_micro": 333_333}]


# ---- attribution_position_weighted -----------------------------------------

def test_attribution_u_shape_credit_split(spark, tmp_path):
    """Three paths — 3-touch (40/20/40), 1-touch (100%), 2-touch
    (50/50) — with exact micro-credit bookkeeping per channel."""
    t0 = pd.Timestamp("2024-01-01")

    def seq(uid, *types):
        return [
            (t, 1.0, t0 + pd.Timedelta(minutes=i), uid)
            for i, t in enumerate(types)
        ]

    rows = (
        seq(1, "click", "view", "error", "purchase")
        + seq(2, "view", "purchase")
        + seq(3, "click", "error", "purchase")
        + seq(4, "signup")  # touch with no conversion: dropped
    )
    sf = _write_events(tmp_path, rows)
    out = {
        r["channel"]: r.asDict()
        for r in relational.attribution_position_weighted(spark, sf).collect()
    }
    assert "signup" not in out and "purchase" not in out
    # click: first of u1 path (400k) + first of u3 2-touch (500k)
    assert out["click"]["credit_micro_total"] == 400_000 + 500_000
    assert out["click"]["n_first"] == 2
    # view: middle of u1 (200k) + sole touch of u2 (1e6)
    assert out["view"]["credit_micro_total"] == 200_000 + 1_000_000
    # error: last of u1 (400k) + last of u3 (500k)
    assert out["error"]["credit_micro_total"] == 400_000 + 500_000
    assert out["error"]["n_last"] == 2
    total = sum(v["credit_micro_total"] for v in out.values())
    assert total == 3 * 1_000_000  # every path sums to exactly 1.0


def test_attribution_remainder_lands_on_last(spark, tmp_path):
    """A 5-touch path has 3 middles: each gets 200000 div 3 = 66666 and
    the 2-micro remainder joins the last touch's 400k."""
    t0 = pd.Timestamp("2024-01-01")
    types = ["click", "view", "view", "view", "error", "purchase"]
    rows = [(t, 1.0, t0 + pd.Timedelta(minutes=i), 9) for i, t in enumerate(types)]
    sf = _write_events(tmp_path, rows)
    out = {
        r["channel"]: r.asDict()
        for r in relational.attribution_position_weighted(spark, sf).collect()
    }
    assert out["click"]["credit_micro_total"] == 400_000
    assert out["view"]["credit_micro_total"] == 3 * 66_666
    assert out["error"]["credit_micro_total"] == 400_000 + (200_000 - 3 * 66_666)
    assert sum(v["credit_micro_total"] for v in out.values()) == 1_000_000


# ---- recsys_item_cosine_topk -----------------------------------------------

def test_recsys_cosine_planted_baskets(spark, tmp_path):
    """Baskets {A,B}, {A,B}, {A,C}: cos(A,B) = 2/sqrt(3*2), cos(A,C) =
    1/sqrt(3*1) — B must rank first for A with the exact micro scores."""
    A, B, C = 101, 102, 103
    sf = _write_lineitem(tmp_path, [(1, A), (1, B), (2, A), (2, B), (3, A), (3, C)])
    out = [r.asDict() for r in relational.recsys_item_cosine_topk(spark, sf).collect()]
    a_rows = sorted([r for r in out if r["item_id"] == A], key=lambda r: r["rank"])
    assert [r["neighbor_item_id"] for r in a_rows] == [B, C]
    assert a_rows[0]["cos_micro"] == int(np.floor(2_000_000 / np.sqrt(6) + 0.5))
    assert a_rows[1]["cos_micro"] == int(np.floor(1_000_000 / np.sqrt(3) + 0.5))
    assert a_rows[0]["n_common"] == 2 and a_rows[1]["n_common"] == 1
    # symmetry: B sees A with the same score
    b_top = next(r for r in out if r["item_id"] == B and r["rank"] == 1)
    assert b_top["neighbor_item_id"] == A
    assert b_top["cos_micro"] == a_rows[0]["cos_micro"]


def test_recsys_duplicate_lines_collapse_to_binary(spark, tmp_path):
    """The same part twice in one order must not inflate n_common
    (binary incidence, not quantity-weighted)."""
    A, B = 7, 8
    sf = _write_lineitem(tmp_path, [(1, A), (1, A), (1, B)])
    out = [r.asDict() for r in relational.recsys_item_cosine_topk(spark, sf).collect()]
    assert all(r["n_common"] == 1 for r in out)
    assert all(r["cos_micro"] == 1_000_000 for r in out)  # 1/sqrt(1*1)


# ---- stats_spearman_rank ---------------------------------------------------

def test_spearman_monotone_profiles(spark, tmp_path):
    """A profile rising with hour gives rho = 1, a falling one -1 —
    regardless of nonlinearity (rank correlation, unlike the OLS r)."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for h in range(6):
        # inc: convex growth (nonlinear but monotone); dec: mirror
        rows.append(("inc", float(h * h * 10), t0 + pd.Timedelta(hours=h), 1))
        rows.append(("dec", float(100 - h * h * 10), t0 + pd.Timedelta(hours=h), 2))
    sf = _write_events(tmp_path, rows)
    out = {
        r["event_type"]: r.asDict()
        for r in relational.stats_spearman_rank(spark, sf).collect()
    }
    assert out["inc"]["spearman_rho"] == 1.0
    assert out["dec"]["spearman_rho"] == -1.0
    assert out["inc"]["n_points"] == 6


def test_spearman_ties_use_average_ranks(spark, tmp_path):
    """Two hours share the same profile value: the tied pair takes the
    average rank and rho matches scipy's tie-corrected formula computed
    by hand: profile y = [1, 2, 2, 3] over hours 0..3."""
    t0 = pd.Timestamp("2024-01-01")
    vals = {0: 1.0, 1: 2.0, 2: 2.0, 3: 3.0}
    rows = [("t", v, t0 + pd.Timedelta(hours=h), 1) for h, v in vals.items()]
    sf = _write_events(tmp_path, rows)
    r = relational.stats_spearman_rank(spark, sf).collect()[0].asDict()
    # double-ranks: a = [1,3,5,7] (distinct hours), b = [2,5,5,8] →
    # rho = (n*sab - sa*sb)/sqrt((n*saa-sa^2)(n*sbb-sb^2))
    a, b = [1, 3, 5, 7], [2, 5, 5, 8]
    n = 4
    sab = sum(x * y for x, y in zip(a, b))
    num = n * sab - sum(a) * sum(b)
    den = np.sqrt(
        (n * sum(x * x for x in a) - sum(a) ** 2)
        * (n * sum(y * y for y in b) - sum(b) ** 2)
    )
    assert r["spearman_rho"] == round(num / den, 6)

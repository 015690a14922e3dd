"""Round-4 eighth-continuation batch (part 9): TPC-H Q5/Q18 shapes,
variance-ratio homogeneity, and gaps-and-islands activity streaks.

All four carry FULL DuckDB oracles (registry.py).  These tests pin
planted regimes: a minimal Q5 star where exactly one order survives
region/date/co-nation filters, a Q18 whale order astride the floor,
two groups with hand-computed variances, and a user with three
distinct streaks."""

from __future__ import annotations

import numpy as np
import pandas as pd

from stixtoneodb_spark.operators import relational


def _write(tmp, name, **cols):
    pd.DataFrame(cols).to_parquet(tmp / f"{name}.parquet")


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


def _mini_tpch(tmp):
    _write(tmp, "region", r_regionkey=[0, 1], r_name=["ASIA", "EUROPE"])
    _write(tmp, "nation", n_nationkey=[10, 20], n_name=["JAPAN", "FRANCE"],
           n_regionkey=[0, 1])
    _write(tmp, "customer",
           c_custkey=[1, 2], c_name=["Customer#1", "Customer#2"],
           c_nationkey=np.array([10, 20], dtype=np.int32),
           c_acctbal=[0.0, 0.0], c_mktsegment=["BUILDING"] * 2)
    _write(tmp, "supplier",
           s_suppkey=[5, 6], s_name=["S5", "S6"],
           s_nationkey=np.array([10, 20], dtype=np.int32),
           s_acctbal=[0.0, 0.0])
    _write(tmp, "orders",
           o_orderkey=[100, 101, 102],
           o_custkey=[1, 1, 2],
           o_orderstatus=["F"] * 3,
           o_totalprice=[1.0] * 3,
           o_orderdate=pd.to_datetime(
               ["1996-06-01", "1999-01-01", "1996-06-01"]
           ).astype("datetime64[us]"),
           o_orderpriority=["1-URGENT"] * 3)
    # order 100: in window, c_nation 10 == s_nation 10 -> counts
    # order 101: out of the date window -> excluded
    # order 102: customer nation 20 vs supplier nation 10 -> excluded
    _write(tmp, "lineitem",
           l_orderkey=[100, 100, 101, 102],
           l_partkey=[1, 2, 3, 4],
           l_suppkey=[5, 5, 5, 5],
           l_linenumber=[1, 2, 1, 1],
           l_quantity=[100.0, 250.0, 10.0, 10.0],
           l_extendedprice=[1000.0, 2000.0, 500.0, 500.0],
           l_discount=[0.1, 0.0, 0.0, 0.0],
           l_tax=[0.0] * 4,
           l_returnflag=["N"] * 4,
           l_linestatus=["O"] * 4,
           l_shipdate=pd.to_datetime(["1996-06-10"] * 4).astype("datetime64[us]"))
    return str(tmp)


def test_q5_region_date_conation_filters(spark, tmp_path):
    sf = _mini_tpch(tmp_path)
    out = [r.asDict() for r in relational.q5_local_supplier_volume(spark, sf).collect()]
    assert out == [{"n_name": "JAPAN", "revenue": 1000.0 * 0.9 + 2000.0}]


def test_q18_whale_order_over_floor(spark, tmp_path):
    sf = _mini_tpch(tmp_path)
    out = [r.asDict() for r in relational.q18_large_volume_customers(spark, sf).collect()]
    # only order 100 totals 350 > 300
    assert len(out) == 1
    r = out[0]
    assert r["o_orderkey"] == 100 and r["c_custkey"] == 1
    assert r["total_qty"] == 350.0
    assert r["o_orderdate_s"] == "1996-06-01"


def test_variance_ratio_hand_computed(spark, tmp_path):
    """A = {0,4} (s² = 8), B = {1,1,3,3} (s² = 4/3) → F_A = 6, F_B = 1/6."""
    t0 = pd.Timestamp("2024-01-01")
    rows = [("A", 0.0, t0, 1), ("A", 4.0, t0 + pd.Timedelta(minutes=1), 1)]
    rows += [
        ("B", v, t0 + pd.Timedelta(minutes=2 + i), 1)
        for i, v in enumerate([1.0, 1.0, 3.0, 3.0])
    ]
    sf = _write_events(tmp_path, rows)
    out = {r["event_type"]: r.asDict() for r in relational.stats_variance_ratio(spark, sf).collect()}
    assert out["A"]["f_ratio"] == 6.0
    assert out["B"]["f_ratio"] == round(1 / 6, 6)
    assert out["A"]["n_rest"] == 4


def test_islands_three_streaks(spark, tmp_path):
    """Active days {1,2,3}, {7,8}, {20}: 3 streaks, longest 3, 6 active
    days — multiple events on one day collapse to one."""
    t0 = pd.Timestamp("2024-01-01")
    active = [1, 2, 3, 7, 8, 20]
    rows = []
    for d in active:
        rows.append(("click", 1.0, t0 + pd.Timedelta(days=d, hours=1), 9))
    rows.append(("click", 1.0, t0 + pd.Timedelta(days=2, hours=5), 9))  # dup day
    sf = _write_events(tmp_path, rows)
    r = relational.events_islands_summary(spark, sf).collect()[0].asDict()
    assert r["n_active_days"] == 6
    assert r["n_streaks"] == 3
    assert r["longest_streak_days"] == 3

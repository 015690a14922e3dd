"""Pandas-UDF API completion tier: GROUPED_AGG UDAFs and cogrouped
applyInPandas (operators/pandas_surface.py).

Both operators carry FULL DuckDB oracles (registry.py); these tests pin
the invariants the oracle corpus can't exercise — planted odd/even group
sizes for the lower-median selection rule, empty-one-side cogroup keys,
and the at-or-before tie on the conversion boundary.
"""

from __future__ import annotations

import datetime as dt

import numpy as np

from stixtoneodb_spark.operators import pandas_surface
from stixtoneodb_spark.operators.pandas_surface import _lower_median

SF = "/root/testdata/sf0.01"


def test_lower_median_selection_rule():
    # odd n: the true middle; even n: the LOWER of the two middles (no
    # interpolation — the cross-engine bit-exactness contract)
    assert _lower_median(np.array([3.0, 1.0, 2.0])) == 2.0
    assert _lower_median(np.array([4.0, 1.0, 3.0, 2.0])) == 2.0
    assert _lower_median(np.array([7.5])) == 7.5


def test_grouped_agg_planted_groups(spark):
    df = spark.createDataFrame(
        [
            ("a", 1.0), ("a", 9.0), ("a", 5.0),            # odd: med 5, devs {4,4,0} -> mad 4
            ("b", 1.0), ("b", 2.0), ("b", 10.0), ("b", 20.0),  # even: med 2 (lower), devs {1,0,8,18} -> mad 1
            ("c", 42.0),                                    # singleton: med 42, mad 0
        ],
        "event_type string, value double",
    )
    got = {
        r["event_type"]: (r["n_events"], r["med_value"], r["mad_value"])
        for r in df.groupBy("event_type")
        .agg(
            pandas_surface._count_udaf("value").alias("n_events"),
            pandas_surface._lower_median_udaf("value").alias("med_value"),
            pandas_surface._lower_mad_udaf("value").alias("mad_value"),
        )
        .collect()
    }
    assert got == {"a": (3, 5.0, 4.0), "b": (4, 2.0, 1.0), "c": (1, 42.0, 0.0)}


def test_cogroup_conversion_planted(spark):
    t = lambda s: dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731
    events = spark.createDataFrame(
        [
            # u1: click before purchase -> converted; second purchase
            # BEFORE any click -> not converted
            (1, "click", t(10)),
            (1, "purchase", t(20)),
            (1, "purchase", t(5)),
            # u2: click at the SAME ts as the purchase -> at-or-before tie
            # counts as converted
            (2, "click", t(30)),
            (2, "purchase", t(30)),
            # u3: purchases only (empty click side of the cogroup)
            (3, "purchase", t(40)),
            # u4: clicks only (empty purchase side)
            (4, "click", t(50)),
            (4, "click", t(51)),
            # u5: other event types must not leak in
            (5, "view", t(60)),
        ],
        "user_id long, event_type string, ts timestamp",
    )
    import stixtoneodb_spark.sources.tables as tables

    # drive the operator through a monkeypatched loader so the planted
    # frame rides the exact production cogroup path
    orig = tables.load_table
    try:
        tables.load_table = lambda spark, sf_dir, name: events
        pandas_surface.load_table = tables.load_table
        out = pandas_surface.join_cogroup_conversion(spark, SF)
        got = {
            r["user_id"]: (r["n_clicks"], r["n_purchases"], r["n_converted"])
            for r in out.collect()
        }
    finally:
        tables.load_table = orig
        pandas_surface.load_table = orig
    assert got == {
        1: (1, 2, 1),
        2: (1, 1, 1),
        3: (0, 1, 0),
        4: (2, 0, 0),
    }
    assert 5 not in got


def test_cogroup_survives_count_only_pruning(spark):
    """Regression: under an output-free plan (bare count()), Spark 4.1's
    column pruning deduplicates identically-named non-key columns across
    the two cogroup sides and hands the right-side pandas frame without
    its timestamp (KeyError) — the operator renames the right side's ts
    to p_ts to keep both inputs intact.  The driver's rows-only check
    runs exactly this plan shape."""
    out = pandas_surface.join_cogroup_conversion(spark, SF)
    assert out.count() == 150


# -- Misra-Gries heavy hitters ---------------------------------------------------

def test_mg_guarantee_under_eviction_and_partitionings(spark):
    """Eviction regime: vocab (40) > capacity (8).  The MG guarantee —
    every token with true frequency > n/(capacity+1) survives — must
    hold under ANY partitioning; sketch weights must under-count, never
    over-count."""
    from stixtoneodb_spark.operators.pandas_surface import mg_sketch

    # planted heavy-tailed stream: 3 hot tokens at 5000 plus 37 cold at
    # 50 — n=16850, threshold n/9≈1872, so exactly the hot set is
    # guaranteed to survive capacity 8
    rows = [(f"hot{i}",) for i in range(3) for _ in range(5000)]
    rows += [(f"t{i:02d}",) for i in range(37) for _ in range(50)]
    n = len(rows)
    exact = {}
    for (t,) in rows:
        exact[t] = exact.get(t, 0) + 1
    cap = 8
    threshold = n / (cap + 1)
    must_survive = {t for t, c in exact.items() if c > threshold}
    assert must_survive, "planted stream must have guaranteed heavy hitters"

    tok = spark.createDataFrame(rows, "token string")
    for parts in (1, 5, 17):
        got = {
            r["token"]: r["w"]
            for r in mg_sketch(tok.repartition(parts), cap).collect()
        }
        assert len(got) <= cap
        assert must_survive <= set(got), (parts, must_survive - set(got))
        for t, w in got.items():
            assert w <= exact[t], (t, w, exact[t])


def test_heavy_hitters_query_exact_regime(spark):
    """Registry regime: capacity >= corpus vocabulary, so every top-J
    token is retained and sketch weights equal exact frequencies."""
    from stixtoneodb_spark.operators.pandas_surface import (
        agg_heavy_hitters_contract,
    )

    rows = agg_heavy_hitters_contract(spark, SF).collect()
    assert len(rows) > 0
    assert all(r["retained_by_sketch"] for r in rows)

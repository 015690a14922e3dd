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

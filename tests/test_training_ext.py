"""Round-4 training-pipeline extensions: as-of join, pivot, the
percentile_approx contract, repeated n-gram spans, and SQ8 quantization.

Each operator also carries a FULL DuckDB oracle (registry.py, driver
hash-compare at sf0.01); these tests pin the invariants the oracle can't
see — planted point-in-time edge cases, numpy bit-equality for the
quantizer, and raw-text recounts for the n-gram spans.
"""

from __future__ import annotations


import numpy as np
from pyspark.sql import functions as F

from stixtoneodb_spark.operators import relational, similarity, text
from stixtoneodb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


# -- as-of join ---------------------------------------------------------------

def test_asof_planted_cases(spark):
    """Left rows exercise: match strictly before, match AT the same ts
    (at-or-before contract), no prior right row (nulls), and a later right
    row that must NOT bleed backward."""
    left = spark.createDataFrame(
        [
            ("u1", 100, "L1"),  # right at 90 -> match 90
            ("u1", 200, "L2"),  # right at 200 (equal ts) -> match 200
            ("u2", 50, "L3"),   # right only at 60 -> null
            ("u3", 10, "L4"),   # no right rows at all -> null
        ],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 90, 901), ("u1", 200, 902), ("u1", 500, 903), ("u2", 60, 904)],
        "k string, ts long, payload int",
    )
    got = {
        r["tag"]: (r["asof_ts"], r["asof_payload"])
        for r in relational.asof_backward_join(
            left, right, key="k", ts="ts", right_payload=("payload",)
        ).collect()
    }
    assert got == {
        "L1": (90, 901),
        "L2": (200, 902),
        "L3": (None, None),
        "L4": (None, None),
    }


def test_asof_query_never_future(spark):
    out = relational.join_asof_prior_event(spark, SF).collect()
    assert out
    matched = [r for r in out if r["asof_click_ts"] is not None]
    assert matched, "fixture must produce at least one as-of match"
    for r in matched:
        assert r["asof_click_ts"] <= r["purchase_ts"]


# -- pivot --------------------------------------------------------------------

def test_pivot_rows_sum_to_event_counts(spark):
    wide = relational.pivot_event_type_counts(spark, SF)
    totals = {
        r["user_id"]: sum(r[f"n_{t}"] for t in relational.EVENT_TYPES)
        for r in wide.collect()
    }
    expected = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert totals == expected
    # dense matrix: no nulls anywhere
    assert wide.where(
        " OR ".join(f"n_{t} IS NULL" for t in relational.EVENT_TYPES)
    ).count() == 0


# -- percentile_approx contract -------------------------------------------------

def test_percentile_contract_holds_and_brackets_median(spark):
    rows = relational.agg_percentile_approx_contract(spark, SF).collect()
    assert rows
    vals = {
        r["event_type"]: sorted(
            x["value"]
            for x in load_table(spark, SF, "events")
            .where(F.col("event_type") == r["event_type"])
            .select("value")
            .collect()
        )
        for r in rows
    }
    for r in rows:
        assert r["p50_within_bounds"] is True
        v = vals[r["event_type"]]
        true_median = v[(len(v) - 1) // 2]
        assert r["p50_lo"] <= round(true_median, 4) + 1e-9
        assert round(true_median, 4) <= r["p50_hi"] + 1e-9


# -- repeated n-grams -----------------------------------------------------------

def test_repeated_ngrams_recount_against_raw_text(spark):
    res = text.dedup_repeated_ngrams(spark, SF)
    rows = res.collect()
    assert rows, "synthetic corpus must contain cross-doc repeated 8-grams"
    docs = {
        r["doc_id"]: r["text"].lower().split(" ")
        for r in load_table(spark, SF, "documents").collect()
    }

    def count_gram(gram: str) -> tuple[int, int]:
        g = gram.split(" ")
        n_docs = n_occ = 0
        for toks in docs.values():
            c = sum(
                1
                for i in range(len(toks) - len(g) + 1)
                if toks[i : i + len(g)] == g
            )
            n_docs += 1 if c else 0
            n_occ += c
        return n_docs, n_occ

    # spot-check the 5 most-repeated grams plus 5 arbitrary ones
    sample = sorted(rows, key=lambda r: (-r["n_occurrences"], r["gram"]))[:5]
    sample += sorted(rows, key=lambda r: r["gram"])[:5]
    for r in sample:
        assert len(r["gram"].split(" ")) == text.NGRAM_SPAN
        nd, no = count_gram(r["gram"])
        assert (nd, no) == (r["n_docs"], r["n_occurrences"])
        assert nd >= 2


def test_repeated_ngrams_hashed_equals_string_plan(spark):
    """The 100-TB physical plan (8-byte hash shuffle + survivor-pruned
    string recovery) must produce the exact row set of the string plan,
    and its corpus-scale exchange must partition on the HASH, never on a
    gram string."""
    a = {
        (r["gram"], r["n_docs"], r["n_occurrences"])
        for r in text.dedup_repeated_ngrams(spark, SF).collect()
    }
    hashed = text.dedup_repeated_ngrams_hashed(spark, SF)
    b = {(r["gram"], r["n_docs"], r["n_occurrences"]) for r in hashed.collect()}
    assert a == b and a

    plan = hashed._jdf.queryExecution().executedPlan().toString()
    # the corpus-scale aggregation exchanges key on the 8-byte hash (the
    # string plan has no h-keyed exchange at all); the only gram-keyed
    # exchange is the final SURVIVOR-scale groupBy after the pruning join
    import re

    # AQE toString renders the final AND initial plans (with distinct
    # plan_ids) — examine only the executed Final Plan section
    final = plan.split("== Initial Plan ==")[0]
    keyed = re.findall(r"hashpartitioning\(([^)]*)\)", final)
    assert any(k.lstrip().startswith("h#") for k in keyed), final
    assert sum("gram" in k for k in keyed) <= 1, final


# -- SQ8 quantization -----------------------------------------------------------

def test_quantize_codes_match_numpy_bitwise(spark):
    got = {
        r["vec_id"]: (r["code_sum"], r["code_checksum"], r["code_min"], r["code_max"])
        for r in similarity.embedding_quantize_codes(spark, SF).collect()
    }
    emb = load_table(spark, SF, "embeddings").collect()
    assert len(got) == len(emb)
    for r in emb:
        x = np.asarray(r["embedding"], dtype=np.float32).astype(np.float64)
        mn, mx = x.min(), x.max()
        if mx > mn:
            codes = np.floor((x - mn) / (mx - mn) * 255.0 + 0.5).astype(np.int64)
        else:
            codes = np.zeros_like(x, dtype=np.int64)
        expect = (
            int(codes.sum()),
            int((codes * np.arange(1, len(codes) + 1)).sum()),
            int(codes.min()),
            int(codes.max()),
        )
        assert got[r["vec_id"]] == expect
        assert 0 <= codes.min() and codes.max() <= 255
        if mx > mn:
            # range endpoints quantize exactly to the code rails
            assert codes.max() == 255 and codes.min() == 0


# -- funnel -------------------------------------------------------------------

def test_funnel_planted_sequences(spark):
    """Planted per-user event sequences pin the greedy earliest-completion
    semantics the oracle shares: out-of-order steps don't count, a
    missing middle step stops the funnel even when the last step exists,
    equal timestamps DO advance (>= boundary), and the timestamps taken
    are the EARLIEST valid ones."""
    from datetime import datetime as dt

    rows = [
        # u1: full funnel, extra noise events, earliest-valid choice:
        # second view (later) must NOT move t1
        (1, "view", dt(2026, 1, 1, 0, 0, 0)),
        (1, "view", dt(2026, 1, 1, 2, 0, 0)),
        (1, "click", dt(2026, 1, 1, 1, 0, 0)),
        (1, "purchase", dt(2026, 1, 1, 3, 0, 0)),
        # u2: click BEFORE any view -> funnel stops at view
        (2, "click", dt(2026, 1, 1, 0, 0, 0)),
        (2, "view", dt(2026, 1, 1, 1, 0, 0)),
        (2, "purchase", dt(2026, 1, 1, 2, 0, 0)),
        # u3: purchase without click -> n_steps 1 despite purchase
        (3, "view", dt(2026, 1, 1, 0, 0, 0)),
        (3, "purchase", dt(2026, 1, 1, 1, 0, 0)),
        # u4: all three at the SAME timestamp -> >= admits them all
        (4, "view", dt(2026, 1, 1, 0, 0, 0)),
        (4, "click", dt(2026, 1, 1, 0, 0, 0)),
        (4, "purchase", dt(2026, 1, 1, 0, 0, 0)),
        # u5: never viewed -> absent from output
        (5, "click", dt(2026, 1, 1, 0, 0, 0)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp_ntz")
    got = {
        r["user_id"]: (r["n_steps"], r["t1_micros"], r["t_last_micros"])
        for r in relational.funnel_steps_frame(ev).collect()
    }
    import calendar

    def us(*a):
        return calendar.timegm(dt(*a).timetuple()) * 1_000_000

    assert set(got) == {1, 2, 3, 4}
    assert got[1] == (3, us(2026, 1, 1, 0), us(2026, 1, 1, 3))
    # u2's only click precedes its first view, so step 2 never fires —
    # and the purchase can't count without it
    assert got[2] == (1, us(2026, 1, 1, 1), None)
    assert got[3] == (1, us(2026, 1, 1, 0), None)
    assert got[4] == (3, us(2026, 1, 1, 0), us(2026, 1, 1, 0))


# -- retention cohorts ---------------------------------------------------------

def test_retention_cohorts_invariants(spark):
    """Offset-0 cells must equal the cohort sizes (every user is active on
    their own first day), no offset can exceed its cohort's size, and
    offsets stay within the configured window."""
    rows = relational.retention_cohorts(spark, SF).collect()
    assert rows
    day0 = {r["cohort_day"]: r["n_active"] for r in rows if r["day_offset"] == 0}
    ev = load_table(spark, SF, "events").select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    )
    sizes = {
        r["cohort_day"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.min("d").alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert day0 == sizes
    for r in rows:
        assert 0 <= r["day_offset"] <= relational.RETENTION_MAX_OFFSET
        assert r["n_active"] <= sizes[r["cohort_day"]]

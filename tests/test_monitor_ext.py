"""Round-4 eighth-continuation batch (part 5): personalized PageRank,
Markov entropy rate, freshness/completeness SLA, vocabulary coverage.

All four carry FULL DuckDB oracles (registry.py; the PPR oracle unrolls
the restart-walk iterations).  These tests pin planted regimes: a seed
whose mass must decay with graph distance, deterministic vs uniform
transition rows, a planted silent gap and stale stream, and a
hand-built vocabulary cut."""

from __future__ import annotations

import numpy as np
import pandas as pd

from stixtoneodb_spark.operators import graph, relational, text


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


def _write_documents(tmp, texts, langs=None):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": langs if langs is not None else ["en"] * len(texts),
            "source": "src",
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pdf.to_parquet(tmp / "documents.parquet")
    return str(tmp)


# ---- kg_personalized_pagerank ----------------------------------------------

def test_ppr_mass_decays_with_distance(spark, tmp_path):
    """Chain join—customer—vector: mass decays with distance from the
    restart (1-hop > 2-hop; the seed beats the 2-hop node despite
    giving all its walk mass away each step — degree asymmetry CAN
    rank the 1-hop hub above the seed, which is correct PPR), and
    off-component entities get exactly 0."""
    texts = (
        ["join customer"] * 4
        + ["customer vector"] * 2
        + ["window stream"] * 3  # separate component, no path from seed
    )
    sf = _write_documents(tmp_path, texts)
    out = {r["mention"]: r["ppr"] for r in graph.kg_personalized_pagerank(spark, sf).collect()}
    assert out["customer"] > out["vector"] > 0
    assert out["join"] > out["vector"]  # restart keeps the seed above 2-hop
    assert out["window"] == 0.0 and out["stream"] == 0.0


def test_ppr_seed_isolated_keeps_restart_mass(spark, tmp_path):
    """If the seed has no edges it never appears as a node (graph built
    from co-occurrence): the operator returns rows only for connected
    vocabulary, with no seed row — the honest empty-neighborhood case."""
    sf = _write_documents(tmp_path, ["window stream"] * 3)
    out = {r["mention"] for r in graph.kg_personalized_pagerank(spark, sf).collect()}
    assert "join" not in out
    assert out == {"window", "stream"}


# ---- stats_entropy_rate ----------------------------------------------------

def test_entropy_rate_deterministic_vs_uniform(spark, tmp_path):
    """State 'click' always transitions to 'view' (H = 0); state 'view'
    splits 50/50 between 'click' and 'error' (H = ln 2)."""
    t0 = pd.Timestamp("2024-01-01")
    # user 1: c v c v c v e  | user 2: c v e
    rows = []
    for uid, seq in [(1, "cvcvcve"), (2, "cve")]:
        names = {"c": "click", "v": "view", "e": "error"}
        for i, ch in enumerate(seq):
            rows.append((names[ch], 1.0, t0 + pd.Timedelta(minutes=i), uid))
    sf = _write_events(tmp_path, rows)
    out = {r["event_type"]: r.asDict() for r in relational.stats_entropy_rate(spark, sf).collect()}
    assert out["click"]["h_state_nats"] == 0.0          # always -> view
    assert out["click"]["n_dst"] == 1
    assert out["view"]["n_dst"] == 2
    assert abs(out["view"]["h_state_nats"] - round(np.log(2), 6)) < 1e-9


# ---- dq_freshness_sla ------------------------------------------------------

def test_freshness_sla_planted_gap_and_staleness(spark, tmp_path):
    """'click' covers hours 0-5 except a 2-hour silence (3,4) and stops
    3 hours before the watermark set by 'view'."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for h in [0, 1, 2, 5]:
        rows.append(("click", 1.0, t0 + pd.Timedelta(hours=h), 1))
    for h in range(9):  # view defines the corpus watermark (hour 8)
        rows.append(("view", 1.0, t0 + pd.Timedelta(hours=h), 2))
    sf = _write_events(tmp_path, rows)
    out = {r["event_type"]: r.asDict() for r in relational.dq_freshness_sla(spark, sf).collect()}
    c = out["click"]
    assert c["observed_hours"] == 4
    assert c["expected_hours"] == 9
    assert c["missing_hours"] == 5
    assert c["max_gap_hours"] == 2  # hours 3-4 silent
    assert c["staleness_minutes"] == 3 * 60
    v = out["view"]
    assert v["coverage_ppm"] == 1_000_000 and v["staleness_minutes"] == 0


# ---- tokenizer_vocab_coverage ----------------------------------------------

def test_vocab_coverage_hand_built_cut(spark, tmp_path):
    """9 distinct words → vocab = top 9 div 3 + 1 = 4 by (freq desc,
    word): planted frequencies make the cut exactly {aa, bb, cc, dd};
    per-lang token/type coverage follows by hand."""
    texts = [
        "aa aa aa aa bb bb bb cc",          # en: aa*4 bb*3 cc*1
        "cc dd dd ee ff",                   # fr: cc dd*2 ee ff
        "gg hh ii aa",                      # fr: singletons + aa
    ]
    langs = ["en", "fr", "fr"]
    sf = _write_documents(tmp_path, texts, langs)
    out = {r["lang"]: r.asDict() for r in text.tokenizer_vocab_coverage(spark, sf).collect()}
    # freqs: aa5 bb3 dd2 cc2 ee1 ff1 gg1 hh1 ii1 → vocab {aa,bb,cc,dd}
    en = out["en"]
    assert en["n_tokens"] == 8 and en["n_covered"] == 8
    assert en["token_coverage_ppm"] == 1_000_000
    assert en["n_types"] == 3 and en["n_types_covered"] == 3
    fr = out["fr"]
    assert fr["n_tokens"] == 9
    assert fr["n_covered"] == 4  # cc dd dd aa
    assert fr["n_types"] == 8 and fr["n_types_covered"] == 3  # aa cc dd
    assert fr["type_coverage_ppm"] == 1_000_000 * 3 // 8

"""Round-4 eighth-continuation batch (part 8): Bloom membership sketch,
Kendall's tau-b, RFM segmentation, zone-map pruning simulation.

All four carry FULL DuckDB oracles (registry.py).  These tests pin
planted regimes: an md5-replayed Bloom filter (no false negatives,
replayed false positives), a single-swap and a tied profile for tau,
five purchasers whose R/F/M quintiles are forced distinct, and an
interleaved vs clustered layout whose pruning the test replays."""

from __future__ import annotations

import hashlib

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


def _write_documents(tmp, texts, n_chars=None):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "src",
            "n_chars": np.asarray(
                n_chars if n_chars is not None else [len(t) for t in texts],
                dtype=np.int64,
            ),
        }
    )
    pdf.to_parquet(tmp / "documents.parquet")
    return str(tmp)


# ---- sketch_bloom_membership ------------------------------------------------

def _bloom_pos(text: str, i: int) -> int:
    th = hashlib.md5(text.encode()).hexdigest()
    return int(hashlib.md5(f"{i}:{th}".encode()).hexdigest()[:6], 16) % relational.BLOOM_M


def test_bloom_no_false_negatives_and_replayed_fp(spark, tmp_path):
    n = 60
    texts = [f"doc number {i}" for i in range(n)]
    sf = _write_documents(tmp_path, texts)
    r = relational.sketch_bloom_membership(spark, sf).collect()[0].asDict()

    bits = set()
    for i in range(0, n, 2):
        for k in range(relational.BLOOM_K):
            bits.add(_bloom_pos(texts[i], k))
    fp = sum(
        1
        for i in range(1, n, 2)
        if all(_bloom_pos(texts[i], k) in bits for k in range(relational.BLOOM_K))
    )
    assert r["n_members"] == n // 2
    assert r["true_positives"] == n // 2  # the Bloom guarantee
    assert r["n_bits_set"] == len(bits)
    assert r["false_positives"] == fp
    s = len(bits)
    assert r["theo_fpr_ppm"] == 1_000_000 * s * s * s // relational.BLOOM_M**3


# ---- stats_kendall_tau -----------------------------------------------------

def test_kendall_single_swap(spark, tmp_path):
    """Profile [1,2,4,3,5]: one discordant pair → tau = 8/10 = 0.8."""
    t0 = pd.Timestamp("2024-01-01")
    vals = {0: 1.0, 1: 2.0, 2: 4.0, 3: 3.0, 4: 5.0}
    rows = [("t", v, t0 + pd.Timedelta(hours=h), 1) for h, v in vals.items()]
    sf = _write_events(tmp_path, rows)
    r = relational.stats_kendall_tau(spark, sf).collect()[0].asDict()
    assert r["n_concordant"] == 9 and r["n_discordant"] == 1
    assert r["n_tied_y"] == 0
    assert r["kendall_tau"] == 0.8


def test_kendall_tie_correction(spark, tmp_path):
    """Profile [1,2,2,3]: C=5, D=0, one y-tie → tau-b = 5/sqrt(6·5)."""
    t0 = pd.Timestamp("2024-01-01")
    vals = {0: 1.0, 1: 2.0, 2: 2.0, 3: 3.0}
    rows = [("t", v, t0 + pd.Timedelta(hours=h), 1) for h, v in vals.items()]
    sf = _write_events(tmp_path, rows)
    r = relational.stats_kendall_tau(spark, sf).collect()[0].asDict()
    assert r["n_concordant"] == 5 and r["n_discordant"] == 0
    assert r["n_tied_y"] == 1
    assert r["kendall_tau"] == round(5 / np.sqrt(6 * 5), 6)


# ---- users_rfm_segments ----------------------------------------------------

def test_rfm_five_users_forced_quintiles(spark, tmp_path):
    """User k makes k purchases of value 10k on day k: recency,
    frequency and monetary orderings all rank user k k-th → segments
    111, 222, 333, 444, 555 with one user each."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for k in range(1, 6):
        for j in range(k):
            rows.append(
                ("purchase", 10.0 * k, t0 + pd.Timedelta(days=k, minutes=j), k)
            )
    sf = _write_events(tmp_path, rows)
    out = {r["segment"]: r.asDict() for r in relational.users_rfm_segments(spark, sf).collect()}
    assert set(out) == {111, 222, 333, 444, 555}
    for seg, d in out.items():
        k = seg // 100
        assert d["n_users"] == 1
        assert d["share_ppm"] == 200_000
        assert d["mean_f_milli"] == 1000 * k
        assert d["mean_m_micro"] == 1000 * (k * 10_000 * k)  # k purchases of 10k


# ---- layout_zone_map_pruning -----------------------------------------------

def test_zone_map_clustered_layout_prunes(spark, tmp_path):
    """Alternating 1/100 sizes: id-order bins all span [1,100] (zero
    pruning on interior probes) while the value-sorted layout isolates
    ranges; the full grid is replayed in Python."""
    n = 64
    sizes = [1 if i % 2 == 0 else 100 for i in range(n)]
    sf = _write_documents(tmp_path, [f"d{i}" for i in range(n)], sizes)
    out = {
        (r["layout"], r["probe_value"]): r.asDict()
        for r in relational.layout_zone_map_pruning(spark, sf).collect()
    }

    target = sum(sizes) // relational.COMPACT_BINS + 1
    vmin, vmax = min(sizes), max(sizes)
    probes = sorted(
        {vmin + (k * (vmax - vmin)) // relational.ZONE_PROBES for k in range(9)}
    )

    def zones_of(order):
        cum, zones = 0, {}
        for i in order:
            b = cum // target
            z = zones.setdefault(b, [sizes[i], sizes[i]])
            z[0] = min(z[0], sizes[i])
            z[1] = max(z[1], sizes[i])
            cum += sizes[i]
        return zones

    layouts = {
        "id_order": zones_of(range(n)),
        "value_order": zones_of(sorted(range(n), key=lambda i: (sizes[i], i))),
    }
    for layout, zones in layouts.items():
        for p in probes:
            cand = sum(1 for lo, hi in zones.values() if lo <= p <= hi)
            d = out[(layout, p)]
            assert d["n_bins"] == len(zones)
            assert d["n_candidate_bins"] == cand
            assert d["pruned_ppm"] == 1_000_000 * (len(zones) - cand) // len(zones)
    # the demonstration itself: clustering strictly improves total pruning
    total = {
        lay: sum(out[(lay, p)]["pruned_ppm"] for p in probes)
        for lay in ("id_order", "value_order")
    }
    assert total["value_order"] > total["id_order"]

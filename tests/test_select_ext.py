"""Round-4 eighth-continuation batch (part 12): greedy k-center diverse
selection, interval-overlap join, Pareto concentration.

All three carry FULL DuckDB oracles (registry.py; the k-center oracle
unrolls every greedy step over materialized integer cosines).  These
tests pin planted regimes: a geometry where the greedy order is
provable by hand (and k > n truncates), a known overlapping session
pair, and a whale-buyer distribution with an exact 80% cut."""

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


def _write_embeddings(tmp, vecs):
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": np.zeros(len(vecs), dtype=np.int32),
        }
    )
    pdf.to_parquet(tmp / "embeddings.parquet")
    return str(tmp)


# ---- corpus_select_diverse_kcenter -----------------------------------------

def test_kcenter_greedy_order_by_hand(spark, tmp_path):
    """v0=e1 (seed), v1≈e1, v2=e2, v3=−e1: farthest-first must pick the
    antipode, then the orthogonal, then the near-duplicate last — and
    k > n truncates to n rows."""
    vecs = [
        [1.0, 0.0],
        [1.0, 1e-3],
        [0.0, 1.0],
        [-1.0, 0.0],
    ]
    sf = _write_embeddings(tmp_path, vecs)
    out = sorted(
        (r.asDict() for r in relational.corpus_select_diverse_kcenter(spark, sf).collect()),
        key=lambda r: r["pick_rank"],
    )
    assert [r["vec_id"] for r in out] == [0, 3, 2, 1]
    assert out[0]["maxsim_prior_micro"] == 0          # seed convention
    assert out[1]["maxsim_prior_micro"] == -1_000_000  # antipode of seed
    assert abs(out[2]["maxsim_prior_micro"]) < 2_000   # ~orthogonal
    assert out[3]["maxsim_prior_micro"] > 999_000      # near-dup picked last
    assert len(out) == 4  # KCENTER_K=8 truncates to n


# ---- join_interval_overlap_topk --------------------------------------------

def test_interval_overlap_detects_copresence(spark, tmp_path):
    """u1 online [0h,2h], u2 online [1h,3h] → one overlapping pair;
    u3's late session overlaps nobody."""
    t0 = pd.Timestamp("2024-01-01")

    def sess(uid, start_h, end_h):
        out = []
        t = t0 + pd.Timedelta(hours=start_h)
        while t <= t0 + pd.Timedelta(hours=end_h):
            out.append(("click", 1.0, t, uid))
            t += pd.Timedelta(minutes=20)  # < 30-min gap: one session
        return out

    rows = sess(1, 0, 2) + sess(2, 1, 3) + sess(3, 10, 11)
    sf = _write_events(tmp_path, rows)
    out = [r.asDict() for r in relational.join_interval_overlap_topk(spark, sf).collect()]
    assert len(out) == 1
    assert out[0]["user_a"] == 1 and out[0]["user_b"] == 2
    assert out[0]["n_overlaps"] == 1 and out[0]["rank"] == 1


# ---- agg_pareto_concentration ----------------------------------------------

def test_pareto_whale_concentration(spark, tmp_path):
    """One 160-value whale + nine 5-value buyers: 2 users reach 80% of
    the 205 total; the top 1% (1 user of 10) holds 160/205."""
    t0 = pd.Timestamp("2024-01-01")
    rows = [("purchase", 160.0, t0, 0)]
    rows += [
        ("purchase", 5.0, t0 + pd.Timedelta(minutes=u), u) for u in range(1, 10)
    ]
    sf = _write_events(tmp_path, rows)
    r = relational.agg_pareto_concentration(spark, sf).collect()[0].asDict()
    assert r["n_buyers"] == 10
    assert r["total_value_milli"] == 205_000
    assert r["n_users_for_80pct"] == 2  # 160+5=165, 5*165 >= 4*205
    assert r["share_users_for_80pct_ppm"] == 200_000
    assert r["top1pct_value_share_ppm"] == 1_000_000 * 160_000 // 205_000


SF001 = "/root/testdata/sf0.001"


def test_knn_outliers_corpus_tier_bounded_and_one_sided(spark):
    """Planted guard (audit_max_rows=0) forces the IVF candidate tier:
    no full-table collect, driver holds only centroids.  The candidate
    set is a subset of the corpus, so every IVF k-th-NN cosine must be
    ≤ the exact tier's for the same vector — the one-sided
    approximation contract the docstring states."""
    exact = {
        r["vec_id"]: r["nn_cos_micro"]
        for r in relational.embedding_knn_outliers(spark, SF001).collect()
    }
    ivf_rows = relational.embedding_knn_outliers(
        spark, SF001, audit_max_rows=0
    ).collect()
    assert ivf_rows, "corpus tier must produce scored rows"
    assert len(ivf_rows) <= len(exact)
    n_flag = sum(r["is_outlier"] for r in ivf_rows)
    assert n_flag == min(len(exact) // relational.KNN_OUT_DECI, len(ivf_rows))
    for r in ivf_rows:
        assert r["nn_cos_micro"] <= exact[r["vec_id"]], r["vec_id"]
    # and the tiers agree on at least some vectors (at sf0.001 the probe
    # fraction is ~nprobe/√n ≈ 18% of the corpus, so exact-k-th-NN
    # recall is structurally low — the ≤ contract above is the real pin)
    agree = sum(1 for r in ivf_rows if r["nn_cos_micro"] == exact[r["vec_id"]])
    assert agree >= 10


def test_kcenter_corpus_tier_pool_bounded_and_valid_greedy(spark):
    """Planted guard forces the IVF-representative pool tier: picks
    come from the pool (subset of corpus ids), pick 1 is the smallest
    pool id, and the coverage radius is non-decreasing from rank 2 on
    (greedy k-center invariant: maxsim values only grow as picks
    accumulate)."""
    rows = sorted(
        relational.corpus_select_diverse_kcenter(
            spark, SF001, audit_max_rows=0
        ).collect(),
        key=lambda r: r["pick_rank"],
    )
    assert rows and rows[0]["pick_rank"] == 1
    assert rows[0]["maxsim_prior_micro"] == 0
    radii = [r["maxsim_prior_micro"] for r in rows[1:]]
    assert radii == sorted(radii)
    # ranks are contiguous and picks unique
    assert [r["pick_rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len({r["vec_id"] for r in rows}) == len(rows)

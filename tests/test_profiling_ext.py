"""Round-4 profiling/curation batch: document chunking, PII scrub,
equi-width histogram, key-skew profile, range-partition bounds, and the
Pearson correlation matrix.

All six carry FULL DuckDB oracles (registry.py, driver-compared at
sf0.01); these tests pin regimes the fixture can't reach — chunk
boundary arithmetic at exact window/stride multiples, PII patterns
planted in the BASE text, known-bin histogram values, a planted
mega-hot key, bucket balance/ordering invariants, and exactly
correlated/anti-correlated columns.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from stixtoneodb_spark.operators import relational, text

SF = "/root/testdata/sf0.01"


def _write_docs(tmp, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": "planted",
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp / "documents.parquet")
    return str(tmp)


# ---- corpus_chunk_documents ------------------------------------------------


def _ref_chunks(s: str):
    """Independent pure-Python chunker: starts 0, stride, ... <= len-1
    (at least one start), window CHUNK_LEN."""
    last = max(len(s) - 1, 0)
    starts = list(range(0, last + 1, text.CHUNK_STRIDE))
    return [
        (i, st, s[st : st + text.CHUNK_LEN])
        for i, st in enumerate(starts)
    ]


def test_chunking_boundary_arithmetic(spark, tmp_path):
    """Lengths at every boundary class: shorter than one window, exactly
    CHUNK_LEN, CHUNK_LEN+1 (one extra overlapping tail chunk), an exact
    stride multiple (tail chunk shorter than the overlap), and a long
    document.  Every chunk's md5 must equal hashlib.md5 of the Python
    slice, and the windows must cover every character."""
    texts = [
        "x" * 3,
        "ab" * (text.CHUNK_LEN // 2),          # == CHUNK_LEN
        "ab" * (text.CHUNK_LEN // 2) + "z",    # == CHUNK_LEN + 1
        "q" * (text.CHUNK_STRIDE * 4),         # exact stride multiple
        "".join(chr(97 + (i * 7) % 26) for i in range(1000)),
    ]
    d = _write_docs(tmp_path, texts)
    rows = text.corpus_chunk_documents(spark, d).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(range(len(texts)))
    for doc_id, s in enumerate(texts):
        got = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        ref = _ref_chunks(s)
        assert len(got) == len(ref), (doc_id, len(got), len(ref))
        covered = set()
        for r, (idx, st, chunk) in zip(got, ref):
            assert (r.chunk_idx, r.chunk_start, r.chunk_len) == (idx, st, len(chunk))
            assert r.chunk_md5 == hashlib.md5(chunk.encode()).hexdigest()
            covered.update(range(st, st + len(chunk)))
        assert covered == set(range(len(s)))


# ---- text_pii_scrub ---------------------------------------------------------


def test_pii_scrub_counts_and_content(spark, tmp_path):
    """PII planted in the BASE text (the operator also appends its own
    deterministic contact line): counts must see both, and scrub_md5
    must equal the md5 of an independent Python re scrub applied in the
    same URL -> EMAIL -> DIGITS order."""
    texts = [
        "visit https://a.example/x and mail bob.smith@corp.io code 1234567 now",
        "no pii here at all",
        "two urls http://x.y/1 https://z.w/2 and 999999",
        "short digits 12345 do not count",
    ]
    d = _write_docs(tmp_path, texts)
    out = {r.doc_id: r for r in text.text_pii_scrub(spark, d).collect()}

    for doc_id, base in enumerate(texts):
        planted = (
            f"{base} contact u{doc_id}@ex{doc_id % 7}.com via "
            f"https://h{doc_id % 5}.example/p{doc_id} ref 90210{doc_id}"
        )
        s1 = re.sub(text.PII_URL_RE, "<URL>", planted)
        s2 = re.sub(text.PII_EMAIL_RE, "<EMAIL>", s1)
        s3 = re.sub(text.PII_DIGITS_RE, "<NUM>", s2)
        r = out[doc_id]
        assert r.n_urls == len(re.findall(text.PII_URL_RE, planted))
        assert r.n_emails == len(re.findall(text.PII_EMAIL_RE, s1))
        assert r.n_digit_runs == len(re.findall(text.PII_DIGITS_RE, s2))
        assert r.scrub_md5 == hashlib.md5(s3.encode()).hexdigest()
    # the planted base PII was actually seen (not just the contact line):
    # base URL/email/digit-run each add one over the contact line's own.
    assert out[0].n_urls == 2 and out[0].n_emails == 2 and out[0].n_digit_runs == 2
    assert out[1].n_urls == 1 and out[1].n_emails == 1 and out[1].n_digit_runs == 1
    assert out[2].n_urls == 3 and out[2].n_digit_runs == 2
    assert out[3].n_digit_runs == 1  # base 5-digit run correctly ignored


# ---- agg_histogram_prices ---------------------------------------------------


def test_histogram_bins_exact(spark, tmp_path):
    """Known values: bin edges are integer-exact, the max value lands in
    the LAST bin (no off-by-one overflow bin), total count preserved."""
    prices = [0.01, 1.0, 9.99, 10.0, 50.0, 99.99, 100.0, 100.0]
    pdf = pd.DataFrame(
        {
            "o_orderkey": np.arange(len(prices), dtype=np.int64),
            "o_custkey": np.int64(1),
            "o_orderstatus": "O",
            "o_totalprice": prices,
            "o_orderdate": pd.Timestamp("2024-01-01"),
            "o_orderpriority": "1-URGENT",
        }
    )
    pdf.to_parquet(tmp_path / "orders.parquet")
    rows = relational.agg_histogram_prices(spark, str(tmp_path)).collect()
    got = {r.bin: r.n for r in rows}
    max_cents = 10000
    expect: dict[int, int] = {}
    for p in prices:
        b = int(round(p * 100)) * relational.HIST_BINS // (max_cents + 1)
        expect[b] = expect.get(b, 0) + 1
    assert got == expect
    assert sum(got.values()) == len(prices)
    assert max(got) == relational.HIST_BINS - 1
    assert all(0 <= b < relational.HIST_BINS for b in got)


# ---- profile_key_skew -------------------------------------------------------


def _write_events(tmp, user_ids):
    n = len(user_ids)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": (
                pd.to_datetime("2024-01-01")
                + pd.to_timedelta(np.arange(n), unit="s")
            ).astype("datetime64[us]"),
            "user_id": np.asarray(user_ids, dtype=np.int64),
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp / "events.parquet")
    return str(tmp)


def test_key_skew_flags_planted_hot_key(spark, tmp_path):
    """One mega-hot key (60% of traffic) among a uniform tail: it must
    rank first with the exact truncated ppm share; cumulative share is
    monotone and exact (scaled once, not a sum of truncated shares)."""
    users = [7] * 600 + [100 + i % 40 for i in range(400)]
    d = _write_events(tmp_path, users)
    rows = sorted(
        relational.profile_key_skew(spark, d).collect(), key=lambda r: r.rank
    )
    assert rows[0].user_id == 7
    assert rows[0].cnt == 600
    assert rows[0].share_ppm == 600 * 1_000_000 // 1000
    cum = 0
    for r in rows:
        cum += r.cnt
        assert r.cum_share_ppm == cum * 1_000_000 // 1000
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


# ---- layout_range_partition_bounds -----------------------------------------


def test_range_bounds_balanced_and_ordered(spark, tmp_path):
    """Buckets are row-balanced (sizes differ by <=1 — the ntile
    contract) and key-ordered: each bucket's [lo,hi] span never runs
    backwards vs the previous bucket's."""
    rng = np.random.RandomState(7)
    users = rng.randint(0, 50, size=1003)  # deliberately not divisible by 8
    d = _write_events(tmp_path, list(users))
    rows = sorted(
        relational.layout_range_partition_bounds(spark, d).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in rows] == list(range(1, relational.RANGE_BUCKETS + 1))
    sizes = [r.n_rows for r in rows]
    assert sum(sizes) == 1003
    assert max(sizes) - min(sizes) <= 1
    assert sizes == sorted(sizes, reverse=True)  # remainder rows go to FIRST buckets
    for a, b in zip(rows, rows[1:]):
        assert a.lo_user <= a.hi_user
        assert a.hi_user <= b.lo_user  # ranges ordered (ties allowed at the seam)


# ---- stats_correlation_matrix ----------------------------------------------


def test_correlation_exact_poles_and_numpy_parity(spark, tmp_path):
    """price = 200*quantity (corr exactly +1 -> 1_000_000 ppm) and
    discount anti-monotone in quantity; the independent check is
    numpy.corrcoef on the SAME integer-scaled values, +-1 ppm for the
    float assembly."""
    n = 64
    q = np.arange(1, n + 1, dtype=np.float64)          # quantity 1..64
    p = q * 200.0                                      # exactly linear
    disc = (n + 1 - q) / 1000.0                        # anti-monotone, linear
    pdf = pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype=np.int64),
            "l_partkey": np.int64(1),
            "l_suppkey": np.int64(1),
            "l_linenumber": np.int32(1),
            "l_quantity": q,
            "l_extendedprice": p,
            "l_discount": disc,
            "l_tax": 0.0,
            "l_returnflag": "N",
            "l_linestatus": "O",
            "l_shipdate": pd.Timestamp("2024-01-01"),
        }
    )
    pdf.to_parquet(tmp_path / "lineitem.parquet")
    rows = {
        (r.x_col, r.y_col): r
        for r in relational.stats_correlation_matrix(spark, str(tmp_path)).collect()
    }
    assert rows[("quantity", "price")].corr_ppm == 1_000_000
    assert rows[("quantity", "discount")].corr_ppm == -1_000_000
    assert rows[("price", "discount")].corr_ppm == -1_000_000
    assert all(r.n == n for r in rows.values())

    qi = np.round(q * 100).astype(np.int64)
    pi = np.round(p).astype(np.int64)
    di = np.round(disc * 10000).astype(np.int64)
    for (xc, yc), (x, y) in {
        ("quantity", "price"): (qi, pi),
        ("quantity", "discount"): (qi, di),
        ("price", "discount"): (pi, di),
    }.items():
        expect = int(np.floor(1_000_000 * np.corrcoef(x, y)[0, 1] + 0.5))
        assert abs(rows[(xc, yc)].corr_ppm - expect) <= 1


# ---- kg_hits_scores ---------------------------------------------------------


def test_hits_planted_hub_authority_structure(spark, tmp_path):
    """A planted pure-hub/pure-authority star: 'join' always leads,
    {'hash','row','batch'} always follow.  'join' must take all hub
    mass and zero authority; the three authorities split authority by
    their in-weights and hold zero hub.  Scores re-derived by an
    independent numpy power iteration with the same sum normalization."""
    from stixtoneodb_spark.operators import graph

    texts = (
        ["join hash"] * 4 + ["join row"] * 2 + ["join batch"] * 2
    )
    d = _write_docs(tmp_path, texts)
    rows = {r.mention: r for r in graph.kg_hits_scores(spark, d).collect()}
    assert set(rows) == {"join", "hash", "row", "batch"}
    assert rows["join"].hub == 1.0 and rows["join"].authority == 0.0
    for a in ("hash", "row", "batch"):
        assert rows[a].hub == 0.0

    nodes = ["join", "hash", "row", "batch"]
    idx = {n: i for i, n in enumerate(nodes)}
    W = np.zeros((4, 4))
    W[idx["join"], idx["hash"]] = 4
    W[idx["join"], idx["row"]] = 2
    W[idx["join"], idx["batch"]] = 2
    h = np.full(4, 0.25)
    for _ in range(graph.HITS_ITERS):
        a = W.T @ h
        a = a / a.sum()
        h = W @ a
        h = h / h.sum()
    for n in nodes:
        assert abs(rows[n].hub - round(float(h[idx[n]]), 6)) <= 1e-6
        assert abs(rows[n].authority - round(float(a[idx[n]]), 6)) <= 1e-6


def test_hits_mutual_order_pairs_get_both_directions(spark, tmp_path):
    """Tokens that swap order across documents must receive BOTH
    directed edges (the asymmetry source): with 3 docs 'join hash' and
    1 doc 'hash join', both nodes carry nonzero hub AND authority."""
    from stixtoneodb_spark.operators import graph

    d = _write_docs(tmp_path, ["join hash"] * 3 + ["hash join"])
    rows = {r.mention: r for r in graph.kg_hits_scores(spark, d).collect()}
    for n in ("join", "hash"):
        assert rows[n].hub > 0.0 and rows[n].authority > 0.0
    # heavier join->hash direction: join is the stronger hub, hash the
    # stronger authority
    assert rows["join"].hub > rows["hash"].hub
    assert rows["hash"].authority > rows["join"].authority


# ---- window_cumulative_distinct --------------------------------------------


def test_cumulative_distinct_planted_sequence(spark, tmp_path):
    """Hand-computed novelty curve: types A,B,A,C,B,D on one user's
    timeline -> 1,2,2,3,3,4; a second user interleaved in time must not
    bleed into the first's counter."""
    types = ["a", "b", "a", "c", "b", "d"]
    n = len(types)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(2 * n, dtype=np.int64),
            "ts": (
                pd.to_datetime("2024-01-01")
                + pd.to_timedelta(np.repeat(np.arange(n), 2), unit="s")
            ).astype("datetime64[us]"),
            "user_id": np.array([1, 2] * n, dtype=np.int64),
            "event_type": np.repeat(types, 2),
            "value": 1.0,
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    out = relational.window_cumulative_distinct(spark, str(tmp_path)).collect()
    for uid in (1, 2):
        seq = [
            r.cum_distinct_types
            for r in sorted(
                (r for r in out if r.user_id == uid), key=lambda r: r.event_id
            )
        ]
        assert seq == [1, 2, 2, 3, 3, 4]


# ---- agg_anomaly_mad --------------------------------------------------------


def test_mad_flags_outliers_zscore_would_miss(spark, tmp_path):
    """The robustness property that motivates MAD: two huge outliers in
    a tight 50/50 bimodal group.  median=10.5, MAD=0.5, threshold
    8*MAD=4 -> ONLY the planted 1000s flag; the inliers' 0.5 deviation
    never does.  (A mean/stddev rule with these outliers present would
    need the outliers themselves to set the scale.)"""
    vals = [10.0] * 50 + [10.5] * 50 + [1000.0, 1000.0]
    n = len(vals)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": np.int64(1),
            "event_type": "click",
            "value": vals,
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    rows = relational.agg_anomaly_mad(spark, str(tmp_path)).collect()
    assert sorted(r.event_id for r in rows) == [100, 101]
    assert all(r.vc == 100000 for r in rows)


# ---- scalar_bitwise_funcs / agg_mode_per_group / events_gap_stats ----------


def test_bitwise_matches_python_ints(spark, tmp_path):
    """Planted keys at the edge cases (0, 1, a >32-bit value, all-ones
    byte) vs Python's int bit ops."""
    keys = [0, 1, 255, 2**40 + 7, 12345678901]
    custs = [0, 3, 170, 2**33, 999]
    pdf = pd.DataFrame(
        {
            "o_orderkey": np.array(keys, dtype=np.int64),
            "o_custkey": np.array(custs, dtype=np.int64),
            "o_orderstatus": "O",
            "o_totalprice": 1.0,
            "o_orderdate": pd.Timestamp("2024-01-01"),
            "o_orderpriority": "1-URGENT",
        }
    )
    pdf.to_parquet(tmp_path / "orders.parquet")
    out = {
        r.o_orderkey: r
        for r in relational.scalar_bitwise_funcs(spark, str(tmp_path)).collect()
    }
    for k, c in zip(keys, custs):
        r = out[k]
        assert r.low_byte == k & 255
        assert r.or_cust == k | c
        assert r.xor_cust == k ^ c
        assert r.shl3 == k << 3
        assert r.shr2 == k >> 2
        assert r.popcount == bin(k).count("1")
        assert r.bucket32 == k & 31


def test_mode_tie_breaks_to_smallest_bucket(spark, tmp_path):
    """Two buckets tied at the top -> the smaller bucket must win on
    BOTH engines (the documented deterministic tie-break)."""
    vals = [5.0] * 4 + [95.0] * 4 + [45.0] * 2  # buckets 0 and 9 tie at 4
    n = len(vals)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": np.int64(1),
            "event_type": "click",
            "value": vals,
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    rows = relational.agg_mode_per_group(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].mode_bucket == 0 and rows[0].cnt == 4


def test_gap_stats_exact_micros_and_single_event_user(spark, tmp_path):
    """Fractional-second gaps must come out in exact microseconds (the
    truncation bug class the operator switched units to avoid), and a
    single-event user produces no row."""
    base = pd.Timestamp("2024-01-01")
    ts = [
        base,
        base + pd.Timedelta(microseconds=1_500_000),   # gap 1.5 s
        base + pd.Timedelta(microseconds=2_000_001),   # gap 0.500001 s
        base + pd.Timedelta(days=1),                   # user 2, single event
    ]
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": pd.Series(ts).astype("datetime64[us]"),
            "user_id": np.array([1, 1, 1, 2], dtype=np.int64),
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    rows = {r.user_id: r for r in relational.events_gap_stats(spark, str(tmp_path)).collect()}
    assert set(rows) == {1}
    r = rows[1]
    assert r.n_gaps == 2
    assert r.min_gap_us == 500_001
    assert r.max_gap_us == 1_500_000
    assert r.avg_gap_us == (1_500_000 + 500_001) // 2


# ---- embedding_dim_stats ----------------------------------------------------


def test_embedding_dim_stats_planted_moments(spark, tmp_path):
    """Dim 0 constant (var 0), dim 1 alternating ±0.5 (mean 0, var
    0.25e12 micro²), dim 2 a ramp with hand-computed moments."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 8
    vecs = []
    for i in range(n):
        vecs.append([0.25, 0.5 if i % 2 == 0 else -0.5, i / 10.0])
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    from stixtoneodb_spark.operators import similarity

    rows = {r.dim: r for r in similarity.embedding_dim_stats(spark, str(tmp_path)).collect()}
    assert set(rows) == {0, 1, 2}
    assert all(r.n == n for r in rows.values())
    assert rows[0].mean_micro == 250_000 and rows[0].var_micro2 == 0
    assert rows[1].mean_micro == 0
    assert rows[1].var_micro2 == 500_000 * 500_000
    # dim 2: micros are the float32-exact roundings of i/10
    micros = [int(np.floor(np.float64(np.float32(i / 10.0)) * 1e6 + 0.5)) for i in range(n)]
    s1, s2 = sum(micros), sum(m * m for m in micros)
    assert rows[2].mean_micro == s1 // n
    assert rows[2].var_micro2 == int(np.floor((n * s2 - s1 * s1) / (n * n) + 0.5))


# ---- kg_local_clustering_coefficient ----------------------------------------


def test_lcc_planted_triangle_plus_pendant(spark, tmp_path):
    """Triangle {join,hash,row} plus pendant batch-join edge:
    lcc(hash)=lcc(row)=1e6 (their whole neighborhood is closed),
    lcc(join)=2*1/(3*2)=333333 ppm truncated, lcc(batch)=0 (degree 1)."""
    from stixtoneodb_spark.operators import graph

    texts = ["join hash", "hash row", "join row", "join batch"]
    d = _write_docs(tmp_path, texts)
    rows = {
        r.mention: r
        for r in graph.kg_local_clustering_coefficient(spark, d).collect()
    }
    assert rows["join"].degree == 3 and rows["join"].n_triangles == 1
    assert rows["join"].lcc_ppm == 2_000_000 // 6
    for n in ("hash", "row"):
        assert rows[n].degree == 2 and rows[n].lcc_ppm == 1_000_000
    assert rows["batch"].degree == 1
    assert rows["batch"].n_triangles == 0 and rows["batch"].lcc_ppm == 0


# ---- join_null_safe_demo ----------------------------------------------------


def test_null_safe_join_keeps_null_group(spark, tmp_path):
    """The NULL key must survive as a matched group (n = #click rows,
    dim_len = -1); a plain equi-join would drop those rows entirely."""
    types = ["click"] * 7 + ["view"] * 3
    n = len(types)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": np.int64(1),
            "event_type": types,
            "value": 1.0,
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    rows = {r.k: r for r in relational.join_null_safe_demo(spark, str(tmp_path)).collect()}
    assert set(rows) == {None, "view"}
    assert rows[None].n == 7 and rows[None].dim_len == -1
    assert rows["view"].n == 3 and rows["view"].dim_len == 4


# ---- sketch_hll_union_contract ----------------------------------------------


def test_hll_union_contract_on_planted_wide_distinct(spark, tmp_path):
    """60k distinct users split across 4 groups: the unioned per-group
    sketches must estimate the global distinct within the 5% contract
    (and the exact count must be exactly 60000)."""
    n = 60000
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": np.arange(n, dtype=np.int64),
            "event_type": np.array(["a", "b", "c", "d"])[np.arange(n) % 4],
            "value": 1.0,
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    rows = relational.sketch_hll_union_contract(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].exact_users == n
    assert rows[0].union_within_5pct is True


# ---- corpus_overlap_minhash -------------------------------------------------


def test_corpus_overlap_poles_and_estimator_agreement(spark, tmp_path):
    """Identical token sets -> exact AND estimate both 1e6; disjoint
    sets -> both 0; a half-overlapping pair's estimate must land within
    the binomial noise of K=32 slots around the true Jaccard."""
    a = " ".join(f"tok{i}" for i in range(40))
    b = " ".join(f"tok{i}" for i in range(20, 60))      # J(a,b) = 20/60
    c = " ".join(f"other{i}" for i in range(40))        # disjoint from a,b
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [a, a, b, c],
            "lang": "en",
            "source": ["s1", "s2", "s3", "s4"],
            "n_chars": [len(a), len(a), len(b), len(c)],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    rows = {
        (r.src_a, r.src_b): r
        for r in text.corpus_overlap_minhash(spark, str(tmp_path)).collect()
    }
    assert rows[("s1", "s2")].exact_jaccard_ppm == 1_000_000
    assert rows[("s1", "s2")].est_jaccard_ppm == 1_000_000
    assert rows[("s1", "s4")].exact_jaccard_ppm == 0
    assert rows[("s1", "s4")].est_jaccard_ppm == 0
    true_ppm = 20 * 1_000_000 // 60
    got = rows[("s1", "s3")].est_jaccard_ppm
    # 32 slots: allow ±4 sigma of Binomial(32, 1/3)
    sigma_ppm = int(1_000_000 * (1 / 3 * 2 / 3 / 32) ** 0.5)
    assert abs(got - true_ppm) <= 4 * sigma_ppm
    assert rows[("s1", "s3")].exact_jaccard_ppm == true_ppm


# ---- agg_weighted_median / events_rate_anomaly / text_url_canonicalize -----


def test_weighted_median_hand_computed(spark, tmp_path):
    """Weights engineered so the weighted median differs from the plain
    median: values 1,2,3 with weights 1,1,10 -> cum 1,2,12 vs total 12;
    2*cw>=tw first at value 3 (plain median would be 2)."""
    pdf = pd.DataFrame(
        {
            "l_orderkey": np.arange(3, dtype=np.int64),
            "l_partkey": np.int64(1),
            "l_suppkey": np.int64(1),
            "l_linenumber": np.int32(1),
            "l_quantity": [1.0, 1.0, 10.0],
            "l_extendedprice": [1.0, 2.0, 3.0],
            "l_discount": 0.0,
            "l_tax": 0.0,
            "l_returnflag": "N",
            "l_linestatus": "O",
            "l_shipdate": pd.Timestamp("2024-01-01"),
        }
    )
    pdf.to_parquet(tmp_path / "lineitem.parquet")
    rows = relational.agg_weighted_median(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].w_median_cents == 300
    assert rows[0].total_weight == 12
    # exact-midpoint tie: weights 1,1 over values 1,2 -> 2*cw==tw at the
    # LOWER value (the documented lower-weighted-median rule)
    pdf2 = pdf.iloc[:2].copy()
    pdf2["l_quantity"] = [1.0, 1.0]
    pdf2.to_parquet(tmp_path / "lineitem.parquet")
    rows = relational.agg_weighted_median(spark, str(tmp_path)).collect()
    assert rows[0].w_median_cents == 100


def test_rate_anomaly_flags_planted_spike_hour(spark, tmp_path):
    """11 quiet hours at 10 events + one 200-event spike hour: only the
    spike hour flags (mean≈25.8, the quiet hours sit well inside 3σ)."""
    counts = [10] * 11 + [200]
    ids, hrs = [], []
    eid = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            ids.append(eid)
            hrs.append(h)
            eid += 1
    pdf = pd.DataFrame(
        {
            "event_id": np.array(ids, dtype=np.int64),
            "ts": (
                pd.to_datetime("2024-01-01")
                + pd.to_timedelta(np.array(hrs) * 3600 + 60, unit="s")
            ).astype("datetime64[us]"),
            "user_id": np.int64(1),
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    rows = relational.events_rate_anomaly(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].c == 200
    spike_hour_id = int(
        (pd.Timestamp("2024-01-01") - pd.Timestamp("1970-01-01")).total_seconds()
    ) // 3600 + 11
    assert rows[0].hour_id == spike_hour_id


def test_url_canonicalize_collides_equivalent_urls(spark, tmp_path):
    """The property the canonicalizer exists for: two doc_ids with the
    same (doc_id % 5, doc_id) would be identical — instead verify
    against an independent Python canonicalization of the SAME planted
    URL, and that utm params are counted dropped."""
    d = _write_docs(tmp_path, ["x", "y", "z"])
    rows = {r.doc_id: r for r in text.text_url_canonicalize(spark, d).collect()}
    for doc_id in range(3):
        url = (
            f"HTTPS://WWW.Ex{doc_id % 5}.COM/Path/{doc_id}"
            f"?zeta=9&utm_source=feed&Id={doc_id}&utm_campaign=x&alpha=1#Frag"
        )
        no_frag = url.split("#")[0]
        base, query = no_frag.split("?")
        kept = sorted(p for p in query.split("&") if not p.startswith("utm_"))
        canon = base.lower() + "?" + "&".join(kept)
        r = rows[doc_id]
        assert r.n_params_dropped == 2
        assert r.canon_md5 == hashlib.md5(canon.encode()).hexdigest()


# ---- physical-plan proofs ----------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_plan_shapes_of_profiling_batch(spark):
    """Executed-plan assertions for the batch's 100-TB claims:
    chunking is shuffle-free map-side codegen; the skew profile's top-k
    is TakeOrderedAndProject (heap, not global sort); the correlation
    matrix reads the fact table EXACTLY once (the unioned-selects form
    recomputed the aggregate subtree — three scans — before the explode
    rewrite)."""
    p = _plan(text.corpus_chunk_documents(spark, SF))
    assert "Exchange" not in p
    assert "Generate" in p  # posexplode stayed JVM-side

    p = _plan(relational.profile_key_skew(spark, SF))
    assert "TakeOrderedAndProject" in p

    p = _plan(relational.stats_correlation_matrix(spark, SF))
    assert p.count("FileScan parquet") == 1

    p = _plan(relational.agg_histogram_prices(spark, SF))
    assert "BroadcastExchange" in p  # the 1-row max joins broadcast


# ---- dedup_pick_representatives ---------------------------------------------


def test_representative_pick_longest_wins_one_keeper_per_cluster(spark, tmp_path):
    """A planted 3-doc near-dup family where the LONGEST member is not
    the smallest doc_id: the longest must win; exactly one keep per
    cluster; every member agrees on the rep."""
    from stixtoneodb_spark.operators import graph

    fam = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        fam,                          # doc 0
        fam + " lambda",              # doc 1 — longest, must win
        fam,                          # doc 2
        "completely different words here nothing shared with the family x y z",
    ]
    d = _write_docs(tmp_path, texts)
    rows = graph.dedup_pick_representatives(spark, d).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert set(r.doc_id for r in rows) == {0, 1, 2}  # doc 3 is a singleton
    (members,) = by_cluster.values()
    assert all(r.rep_doc_id == 1 for r in members)
    keeps = [r.doc_id for r in members if r.keep]
    assert keeps == [1]


# ---- text_rake_keywords -----------------------------------------------------


def _py_rake(docs: list, stops: set, top_k: int):
    """Independent reference RAKE: phrase split on stopwords, word score
    deg*1e6//freq, phrase score = sum of member word scores, per-doc
    top-k with (score desc, phrase asc) ordering."""
    doc_phrases = []
    for t in docs:
        phrases, cur = [], []
        for tok in t.lower().split(" "):
            if not tok:
                continue
            if tok in stops:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(tok)
        if cur:
            phrases.append(cur)
        doc_phrases.append(phrases)
    deg: dict = {}
    freq: dict = {}
    for phrases in doc_phrases:
        for p in phrases:
            for w in p:
                deg[w] = deg.get(w, 0) + len(p)
                freq[w] = freq.get(w, 0) + 1
    wscore = {w: deg[w] * 1_000_000 // freq[w] for w in deg}
    out = []
    for doc_id, phrases in enumerate(doc_phrases):
        scored = sorted(
            ((sum(wscore[w] for w in p), " ".join(p)) for p in phrases),
            key=lambda x: (-x[0], x[1]),
        )
        for rank, (score, phrase) in enumerate(scored[:top_k], 1):
            out.append((doc_id, rank, phrase, score))
    return sorted(out)


def test_rake_matches_independent_reference(spark, tmp_path):
    """Multi-doc corpus with shared and doc-local words, multi-word and
    singleton phrases, leading/trailing stopwords — vs a from-scratch
    Python RAKE."""
    docs = [
        "the deep learning of deep networks is a hard problem",
        "linear constraints of the system and strict bounds",
        "deep networks and linear algebra in it",
        "a of the and",  # stopwords only -> no phrases, no rows
    ]
    d = _write_docs(tmp_path, docs)
    got = sorted(
        (r.doc_id, r.rank, r.phrase, r.phrase_score)
        for r in text.text_rake_keywords(spark, d).collect()
    )
    expect = _py_rake(docs, set(text.STOPWORDS_EN), text.RAKE_TOP_K)
    assert got == expect
    assert not any(doc_id == 3 for doc_id, *_ in got)


# ---- agg_skew_kurtosis ------------------------------------------------------


def test_skew_kurtosis_known_shapes_and_scipy_free_reference(spark, tmp_path):
    """A symmetric group must score skew 0 (exact integer symmetry) and
    the two-point ±1 distribution must score ekurt −2e6 (its m4/m2² is
    exactly 1); a right-skewed group is checked against a from-scratch
    numpy population skew/kurt at ±1 ppm."""
    sym = [10.0, 20.0, 30.0, 20.0, 10.0, 30.0]          # symmetric around 20
    twopoint = [0.0, 2.0] * 8                            # ±1 around mean 1
    skewed = [1.0] * 8 + [2.0] * 3 + [30.0]              # long right tail
    vals = sym + twopoint + skewed
    types = ["sym"] * len(sym) + ["two"] * len(twopoint) + ["skw"] * len(skewed)
    n = len(vals)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": np.int64(1),
            "event_type": types,
            "value": vals,
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    rows = {r.event_type: r for r in relational.agg_skew_kurtosis(spark, str(tmp_path)).collect()}
    assert rows["sym"].skew_ppm == 0
    assert rows["two"].skew_ppm == 0
    assert rows["two"].ekurt_ppm == -2_000_000

    x = np.array([round(v) for v in skewed], dtype=np.float64)
    mu = x.mean()
    m2 = ((x - mu) ** 2).mean()
    m3 = ((x - mu) ** 3).mean()
    m4 = ((x - mu) ** 4).mean()
    skew_ref = int(np.floor(1e6 * m3 / (m2 * np.sqrt(m2)) + 0.5))
    ekurt_ref = int(np.floor(1e6 * (m4 / (m2 * m2) - 3.0) + 0.5))
    assert abs(rows["skw"].skew_ppm - skew_ref) <= 1
    assert abs(rows["skw"].ekurt_ppm - ekurt_ref) <= 1


# ---- kg_community_modularity -------------------------------------------------


def test_modularity_two_planted_triangles(spark, tmp_path):
    """Two complete triangles bridged by one edge: an independent Python
    sync-LPA (+ exact integer modularity) must agree row-for-row, and
    the bridged triangles must score POSITIVE q_ppm (real structure)."""
    from stixtoneodb_spark.operators import graph

    # two K4 cliques whose INTERNAL minimum label dominates the invasion
    # through the bridge (sync LPA's round-1 all-tie otherwise lets the
    # global min label flood both sides — simulated before planting)
    import itertools

    k4a = list(itertools.combinations(["batch", "join", "hash", "row"], 2))
    k4b = list(itertools.combinations(["column", "customer", "filter", "scan"], 2))
    pairs = set(k4a) | set(k4b) | {("row", "scan")}
    texts = [f"{a} {b}" for a, b in sorted(pairs)]
    d = _write_docs(tmp_path, texts)
    edges = sorted(pairs | {(b, a) for a, b in pairs})
    nodes = sorted({a for a, _ in edges})
    lab = {v: v for v in nodes}
    for _ in range(graph.LPA_ITERS):
        nxt = {}
        for v in nodes:
            counts: dict = {}
            for a, b in edges:
                if a == v:
                    counts[lab[b]] = counts.get(lab[b], 0) + 1
            nxt[v] = min(counts, key=lambda l: (-counts[l], l))
        lab = nxt
    E = len(edges)
    comms = sorted(set(lab.values()))
    expect = {}
    for c in comms:
        members = [v for v in nodes if lab[v] == c]
        intra = sum(1 for a, b in edges if lab[a] == c and lab[b] == c)
        deg = sum(1 for a, _ in edges if lab[a] == c)
        q = (intra * E - deg * deg) * 1_000_000
        q = int(q / (E * E)) if q >= 0 else -int(-q / (E * E))  # trunc to 0
        expect[c] = (len(members), intra, deg, q)

    rows = {r.community: r for r in graph.kg_community_modularity(spark, d).collect()}
    assert set(rows) == set(expect)
    for c, (n_nodes, intra, deg, q) in expect.items():
        r = rows[c]
        assert (r.n_nodes, r.intra_rows, r.deg_sum, r.q_ppm) == (n_nodes, intra, deg, q)
    assert len(rows) >= 2                     # the triangles separated
    assert all(r.q_ppm > 0 for r in rows.values())


# ---- corpus_select_to_budget -------------------------------------------------


def test_budget_selection_cuts_at_exact_boundary(spark, tmp_path):
    """Hand-checkable cut: token counts 5,4,3,2,1 (priority order),
    budget = 60% of 15 = 9 -> keep 5,4 (cum 9 == budget, strict <=
    keeps it); the 3-token doc at cum 12 is out."""
    texts = [
        "a b c d e",      # 5 tokens, doc 0
        "a b c d",        # 4, doc 1
        "a b c",          # 3, doc 2
        "a b",            # 2, doc 3
        "a",              # 1, doc 4
    ]
    d = _write_docs(tmp_path, texts)
    rows = sorted(
        text.corpus_select_to_budget(spark, d).collect(), key=lambda r: r.cum_tokens
    )
    assert [(r.doc_id, r.n_tokens, r.cum_tokens) for r in rows] == [
        (0, 5, 5),
        (1, 4, 9),
    ]

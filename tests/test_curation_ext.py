"""Round-4 continuation operators: prefix-filter set-similarity join,
sweep-line concurrency, PMI edge weights, priority sampling, profiler.

All five carry FULL DuckDB oracles (registry.py, driver-compared at
sf0.01); these tests pin the regimes the fixture can't reach — planted
prefix-filter corner cases, intervals that CROSS the prefix-sum bucket
boundary (the carry path), PMI against an independent math.log
computation, priority-sampling mergeability, and null profiling.
"""

from __future__ import annotations

import hashlib
import itertools
import math

import numpy as np
import pandas as pd
import pytest

from stixtoneodb_spark.operators import dedup, graph, relational, similarity, text
from stixtoneodb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def _write_docs(tmp, texts, langs=None):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": langs if langs is not None else ["en"] * len(texts),
            "source": "planted",
            "n_chars": [len(t) if t is not None else 0 for t in texts],
        }
    )
    pdf.to_parquet(tmp / "documents.parquet")
    return str(tmp)


# ---- dedup_set_similarity_prefix ------------------------------------------


def test_prefix_filter_lossless_on_planted_borderline_pairs(spark, tmp_path):
    """Pairs engineered to sit exactly at/above/below tau=0.9, including
    sets whose ONLY shared prefix token is the globally rarest one (the
    regime where a buggy prefix length silently loses pairs)."""
    texts = []
    # family A: 20 docs = 17 shared tokens + 1 unique -> J = 17/19 < 0.9
    for i in range(20):
        texts.append(" ".join([f"a{j}" for j in range(17)] + [f"ua{i}"]))
    # family B: 15 docs = 29 shared tokens + 1 unique -> J = 29/31 >= 0.9
    for i in range(15):
        texts.append(" ".join([f"b{j}" for j in range(29)] + [f"ub{i}"]))
    # identical twins -> J = 1
    texts += ["c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"] * 2
    d = _write_docs(tmp_path, texts)

    sets = [frozenset(t.split(" ")) for t in texts]
    truth = set()
    for x, y in itertools.combinations(range(len(texts)), 2):
        inter = len(sets[x] & sets[y])
        uni = len(sets[x] | sets[y])
        if inter * dedup.SSJ_TAU_DEN >= dedup.SSJ_TAU_NUM * uni:
            truth.add((x, y))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_set_similarity_prefix(spark, d).collect()
    }
    assert got == truth
    # sanity on the construction itself: B-family and twins survive, A dies
    assert (20, 21) in truth and (35, 36) in truth and (0, 1) not in truth


def test_prefix_filter_exact_scores(spark, tmp_path):
    shared = " ".join(f"t{j}" for j in range(19))
    d = _write_docs(tmp_path, [f"{shared} x", f"{shared} y"])
    rows = dedup.dedup_set_similarity_prefix(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["inter"], r["uni"]) == (19, 21)  # 19/21 = 0.9047 >= 0.9
    assert r["jaccard_ppm"] == 19 * 1_000_000 // 21


# ---- events_max_concurrency ------------------------------------------------


def _write_events(tmp, rows):
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            # microsecond precision: Spark's parquet reader rejects NANOS
            "ts": pd.to_datetime([r[0] for r in rows], unit="s").astype(
                "datetime64[us]"
            ),
            "user_id": np.int64(1),
            "event_type": [r[2] for r in rows],
            "value": [float(r[1]) for r in rows],
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp / "events.parquet")
    return str(tmp)


def _naive_max_concurrency(rows):
    out = {}
    for typ in {r[2] for r in rows}:
        deltas = []
        for i, (t0, v, t) in enumerate(rows):
            if t != typ:
                continue
            dur = math.floor(v * 10)
            deltas.append((t0 * 1_000_000, 1, i))
            deltas.append(((t0 + dur) * 1_000_000, -1, i))
        deltas.sort()
        run = best = 0
        for _, d, _ in deltas:
            run += d
            best = max(best, run)
        out[typ] = best
    return out


def test_concurrency_carry_across_bucket_boundary(spark, tmp_path):
    """Sessions opened in hour-bucket k that stay open into bucket k+1:
    the two-pass decomposition is only correct if the carry-in offset is
    added — a local-window-only implementation reports max=1 here."""
    b = relational.CONCURRENCY_BUCKET_S
    rows = [
        # three sessions opened late in bucket 0, each 1000s long -> all
        # still open at the bucket boundary; one more opens in bucket 1
        (b - 300, 100.0, "click"),
        (b - 200, 100.0, "click"),
        (b - 100, 100.0, "click"),
        (b + 50, 10.0, "click"),  # overlaps the three carried sessions
        # a type whose peak is entirely inside one bucket
        (10, 5.0, "view"),
        (20, 5.0, "view"),
    ]
    d = _write_events(tmp_path, rows)
    got = {
        r["event_type"]: r["max_concurrent"]
        for r in relational.events_max_concurrency(spark, d).collect()
    }
    assert got == _naive_max_concurrency(rows)
    assert got["click"] == 4  # proves the carry was applied


def test_concurrency_halfopen_touching_intervals(spark, tmp_path):
    """[0,10) and [10,20): end applies before start at t=10 -> never 2."""
    rows = [(0, 1.0, "click"), (10, 1.0, "click")]
    d = _write_events(tmp_path, rows)
    got = relational.events_max_concurrency(spark, d).collect()
    assert {(r["event_type"], r["max_concurrent"]) for r in got} == {("click", 1)}


# ---- kg_pmi_edge_weights ----------------------------------------------------


def test_pmi_against_independent_log_computation(spark, tmp_path):
    """Planted marginals: 'join hash' in 4 docs, 'join' alone in 4 more,
    'hash' alone in 2 more, 10 filler docs (N=20).  PMI computed
    independently with math.log."""
    texts = (
        ["join hash"] * 4 + ["join alone"] * 4 + ["hash alone"] * 2
        + ["filler text"] * 10
    )
    d = _write_docs(tmp_path, texts)
    rows = graph.kg_pmi_edge_weights(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src"], r["dst"], r["n_ab"]) == ("hash", "join", 4)
    assert r["pmi"] == pytest.approx(round(math.log(4 * 20 / (6 * 8)), 6), abs=1e-9)
    assert r["pmi"] > 0  # co-occurring more than independence predicts


def test_pmi_negative_for_anti_correlated_pair(spark, tmp_path):
    """Both tokens frequent but rarely together -> PMI < 0."""
    texts = (
        ["join x"] * 10 + ["hash y"] * 10 + ["join hash"] * 1 + ["filler"] * 4
    )
    d = _write_docs(tmp_path, texts)
    r = graph.kg_pmi_edge_weights(spark, d).collect()[0]
    assert r["n_ab"] == 1
    assert r["pmi"] == pytest.approx(round(math.log(1 * 25 / (11 * 11)), 6), abs=1e-9)
    assert r["pmi"] < 0


# ---- corpus_sample_weighted_priority ---------------------------------------


def _py_priority(doc_id: int, n_chars: int) -> float:
    u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) + 1
    return n_chars / u


def test_priority_sample_matches_independent_reference(spark):
    """Full independent replay: hashlib md5 + python division vs the
    Spark TakeOrderedAndProject path on the real sf0.01 corpus."""
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "n_chars"]]
    docs["priority"] = [
        _py_priority(i, n) for i, n in zip(docs.doc_id, docs.n_chars)
    ]
    expect = (
        docs.sort_values(["priority", "doc_id"], ascending=[False, True])
        .head(text.PRIORITY_SAMPLE_K)
        .reset_index(drop=True)
    )
    got = (
        text.corpus_sample_weighted_priority(spark, SF)
        .orderBy("sample_rank")
        .toPandas()
    )
    assert list(got.doc_id) == list(expect.doc_id)
    assert list(got.sample_rank) == list(range(1, text.PRIORITY_SAMPLE_K + 1))


def test_priority_sample_is_mergeable(spark):
    """The 100-TB property: top-k over the union == top-k of the two
    halves' top-ks (what per-partition heaps rely on)."""
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "n_chars"]]
    docs["priority"] = [
        _py_priority(i, n) for i, n in zip(docs.doc_id, docs.n_chars)
    ]
    k = text.PRIORITY_SAMPLE_K
    key = lambda df: df.sort_values(  # noqa: E731
        ["priority", "doc_id"], ascending=[False, True]
    ).head(k)
    half1, half2 = docs.iloc[::2], docs.iloc[1::2]
    merged = key(pd.concat([key(half1), key(half2)]))
    assert list(merged.doc_id) == list(key(docs).doc_id)


# ---- profile_table_stats ----------------------------------------------------


def test_profiler_counts_nulls_and_native_minmax(spark, tmp_path):
    texts = ["bb", "aa", None, "cc"]
    d = _write_docs(tmp_path, texts, langs=["en", None, None, "de"])
    got = {
        r["col_name"]: r
        for r in relational.profile_table_stats(spark, d).collect()
    }
    assert got["text"]["n_nulls"] == 1
    assert got["text"]["n_distinct"] == 3
    assert got["lang"]["n_nulls"] == 2
    assert (got["lang"]["min_str"], got["lang"]["max_str"]) == ("de", "en")
    # numeric column profiles numerically (doc_id 0..3, min "0" not "")
    assert (got["doc_id"]["min_str"], got["doc_id"]["max_str"]) == ("0", "3")
    assert got["n_chars"]["n_rows"] == 4


# ---- layout_zorder_keys -----------------------------------------------------


def _py_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for k in range(bits):
        z |= ((x >> k) & 1) << (2 * k)
        z |= ((y >> k) & 1) << (2 * k + 1)
    return z


def test_zorder_matches_independent_bit_interleave(spark):
    rows = relational.layout_zorder_keys(spark, SF).limit(500).collect()
    assert rows
    for r in rows:
        assert r["z_key"] == _py_morton(r["x"], r["y"], relational.ZORDER_BITS)
        assert r["file_bucket"] == r["z_key"] >> 26


def test_zorder_buckets_localize_both_dimensions(spark, tmp_path):
    """The reason Z-order exists: range-bucketing the interleaved key
    bounds EACH dimension's per-bucket spread (~1/sqrt(buckets) of the
    domain for uniform data), where a single-column sort leaves the
    other dimension's spread at ~the full domain."""
    rng = np.random.default_rng(5)
    n = 4096
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(np.zeros(n), unit="s").astype("datetime64[us]"),
            "user_id": rng.integers(0, 1 << 16, n),
            "event_type": "click",
            # value*100 spans the full 16-bit y domain
            "value": rng.integers(0, 1 << 16, n) / 100.0,
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    got = relational.layout_zorder_keys(spark, str(tmp_path)).toPandas()
    spread = got.groupby("file_bucket").agg(
        x_spread=("x", lambda s: s.max() - s.min()),
        y_spread=("y", lambda s: s.max() - s.min()),
    )
    domain = float(1 << 16)
    # 64 buckets = 8x8 grid on the top 3 bits of each dim -> per-bucket
    # spread ~ domain/8; allow 2x slack for uniform-sampling noise
    assert spread.x_spread.mean() < domain / 4
    assert spread.y_spread.mean() < domain / 4


# ---- tokenizer_bpe_merges ---------------------------------------------------


def _py_bpe(word_counts: dict, n_merges: int):
    """Independent reference BPE trainer (classic dict-of-tuples form,
    Sennrich et al. fig. 1) — no shared code with the Spark loop or the
    SQL oracle."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    out = []
    for step in range(1, n_merges + 1):
        pairs: dict = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # max count, ties -> lexicographically smallest pair
        best = min(pairs, key=lambda p: (-pairs[p], p))
        out.append((step, best[0], best[1], best[0] + best[1], pairs[best]))
        new_vocab = {}
        for syms, c in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    merged.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_vocab[tuple(merged)] = new_vocab.get(tuple(merged), 0) + c
        vocab = new_vocab
    return out


def test_bpe_matches_independent_reference_on_planted_corpus(spark, tmp_path):
    texts = (
        ["low lower lowest"] * 5
        + ["new newer newest"] * 4
        + ["wide wider widest"] * 3
    )
    d = _write_docs(tmp_path, texts)
    counts: dict = {}
    for t in texts:
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    expect = _py_bpe(counts, text.BPE_MERGES)
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in text.tokenizer_bpe_merges(spark, d).orderBy("step").collect()
    ]
    assert got == expect
    # the reference corpus's signature merge: 'est' assembled from e+s+t
    assert any(m[3] == "est" for m in got) or any(
        m[3] in ("es", "st") for m in got
    )


def test_bpe_merged_tokens_compose_and_counts_bounded(spark):
    rows = text.tokenizer_bpe_merges(spark, SF).orderBy("step").collect()
    assert len(rows) == text.BPE_MERGES
    known = set()
    for r in rows:
        # each side is a single char or a previously learned merge
        for side in (r["left"], r["right"]):
            assert len(side) == 1 or side in known
        assert r["merged"] == r["left"] + r["right"]
        known.add(r["merged"])
        assert r["pair_count"] > 0


# ---- tokenizer_bpe_encode ---------------------------------------------------


def _py_bpe_apply(word: str, merges) -> list:
    """Independent reference encoder: apply each learned merge in order
    as one leftmost-nonoverlapping pass (the classic applier)."""
    syms = list(word)
    for _, left, right, merged, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (left, right):
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_reference_applier(spark, tmp_path):
    """Encoding every vocabulary word with the learned table must equal
    the independent Python train+apply — i.e. the replace-chain program
    IS the merge table."""
    texts = (
        ["low lower lowest"] * 5
        + ["new newer newest"] * 4
        + ["wide wider widest"] * 3
    )
    d = _write_docs(tmp_path, texts)
    counts: dict = {}
    for t in texts:
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    merges = _py_bpe(counts, text.BPE_MERGES)
    rows = {r["word"]: r for r in text.tokenizer_bpe_encode(spark, d).collect()}
    assert set(rows) == set(counts)
    for w, c in counts.items():
        expect = _py_bpe_apply(w, merges)
        r = rows[w]
        assert r["cnt"] == c
        assert r["n_symbols"] == len(expect), (w, r["encoding"], expect)
        assert r["encoding"] == " ".join(expect)


def test_bpe_encode_lossless_on_corpus(spark):
    """BPE invariants on the real fixture: symbols concatenate back to
    the word, and n_symbols matches the symbol list."""
    rows = text.tokenizer_bpe_encode(spark, SF).collect()
    assert rows
    for r in rows:
        syms = r["encoding"].split(" ")
        assert "".join(syms) == r["word"]
        assert r["n_symbols"] == len(syms)
        assert 1 <= r["n_symbols"] <= len(r["word"])


# ---- kg_negative_samples ----------------------------------------------------


def test_negative_samples_filtered_protocol(spark):
    """Filtered-negative invariants on the real corpus: every survivor
    is vocabulary-drawn, never a self-loop, never a true co-occurrence
    edge; sampling is deterministic; and the filter actually fired
    (fewer survivors than raw candidates)."""
    edges = {
        (r["src"], r["dst"])
        for r in graph._cooccurrence_edges(spark, SF).collect()
    }
    half = {(s, d) for s, d in edges if s < d}
    got = graph.kg_negative_samples(spark, SF).collect()
    assert got
    for r in got:
        assert (r["src"], r["dst"]) in half
        assert 0 <= r["k"] < graph.NEG_SAMPLES_K
        assert r["neg_dst"] != r["src"] and r["neg_dst"] != r["dst"]
        assert (r["src"], r["neg_dst"]) not in edges
    assert len(got) < len(half) * graph.NEG_SAMPLES_K  # anti-join fired
    again = graph.kg_negative_samples(spark, SF).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


# ---- text_token_count_arrow -------------------------------------------------


def test_arrow_token_count_equals_jvm_path(spark):
    """The mapInArrow implementation must emit exactly the JVM built-in
    path's rows — two independent implementations of the same spec."""
    a = text.text_token_count_arrow(spark, SF)
    b = text.text_token_count(spark, SF)
    assert a.schema == b.schema
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() == 500


# ---- agg_anomaly_zscore -----------------------------------------------------


def test_zscore_matches_independent_numpy_reference(spark, tmp_path):
    """Planted distribution with KNOWN outliers, checked against an
    independent numpy population-z computation."""
    rng = np.random.default_rng(9)
    base = rng.normal(100.0, 5.0, 400).round(2)
    planted = np.array([500.0, 480.0, -200.0])  # unambiguous outliers
    vals = np.concatenate([base, planted])
    rows = [(int(i), float(v)) for i, v in enumerate(vals)]
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime(np.zeros(len(rows)), unit="s").astype(
                "datetime64[us]"
            ),
            "user_id": 1,
            "event_type": "click",
            "value": [r[1] for r in rows],
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    got = {
        r["event_id"]
        for r in relational.agg_anomaly_zscore(spark, str(tmp_path)).collect()
    }
    vc = np.floor(vals * 100 + 0.5).astype(np.int64)
    z = (vc - vc.mean()) / vc.std()  # population std, like the operator
    expect = {int(i) for i in np.where(np.abs(z) > relational.ZSCORE_SIGMA)[0]}
    assert got == expect
    assert {400, 401, 402} <= got  # the planted outliers are flagged


# ---- embedding_gram_matrix --------------------------------------------------


def test_gram_matrix_matches_numpy_and_partitioning_invariant(spark):
    """Exact-moments property: the distributed integer GEMM equals a
    single-machine numpy computation bit-for-bit, regardless of
    partitioning (the float-sum version would differ run to run)."""
    from stixtoneodb_spark.operators import similarity

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(m * similarity.GRAM_SCALE + 0.5).astype(np.int64)
    full = q.T @ q
    got = {
        (r["i"], r["j"]): r["gram"]
        for r in similarity.embedding_gram_matrix(spark, SF).collect()
    }
    iu = np.triu_indices(full.shape[0])
    expect = {(int(a), int(b)): int(full[a, b]) for a, b in zip(*iu)}
    assert got == expect


# ---- dedup_sorted_neighborhood ----------------------------------------------


def test_snm_window_semantics_on_planted_corpus(spark, tmp_path):
    """Independent replay of the full SNM spec (python sort + window +
    jaccard) on a planted corpus that includes near-dups adjacent in
    sort order AND a near-dup pair pushed farther apart than the window
    by interleaved keys — the documented recall limit of SNM (the pair
    must NOT appear; LSH would find it)."""
    texts = []
    # 5 near-identical docs sharing a sort-key prefix (adjacent ranks)
    for i in range(5):
        texts.append("aaa common body tokens shared by the family " + f"v{i}")
    # a near-dup pair separated by > SNM_WINDOW interleaved 'b*' keys
    texts.append("bbb 0 pair first half tokens mostly common here")
    for i in range(dedup.SNM_WINDOW + 2):
        texts.append(f"bbb {i+1} filler interleaved row number {i} unique{i}")
    texts.append("bbb z pair first half tokens mostly common here")
    d = _write_docs(tmp_path, texts)

    # independent reference
    ranked = sorted(
        range(len(texts)), key=lambda i: (texts[i][: dedup.SNM_KEY_LEN], i)
    )
    sets = [frozenset(t.split(" ")) for t in texts]
    truth = set()
    for p in range(len(ranked)):
        for q in range(p + 1, min(p + dedup.SNM_WINDOW + 1, len(ranked))):
            a, b = ranked[p], ranked[q]
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if inter * dedup.SNM_TAU_DEN >= dedup.SNM_TAU_NUM * uni:
                truth.add((a, b))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_sorted_neighborhood(spark, d).collect()
    }
    assert got == truth
    # family pairs found; the far-apart bbb pair missed (SNM recall limit)
    assert (0, 1) in got
    far_pair = (5, len(texts) - 1)
    sa, sb = sets[far_pair[0]], sets[far_pair[1]]
    assert len(sa & sb) * dedup.SNM_TAU_DEN >= dedup.SNM_TAU_NUM * len(sa | sb)
    assert far_pair not in got  # similar but outside the window


# ---- kg_closeness_centrality ------------------------------------------------


def test_closeness_on_planted_path_graph(spark, tmp_path):
    """The oracle corpus's co-occurrence graph is complete (every pair
    d=1); this plants a PATH a-b-c-d (via PR_VOCAB members 'join',
    'hash', 'row', 'batch') so multi-hop distances and the truncating
    1e6 div d harmonic terms are actually exercised, against an
    independent python BFS."""
    texts = (
        ["join hash"] * 3 + ["hash row"] * 3 + ["row batch"] * 3
        + ["filler doc"] * 4
    )
    d = _write_docs(tmp_path, texts)
    adj = {
        "join": {"hash"}, "hash": {"join", "row"},
        "row": {"hash", "batch"}, "batch": {"row"},
    }

    def bfs(src):
        dist, frontier = {src: 0}, {src}
        for k in range(1, graph.CLOSE_MAX_D + 1):
            frontier = {
                v for u in frontier for v in adj[u] if v not in dist
            }
            for v in frontier:
                dist[v] = k
        return dist

    expect = {}
    for s in adj:
        dist = bfs(s)
        terms = [1_000_000 // dd for v, dd in dist.items() if dd > 0]
        expect[s] = (len(terms), sum(terms))
    got = {
        r["mention"]: (r["n_reachable"], r["harmonic_x1e6"])
        for r in graph.kg_closeness_centrality(spark, d).collect()
    }
    assert got == expect
    # end nodes are strictly less central than middle nodes
    assert got["join"][1] < got["hash"][1]


# ---- events_association_rules -----------------------------------------------


def test_association_rules_planted_lift(spark, tmp_path):
    """Planted baskets with a known positive- and negative-lift pair,
    checked against hand-computed support/confidence/lift."""
    # users 0-9: {click, purchase}; users 10-19: {view}; user 20: {click}
    rows = []
    eid = 0
    for u in range(10):
        for t in ("click", "purchase"):
            rows.append((eid, u, t)); eid += 1
    for u in range(10, 20):
        rows.append((eid, u, "view")); eid += 1
    rows.append((eid, 20, "click")); eid += 1
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime(np.zeros(len(rows)), unit="s").astype(
                "datetime64[us]"
            ),
            "user_id": [r[1] for r in rows],
            "event_type": [r[2] for r in rows],
            "value": 1.0,
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    got = {
        (r["ante"], r["cons"]): (r["support_ab"], r["confidence_ppm"], r["lift_ppm"])
        for r in relational.events_association_rules(spark, str(tmp_path)).collect()
    }
    # |click|=11, |purchase|=10, |both|=10, N=21
    assert got[("click", "purchase")] == (
        10, 10 * 1_000_000 // 11, 10 * 21 * 1_000_000 // (11 * 10)
    )
    assert got[("purchase", "click")] == (10, 1_000_000, 21 * 1_000_000 // 11)
    # click/view never co-occur -> pair absent entirely
    assert ("click", "view") not in got
    # lift > 1e6 (positive association) for the planted pair
    assert got[("click", "purchase")][2] > 1_000_000


# ---- corpus_decontaminate_ngrams ------------------------------------------


def test_decontaminate_planted_leak(spark, tmp_path):
    """Planted leak regimes the sf fixture can't isolate: an exact 8-gram
    leak is flagged, a 7-token overlap (one short of the span) is NOT,
    a doubly-occurring leaked window counts occurrences but one distinct
    gram, and benchmark docs never appear in the output."""
    leak = "w1 w2 w3 w4 w5 w6 w7 w8"
    texts = [
        leak + " tail0 tail1",                 # doc 0: benchmark (0 % 3)
        "pre0 " + leak + " post0",             # doc 1: one leaked window
        "w1 w2 w3 w4 w5 w6 w7 x8 y9 z10",      # doc 2: 7-token overlap only
        "a0 " + leak + " mid " + leak,         # doc 3: benchmark (3 % 3)
        "b0 " + leak + " b1 " + leak + " b2",  # doc 4: leak twice
    ]
    d = _write_docs(tmp_path, texts)
    out = {
        r["doc_id"]: (r["n_grams_hit"], r["n_gram_occurrences"])
        for r in text.decontaminate_grams(
            load_table(spark, d, "documents"), mod=3
        ).collect()
    }
    assert out == {1: (1, 1), 4: (1, 2)}


# ---- kg_link_prediction_ra -------------------------------------------------


def test_resource_allocation_planted_graph(spark):
    """Path + star components: RA scores equal 10^6 div deg(z) summed over
    common neighbors, adjacent pairs are excluded, and pairs with no
    common neighbor never appear."""
    half = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "d"),      # path a-b-c-d
            ("z", "x1"), ("z", "x2"), ("z", "x3"),   # star around z
        ],
        "src string, dst string",
    )
    out = {
        (r["src"], r["dst"]): (r["n_common"], r["ra_score_ppm"])
        for r in graph.resource_allocation(half).collect()
    }
    assert out == {
        ("a", "c"): (1, 500000),      # via b, deg(b)=2
        ("b", "d"): (1, 500000),      # via c, deg(c)=2
        ("x1", "x2"): (1, 333333),    # via z, deg(z)=3
        ("x1", "x3"): (1, 333333),
        ("x2", "x3"): (1, 333333),
    }


# ---- kg_kcore ---------------------------------------------------------------


def test_kcore_planted_cascade(spark):
    """Regimes the fixture can't reach (it peels in one round): a path
    whose peel CASCADES to empty across three rounds, and a triangle
    that sheds a pendant then stabilizes."""
    # path a-b-c-d-e at k=2: round1 drops a,e; round2 drops b,d; round3 c
    path = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    assert graph.kcore_peel(path, k=2, iters=3).count() == 0
    # one round short: c survives round 2 with degree 0 edges -> absent
    # too (no incident edges left), b/d already gone
    assert graph.kcore_peel(path, k=2, iters=2).count() == 0

    tri = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("x", "z"), ("w", "x")],
        "src string, dst string",
    )
    out = {
        r["mention"]: r["core_degree"]
        for r in graph.kcore_peel(tri, k=2, iters=3).collect()
    }
    assert out == {"x": 2, "y": 2, "z": 2}


# ---- kg_shortest_paths_weighted ---------------------------------------------


def test_bellman_ford_planted_weighted_graph(spark):
    """Weighted regimes the near-complete fixture can't isolate: a 2-hop
    detour CHEAPER than the direct edge, and the <=k-edge horizon
    returning a TRUNCATED (not final) distance for a node whose cheapest
    path needs k+1 edges."""
    rows = [
        ("s", "a", 10), ("a", "s", 10),
        ("a", "b", 10), ("b", "a", 10),
        ("s", "b", 100), ("b", "s", 100),  # direct s-b costs 100; s-a-b 20
        ("b", "c", 1), ("c", "b", 1),      # c: best 21 via 3 edges
        ("c", "d", 1), ("d", "c", 1),      # d: best 22 via 4 edges
    ]
    edges = spark.createDataFrame(rows, "src string, dst string, w long")
    out = {
        r["node"]: r["dist"]
        for r in graph.bellman_ford(edges, "s", iters=3).collect()
    }
    # d's cheapest path (s-a-b-c-d = 22) has 4 edges; at horizon 3 the
    # spec returns the best <=3-edge path (s-b-c-d = 102) — exactly what
    # the unrolled oracle computes too
    assert out == {"s": 0, "a": 10, "b": 20, "c": 21, "d": 102}
    out4 = {
        r["node"]: r["dist"]
        for r in graph.bellman_ford(edges, "s", iters=4).collect()
    }
    assert out4["d"] == 22  # one more round finds the true distance


# ---- scd2_user_history ------------------------------------------------------


def test_scd2_reopened_type_gets_new_version(spark, tmp_path):
    """A user going click -> view -> click must produce THREE versions
    (gaps-and-islands), not two groupBy-type rows; valid_to chains to the
    next run's valid_from and only the last run is current."""
    rows = [
        (100, 1.0, "click"),
        (200, 1.0, "click"),
        (300, 1.0, "view"),
        (400, 1.0, "click"),
    ]
    d = _write_events(tmp_path, rows)
    out = sorted(
        relational.scd2_user_history(spark, d).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [r["event_type"] for r in out] == ["click", "view", "click"]
    assert [r["n_events"] for r in out] == [2, 1, 1]
    assert [r["is_current"] for r in out] == [0, 0, 1]
    assert out[0]["valid_to"] == out[1]["valid_from"]
    assert out[1]["valid_to"] == out[2]["valid_from"]
    assert out[2]["valid_to"] is None


# ---- text_repetition_signals ------------------------------------------------


def test_repetition_signals_planted_extremes(spark, tmp_path):
    """Closed-form extremes: an all-same-token doc, an all-distinct doc,
    and a single-token doc (no 2-gram windows -> 0, not null)."""
    texts = [
        "x x x x",           # top=4/4, 2grams: 'x x'×3 -> dup 2/3, distinct 1/4
        "a b c d",           # top 1/4, no dup 2grams, distinct 4/4
        "solo",              # 1 token: no 2-grams at all
    ]
    d = _write_docs(tmp_path, texts)
    out = {
        r["doc_id"]: (
            r["n_tokens"], r["top_token_ppm"],
            r["dup_2gram_ppm"], r["distinct_ratio_ppm"],
        )
        for r in text.text_repetition_signals(spark, d).collect()
    }
    assert out == {
        0: (4, 1000000, 2 * 1000000 // 3, 250000),
        1: (4, 250000, 0, 1000000),
        2: (1, 1000000, 0, 1000000),
    }


# ---- kg_neighbor_jaccard ----------------------------------------------------


def test_neighbor_jaccard_detects_nonadjacent_twins(spark):
    """Alias-shaped structure: x and y never co-occur but share all
    neighbors -> jaccard 1e6; adding one extra neighbor to x drops the
    pair to 3/4; pairs with disjoint neighborhoods never appear."""
    half = spark.createDataFrame(
        [("x", "z1"), ("x", "z2"), ("x", "z3"),
         ("y", "z1"), ("y", "z2"), ("y", "z3"),
         ("w", "x")],
        "src string, dst string",
    )
    out = {
        (r["src"], r["dst"]): (r["n_common"], r["jaccard_ppm"])
        for r in graph.neighbor_jaccard(half).collect()
    }
    assert out[("x", "y")] == (3, 3 * 1000000 // 4)  # x has w too: 3/(4+3-3)
    assert out[("z1", "z2")] == (2, 1000000)          # true twins
    assert ("x", "z1") not in out                      # disjoint neighborhoods


# ---- window_rolling_range_sum / unpivot_event_counts ------------------------


def test_rolling_range_inclusive_boundary(spark, tmp_path):
    """RANGE frame semantics: the event exactly ROLLING_RANGE_S seconds
    earlier is INSIDE the frame; one second later it falls out."""
    r = relational.ROLLING_RANGE_S
    rows = [(0, 1.0, "click"), (r, 2.0, "click"), (r + 1, 4.0, "click")]
    d = _write_events(tmp_path, rows)
    out = {
        e["event_id"]: (e["trailing_cents"], e["n_trailing"])
        for e in relational.window_rolling_range_sum(spark, d).collect()
    }
    assert out[1] == (300, 2)   # t=r sees t=0 (boundary inclusive)
    assert out[2] == (600, 2)   # t=r+1 sees t=r only, not t=0


# ---- events_transition_matrix ----------------------------------------------


def test_transition_matrix_planted_chain(spark, tmp_path):
    """click,view,click,error for one user: transitions click->view,
    view->click, click->error; click's two outgoing edges split the
    conditional ppm 50/50."""
    rows = [(0, 1.0, "click"), (10, 1.0, "view"),
            (20, 1.0, "click"), (30, 1.0, "error")]
    d = _write_events(tmp_path, rows)
    out = {
        (r["src_type"], r["dst_type"]): (r["n_transitions"], r["prob_ppm"])
        for r in relational.events_transition_matrix(spark, d).collect()
    }
    assert out == {
        ("click", "view"): (1, 500000),
        ("click", "error"): (1, 500000),
        ("view", "click"): (1, 1000000),
    }


# ---- dim_calendar -----------------------------------------------------------


def test_calendar_spans_and_portable_dow(spark, tmp_path):
    """Two events 3 days apart -> 4 calendar rows; 2024-01-01 is a
    Monday (dow_monday0 = 0) and the arithmetic dow increments mod 7."""
    rows = [(0, 1.0, "click"), (3 * 86400, 1.0, "view")]  # epoch 1970 base
    d = _write_events(tmp_path, rows)
    out = sorted(
        relational.dim_calendar(spark, d).collect(), key=lambda r: r["day"]
    )
    assert len(out) == 4
    # 1970-01-01 was a Thursday -> days since Monday 1970-01-05 mod 7 = 3
    assert [r["dow_monday0"] for r in out] == [3, 4, 5, 6]
    assert out[0]["year"] == 1970 and out[0]["quarter"] == 1


# ---- text_feature_hashing ---------------------------------------------------


def test_feature_hashing_matches_hashlib(spark, tmp_path):
    """Bucket assignment replayed independently with hashlib + Counter."""
    from collections import Counter  # noqa: PLC0415

    texts = ["the quick brown fox the fox", "lazy dog dog dog"]
    d = _write_docs(tmp_path, texts)
    truth = {}
    for i, t in enumerate(texts):
        c = Counter(
            int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
            % text.FH_BUCKETS
            for tok in t.lower().split(" ")
        )
        for b, n in c.items():
            truth[(i, b)] = n
    got = {
        (r["doc_id"], r["bucket"]): r["n"]
        for r in text.text_feature_hashing(spark, d).collect()
    }
    assert got == truth


# ---- embedding_pq_codes -----------------------------------------------------


def test_pq_codes_planted_subspace_structure(spark, tmp_path):
    """Vectors built so each SUBSPACE independently matches a different
    seed: PQ must emit different codes per subspace for the same vector
    (the property scalar quantization cannot express)."""
    import pyarrow as pa  # noqa: PLC0415
    import pyarrow.parquet as pq_  # noqa: PLC0415

    n, dim = 12, 8  # PQ_M=4 subspaces of 2 dims each
    sd = dim // similarity.PQ_M
    # seed ids = the PQ_KS smallest md5('pqseed:'||i)
    order = sorted(range(n), key=lambda i: hashlib.md5(
        f"pqseed:{i}".encode()).hexdigest())
    seed_ids = order[: similarity.PQ_KS]
    # 4 well-separated subspace prototypes in R^sd
    protos = np.array([[10.0, 0.0], [0.0, 10.0], [-10.0, 0.0], [0.0, -10.0]])
    vecs = np.zeros((n, dim))
    for k, sid in enumerate(seed_ids):
        for m in range(similarity.PQ_M):
            vecs[sid, m * sd : (m + 1) * sd] = protos[k]
    # one probe vector per rotation: subspace m matches proto (m % 4)
    probe_ids = [i for i in range(n) if i not in seed_ids]
    for j, pid in enumerate(probe_ids):
        for m in range(similarity.PQ_M):
            vecs[pid, m * sd : (m + 1) * sd] = protos[(m + j) % 4] * 0.9
    pq_.write_table(
        pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }),
        str(tmp_path / "embeddings.parquet"),
    )
    out = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in similarity.embedding_pq_codes(spark, str(tmp_path)).collect()
    }
    # seed k gets code k in every subspace (it IS the codebook row)
    for k, sid in enumerate(seed_ids):
        for m in range(similarity.PQ_M):
            assert out[(sid, m)] == k
    # probe j's subspace m matches prototype (m + j) % 4
    for j, pid in enumerate(probe_ids):
        for m in range(similarity.PQ_M):
            assert out[(pid, m)] == (m + j) % 4


# ---- ann_pq_adc_topk --------------------------------------------------------


def test_pq_adc_matches_independent_numpy_replay(spark):
    """THIRD engine: the entire PQ train + encode + ADC search replayed
    in pure numpy/hashlib (no Spark, no DuckDB) on the real sf0.001
    corpus; every output row must match exactly."""
    sf = "/root/testdata/sf0.001"
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    M, KS = similarity.PQ_M, similarity.PQ_KS
    NQ, K = similarity.N_QUERIES, similarity.TOP_K
    sd = V.shape[1] // M

    order = sorted(range(len(ids)), key=lambda i: hashlib.md5(
        f"pqseed:{ids[i]}".encode()).hexdigest())
    S0 = V[order[:KS]]

    def assign(C_by_m):
        codes = np.zeros((len(ids), M), dtype=np.int64)
        for m, (cid, C) in C_by_m.items():
            sub = V[:, m * sd : (m + 1) * sd]
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = cid[np.argmin(d2, axis=1)]
        return codes

    books0 = {m: (np.arange(KS), S0[:, m * sd : (m + 1) * sd]) for m in range(M)}
    c0 = assign(books0)
    books1 = {}
    for m in range(M):
        live = sorted(set(c0[:, m]))
        C = np.stack([
            V[c0[:, m] == c, m * sd : (m + 1) * sd].mean(axis=0) for c in live
        ])
        books1[m] = (np.array(live), C)
    c1 = assign(books1)

    truth = set()
    for qpos in np.where(ids < NQ)[0]:
        qid = ids[qpos]
        dt = {}
        for m, (cid, C) in books1.items():
            sub = V[qpos, m * sd : (m + 1) * sd]
            d2 = ((C - sub[None, :]) ** 2).sum(axis=1)
            for c, d in zip(cid, d2):
                dt[(m, c)] = int(np.floor(d * 1e6))
        adc = [
            (sum(dt[(m, c1[i, m])] for m in range(M)), int(ids[i]))
            for i in range(len(ids)) if ids[i] != qid
        ]
        adc.sort()
        for rank, (micro, nid) in enumerate(adc[:K], start=1):
            truth.add((int(qid), nid, micro, rank))

    got = {
        (r["query_id"], r["neighbor_id"], r["adc_micro"], r["rank"])
        for r in similarity.ann_pq_adc_topk(spark, sf).collect()
    }
    assert got == truth


# ---- corpus_pack_sequences / corpus_language_sampling_weights ---------------


def test_pack_sequences_straddle_and_offsets(spark, tmp_path):
    """Docs of 200+100+300 tokens at PACK_LEN=256: doc1 starts in pack 0
    at offset 200 (straddles into pack 1), doc2 starts in pack 1."""
    texts = [" ".join(["w"] * n) for n in (200, 100, 300)]
    d = _write_docs(tmp_path, texts)
    out = {
        r["doc_id"]: (r["pack_id"], r["offset_in_pack"])
        for r in text.corpus_pack_sequences(spark, d).collect()
    }
    assert out == {0: (0, 0), 1: (0, 200), 2: (1, 300 - 256 + 0)}
    # doc2 start offset = 300 tokens cum -> (300 div 256, 300 mod 256)
    assert out[2] == (1, 44)


def test_language_weights_upweight_tail(spark, tmp_path):
    """100 'en' docs vs 4 'de' docs: sqrt damping gives de 2/12 of the
    budget instead of 4/104 — the tail is upweighted."""
    texts = ["x y"] * 104
    langs = ["en"] * 100 + ["de"] * 4
    d = _write_docs(tmp_path, texts, langs=langs)
    out = {
        r["lang"]: (r["isqrt_n"], r["weight_ppm"])
        for r in text.corpus_language_sampling_weights(spark, d).collect()
    }
    assert out == {"en": (10, 10 * 1000000 // 12), "de": (2, 2 * 1000000 // 12)}


# ---- dq_constraint_violations -----------------------------------------------


def test_dq_counts_planted_violations(spark, tmp_path):
    """Planted dirty data: 3 copies of one event_id (2 extra rows), one
    negative value, one out-of-domain type; shape stays 5 rows with
    explicit zeros."""
    pdf = pd.DataFrame(
        {
            "event_id": np.array([1, 1, 1, 2, 3], dtype=np.int64),
            "ts": pd.to_datetime([0, 1, 2, 3, 4], unit="s").astype(
                "datetime64[us]"
            ),
            "user_id": np.int64(7),
            "event_type": ["click", "click", "click", "zzz_bogus", "view"],
            "value": [1.0, 1.0, 1.0, 2.0, -5.0],
            "props": "{}",
        }
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    # empty-but-typed dims so the referential leg runs
    pd.DataFrame({"o_orderkey": pd.Series([1], dtype="int64"),
                  "o_custkey": pd.Series([99], dtype="int64")}).to_parquet(
        tmp_path / "orders.parquet")
    pd.DataFrame({"c_custkey": pd.Series([1], dtype="int64")}).to_parquet(
        tmp_path / "customer.parquet")
    out = {
        r["constraint"]: r["n"]
        for r in relational.dq_constraint_violations(spark, str(tmp_path)).collect()
    }
    assert out == {
        "event_id_unique": 2,
        "value_nonnegative": 1,
        "event_type_in_domain": 1,
        "user_id_not_null": 0,
        "orders_custkey_references_customer": 1,
    }


# ---- search_hybrid_rrf ------------------------------------------------------


def test_rrf_fusion_recomputed_from_component_rankings(spark):
    """Fusion recomputed in python from the three systems' own outputs:
    integer contributions, counts, and fused tie-break order."""
    sf = "/root/testdata/sf0.001"
    from collections import defaultdict  # noqa: PLC0415

    agg = defaultdict(lambda: [0, 0])
    for fn in (
        similarity.ann_cosine_topk,
        similarity.ann_ivf_topk,
        similarity.ann_pq_adc_topk,
    ):
        for r in fn(spark, sf).collect():
            key = (r["query_id"], r["neighbor_id"])
            agg[key][0] += 1
            agg[key][1] += 1000000 // (similarity.RRF_K + r["rank"])
    got = {
        (r["query_id"], r["neighbor_id"]): (
            r["n_systems"], r["rrf_micro"], r["fused_rank"]
        )
        for r in similarity.search_hybrid_rrf(spark, sf).collect()
    }
    assert set(got) == set(agg)
    for k, (n, s) in agg.items():
        assert got[k][:2] == (n, s)
    # fused_rank is the (rrf desc, neighbor asc) order within each query
    by_q = defaultdict(list)
    for (q, nb), (n, s) in agg.items():
        by_q[q].append((-s, nb))
    for q, lst in by_q.items():
        for rank, (_, nb) in enumerate(sorted(lst), start=1):
            assert got[(q, nb)][2] == rank


# ---- ann_ivfpq_topk ---------------------------------------------------------


def test_ivfpq_structure_and_planted_twin(spark, tmp_path):
    """Structural contract on the real corpus (contiguous ranks,
    ascending adc within a query, self excluded) plus a planted exact
    twin of query 0, which must achieve the minimum possible ADC sum
    (its codes ARE the per-subspace argmin of the query's own distance
    table) and rank first."""
    rows = similarity.ann_ivfpq_topk(spark, "/root/testdata/sf0.001").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
        assert r["neighbor_id"] != r["query_id"]
    for q, lst in by_q.items():
        lst.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in lst] == list(range(1, len(lst) + 1))
        adcs = [r["adc_micro"] for r in lst]
        assert adcs == sorted(adcs)

    import pyarrow as pa  # noqa: PLC0415
    import pyarrow.parquet as pq_  # noqa: PLC0415

    # a 40-vector corpus: 4^4 = 256 code tuples over 40 vectors, so the
    # twin's code tuple is almost surely unique and ADC separates it —
    # on the 500-vector corpus many vectors share code tuples and the
    # twin TIES on adc (that aliasing IS the PQ compression; asserting
    # rank-1 there would test the id tiebreak, not the index)
    rng_base = (
        pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        .sort_values("vec_id")
        .head(40)
    )
    V = np.stack(rng_base["embedding"].to_numpy()).astype(np.float64)
    twin_id = int(rng_base["vec_id"].max()) + 1
    V2 = np.vstack([V, V[rng_base["vec_id"].to_numpy() == 0]])
    ids2 = list(rng_base["vec_id"]) + [twin_id]
    pq_.write_table(
        pa.table({
            "vec_id": pa.array(ids2, pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in V2],
                                  pa.list_(pa.float32())),
        }),
        str(tmp_path / "embeddings.parquet"),
    )
    out = similarity.ann_ivfpq_topk(spark, str(tmp_path)).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in out if r["rank"] == 1}
    assert top1[0] == twin_id


# ---- sketch_count_min_tokens ------------------------------------------------


def test_cms_overestimates_only_and_is_mergeable(spark, tmp_path):
    """CMS contract: estimate >= truth for every token, at least one
    genuine collision at W=32 (non-vacuous), and cell-wise mergeability
    (sketch(A) + sketch(B) on split halves == readout basis of the
    full corpus) verified by recomputing cells with hashlib."""
    from collections import Counter  # noqa: PLC0415

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    out = {
        r["token"]: (r["n_true"], r["n_cms"])
        for r in text.sketch_count_min_tokens(spark, SF).collect()
    }
    assert all(cms >= true for true, cms in out.values())
    assert any(cms > true for true, cms in out.values())

    # independent replay: full-corpus cells == sum of half-corpus cells
    def cells_of(texts):
        c = Counter()
        for t in texts:
            for tok in t.lower().split(" "):
                for d in range(text.CMS_D):
                    b = int(hashlib.md5(f"{d}:{tok}".encode()).hexdigest()[:8],
                            16) % text.CMS_W
                    c[(d, b)] += 1
        return c

    texts = docs["text"].tolist()
    whole = cells_of(texts)
    merged = cells_of(texts[: len(texts) // 2]) + cells_of(
        texts[len(texts) // 2 :]
    )
    assert whole == merged
    # and the Spark readout equals the hashlib readout
    truth = Counter(tok for t in texts for tok in t.lower().split(" "))
    for tok, n in truth.items():
        est = min(
            whole[(d, int(hashlib.md5(f"{d}:{tok}".encode()).hexdigest()[:8],
                          16) % text.CMS_W)]
            for d in range(text.CMS_D)
        )
        assert out[tok] == (n, est)

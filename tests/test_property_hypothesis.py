"""Hypothesis property tests for the round-4 operator cores (SURVEY §5:
the property tier pins regimes the fixed-corpus oracles can't reach —
random key/time collisions, disconnected graphs, degenerate vectors).

Each test compares the Spark core against an INDEPENDENT pure-Python
reference (no shared code, no SQL).  max_examples is kept small: every
example is a full Spark job; the generators are tuned so few examples
still cover the edge regimes (empty sides, all-equal timestamps,
single-node graphs, constant vectors).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stixtoneodb_spark.operators import graph, relational, similarity

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_spark = None


def _get_spark():
    # hypothesis decorates away pytest fixtures' scoping; reuse the session
    global _spark
    if _spark is None:
        from stixtoneodb_spark.session import get_spark

        _spark = get_spark(
            app_name="stixtoneodb-hypothesis", master="local[8]", shuffle_partitions=4
        )
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


# -- as-of join ---------------------------------------------------------------

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2", "k3"]),          # few keys -> collisions
        st.integers(min_value=0, max_value=20),       # small ts range -> ties
        st.integers(min_value=0, max_value=10**6),    # payload / id
    ),
    min_size=0,
    max_size=25,
)


@SETTINGS
@given(left_rows=rows_strategy, right_rows=rows_strategy)
def test_asof_matches_python_reference(left_rows, right_rows):
    spark = _get_spark()
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t, _p) in enumerate(left_rows)] or [("z", 0, 0)],
        "k string, ts long, lid long",
    )
    right = spark.createDataFrame(
        right_rows or [("zz", 0, 0)], "k string, ts long, payload long"
    )
    got = {
        r["lid"]: (r["asof_ts"], r["asof_payload"])
        for r in relational.asof_backward_join(
            left,
            right,
            key="k",
            ts="ts",
            right_payload=("payload",),
            right_order=("payload",),
        ).collect()
    }

    # reference: for each left row, the right row with max ts <= left ts;
    # ties on ts broken by max payload (the right_order contract)
    rrows = right_rows or [("zz", 0, 0)]
    lrows = [(k, t, i) for i, (k, t, _p) in enumerate(left_rows)] or [("z", 0, 0)]
    for k, t, lid in lrows:
        cands = [(rt, p) for rk, rt, p in rrows if rk == k and rt <= t]
        expect = max(cands) if cands else (None, None)
        assert got[lid] == expect


# -- k-hop BFS ----------------------------------------------------------------

edges_strategy = st.lists(
    st.tuples(
        st.sampled_from("abcdefgh"),
        st.sampled_from("abcdefgh"),
    ),
    min_size=0,
    max_size=15,
)


@SETTINGS
@given(half_edges=edges_strategy, kmax=st.integers(min_value=1, max_value=4))
def test_khop_matches_python_bfs(half_edges, kmax):
    half = [(a, b) for a, b in half_edges if a != b]
    spark = _get_spark()
    both = half + [(b, a) for a, b in half]
    edges = spark.createDataFrame(
        both or [("y", "z")], "src string, dst string"
    )
    got = {
        r["mention"]: r["hops"]
        for r in graph.khop_reach(edges, "a", kmax).collect()
    }

    # reference BFS
    adj: dict[str, set[str]] = {}
    for s, d in both:
        adj.setdefault(s, set()).add(d)
    dist = {"a": 0}
    frontier = ["a"]
    for k in range(1, kmax + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = k
                    nxt.append(v)
        frontier = nxt
    assert got == dist


# -- SQ8 quantization ----------------------------------------------------------

vec_strategy = st.lists(
    st.floats(
        min_value=-1e6,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
        width=32,  # float32-representable, like the embeddings column
    ),
    min_size=1,
    max_size=24,
)


@SETTINGS
@given(vecs=st.lists(vec_strategy, min_size=1, max_size=8))
def test_sq8_matches_numpy(vecs):
    import numpy as np

    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, [float(np.float32(x)) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["code_sum"], r["code_checksum"], r["code_min"], r["code_max"])
        for r in similarity.sq8_code_stats(df).collect()
    }
    for i, v in enumerate(vecs):
        x = np.array(v, dtype=np.float32).astype(np.float64)
        mn, mx = x.min(), x.max()
        if mx > mn:
            codes = np.floor((x - mn) / (mx - mn) * 255.0 + 0.5).astype(np.int64)
        else:
            codes = np.zeros_like(x, dtype=np.int64)
        assert got[i] == (
            int(codes.sum()),
            int((codes * np.arange(1, len(codes) + 1)).sum()),
            int(codes.min()),
            int(codes.max()),
        )
        assert 0 <= codes.min() and codes.max() <= 255
        # reconstruction error bound: half a quantization step
        if mx > mn:
            recon = mn + codes * (mx - mn) / 255.0
            assert np.abs(recon - x).max() <= (mx - mn) / 255.0 / 2 + 1e-9 * (mx - mn)


# -- prefix-filter set-similarity join ---------------------------------------

docs_strategy = st.lists(
    st.lists(
        st.sampled_from([f"t{i}" for i in range(12)]),  # small alphabet ->
        min_size=1, max_size=10,                        # dense near-dup space
    ),
    min_size=2,
    max_size=14,
)


@given(docs_strategy)
@SETTINGS
def test_prefix_filter_join_equals_bruteforce(token_lists):
    """Losslessness of the AllPairs/PPJoin prefix filter on random
    corpora: result set == brute-force exact Jaccard >= tau over all
    pairs (duplicates, subsets, singletons, shared-rare-token-only
    pairs all arise from the generator)."""
    import tempfile

    import pandas as pd

    from stixtoneodb_spark.operators import dedup

    spark = _get_spark()
    texts = [" ".join(toks) for toks in token_lists]
    d = tempfile.mkdtemp(prefix="ssj_hyp_")
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "hyp",
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(f"{d}/documents.parquet")

    sets = [frozenset(t.split(" ")) for t in texts]
    truth = {}
    for a in range(len(sets)):
        for b in range(a + 1, len(sets)):
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if inter * dedup.SSJ_TAU_DEN >= dedup.SSJ_TAU_NUM * uni:
                truth[(a, b)] = (inter, uni)
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["uni"])
        for r in dedup.dedup_set_similarity_prefix(spark, d).collect()
    }
    assert got == truth


# -- sweep-line max concurrency ------------------------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9000),   # spans 3 hour-buckets
        st.integers(min_value=0, max_value=5000),   # durations cross buckets
        st.sampled_from(["a", "b"]),
    ),
    min_size=1,
    max_size=25,
)


@given(events_strategy)
@SETTINGS
def test_concurrency_two_pass_equals_naive_sweep(evs):
    """The bucketed two-pass prefix-sum decomposition equals a naive
    single-pass python sweep on random interval sets — including zero
    durations, identical timestamps, and intervals spanning multiple
    carry buckets."""
    import tempfile

    import pandas as pd

    spark = _get_spark()
    d = tempfile.mkdtemp(prefix="conc_hyp_")
    pd.DataFrame(
        {
            "event_id": range(len(evs)),
            "ts": pd.to_datetime([e[0] for e in evs], unit="s").astype(
                "datetime64[us]"
            ),
            "user_id": 1,
            "event_type": [e[2] for e in evs],
            # value*10 must floor back to the integer duration
            "value": [e[1] / 10.0 for e in evs],
            "props": "{}",
        }
    ).to_parquet(f"{d}/events.parquet")

    expect = {}
    for typ in {e[2] for e in evs}:
        deltas = []
        for t0, dur10, t in evs:
            if t != typ:
                continue
            dur = math.floor((dur10 / 10.0) * 10)  # replay the operator spec
            deltas.append((t0 * 1_000_000, 1))
            deltas.append(((t0 + dur) * 1_000_000, -1))
        deltas.sort()
        run = best = 0
        for _t, dl in deltas:
            run += dl
            best = max(best, run)
        expect[typ] = best
    got = {
        r["event_type"]: r["max_concurrent"]
        for r in relational.events_max_concurrency(spark, d).collect()
    }
    assert got == expect

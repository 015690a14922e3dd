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

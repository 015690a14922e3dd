"""Iterative graph tier: duplicate-cluster CC and weighted PageRank.

Both operators also carry FULL DuckDB oracles (registry.py) — the driver
hash-compares them at sf0.01; these tests pin the algorithmic invariants
the oracle can't see (transitive closure vs an independent Python union-
find, PageRank vs an independent numpy power iteration, mass conservation).
"""

from __future__ import annotations

import numpy as np

from stixtoneodb_spark.operators import dedup, graph

SF = "/root/testdata/sf0.01"


def _union_find_clusters(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Independent reference: union-find over the pair graph, cluster id =
    min member (no shared code with the Spark loop or the SQL oracle)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_cluster_components_match_union_find(spark):
    pairs = [
        (r["id_a"], r["id_b"])
        for r in dedup.dedup_minhash_lsh(spark, SF).select("id_a", "id_b").collect()
    ]
    assert pairs, "fixture must contain near-dup pairs"
    expected = _union_find_clusters(pairs)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in graph.dedup_cluster_components(spark, SF).collect()
    }
    assert got == expected


def test_cluster_components_transitive_chain(spark):
    """A~B and B~C land in ONE cluster even when A~C was never a pair —
    the property pairwise dedup alone cannot express."""
    pairs = [
        (r["id_a"], r["id_b"])
        for r in dedup.dedup_minhash_lsh(spark, SF).select("id_a", "id_b").collect()
    ]
    clusters = graph.dedup_cluster_components(spark, SF).collect()
    cid = {r["doc_id"]: r["cluster_id"] for r in clusters}
    for a, b in pairs:
        assert cid[a] == cid[b]
    # cluster id is the min member
    by_cluster: dict[int, list[int]] = {}
    for d, c in cid.items():
        by_cluster.setdefault(c, []).append(d)
    for c, members in by_cluster.items():
        assert c == min(members)


def _numpy_pagerank(edges: list[tuple[str, str, float]], d: float, iters: int):
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for u, v, w in edges:
        W[idx[u], idx[v]] = w
    wout = W.sum(axis=1, keepdims=True)
    P = W / wout
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        pr = (1.0 - d) / n + d * (P.T @ pr)
    return dict(zip(nodes, pr))


def test_pagerank_matches_numpy_power_iteration(spark):
    rows = graph.kg_pagerank(spark, SF).collect()
    got = {r["mention"]: r["pagerank"] for r in rows}
    assert set(got) == set(graph.PR_VOCAB)

    # rebuild the weighted symmetric edge list independently (pure python
    # over the raw parquet via Spark scan; weights = co-mention doc counts)
    import itertools

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    from collections import Counter

    w: Counter = Counter()
    for r in docs:
        toks = sorted({t for t in r["text"].lower().split(" ") if t in graph.PR_VOCAB})
        for a, b in itertools.combinations(toks, 2):
            w[(a, b)] += 1
    edges = [(a, b, float(c)) for (a, b), c in w.items()]
    edges += [(b, a, c) for a, b, c in edges]
    ref = _numpy_pagerank(edges, graph.PR_DAMPING, graph.PR_ITERS)
    for k, v in ref.items():
        assert abs(got[k] - v) < 2e-6, (k, got[k], v)


def test_pagerank_conserves_mass(spark):
    """No dangling nodes in a symmetrized graph → total PageRank mass is
    exactly 1 each iteration (up to the 6-decimal output rounding)."""
    rows = graph.kg_pagerank(spark, SF).collect()
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < len(rows) * 5e-7 + 1e-9


# -- triangle / k-hop tier (planted sparse graphs; the oracle corpus's
# co-occurrence graph is complete, so depth/selectivity live here) --------

def test_triangles_planted_sparse_graph(spark):
    """Path a-b-c-d (no triangle) + planted triangle x-y-z + a chord that
    closes exactly one more triangle (b-c-e): counts must credit only true
    corners, once per triangle."""
    fwd = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "d"),     # path: no triangle
            ("x", "y"), ("x", "z"), ("y", "z"),     # planted triangle
            ("b", "e"), ("c", "e"),                 # closes (b, c, e)
        ],
        "src string, dst string",
    )
    got = {r["mention"]: r["n_triangles"] for r in graph.triangles_per_node(fwd).collect()}
    assert got == {"x": 1, "y": 1, "z": 1, "b": 1, "c": 1, "e": 1}


def test_triangles_complete_graph_closed_form(spark):
    """K_n: every node sits in C(n-1, 2) triangles — the closed form the
    oracle-scale run also lands on (K12 -> 55)."""
    n = 6
    nodes = [f"n{i}" for i in range(n)]
    fwd = spark.createDataFrame(
        [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]],
        "src string, dst string",
    )
    got = {r["mention"]: r["n_triangles"] for r in graph.triangles_per_node(fwd).collect()}
    assert got == {v: (n - 1) * (n - 2) // 2 for v in nodes}


def test_khop_chain_depths(spark):
    """Chain s-1-2-3-4: BFS at kmax=3 must assign exact depths, exclude the
    4th-hop node, and keep min-depth when a shortcut exists."""
    half = [("s", "h1"), ("h1", "h2"), ("h2", "h3"), ("h3", "h4"), ("s", "h2")]
    edges = spark.createDataFrame(
        half + [(b, a) for a, b in half], "src string, dst string"
    )
    got = {r["mention"]: r["hops"] for r in graph.khop_reach(edges, "s", 3).collect()}
    # s-h2 shortcut makes h2 depth 1 and h3 depth 2, pulling h4 into range
    assert got == {"s": 0, "h1": 1, "h2": 1, "h3": 2, "h4": 3}


def test_khop_disconnected_component_excluded(spark):
    half = [("s", "a"), ("p", "q")]
    edges = spark.createDataFrame(
        half + [(b, a) for a, b in half], "src string, dst string"
    )
    got = {r["mention"]: r["hops"] for r in graph.khop_reach(edges, "s", 3).collect()}
    assert got == {"s": 0, "a": 1}


def _undirect(spark, pairs):
    half = spark.createDataFrame(pairs, "src string, dst string")
    return half.unionByName(half.selectExpr("dst as src", "src as dst"))


def test_label_propagation_two_cliques_weak_bridge(spark):
    """Planted structure LPA must recover: two 4-cliques joined by ONE
    bridge edge.  After round 1 every clique member holds its clique's
    min label (each node sees 3 same-clique neighbors vs at most 1
    cross); further rounds are stable — communities = the two cliques.
    The bridge endpoints stay with their own cliques because the
    in-clique majority (3) beats the single bridge neighbor."""
    a = ["a1", "a2", "a3", "a4"]
    b = ["b1", "b2", "b3", "b4"]
    pairs = [(x, y) for c in (a, b) for i, x in enumerate(c) for y in c[i + 1 :]]
    pairs.append(("a1", "b1"))  # weak bridge
    got = {
        r["mention"]: r["community"]
        for r in graph.label_propagation(_undirect(spark, pairs), graph.LPA_ITERS).collect()
    }
    assert {got[x] for x in a} == {"a1"}
    assert {got[x] for x in b} == {"b1"}


def test_label_propagation_tie_breaks_to_smallest_label(spark):
    """A node with equal-count neighbor labels takes the lexicographically
    smallest (the deterministic sync-LPA tie rule both engines run).
    Star center 'm' with leaves x,y after one round: every leaf saw only
    'm'; 'm' saw {x, y} equally often -> 'x'.  Round 2: leaves see 'x',
    center sees {'m'} twice -> 'm'.  Round 3: leaves -> 'm', center 'x'.
    Exactly LPA_ITERS=3 rounds — the test pins the fixed-iteration spec
    (a converge-check would make the oracle unreplayable)."""
    got = {
        r["mention"]: r["community"]
        for r in graph.label_propagation(
            _undirect(spark, [("m", "x"), ("m", "y")]), 3
        ).collect()
    }
    assert got == {"m": "x", "x": "m", "y": "m"}

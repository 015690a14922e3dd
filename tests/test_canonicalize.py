"""S3 — canonicalization unit tests: CC correctness on a known graph,
LSH blocking merges known surface variants, determinism."""

import pyspark.sql.functions as F

from stixtoneodb_spark.plans.canonicalize import (
    canonical_map,
    candidate_pairs,
    connected_components,
)


def test_connected_components_on_known_graph(spark):
    # components: {a,b,c,d} (chain), {x,y}, singleton z not in edges —
    # asserted on BOTH tiers: the driver union-find fast path (default at
    # this size) and the distributed star loop (forced via
    # driver_max_edges=0); the two must agree exactly.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "name_a string, name_b string",
    )
    for cap in (None, 0):
        cc = connected_components(edges) if cap is None else connected_components(
            edges, driver_max_edges=0
        )
        comp = {r.name: r.component for r in cc.collect()}
        assert comp["a"] == comp["b"] == comp["c"] == comp["d"] == "a"
        assert comp["x"] == comp["y"] == "x"


def test_connected_components_chain_converges_logarithmically(spark):
    # long path graph: worst case for naive propagation; star algorithm
    # must still converge within max_iter (forced distributed — the tiny
    # graph would otherwise take the driver fast path)
    n = 60
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)],
        "name_a string, name_b string",
    )
    comp = connected_components(edges, max_iter=20, driver_max_edges=0)
    assert comp.select("component").distinct().count() == 1


def test_connected_components_paths_agree_on_random_graph(spark):
    # property: driver union-find tier ≡ distributed star loop on a
    # pseudo-random multi-component graph (seeded — deterministic)
    import random

    rng = random.Random(7)
    nodes = [f"v{i:03d}" for i in range(120)]
    edges_py = [
        (a, b)
        for a, b in (
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
        )
        if a != b
    ]
    edges = spark.createDataFrame(edges_py, "name_a string, name_b string")
    fast = {
        (r.name, r.component) for r in connected_components(edges).collect()
    }
    dist = {
        (r.name, r.component)
        for r in connected_components(edges, driver_max_edges=0).collect()
    }
    assert fast == dist


def test_lsh_merges_surface_variants(spark):
    names = spark.createDataFrame(
        [("zeus",), ("zeus trojan",), ("wannacry",), ("wannacry ransomware",), ("metasploit",)],
        "name string",
    )
    pairs = {(r.name_a, r.name_b) for r in candidate_pairs(names).collect()}
    assert ("zeus", "zeus trojan") in pairs
    assert ("wannacry", "wannacry ransomware") in pairs
    # metasploit matches nothing
    assert not any("metasploit" in p for p in pairs)


def test_canonical_map_deterministic_across_runs(spark):
    mentions = spark.createDataFrame(
        [("c1", 0, "Zeus", "malware"), ("c1", 1, "zeus trojan", "malware"),
         ("c2", 0, "MITRE Corp", "identity"), ("c2", 1, "mitre", "identity")],
        "conv_id string, turn_idx int, surface string, entity_type string",
    )
    m1 = {r.name: r.canonical_id for r in canonical_map(mentions).collect()}
    m2 = {r.name: r.canonical_id for r in canonical_map(mentions).collect()}
    assert m1 == m2
    assert m1["zeus"] == m1["zeus trojan"]
    # "MITRE Corp" and "mitre" both normalize to the single name "mitre"
    # (corporate stop-token drop) — the cheap exact tier already merged them
    assert "mitre" in m1 and "mitre corp" not in m1


def test_singletons_get_their_own_component(spark):
    mentions = spark.createDataFrame(
        [("c1", 0, "completely unique entity xyz", "tool")],
        "conv_id string, turn_idx int, surface string, entity_type string",
    )
    rows = canonical_map(mentions).collect()
    assert len(rows) == 1
    assert rows[0].canonical_label == "completely unique entity xyz"


def test_canonical_name_translate_equals_regex_and_array_forms(spark):
    """The translate-based canonicalizer (the hot-path implementation —
    the regex chain measured FLAT across cores) must equal BOTH oracle
    forms on every mention surface the corpus generates plus crafted
    edges."""
    from pyspark.sql import functions as F

    from stixtoneodb_spark.functions.textfns import (
        canonical_name,
        canonical_name_hof,
        canonical_name_regex,
    )
    from stixtoneodb_spark.plans import assemble, extract
    from stixtoneodb_spark.sources.transcripts import transcripts_df

    surfaces = extract.detect_mentions(
        assemble.normalize_turns(transcripts_df(spark, 60))
    ).select("surface")
    crafted = spark.createDataFrame(
        [("The MITRE Corporation",), ("corp",), ("the the the",), ("groupx group",),
         ("Acme-Bank, Inc.",), ("  spaced   out  ",), ("",),
         ("tabs\tand\nnewlines",), ("semi;colon:duo",), ("a!@#$%^&*()b",),
         ('quote"back`tick',), ("under_score-dash",), ("~tilde{brace}[bracket]",),
         # non-ASCII (round-3 advice): the translate fast path can't map
         # these — the operator must route them to the regex form so the
         # documented strip-[^a-z0-9 ] semantics hold for every input
         ("Café Corp",), ("naïve systems",), ("Ωmega-Bank",),
         ("ACMÉ—Group",), ("日本 acme 株式会社",), ("ascii and émoji 🚀 mix",)],
        "surface string",
    )
    both = surfaces.unionByName(crafted).select(
        "surface",
        canonical_name(F.col("surface")).alias("tr_form"),
        canonical_name_regex(F.col("surface")).alias("re_form"),
        canonical_name_hof(F.col("surface")).alias("arr_form"),
    )
    bad = both.where(
        (F.col("tr_form") != F.col("re_form")) | (F.col("tr_form") != F.col("arr_form"))
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_normalize_translate_equals_regex_form(spark):
    """`normalize` (translate form, hot shingle path) == the regex form
    on corpus texts and crafted whitespace edges."""
    from pyspark.sql import functions as F

    from stixtoneodb_spark.functions.textfns import normalize, normalize_regex
    from stixtoneodb_spark.sources.transcripts import transcripts_df

    texts = transcripts_df(spark, 40).select(F.col("text").alias("t"))
    crafted = spark.createDataFrame(
        [("  lead",), ("trail  ",), ("a\t\tb",), ("x\n\r\x0b\x0cy",),
         ("   ",), ("",), ("one two",)],
        "t string",
    )
    both = texts.unionByName(crafted).select(
        normalize(F.col("t")).alias("tr"), normalize_regex(F.col("t")).alias("re")
    )
    assert both.where(F.col("tr") != F.col("re")).count() == 0


def test_candidate_pairs_plan_guard_is_broadcast_semi(spark):
    """Plan proof for the narrow-first pair generation (round-5 S3 fix):
    block extraction must execute as a broadcast SEMI-join against the
    tiny useful-band set (2 ≤ bn ≤ MAX_BLOCK — map-side probe; the
    vocabulary-scale keys frame is never re-shuffled wide just to find
    multi-member blocks), and pair expansion must be an aggregate +
    explode, never a band self-join: no SortMergeJoin may appear
    anywhere in the executed plan."""
    names = spark.createDataFrame(
        [("zeus",), ("zeus trojan",), ("poison ivy",), ("poisonivy rat",),
         ("acme systems",), ("acme system",), ("mitre",), ("unrelated word",)],
        "name string",
    )
    pairs = candidate_pairs(names, threshold=0.55)
    pairs.collect()  # finalize AQE so the executed plan is the real one
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, "useful-band guard lost its semi-join form"
    assert "BroadcastHashJoin" in plan, "guard semi-join not broadcast"
    assert "SortMergeJoin" not in plan, "a vocabulary-scale sort-merge join re-entered S3"


def test_candidate_pairs_oversized_band_dropped_wholly(spark, monkeypatch):
    """Whole-block-drop semantics survive the guard rewrite.

    Family design makes the drop observable in isolation: every member
    carries the SAME identifier token ``shared01`` (two digits), so the
    names are LSH-exempt (identifier-bearing names never enter MinHash
    banding) and ``tok:shared01`` is the family's only multi-member
    blocking key; the shared identifier also means the id-conflict rule
    rejects nothing (both sides carry identifiers and share one).  The
    single-char member suffixes keep pairwise weighted Jaccard well
    above the 0.55 threshold, so verification passes once blocked.
    With MAX_BLOCK below the family size the band is degenerate →
    ZERO pairs; above it, the full C(8,2) pair set emerges."""
    from stixtoneodb_spark.plans import canonicalize as C

    fam = [(f"shared01 member{c}",) for c in "abcdefgh"]
    names = spark.createDataFrame(fam, "name string")

    monkeypatch.setattr(C, "MAX_BLOCK", 4)  # family of 8 > 4: band dropped
    assert C.candidate_pairs(names, threshold=0.55).count() == 0

    monkeypatch.setattr(C, "MAX_BLOCK", 32)  # band admitted: all pairs verify
    assert C.candidate_pairs(names, threshold=0.55).count() == 8 * 7 // 2

"""Graph-analytics operator queries (SURVEY §2 Part B, iterative tier).

These expose the engine's iterative graph primitives as first-class
registry queries with FULL cross-engine oracles — previously the
alternating large-star/small-star connected-components loop (the heart of
entity canonicalization, plans/canonicalize.py) was verified only by
property tests; here the DuckDB oracle independently re-computes the same
fixpoint via a recursive CTE, so any drift in the loop (orientation,
min-selection, convergence handling) breaks the hash match.

Reference parity: StixToNeoDB has no graph analytics (it delegates
"very large data sets processing" to external graph tools,
/root/reference/README.md:25-27) — this tier is the Spark-first
replacement for that delegation: the same node/edge tables the pipeline
materializes stay queryable in-engine.

Each function takes (spark, sf_dir) and returns a DataFrame; the matching
oracle SQL lives in ``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stixtoneodb_spark.operators import dedup
from stixtoneodb_spark.operators.text import _ws_tokens
from stixtoneodb_spark.plans.canonicalize import connected_components
from stixtoneodb_spark.sources.tables import load_table

# PageRank protocol constants — shared with the oracle SQL (registry.py
# interpolates them, so both engines always run the same spec).
PR_DAMPING = 0.85
PR_ITERS = 5
PR_VOCAB = (
    "join", "hash", "row", "batch", "scan", "customer",
    "column", "filter", "merge", "vector", "stream", "window",
)


def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS from near-dup pairs: connected components over
    the MinHash-LSH pair graph.

    Pairwise dedup (dedup_minhash_lsh) emits edges; the training-data
    pipeline needs the transitive families (keep one doc per cluster, drop
    the rest) — A~B and B~C put A,C in one cluster even when the A-C
    jaccard sits below the floor.  This runs the SAME alternating
    large-star/small-star loop the entity canonicalizer uses
    (plans/canonicalize.py:273), so the DuckDB oracle's recursive-CTE
    closure independently verifies the engine's iterative CC primitive.

    Output: (doc_id, cluster_id) for every doc in at least one near-dup
    pair; cluster_id = min doc_id of the component.

    Scale shape: input is the PAIR graph (orders of magnitude smaller than
    the corpus — one row per verified near-dup pair), the loop is O(log n)
    rounds of vocabulary-scale shuffles with per-round lineage truncation;
    at 100 TB the corpus never re-enters the loop.  Doc ids ride as
    zero-padded fixed-width strings so the loop's lexicographic min is the
    numeric min (the CC primitive is string-keyed for the name graph).
    """
    pairs = dedup.dedup_minhash_lsh(spark, sf_dir)
    edges = pairs.select(
        F.format_string("%012d", F.col("id_a")).alias("name_a"),
        F.format_string("%012d", F.col("id_b")).alias("name_b"),
    )
    cc = connected_components(edges)
    return cc.select(
        F.col("name").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
    )


def kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the entity co-occurrence graph, fixed
    ``PR_ITERS`` iterations at damping ``PR_DAMPING``.

    Nodes are gazetteer entities (PR_VOCAB), undirected edges weighted by
    the number of documents co-mentioning the pair; the random walk
    follows edges with probability proportional to weight:

        pr_{k+1}(v) = (1-d)/N + d * sum_{u~v} pr_k(u) * w(u,v) / wout(u)

    The iteration count is FIXED (not convergence-tested) so the oracle
    can unroll the identical ``PR_ITERS`` steps in SQL — both engines run
    the same spec by construction; scores are rounded to 6 decimals
    (double partial-sum ordering differs across engines ~1e-15).

    Scale shape: the graph is entity-vocabulary scale, not corpus scale —
    built from one distinct + one self-join on doc_id like
    kg_cooccurrence.  Each iteration is one edges⋈pr shuffle join on src
    plus a groupBy(dst) partial agg; ``localCheckpoint(eager)`` per
    iteration truncates the lineage exactly as the CC loop does (without
    it the plan doubles per iteration).  The node count N is a driver
    scalar (one count on the vocabulary-scale node set).
    """
    d = load_table(spark, sf_dir, "documents")
    m = (
        d.select("doc_id", F.explode(_ws_tokens(F.col("text"))).alias("token"))
        .where(F.col("token").isin(*PR_VOCAB))
        .distinct()
    )
    a = m.select("doc_id", F.col("token").alias("src"))
    b = m.select("doc_id", F.col("token").alias("dst"))
    half = (
        a.join(b, "doc_id")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).localCheckpoint(eager=True)
    outw = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    n = nodes.count()  # vocabulary-scale driver scalar

    pr = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(outw, "src")
            .join(pr, pr.node == F.col("src"))
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("w") / F.col("wout")).alias("c"))
        )
        pr = (
            nodes.join(contrib, nodes.node == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.lit((1.0 - PR_DAMPING) / n)
                    + F.lit(PR_DAMPING) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr.select(F.col("node").alias("mention"), F.round("pr", 6).alias("pagerank"))


KHOP_SEED = "join"
KHOP_MAX = 3


def _cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected entity co-occurrence edges over PR_VOCAB (both
    orientations), deduplicated — the shared base graph for the triangle
    and k-hop operators.  Vocabulary-scale: one distinct + one doc_id
    self-join, exactly kg_pagerank's edge builder minus the weights."""
    d = load_table(spark, sf_dir, "documents")
    m = (
        d.select("doc_id", F.explode(_ws_tokens(F.col("text"))).alias("token"))
        .where(F.col("token").isin(*PR_VOCAB))
        .distinct()
    )
    a = m.select("doc_id", F.col("token").alias("src"))
    b = m.select("doc_id", F.col("token").alias("dst"))
    half = (
        a.join(b, "doc_id")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def kg_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count over the entity co-occurrence graph — the
    clustering/cohesion primitive (KG quality: a mention whose neighbors
    also co-occur is a well-attested entity; one whose aren't is likely
    noise).

    Algorithm: the oriented node-iterator.  Triangles are enumerated once
    each on the DIRECTED a<b<c orientation (two self-joins: wedge
    (a<b, b<c) closed by the (a,c) edge), then each triangle credits its
    three corners via a 3-way explode + count.

    Scale shape: the orientation bounds the wedge join — on a power-law
    graph orienting low→high DEGREE (not name) caps per-node out-degree
    near sqrt(|E|), which is the standard trick at billions of edges; at
    vocabulary scale the lexicographic orientation keeps both engines
    trivially in agreement, and the docstring records the degree-ordered
    variant as the 100-TB swap-in.  All joins are on entity names
    (vocabulary-scale, broadcastable).
    """
    fwd = _cooccurrence_edges(spark, sf_dir).where(F.col("src") < F.col("dst"))
    return triangles_per_node(fwd)


def triangles_per_node(fwd: DataFrame) -> DataFrame:
    """Core triangle counter over a DIRECTED (src < dst oriented,
    deduplicated) edge DataFrame — factored out so property tests can
    plant sparse graphs (the documents co-occurrence graph is complete at
    oracle scale, which exercises the algebra but not the selectivity)."""
    e1 = fwd.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = fwd.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = fwd.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("mention")
    )
    return corners.groupBy("mention").agg(F.count("*").alias("n_triangles"))


def kg_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-hop reachability (bounded BFS) from a seed entity over the
    co-occurrence graph: (mention, hops) with hops = shortest path length
    <= KHOP_MAX from KHOP_SEED — the 'expand the neighborhood of this
    entity' KG exploration query.

    Algorithm: frontier-expansion BFS as iterative DataFrame joins —
    reached holds (node, min-hops so far); each round joins the NEW
    frontier to the edge list, anti-joins already-reached nodes, and
    unions in the next frontier at hops k+1.  The loop is K = KHOP_MAX
    fixed rounds so the DuckDB recursive-CTE oracle (bounded depth +
    MIN(d) collapse) replays the identical spec.

    Scale shape: each round shuffles only frontier⋈edges (frontier is the
    ring, not the full reached set); lineage is truncated per round with
    eager localCheckpoint exactly like the CC/PageRank loops.  At 100 TB
    the same loop runs on the materialized edge table with the frontier
    broadcast while it stays small.
    """
    edges = _cooccurrence_edges(spark, sf_dir)
    return khop_reach(edges, KHOP_SEED, KHOP_MAX)


def khop_reach(edges: DataFrame, seed: str, kmax: int) -> DataFrame:
    """Core bounded BFS over an undirected (both-orientations) edge
    DataFrame — factored out for planted sparse-graph tests (the oracle
    corpus's co-occurrence graph is complete, so every node is 1 hop)."""
    edges = edges.localCheckpoint(eager=True)
    spark_seed = edges.sparkSession.createDataFrame(
        [(seed, 0)], "node string, hops int"
    )
    reached = spark_seed.localCheckpoint(eager=True)
    frontier = reached
    for k in range(1, kmax + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(reached.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(k))
        )
        frontier = nxt.localCheckpoint(eager=True)
        reached = reached.unionByName(frontier).localCheckpoint(eager=True)
    return reached.select(F.col("node").alias("mention"), "hops")


# Label-propagation protocol constants — interpolated into the oracle SQL
# so both engines always run the same spec.
LPA_ITERS = 3


def kg_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection via SYNCHRONOUS label propagation over the
    entity co-occurrence graph — the cheap community primitive
    (Raghavan et al. 2007) for grouping related entities without a
    modularity solve.

    Deterministic spec (async LPA is run-order dependent; this is the
    synchronous variant with a total tie-break, so the DuckDB oracle can
    unroll the identical ``LPA_ITERS`` rounds):

    - round 0: label(v) = v;
    - round k: label(v) = the most frequent label among v's neighbors at
      round k-1, ties broken by the lexicographically SMALLEST label
      (implemented as min over struct(-count, label) — one expression,
      no window);
    - exactly ``LPA_ITERS`` rounds (fixed-iteration, like the PageRank
      loop — convergence detection would make the oracle unreplayable).

    Scale shape: each round is one edge-scale join (labels attach to the
    dst side) + one (node, label) partial-agg groupBy + one per-node
    min-struct agg — the semi-ring iteration shape; lineage truncated per
    round with eager localCheckpoint exactly like the CC/PageRank loops.
    At 100 TB the label frame is node-cardinality (broadcastable while
    the vocabulary allows; shuffle join on node past that).
    """
    edges = _cooccurrence_edges(spark, sf_dir)
    return label_propagation(edges, LPA_ITERS)


def label_propagation(edges: DataFrame, iters: int) -> DataFrame:
    """Core synchronous LPA over an undirected (both-orientations,
    deduplicated) edge DataFrame — factored out for planted sparse-graph
    tests (the oracle corpus's co-occurrence graph is complete, which
    exercises the algebra but not community separation)."""
    edges = edges.localCheckpoint(eager=True)
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        nbr = edges.join(labels, edges.dst == labels.node).select(
            F.col("src").alias("node"), "label"
        )
        counts = nbr.groupBy("node", "label").agg(F.count("*").alias("c"))
        labels = (
            counts.groupBy("node")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"), "label")).alias("m"))
            .select("node", F.col("m.label").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels.select(F.col("node").alias("mention"), F.col("label").alias("community"))


def kg_pmi_edge_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information weights for KG co-occurrence edges —
    the standard edge-scoring step between extraction and materialize
    (raw co-occurrence counts over-weight frequent entities; PMI
    normalizes by marginal frequency so "rare pair that always co-occurs"
    outranks "two ubiquitous entities that collide by chance").

    PMI(a,b) = ln( P(a,b) / (P(a)·P(b)) ) = ln( n_ab·N / (n_a·n_b) )
    with document-level probabilities: n_ab = docs containing both, n_a =
    docs containing a, N = corpus size.  Reported rounded to 6 dp (the
    ln argument is an exact integer ratio computed identically on both
    engines; same convention as kg_pagerank).

    Scale shape: the pair counts come from the vocabulary-bounded distinct
    (doc, token) self-join (per-doc fan-out ≤ |V|²); marginals are a
    vocabulary-cardinality aggregate joined back via broadcast; N rides
    the plan as a broadcast 1-row aggregate (no count() barrier).  At
    100 TB nothing here shuffles more than (doc_id, token) pairs once.
    """
    d = load_table(spark, sf_dir, "documents")
    m = (
        d.select("doc_id", F.explode(_ws_tokens(F.col("text"))).alias("token"))
        .where(F.col("token").isin(*PR_VOCAB))
        .distinct()
    )
    pair = (
        m.select("doc_id", F.col("token").alias("src"))
        .join(m.select("doc_id", F.col("token").alias("dst")), "doc_id")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_ab"))
    )
    marg = m.groupBy("token").agg(F.count("*").alias("n_tok"))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    return (
        pair.join(F.broadcast(marg.withColumnRenamed("token", "src")
                  .withColumnRenamed("n_tok", "n_a")), "src")
        .join(F.broadcast(marg.withColumnRenamed("token", "dst")
              .withColumnRenamed("n_tok", "n_b")), "dst")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "src",
            "dst",
            "n_ab",
            F.round(
                F.log((F.col("n_ab") * F.col("n_docs"))
                      / (F.col("n_a") * F.col("n_b"))),
                6,
            ).alias("pmi"),
        )
    )


NEG_SAMPLES_K = 4


def kg_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative sampling for KG-embedding training (TransE/DistMult
    style): for every true co-occurrence edge, propose ``NEG_SAMPLES_K``
    corrupted tails drawn DETERMINISTICALLY from the entity vocabulary
    (md5 of (src, dst, k) — reproducible across engines, partitionings
    and reruns; no rand()), then keep only corruptions that are NOT true
    edges and not self-loops — the filtered-negative protocol.

    Scale shape: the vocabulary index is a vocabulary-cardinality frame
    (broadcast); candidate generation is a map-side explode (K rows per
    edge); the only non-broadcast join is the LEFT ANTI against the true
    edge set on (src, neg_dst) — the standard negatives-vs-truth check,
    keyed exactly like the edge table so it co-partitions with it at
    100 TB.  Output: (src, dst, k, neg_dst) for surviving corruptions.
    """
    edges = _cooccurrence_edges(spark, sf_dir)
    half = edges.where(F.col("src") < F.col("dst"))
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(_ws_tokens(F.col("text"))).alias("entity"))
        .where(F.length("entity") > 0)
        .distinct()
    )
    # global rank WITHOUT a single-task window: rank within a first-char
    # bucket (distributed), then add broadcast per-bucket offsets — the
    # same two-pass prefix-sum shape events_max_concurrency uses; equals
    # the global ORDER BY entity rank because the bucket is a prefix of
    # the sort key.
    vocab = vocab.withColumn("vb", F.substring("entity", 1, 1))
    local = F.row_number().over(Window.partitionBy("vb").orderBy("entity"))
    offs = (
        vocab.groupBy("vb").agg(F.count("*").alias("bn"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("bn").over(
                    Window.orderBy("vb").rowsBetween(
                        Window.unboundedPreceding, Window.currentRow - 1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("vb", "off")
    )
    vocab = (
        vocab.withColumn("lrn", local)
        .join(F.broadcast(offs), "vb")
        .select("entity", (F.col("off") + F.col("lrn") - 1).alias("vidx"))
    )
    n_vocab = vocab.agg(F.count("*").alias("n_vocab"))
    cand = (
        half.select("src", "dst", F.explode(F.sequence(F.lit(0), F.lit(NEG_SAMPLES_K - 1))).alias("k"))
        .crossJoin(F.broadcast(n_vocab))
        .withColumn(
            "vidx",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", "src", "dst", F.col("k").cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("n_vocab"),
            ),
        )
        .join(F.broadcast(vocab), "vidx")
        .select("src", "dst", "k", F.col("entity").alias("neg_dst"))
        .where((F.col("neg_dst") != F.col("src")) & (F.col("neg_dst") != F.col("dst")))
    )
    return cand.join(
        edges.select(F.col("src"), F.col("dst").alias("neg_dst")),
        ["src", "neg_dst"],
        "left_anti",
    )


CLOSE_MAX_D = 4


def kg_closeness_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic closeness centrality over the co-occurrence graph:
    C(v) = Σ_{u≠v reachable within CLOSE_MAX_D} 1/d(v,u) — the KG "hub
    quality" metric (which canonical entities sit near everything).

    Algorithm: ALL-SOURCES bounded BFS — the kg_khop_reach loop
    generalized to a multi-source frontier keyed (source, node); every
    round expands every source's ring simultaneously through one
    frontier⋈edges join + one (source, node) anti-join.  Harmonic terms
    ride as integer micro-units (1000000 div d — truncating division IS
    the spec, identically on both engines; no float reciprocals).

    Scale shape: state and shuffles are keyed (source, node) — the same
    frontier-ring discipline as single-source BFS, |sources| times the
    rows, which is the honest cost of all-pairs distances (at 100 TB one
    runs this over the vocabulary-scale canonical graph, not raw
    mentions; the loop is CLOSE_MAX_D fixed rounds with per-round
    lineage truncation).  The DuckDB oracle replays the bounded
    min-distance closure as a recursive CTE.
    """
    edges = _cooccurrence_edges(spark, sf_dir).select(
        F.col("src").alias("e_src"), F.col("dst").alias("e_dst")
    ).localCheckpoint(eager=True)
    reached = (
        edges.select(F.col("e_src").alias("s"))
        .distinct()
        .select("s", F.col("s").alias("node"), F.lit(0).alias("d"))
        .localCheckpoint(eager=True)
    )
    frontier = reached
    for k in range(1, CLOSE_MAX_D + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.e_src)
            .select("s", F.col("e_dst").alias("node"))
            .distinct()
            .join(reached.select("s", "node"), ["s", "node"], "left_anti")
            .withColumn("d", F.lit(k))
        )
        frontier = nxt.localCheckpoint(eager=True)
        reached = reached.unionByName(frontier).localCheckpoint(eager=True)
    return (
        reached.where(F.col("d") > 0)
        .groupBy("s")
        .agg(
            F.count("*").alias("n_reachable"),
            F.sum(F.expr("1000000 div d")).alias("harmonic_x1e6"),
        )
        .select(F.col("s").alias("mention"), "n_reachable", "harmonic_x1e6")
    )


RA_COOCC_PCT = 65


def _thresholded_cooccurrence_half(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRONG co-occurrence half-edges (src < dst): entity pairs whose
    co-mention count reaches RA_COOCC_PCT percent of the corpus — the
    sparse 'attested association' graph link prediction runs on (the raw
    co-occurrence graph is complete at vocabulary scale, so thresholding
    is what creates predictive structure).  The corpus size rides the
    plan as a broadcast 1-row aggregate, not a driver count() barrier."""
    d = load_table(spark, sf_dir, "documents")
    m = (
        d.select("doc_id", F.explode(_ws_tokens(F.col("text"))).alias("token"))
        .where(F.col("token").isin(*PR_VOCAB))
        .distinct()
    )
    a = m.select("doc_id", F.col("token").alias("src"))
    b = m.select("doc_id", F.col("token").alias("dst"))
    pair = (
        a.join(b, "doc_id")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_ab"))
    )
    nd = d.agg(F.count("*").alias("n_docs"))
    return pair.join(F.broadcast(nd)).where(
        F.col("n_ab") * 100 >= F.lit(RA_COOCC_PCT) * F.col("n_docs")
    ).select("src", "dst")


def resource_allocation(half: DataFrame) -> DataFrame:
    """Core resource-allocation link predictor over an undirected graph
    given as deduplicated (src < dst) half-edges — factored out so
    property tests can plant sparse graphs.

    For every NON-adjacent pair (a, b) with at least one common neighbor
    z, RA(a,b) = Σ_z 1/deg(z) (Zhou, Lü & Zhang 2009, 'Predicting missing
    links via local information') — the common-neighbor family's
    strongest simple member.  Scores ride as integer ppm (1000000 div
    deg, truncating division IS the spec) so the cross-engine value hash
    can't be broken by float summation order.
    """
    full = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = full.groupBy(F.col("src").alias("z")).agg(F.count("*").alias("deg"))
    e1 = full.select(F.col("src").alias("a"), F.col("dst").alias("z"))
    e2 = full.select(F.col("src").alias("z"), F.col("dst").alias("b"))
    wedges = e1.join(e2, "z").where(F.col("a") < F.col("b"))
    open_w = wedges.join(
        half.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    return (
        open_w.join(deg, "z")
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("n_common"),
            F.sum(F.expr("1000000 div deg")).alias("ra_score_ppm"),
        )
        .select(
            F.col("a").alias("src"), F.col("b").alias("dst"),
            "n_common", "ra_score_ppm",
        )
    )


def kg_link_prediction_ra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-link prediction over the KG: resource-allocation scores
    for non-adjacent entity pairs of the STRONG co-occurrence graph —
    the 'which relationships does the graph imply but not yet contain'
    query a KG-construction pipeline runs to propose new edges for
    verification (relationship discovery over the loader's SRO-style
    edge set; the reference loader materializes only explicit refs —
    StixToNeoDB.scala:24-38 — so this extends it with the standard
    inference tier).

    Plan shape: the wedge enumeration is two self-joins of the adjacency
    list — bounded by the THRESHOLDED degree, which is the point of the
    strong-edge cut (on a raw power-law graph one orients wedges through
    the lower-degree endpoint and salts hot nodes exactly like the
    triangle counter, kg_triangle_count's docstring).  Vocabulary-scale
    here: every join side is broadcastable; the only real shuffle is the
    per-pair aggregate.  Degrees, candidates, and scores all stay
    integer; no float crosses the engine boundary.
    """
    return resource_allocation(_thresholded_cooccurrence_half(spark, sf_dir))


KCORE_K = 3
KCORE_ITERS = 3


def kcore_peel(half: DataFrame, k: int = KCORE_K, iters: int = KCORE_ITERS) -> DataFrame:
    """K-core peeling over deduplicated (src < dst) half-edges: ITERS
    fixed rounds of 'drop every node whose degree in the surviving
    subgraph is < k', then report survivors with their degree in the
    FINAL induced subgraph.

    The iteration count is FIXED (not run-to-convergence) so the DuckDB
    oracle can unroll the identical spec — both engines agree on any
    input, converged or not.  Production swaps the fixed bound for a
    convergence check (dropped-this-round count == 0, riding an
    ``observe()`` metric, with per-round localCheckpoint lineage
    truncation like the CC loop); peeling converges in at most |V|
    rounds and in practice a handful on power-law graphs.

    Scale shape per round: one map-side-combinable degree aggregate plus
    two semi-joins (alive set is node-cardinality, broadcastable long
    before the edge list is small) — the standard distributed k-core
    (Montresor et al. 2013 'Distributed k-core decomposition' is the
    message-passing refinement; the batch peel is its synchronous form).
    """
    full = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    edges = full
    for _ in range(iters):
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        alive = deg.where(F.col("deg") >= k).select("src")
        edges = edges.join(F.broadcast(alive), "src", "left_semi")
        edges = edges.join(
            F.broadcast(alive.select(F.col("src").alias("dst"))),
            "dst",
            "left_semi",
        )
    return (
        edges.groupBy("src")
        .agg(F.count("*").alias("core_degree"))
        .select(F.col("src").alias("mention"), "core_degree")
    )


def kg_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core decomposition of the strong co-occurrence graph: which
    entities survive KCORE_ITERS rounds of degree-{KCORE_K} peeling —
    the KG 'dense nucleus' query (core entities are canonicalization
    anchors; peripheral mentions peel away), run on the same thresholded
    edge set as kg_link_prediction_ra.
    """
    return kcore_peel(_thresholded_cooccurrence_half(spark, sf_dir))


BF_ITERS = 3


def bellman_ford(edges_w: DataFrame, seed: str, iters: int = BF_ITERS) -> DataFrame:
    """Single-source weighted shortest paths, ITERS synchronous min-plus
    rounds (Bellman-Ford): dist_{i+1}(v) = min(dist_i(v), min_u dist_i(u)
    + w(u,v)) — after k rounds dist holds the exact shortest distance
    over paths of <= k edges, which IS the spec (fixed rounds, so the
    DuckDB oracle unrolls identically; production runs to convergence
    with an observe()-metric change counter, <= |V|-1 rounds).

    ``edges_w`` carries BOTH orientations (src, dst, w) with integer
    weights.  Each round shuffles one join keyed on the reached set plus
    one min-aggregate — the relaxed stream is map-side combinable.  For
    long horizons add per-round localCheckpoint exactly like the CC/BFS
    loops; at BF_ITERS=3 the lineage stays shallow.
    """
    dist = edges_w.sparkSession.createDataFrame(
        [(seed, 0)], "node string, dist long"
    )
    for _ in range(iters):
        # alias-qualified: after round 1 dist's lineage contains edges_w,
        # so bare column refs would be ambiguous in the re-join
        relaxed = (
            dist.alias("d")
            .join(edges_w.alias("e"), F.col("d.node") == F.col("e.src"))
            .select(
                F.col("e.dst").alias("node"),
                (F.col("d.dist") + F.col("e.w")).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist


def kg_shortest_paths_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths from KHOP_SEED over the co-occurrence
    graph with RARITY distances w = 1000000 div n_ab (strongly
    co-mentioned entities are 'close') — the KG proximity query behind
    'which entities are semantically nearest this one', the weighted
    refinement of kg_khop_reach's hop counts.

    Integer weights end-to-end: truncating division is the spec on both
    engines, and min-plus over integers is associativity-safe for the
    value hash (no float path sums).  Returns (mention, dist_x1e6) for
    every node reachable within BF_ITERS edges, seed included at 0.
    """
    d = load_table(spark, sf_dir, "documents")
    m = (
        d.select("doc_id", F.explode(_ws_tokens(F.col("text"))).alias("token"))
        .where(F.col("token").isin(*PR_VOCAB))
        .distinct()
    )
    a = m.select("doc_id", F.col("token").alias("src"))
    b = m.select("doc_id", F.col("token").alias("dst"))
    half = (
        a.join(b, "doc_id")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.expr("1000000 div count(*)").alias("w"))
    )
    edges_w = half.unionByName(
        half.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    return bellman_ford(edges_w, KHOP_SEED, BF_ITERS).select(
        F.col("node").alias("mention"), F.col("dist").alias("dist_x1e6")
    )


def kg_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural-equivalence scores over the strong co-occurrence graph:
    for every entity pair (a < b) sharing at least one neighbor, the
    Jaccard similarity of their neighbor SETS in integer ppm — the
    graph-context alias detector (two surface forms of one entity
    co-occur with the same things even when they never co-occur with
    each other), the standard companion to string-distance blocking in
    entity canonicalization (plans/canonicalize.py handles the string
    side; this is the structural side).

    |N(a) ∩ N(b)| is the wedge count through common neighbors (one
    adjacency self-join); |N(a) ∪ N(b)| = deg(a) + deg(b) − common, so
    no union ever materializes.  Degrees broadcast (node-cardinality).
    All-integer output: (src, dst, n_common, jaccard_ppm).
    """
    return neighbor_jaccard(_thresholded_cooccurrence_half(spark, sf_dir))


def neighbor_jaccard(half: DataFrame) -> DataFrame:
    """Core neighborhood-Jaccard over (src < dst) half-edges — factored
    out so property tests can plant alias-shaped graphs."""
    full = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = full.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    )
    e1 = full.select(F.col("src").alias("a"), F.col("dst").alias("z"))
    e2 = full.select(F.col("src").alias("z"), F.col("dst").alias("b"))
    common = (
        e1.join(e2, "z")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))),
            "a",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))),
            "b",
        )
        .select(
            F.col("a").alias("src"),
            F.col("b").alias("dst"),
            "n_common",
            F.expr(
                "n_common * 1000000 div (deg_a + deg_b - n_common)"
            ).alias("jaccard_ppm"),
        )
    )


HITS_ITERS = 4


def kg_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hub/authority scores (Kleinberg 1999) over a DIRECTED entity
    graph, fixed ``HITS_ITERS`` rounds with sum-normalization.

    Direction rule (what makes the co-occurrence graph directed, and
    deterministic): src → dst when src's FIRST occurrence precedes dst's
    within a document; weight = number of documents with that ordered
    pair.  Mutual-ordering pairs get both directions with independent
    weights — exactly the asymmetry HITS needs (a token that habitually
    leads others is a hub; one that habitually follows is an authority).

        a_{k+1}(v) = Σ_{u→v} w·h_k(u)   then a := a / Σa
        h_{k+1}(u) = Σ_{u→v} w·a_{k+1}(v)   then h := h / Σh

    Fixed rounds (not convergence) so the DuckDB oracle unrolls the
    identical spec; output rounded to 6 decimals like kg_pagerank (the
    double partial-sum order differs across engines ~1e-15).

    Scale shape: vocabulary-scale graph from one distinct + one
    self-join on doc_id (the kg_cooccurrence recipe with min-position
    kept); each round is two edge⋈score shuffle joins + two broadcast
    1-row totals; localCheckpoint(eager) truncates lineage per round as
    the PageRank/CC loops do.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(_ws_tokens(F.col("text"))).alias("pos", "token")
    ).where(F.col("token").isin(*PR_VOCAB))
    m = toks.groupBy("doc_id", "token").agg(F.min("pos").alias("pos"))
    a = m.select("doc_id", F.col("token").alias("src"), F.col("pos").alias("ps"))
    b = m.select("doc_id", F.col("token").alias("dst"), F.col("pos").alias("pd"))
    edges = (
        a.join(b, "doc_id")
        .where(F.col("ps") < F.col("pd"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    hub = nodes.withColumn("h", F.lit(1.0 / n))
    auth = None
    for _ in range(HITS_ITERS):
        ar = (
            edges.join(hub, hub.node == F.col("src"))
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("h")).alias("a_raw"))
        )
        atot = ar.agg(F.sum("a_raw").alias("at"))
        auth = (
            nodes.join(ar, nodes.node == F.col("dst"), "left")
            .join(F.broadcast(atot))
            .select(
                "node",
                (F.coalesce(F.col("a_raw"), F.lit(0.0)) / F.col("at")).alias("a"),
            )
            .localCheckpoint(eager=True)
        )
        hr = (
            edges.join(auth, auth.node == F.col("dst"))
            .groupBy("src")
            .agg(F.sum(F.col("w") * F.col("a")).alias("h_raw"))
        )
        htot = hr.agg(F.sum("h_raw").alias("ht"))
        hub = (
            nodes.join(hr, nodes.node == F.col("src"), "left")
            .join(F.broadcast(htot))
            .select(
                "node",
                (F.coalesce(F.col("h_raw"), F.lit(0.0)) / F.col("ht")).alias("h"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        hub.join(auth.select("node", "a"), "node")
        .select(
            F.col("node").alias("mention"),
            F.round("h", 6).alias("hub"),
            F.round("a", 6).alias("authority"),
        )
    )


def kg_local_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per entity — lcc(v) = 2·T(v) /
    (deg(v)·(deg(v)−1)) — the neighborhood-cohesion score that separates
    entities living in tight communities from bridge/noise mentions
    (Watts–Strogatz).  Rides the SAME oriented triangle counter as
    kg_triangle_count plus one degree aggregate; the ratio is truncating
    integer ppm, so no float crosses engines; degree-<2 nodes emit 0 by
    the guarded denominator.

    Scale shape: triangle cost is the oriented wedge join (degree-ordered
    orientation is the documented 100-TB swap, see kg_triangle_count);
    the degree agg and final join are vocabulary-scale.
    """
    edges = _cooccurrence_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("mention")).agg(
        F.count("*").alias("degree")
    )
    fwd = edges.where(F.col("src") < F.col("dst"))
    tri = triangles_per_node(fwd)
    return (
        deg.join(tri, "mention", "left")
        .select(
            "mention",
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    "coalesce(n_triangles, 0) * 2000000"
                    " div (degree * (degree - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("lcc_ppm"),
        )
    )


def dedup_pick_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation DECISION on top of duplicate clustering: for every
    near-dup cluster pick ONE surviving document by a deterministic
    quality rule (longest text wins; ties break to the smallest doc_id)
    and emit the per-document verdict — the actual keep/drop table a
    training-data pipeline writes.

    Output: (doc_id, cluster_id, rep_doc_id, keep) for every clustered
    doc; singleton docs (no near-dup pair) never enter a cluster and are
    implicitly kept upstream.

    Scale shape: clustering is pair-graph-scale (see
    dedup_cluster_components); the quality join brings only n_chars for
    CLUSTERED docs (semi-join-sized), and the per-cluster argmax is one
    window at clustered-doc cardinality.
    """
    cc = dedup_cluster_components(spark, sf_dir)
    q = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    t = cc.join(q, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        t.withColumn("rep_doc_id", F.first("doc_id").over(w))
        .select(
            "doc_id",
            "cluster_id",
            "rep_doc_id",
            (F.col("doc_id") == F.col("rep_doc_id")).alias("keep"),
        )
    )


def kg_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity audit of the label-propagation communities — the
    quality number that says whether the detected communities are real
    structure or noise (Newman-Girvan Q: intra-community edge share
    minus the share expected from degrees alone; Q_c can go NEGATIVE for
    a community worse than random).

    Exact integer form on the both-orientations edge list (|rows| = 2m):
    Q_c·ppm = (intra_rows_c·E − d_c²)·1e6 div E², E = 2m — every term
    integer, truncation toward zero IDENTICAL in Spark's div and
    DuckDB's // (verified including negatives).

    Scale shape: LPA is the iterative cost (see kg_label_propagation);
    the audit itself is two edge-scale joins against the node-cardinality
    label frame (broadcastable) + community-cardinality aggs.
    """
    edges = _cooccurrence_edges(spark, sf_dir).localCheckpoint(eager=True)
    lab = label_propagation(edges, LPA_ITERS).select(
        F.col("mention").alias("node"), F.col("community")
    ).localCheckpoint(eager=True)
    e_tot = edges.agg(F.count("*").alias("E"))
    la = lab.select(F.col("node").alias("src"), F.col("community").alias("ca"))
    lb = lab.select(F.col("node").alias("dst"), F.col("community").alias("cb"))
    intra = (
        edges.join(F.broadcast(la), "src")
        .join(F.broadcast(lb), "dst")
        .where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count("*").alias("intra_rows"))
    )
    deg = (
        edges.join(F.broadcast(la), "src")
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count("*").alias("deg_sum"))
    )
    nodes = lab.groupBy("community").agg(F.count("*").alias("n_nodes"))
    return (
        nodes.join(deg, "community")
        .join(intra, "community", "left")
        .join(F.broadcast(e_tot))
        .select(
            "community",
            "n_nodes",
            F.coalesce(F.col("intra_rows"), F.lit(0)).alias("intra_rows"),
            "deg_sum",
            F.expr(
                "(coalesce(intra_rows, 0) * E - deg_sum * deg_sum)"
                " * 1000000 div (E * E)"
            ).alias("q_ppm"),
        )
    )


PPR_SEED = "join"  # restart target; must be a PR_VOCAB member (= KHOP_SEED)


def kg_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank: the random walk restarts at ONE seed
    entity instead of teleporting uniformly, so scores measure
    closeness-to-seed — the 'related entities' ranking that global
    kg_pagerank can't provide (its teleport washes locality out).

        ppr_{k+1}(v) = (1-d)·1[v = seed] + d · Σ_{u→v} ppr_k(u)·w/wout(u)

    Same FIXED-iteration protocol, damping, graph build, and round-6
    readout as kg_pagerank (constants shared with the oracle, which
    unrolls the identical steps with the restart CASE).  Init is the
    restart vector itself (all mass on the seed).

    Scale shape: identical to kg_pagerank — vocabulary-scale graph,
    one edges⋈pr shuffle join + groupBy(dst) per iteration,
    localCheckpoint truncating lineage.  The restart vector costs a
    CASE, not a join.
    """
    d = load_table(spark, sf_dir, "documents")
    m = (
        d.select("doc_id", F.explode(_ws_tokens(F.col("text"))).alias("token"))
        .where(F.col("token").isin(*PR_VOCAB))
        .distinct()
    )
    a = m.select("doc_id", F.col("token").alias("src"))
    b = m.select("doc_id", F.col("token").alias("dst"))
    half = (
        a.join(b, "doc_id")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).localCheckpoint(eager=True)
    outw = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )

    restart = F.when(F.col("node") == PPR_SEED, F.lit(1.0)).otherwise(F.lit(0.0))
    pr = nodes.withColumn("pr", restart)
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(outw, "src")
            .join(pr, pr.node == F.col("src"))
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("w") / F.col("wout")).alias("c"))
        )
        pr = (
            nodes.join(contrib, nodes.node == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.when(F.col("node") == PPR_SEED, F.lit(1.0 - PR_DAMPING))
                    .otherwise(F.lit(0.0))
                    + F.lit(PR_DAMPING) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr.select(F.col("node").alias("mention"), F.round("pr", 6).alias("ppr"))


def kg_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the entity co-occurrence graph: the
    Pearson correlation of endpoint degrees over all directed edge
    slots — do hubs link to hubs (assortative, r > 0) or to leaves
    (disassortative, r < 0)?  One scalar a KG health dashboard tracks
    next to kg_triangle_count and the degree profile.

    Exact integer moments (degrees and their products summed as
    int64); the ONLY float ops are the final covariance division and
    sqrt on identical operands, round-6.  Density in exact ppm.

    Distribution: the co-occurrence edge build (vocabulary scale);
    degrees via one groupBy; moments via one agg over 2·|edges| rows.
    """
    edges = _cooccurrence_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    both = (
        edges.join(deg.withColumnRenamed("src", "u_"), edges.src == F.col("u_"))
        .select(edges.dst.alias("v"), F.col("d").alias("du"))
        .join(deg.withColumnRenamed("src", "v_"), F.col("v") == F.col("v_"))
        .select(F.col("du"), F.col("d").alias("dv"))
    )
    n_nodes = deg.count()
    agg = both.agg(
        F.count("*").alias("m2"),  # directed slots = 2|E|
        F.sum("du").alias("sx"),
        F.sum("dv").alias("sy"),
        F.sum(F.expr("du * dv")).alias("sxy"),
        F.sum(F.expr("du * du")).alias("sxx"),
        F.sum(F.expr("dv * dv")).alias("syy"),
    )
    return agg.select(
        F.expr("m2 div 2").alias("n_edges"),
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.expr(
            f"(1000000 * m2) div ({n_nodes} * ({n_nodes} - 1))"
        ).alias("density_ppm"),
        F.round(
            F.expr(
                # a degree-regular graph (complete graphs included) has
                # zero degree variance: assortativity undefined -> NULL
                "CASE WHEN m2 * sxx = sx * sx OR m2 * syy = sy * sy THEN NULL"
                " ELSE cast(m2 * sxy - sx * sy as double)"
                " / sqrt(cast(m2 * sxx - sx * sx as double)"
                "        * cast(m2 * syy - sy * sy as double)) END"
            ),
            6,
        ).alias("assortativity"),
    )

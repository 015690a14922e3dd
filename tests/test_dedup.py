"""Dedup-tier property tests — the hazards the sf-fixture oracles cannot
see (round-2 verdict #3/#5):

- a >MAX_BLOCK family of NON-identical near-dups (boilerplate with
  per-doc edits, the primary web-corpus dedup target) must not lose pairs
  to the LSH skew guard: every band bucket of such a family exceeds
  MAX_BLOCK, and the round-2 whole-band drop silently returned zero pairs
  while the exact oracle returns all C(n,2);
- the blocked-GEMM block count is derived from the corpus (bounded
  per-task tile), and a forced B > default yields identical output;
- operator calls leave no persisted intermediates behind (cache hygiene
  for long-lived sessions).
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from stixtoneodb_spark.operators import dedup

FAMILY = 300  # > MAX_BLOCK=256: every band bucket of the family is oversized
BASE_TOKENS = 306


def _shingle_set(text: str, k: int = 3) -> frozenset[str]:
    """Mirror of word_shingle_rows semantics: lowercase, split on
    non-alphanumeric, distinct word k-grams (whole-string fallback for
    short docs)."""
    toks = [t for t in __import__("re").split(r"[^a-z0-9]+", text.lower()) if t]
    if not toks:
        return frozenset()
    if len(toks) < k:
        return frozenset({" ".join(toks)})
    return frozenset(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1))


@pytest.fixture(scope="module")
def family_dir(tmp_path_factory):
    """documents.parquet with a 300-doc near-dup family (doc i replaces
    base token i -> pairwise J ~ 0.96, all >= the 0.5 floor) plus 40
    unrelated docs, and the exact all-pairs ground truth at J >= 0.5."""
    base = [f"w{j}" for j in range(BASE_TOKENS)]
    texts = []
    for i in range(FAMILY):
        toks = list(base)
        toks[i] = f"uniq{i}"
        texts.append(" ".join(toks))
    rng = np.random.default_rng(11)
    for i in range(40):  # unrelated small docs: exercise the small-band path
        texts.append(" ".join(f"z{rng.integers(0, 5000)}" for _ in range(30)))
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "planted",
            "n_chars": [len(t) for t in texts],
        }
    )
    d = tmp_path_factory.mktemp("family")
    pdf.to_parquet(d / "documents.parquet")

    sets = [_shingle_set(t) for t in texts]
    truth = set()
    for a, b in itertools.combinations(range(len(texts)), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.5:
            truth.add((a, b))
    # the planted family really is a full clique at the floor
    assert {(a, b) for a, b in itertools.combinations(range(FAMILY), 2)} <= truth
    return str(d), truth


def test_oversized_nonidentical_family_keeps_all_pairs(spark, family_dir):
    d, truth = family_dir
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.dedup_minhash_lsh(spark, d).collect()
    }
    missing = truth - got
    # per-pair miss probability through the rep-star path is ~(1-J^2)^16
    # with J~0.96 — astronomically small; a miss here is the round-2
    # whole-band-drop bug, not bad luck
    assert not missing, f"lost {len(missing)} family pairs, e.g. {sorted(missing)[:5]}"
    # exact verify tier: nothing below the floor may appear
    assert got <= truth


def test_family_pairs_survive_at_high_floor(spark, family_dir):
    """Same corpus through the 0.8-floor path (dedup_ngram_jaccard)."""
    d, truth = family_dir
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.dedup_ngram_jaccard(spark, d).collect()
    }
    # pairwise J ~ 0.96 >= 0.8: the whole family must still be present
    fam = {(a, b) for a, b in itertools.combinations(range(FAMILY), 2)}
    assert fam <= got


def test_minhash_call_leaves_no_cached_intermediates(spark, family_dir):
    d, _ = family_dir
    spark.catalog.clearCache()
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = dedup.dedup_minhash_lsh(spark, d)
    out.count()
    live = spark.sparkContext._jsc.getPersistentRDDs().size()
    # only the eagerly-checkpointed RESULT may remain (its blocks are
    # released when the frame is garbage-collected); all per-call
    # intermediates (rows/members/rep_rows/sig/cand) must be gone.
    # delta-based: earlier tests' checkpointed results are collected
    # asynchronously by the ContextCleaner, so absolute counts race.
    assert live - before <= 1, f"{live - before} persistent RDDs leaked by one call"


def test_gemm_blocks_derived_and_block_count_invariant(spark, planted_dir_docs=None):
    """Blocked-GEMM: forced B=7 (> the derived value for 60 vectors)
    produces exactly the same pair set."""
    import math

    rng = np.random.default_rng(7)
    n, dim = 60, 64
    vecs = rng.standard_normal((n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    import tempfile, os

    d = tempfile.mkdtemp(prefix="gemmblk")
    pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.astype(np.float32) for v in vecs],
            "label": np.zeros(n, dtype=np.int32),
        }
    ).to_parquet(os.path.join(d, "embeddings.parquet"))

    v64 = vecs.astype(np.float64)
    v64 /= np.linalg.norm(v64, axis=1, keepdims=True)
    ii, jj = np.nonzero(np.triu(v64 @ v64.T >= 0.45, k=1))
    truth = {(int(a), int(b)) for a, b in zip(ii, jj)}

    default = {
        (r["id_a"], r["id_b"]) for r in dedup.dedup_embedding_cosine(spark, d).collect()
    }
    forced = {
        (r["id_a"], r["id_b"])
        for r in dedup.dedup_embedding_cosine(spark, d, n_blocks=7).collect()
    }
    assert default == truth
    assert forced == truth
    # the derived block count follows the documented formula
    assert math.ceil(n / dedup.GEMM_BLOCK_TARGET_ROWS) == 1

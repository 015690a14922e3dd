"""S2 — mention detection + triple extraction (Arrow-vectorized).

Reference correspondence: an SDO (typed entity object) becomes an entity
mention extracted from turn text; an SRO ``relationship {source_ref,
relationship_type, target_ref}`` (testfull.json:108-115) becomes an
extracted triple (subj, pred, obj) (SURVEY §1.4).  The per-object type
dispatch + projection (A6/A7) becomes batched pattern extraction.

Two implementations, same output contract:

- ``detect_mentions_udf`` — scalar pandas UDF (Arrow batches) running a
  compiled gazetteer alternation over a text Series.  The gazetteer regex is
  built once per Python worker, then applied with ``Series.str.findall``.
- ``extract_triples`` — grouped-map ``applyInPandas`` per conv_id: receives
  all turns of a conversation (with stable ordering restored inside the
  batch), emits (conv_id, turn_idx, subj_text, pred, obj_text, confidence).

No per-row Python anywhere (input_hint): both paths are Arrow-batched.
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stixtoneodb_spark.sources.transcripts import GAZETTEER, PREDICATES

MENTION_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("surface", T.StringType()),
            T.StructField("entity_type", T.StringType()),
            T.StructField("start", T.IntegerType()),
        ]
    )
)

TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("subj_text", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj_text", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
    ]
)


@lru_cache(maxsize=1)
def _gazetteer_patterns() -> list[tuple[re.Pattern, str]]:
    """(compiled surface-alternation regex, entity_type) per type; surfaces
    sorted longest-first so the alternation prefers maximal matches."""
    by_type: dict[str, list[str]] = {}
    for _canon, (etype, surfaces) in GAZETTEER.items():
        by_type.setdefault(etype, []).extend(surfaces)
    out = []
    for etype, surfaces in sorted(by_type.items()):
        alts = sorted(set(surfaces), key=len, reverse=True)
        pat = re.compile(
            r"(?<![A-Za-z0-9])(" + "|".join(re.escape(s) for s in alts) + r")(?![A-Za-z0-9])",
            re.IGNORECASE,
        )
        out.append((pat, etype))
    # pattern rules (non-gazetteer entity shapes): infrastructure hostnames
    out.append(
        (
            re.compile(r"(?<![A-Za-z0-9])(host[- ][0-9a-f]{6})(?![A-Za-z0-9])", re.IGNORECASE),
            "infrastructure",
        )
    )
    return out


@lru_cache(maxsize=1)
def _triple_pattern() -> re.Pattern:
    preds = "|".join(re.escape(p) for p in PREDICATES)
    return re.compile(rf"we saw (.+?) ({preds}) (.+?) yesterday", re.IGNORECASE)


def _assert_cross_type_nonoverlap(by_type: dict[str, list[str]]) -> None:
    """PRECONDITION of the single-pass combined regex: ``finditer``
    consumes matched spans globally, so whenever two different types'
    surfaces can occupy OVERLAPPING spans in some text, the per-type
    passes emit both mentions while the combined pass emits only one —
    silently, and only for texts containing the longer/earlier surface.
    Three shapes break equivalence (round-3 advice widened this from the
    original prefix-only check):

    1. boundary-prefix  — ``corp`` / ``corp systems``;
    2. interior/suffix boundary containment — ``corp`` inside
       ``acme corp`` (the per-type pass matches the inner surface at a
       token edge; the combined pass consumed the enclosing span);
    3. suffix/prefix token overlap — ``acme corp`` + ``corp systems``
       overlap on ``corp`` in the text ``acme corp systems``.

    All three are token-level conditions because the surface regexes are
    flanked by ``(?<![A-Za-z0-9])``/``(?![A-Za-z0-9])`` — so the check
    tokenizes on non-alphanumerics and rejects any contiguous-sublist
    containment or proper suffix/prefix token overlap across types.
    Enforced STATICALLY at pattern-build time: a future gazetteer
    addition that violates it fails immediately, not via a drifting
    corpus test.  Within-type overlaps are fine (longest-first
    alternation keeps maximal-match preference and the emitted type is
    identical either way)."""

    def toks(s: str) -> tuple[str, ...]:
        return tuple(t for t in re.split(r"[^a-z0-9]+", s.lower()) if t)

    surfs = [
        (etype, s.lower(), toks(s)) for etype, ss in by_type.items() for s in set(ss)
    ]
    for ta, sa, tka in surfs:
        for tb, sb, tkb in surfs:
            if ta == tb:
                continue
            # (1)+(2): sb's tokens appear contiguously inside sa's
            contained = any(
                tka[i : i + len(tkb)] == tkb for i in range(len(tka) - len(tkb) + 1)
            )
            # (3): a nonempty proper token-suffix of sa is a token-prefix
            # of sb (the two surfaces can share a span mid-text)
            straddle = any(
                tka[-k:] == tkb[:k] for k in range(1, min(len(tka), len(tkb)))
            )
            if contained or straddle:
                kind = "is boundary-contained in" if contained else "token-straddles"
                raise AssertionError(
                    f"gazetteer cross-type overlap: {tb!r} surface {sb!r} {kind} "
                    f"{ta!r} surface {sa!r}; the combined single-pass regex is "
                    "not equivalent to per-type passes under overlap"
                )


@lru_cache(maxsize=1)
def _combined_gazetteer_pattern() -> tuple[re.Pattern, dict[str, str]]:
    """ONE alternation over every type's surfaces, one named group per
    type: a single regex pass replaces the per-type pass loop (7 scans of
    every text → 1), which halved the mention stage's wall at bench
    scale.  Semantics identical to the per-type passes because surfaces
    do not overlap across types (asserted by
    tests/test_pipeline.py::test_combined_mention_pass_equals_per_type);
    within-type longest-first alternation order is preserved per group.
    """
    by_type: dict[str, list[str]] = {}
    for _canon, (etype, surfaces) in GAZETTEER.items():
        by_type.setdefault(etype, []).extend(surfaces)
    _assert_cross_type_nonoverlap(by_type)
    parts: list[str] = []
    group_types: dict[str, str] = {}
    for i, (etype, surfaces) in enumerate(sorted(by_type.items())):
        alts = sorted(set(surfaces), key=len, reverse=True)
        g = f"g{i}"
        group_types[g] = etype
        parts.append(f"(?P<{g}>" + "|".join(re.escape(s) for s in alts) + ")")
    g = f"g{len(parts)}"
    group_types[g] = "infrastructure"
    parts.append(f"(?P<{g}>host[- ][0-9a-f]{{6}})")
    pat = re.compile(
        r"(?<![A-Za-z0-9])(?:" + "|".join(parts) + r")(?![A-Za-z0-9])", re.IGNORECASE
    )
    return pat, group_types


@lru_cache(maxsize=1)
def _combined_gazetteer_pattern_cs() -> tuple[re.Pattern, dict[str, str]]:
    """Case-SENSITIVE twin of ``_combined_gazetteer_pattern`` over
    pre-lowered surfaces: CPython's ``re.IGNORECASE`` roughly halves
    alternation throughput (measured 2.1x on corpus-shaped text), so the
    hot path lowers each text once (C-level) and scans case-sensitively —
    identical matches for any text whose ``lower()`` is length-preserving
    (the non-length-preserving Unicode edge cases fall back to the
    IGNORECASE twin; equality with the per-type reference passes is
    asserted by tests/test_pipeline.py)."""
    by_type: dict[str, list[str]] = {}
    for _canon, (etype, surfaces) in GAZETTEER.items():
        by_type.setdefault(etype, []).extend(s.lower() for s in surfaces)
    parts: list[str] = []
    group_types: dict[str, str] = {}
    for i, (etype, surfaces) in enumerate(sorted(by_type.items())):
        alts = sorted(set(surfaces), key=len, reverse=True)
        g = f"g{i}"
        group_types[g] = etype
        parts.append(f"(?P<{g}>" + "|".join(re.escape(s) for s in alts) + ")")
    g = f"g{len(parts)}"
    group_types[g] = "infrastructure"
    parts.append(f"(?P<{g}>host[- ][0-9a-f]{{6}})")
    # boundary classes need no upper-case letters: the input is lowered
    pat = re.compile(r"(?<![a-z0-9])(?:" + "|".join(parts) + r")(?![a-z0-9])")
    return pat, group_types


@F.pandas_udf(MENTION_SCHEMA)
def detect_mentions_udf(texts: pd.Series) -> pd.Series:
    """Batched gazetteer mention detection: one Arrow batch in, one out;
    one combined regex pass per text (start-ascending by construction).
    Scans the lowered text case-sensitively (2.1x the IGNORECASE
    throughput) and slices each surface from the ORIGINAL text by match
    offset, so the emitted rows are byte-identical to the IGNORECASE
    reference."""
    pat_cs, group_types = _combined_gazetteer_pattern_cs()
    pat_ci, _ = _combined_gazetteer_pattern()

    def scan(text):
        if not isinstance(text, str) or not text:
            return []
        low = text.lower()
        # lower() is length-preserving for all but a few Unicode code
        # points (e.g. İ) — offsets then map 1:1 onto the original
        pat, src = (pat_cs, low) if len(low) == len(text) else (pat_ci, text)
        return [
            {
                "surface": text[m.start(m.lastgroup) : m.end(m.lastgroup)],
                "entity_type": group_types[m.lastgroup],
                "start": m.start(m.lastgroup),
            }
            for m in pat.finditer(src)
        ]

    return texts.map(scan)


@F.pandas_udf(MENTION_SCHEMA)
def detect_mentions_per_type_udf(texts: pd.Series) -> pd.Series:
    """Reference implementation: one pass per entity-type pattern — kept
    as the equality oracle for the combined-pass optimization."""
    pats = _gazetteer_patterns()

    def scan(text):
        if not isinstance(text, str) or not text:
            return []
        found = []
        for pat, etype in pats:
            for m in pat.finditer(text):
                found.append({"surface": m.group(1), "entity_type": etype, "start": m.start(1)})
        found.sort(key=lambda d: d["start"])
        return found

    return texts.map(scan)


def detect_mentions(turns: DataFrame) -> DataFrame:
    """Mentions table: (conv_id, turn_idx, surface, entity_type).

    Narrow transformation — runs on whatever partitioning the turns carry;
    the Arrow boundary is the only cost.
    """
    return (
        turns.select(
            "conv_id", "turn_idx", F.explode(detect_mentions_udf(F.col("text"))).alias("m")
        )
        .select(
            "conv_id",
            "turn_idx",
            F.col("m.surface").alias("surface"),
            F.col("m.entity_type").alias("entity_type"),
            F.col("m.start").alias("start"),
        )
    )


def _extract_conv(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-conversation triple extraction (runs inside applyInPandas).

    Restores stable turn ordering inside the batch, then pattern-extracts
    triples per turn; multi-turn context (previous turn text) is available
    here for richer extractors.
    """
    pdf = pdf.sort_values("turn_idx")
    pat = _triple_pattern()
    rows = []
    for conv_id, turn_idx, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
        if not isinstance(text, str) or not text:
            continue
        for m in pat.finditer(text):
            rows.append((conv_id, int(turn_idx), m.group(1), m.group(2).lower(), m.group(3), 1.0))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "subj_text", "pred", "obj_text", "confidence"]
    )


def extract_triples_grouped(turns: DataFrame) -> DataFrame:
    """Grouped-map form: one pandas frame PER CONVERSATION via
    ``groupBy(conv_id).applyInPandas`` — the shape context-dependent
    extractors need (previous-turn text in hand).  Reuses the pipeline's
    conv_id partitioning, so no extra exchange — but at transcript scale
    the per-group overhead is real: millions of conversations mean
    millions of tiny pandas frames (one sort + one construction each).
    Use this form only when the extractor genuinely consumes cross-turn
    context; ``extract_triples`` is the batch-vectorized default with
    identical output (tests assert the equality)."""
    return turns.select("conv_id", "turn_idx", "text").groupBy("conv_id").applyInPandas(
        _extract_conv, TRIPLE_SCHEMA
    )


def _extract_batches(batches):
    """mapInPandas body: vectorized extractall per Arrow batch."""
    pat = _triple_pattern()
    empty = pd.DataFrame(
        {
            "conv_id": pd.Series(dtype="object"),
            "turn_idx": pd.Series(dtype="int32"),
            "subj_text": pd.Series(dtype="object"),
            "pred": pd.Series(dtype="object"),
            "obj_text": pd.Series(dtype="object"),
            "confidence": pd.Series(dtype="float64"),
        }
    )
    for pdf in batches:
        if len(pdf) == 0:
            yield empty
            continue
        pdf = pdf.reset_index(drop=True)
        hits = pdf["text"].fillna("").str.extractall(pat)
        if len(hits) == 0:
            yield empty
            continue
        ridx = hits.index.get_level_values(0)
        yield pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].take(ridx).to_numpy(),
                "turn_idx": pdf["turn_idx"].take(ridx).to_numpy(),
                "subj_text": hits[0].to_numpy(),
                "pred": hits[1].str.lower().to_numpy(),
                "obj_text": hits[2].to_numpy(),
                "confidence": 1.0,
            }
        )


def extract_triples(turns: DataFrame) -> DataFrame:
    """Raw triples: (conv_id, turn_idx, subj_text, pred, obj_text, confidence).

    Batch-vectorized default: the extractor is per-turn, so it needs no
    per-conversation grouping — ``mapInPandas`` keeps Arrow batches whole
    and runs ONE pandas ``str.extractall`` (C-level match loop) per batch.
    The grouped-map form (``extract_triples_grouped``) produced one tiny
    pandas frame per conversation — at 432k conversations that per-group
    construction+sort overhead dominated the entire pipeline's S2 cost
    (73s of a 170s local[16] wall); the vectorized form emits the
    identical triple set (asserted by tests/test_pipeline.py).
    """
    return turns.select("conv_id", "turn_idx", "text").mapInPandas(
        _extract_batches, TRIPLE_SCHEMA
    )


# -- UDTF surface (SURVEY §2 UDF/UDAF/UDTF table) -----------------------------

SENTENCE_SPLIT_RE = r"(?<=[.!?]) +"


def make_sentences_udtf():
    """Python UDTF (Spark 4 table function): one turn row → one row per
    sentence, with its index — the lateral-expansion shape (SQL
    ``FROM turns, LATERAL split_sentences(...)``).

    This exists to prove the UDTF API surface end-to-end (registration,
    LATERAL join, multi-column yield); it is NOT the production path —
    UDTF ``eval`` runs per input row in Python, which violates the
    pipeline's no-per-row-Python rule, so hot paths use the equivalent
    built-in ``explode(split(...))`` (``split_sentences_builtin``, proven
    identical by test).  Built lazily inside a factory because the
    ``@udtf`` decorator needs a live Spark-configured environment.
    """
    import re as _re  # noqa: PLC0415 — serialized into the UDTF closure

    from pyspark.sql.functions import udtf  # noqa: PLC0415

    pattern = SENTENCE_SPLIT_RE

    @udtf(returnType="sentence_idx int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            if not text:
                return
            for i, s in enumerate(_re.split(pattern, text)):
                if s:
                    yield i, s

    return SplitSentences


def split_sentences_builtin(turns: DataFrame) -> DataFrame:
    """Production sentence expansion: explode(split(...)) with posexplode
    for the index — whole-stage-codegen JVM path, zero Python."""
    return turns.select(
        "conv_id",
        "turn_idx",
        F.posexplode(F.split(F.col("text"), SENTENCE_SPLIT_RE)).alias(
            "sentence_idx", "sentence"
        ),
    ).where(F.length("sentence") > 0)


def split_sentences_udtf(turns: DataFrame) -> DataFrame:
    """UDTF-powered variant of split_sentences_builtin (same output
    contract; test-asserted equal).  Registers the TVF and applies it as a
    SQL LATERAL join."""
    spark = turns.sparkSession
    spark.udtf.register("split_sentences", make_sentences_udtf())
    turns.select("conv_id", "turn_idx", "text").createOrReplaceTempView(
        "_udtf_turns"
    )
    return spark.sql(
        "SELECT conv_id, turn_idx, s.sentence_idx, s.sentence "
        "FROM _udtf_turns, LATERAL split_sentences(text) AS s"
    )


# -- fused S2: one corpus pass for mentions AND triples ----------------------

FUSED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("kind", T.StringType()),       # 'm' | 't'
        T.StructField("a", T.StringType()),          # surface / subj_text
        T.StructField("b", T.StringType()),          # entity_type / pred
        T.StructField("c", T.StringType()),          # null / obj_text
        T.StructField("confidence", T.DoubleType()), # null / confidence
    ]
)


def _fused_batches(batches):
    """mapInPandas body: BOTH extractors over each Arrow batch — the
    text column crosses the Python boundary once and is scanned once
    per extractor, instead of two whole-corpus jobs each paying the
    scan + Arrow transfer.  Emits a tagged union; row content is
    IDENTICAL to detect_mentions ∪ extract_triples (equality-pinned by
    tests/test_pipeline.py)."""
    pat_cs, group_types = _combined_gazetteer_pattern_cs()
    pat_ci, _ = _combined_gazetteer_pattern()
    tpat = _triple_pattern()
    empty = pd.DataFrame(
        {
            "conv_id": pd.Series(dtype="object"),
            "turn_idx": pd.Series(dtype="int32"),
            "kind": pd.Series(dtype="object"),
            "a": pd.Series(dtype="object"),
            "b": pd.Series(dtype="object"),
            "c": pd.Series(dtype="object"),
            "confidence": pd.Series(dtype="float64"),
        }
    )
    for pdf in batches:
        if len(pdf) == 0:
            yield empty
            continue
        pdf = pdf.reset_index(drop=True)
        frames = []
        # -- mentions: identical scan to detect_mentions_udf ------------
        m_conv, m_turn, m_a, m_b = [], [], [], []
        for conv, turn, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
            if not isinstance(text, str) or not text:
                continue
            low = text.lower()
            pat, src = (pat_cs, low) if len(low) == len(text) else (pat_ci, text)
            for m in pat.finditer(src):
                m_conv.append(conv)
                m_turn.append(turn)
                m_a.append(text[m.start(m.lastgroup) : m.end(m.lastgroup)])
                m_b.append(group_types[m.lastgroup])
        if m_conv:
            frames.append(
                pd.DataFrame(
                    {
                        "conv_id": m_conv,
                        "turn_idx": pd.Series(m_turn, dtype="int32"),
                        "kind": "m",
                        "a": m_a,
                        "b": m_b,
                        "c": None,
                        "confidence": np.nan,
                    }
                )
            )
        # -- triples: identical extractall to _extract_batches ----------
        hits = pdf["text"].fillna("").str.extractall(tpat)
        if len(hits):
            ridx = hits.index.get_level_values(0)
            frames.append(
                pd.DataFrame(
                    {
                        "conv_id": pdf["conv_id"].take(ridx).to_numpy(),
                        "turn_idx": pdf["turn_idx"].take(ridx).to_numpy(),
                        "kind": "t",
                        "a": hits[0].to_numpy(),
                        "b": hits[1].str.lower().to_numpy(),
                        "c": hits[2].to_numpy(),
                        "confidence": 1.0,
                    }
                )
            )
        yield pd.concat(frames, ignore_index=True) if frames else empty


def extract_fused(turns: DataFrame) -> DataFrame:
    """Tagged mention ∪ triple stream from ONE corpus pass (see
    ``_fused_batches``).  kind='m' rows: (a=surface, b=entity_type);
    kind='t' rows: (a=subj_text, b=pred, c=obj_text, confidence)."""
    return turns.select("conv_id", "turn_idx", "text").mapInPandas(
        _fused_batches, FUSED_SCHEMA
    )

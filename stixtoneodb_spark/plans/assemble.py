"""S0 ingest + S1 per-conversation assembly.

Reference correspondence: a STIX *bundle* is one conversation (all turns of a
conv_id); an NDJSON line in `-x` mode is one turn (SURVEY §1.4;
/root/reference/README.md:69-82).  The reference preserves file order
implicitly by reading sequentially; in a distributed engine ordering must be
explicit — `Window.partitionBy(conv_id).orderBy(turn_idx)` is the stable
turn ordering mandated by the north rule.

Scale notes:
- S0's single shuffle (repartition by conv_id) is *reused* by S1's window
  and groupBy — Catalyst sees the child partitioning satisfies the window's
  required distribution, so assembly adds no extra exchange.
- ``sort_array(collect_list(struct(...)))`` gives deterministic per-group
  order without a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_turns(transcripts: DataFrame) -> DataFrame:
    """S0: project + validity-gate the raw turn stream.

    Mirrors the reference's parse+validate step (A5, play-json Reads
    rejecting malformed objects; README.md:83-85 skip-and-continue): empty /
    null text rows are filtered out, not fatal.  The filter is written
    before anything else so it pushes down to the scan.
    """
    return (
        transcripts.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .where(F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull())
        .where(F.col("text").isNotNull() & (F.length("text") > 0))
    )


def with_turn_context(turns: DataFrame, k_prev: int = 1) -> DataFrame:
    """Attach previous-turn context via lag over the conv window.

    The window's required distribution is hash(conv_id) — the same
    partitioning every later stage needs, so this is the pipeline's one
    up-front shuffle.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    out = turns.withColumn("turn_rank", F.row_number().over(w))
    for i in range(1, k_prev + 1):
        out = out.withColumn(f"prev_text_{i}", F.lag("text", i).over(w))
    return out


def assemble_conversations(turns: DataFrame) -> DataFrame:
    """S1: one row per conversation with an ordered array of turns.

    sort_array on the collected struct array is deterministic and
    shuffle-free per group (turn_idx is the struct's first field, so
    struct ordering == turn ordering).
    """
    turn_struct = F.struct(
        F.col("turn_idx"), F.col("role"), F.col("text"), F.col("tool"), F.col("ts")
    )
    return turns.groupBy("conv_id").agg(
        F.sort_array(F.collect_list(turn_struct)).alias("turns"),
        F.count("*").alias("n_turns"),
        F.min("ts").alias("started_at"),
        F.max("ts").alias("ended_at"),
    )


def reassembled_turns(conversations: DataFrame) -> DataFrame:
    """Inverse of assemble_conversations — used by the per-turn text-equality
    invariant test (input_hint): explode back to (conv_id, turn_idx, text)
    and require byte-identical rows vs the source."""
    return conversations.select(
        "conv_id", F.explode("turns").alias("t")
    ).select("conv_id", F.col("t.turn_idx").alias("turn_idx"), F.col("t.text").alias("text"))

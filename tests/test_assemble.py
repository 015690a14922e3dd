"""S0/S1 invariants — per-turn text equality under stable ordering is the
authoritative per-row invariant (BASELINE.json input_hint)."""

import pyspark.sql.functions as F

from stixtoneodb_spark.plans import assemble
from stixtoneodb_spark.sources.transcripts import transcripts_df


def test_reassembly_round_trip_is_byte_identical(spark):
    tr = transcripts_df(spark, 40)
    turns = assemble.normalize_turns(tr)
    conv = assemble.assemble_conversations(turns)
    back = assemble.reassembled_turns(conv)

    src = turns.select("conv_id", "turn_idx", "text")
    assert src.exceptAll(back).count() == 0
    assert back.exceptAll(src).count() == 0


def test_normalize_skips_empty_turns_without_failing(spark):
    tr = transcripts_df(spark, 80)
    raw = tr.count()
    kept = assemble.normalize_turns(tr).count()
    # generator plants ~0.5% empty turns; they must be dropped, not fatal
    assert 0 < raw - kept < raw * 0.05


def test_turn_ordering_is_stable_within_conversation(spark):
    tr = transcripts_df(spark, 20)
    turns = assemble.with_turn_context(assemble.normalize_turns(tr))
    # row_number over (conv_id, turn_idx) must be monotone in turn_idx
    bad = (
        turns.groupBy("conv_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("turn_rank", "turn_idx"))).alias("s")
        )
        .select(
            F.exists(
                F.zip_with(
                    F.col("s"),
                    F.slice(F.col("s"), 2, 100000),
                    lambda a, b: b.getField("turn_idx") < a.getField("turn_idx"),
                ),
                lambda x: x,
            ).alias("disordered")
        )
        .where("disordered")
        .count()
    )
    assert bad == 0


def test_lag_context_matches_previous_turn(spark):
    tr = transcripts_df(spark, 10)
    turns = assemble.with_turn_context(assemble.normalize_turns(tr), k_prev=1)
    rows = turns.select("conv_id", "turn_idx", "text", "prev_text_1").collect()
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)
    for conv_rows in by_conv.values():
        conv_rows.sort(key=lambda r: r.turn_idx)
        for prev, cur in zip(conv_rows, conv_rows[1:]):
            assert cur.prev_text_1 == prev.text
        assert conv_rows[0].prev_text_1 is None

"""Structured Streaming demonstrator tests (SURVEY §2 Streaming, §7 M6).

Strategy: feed the file source a bounded set of parquet chunks, run with
Trigger.AvailableNow (drain-and-stop), and assert the streaming results
equal the batch results on the same input — the batch/streaming agreement
guarantee that makes the demonstrator trustworthy.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stixtoneodb_spark.plans import assemble, extract
from stixtoneodb_spark.sources.transcripts import transcripts_df
from stixtoneodb_spark.streaming import ingest


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Transcript corpus split into 3 parquet chunk-files (arrival order)."""
    d = tmp_path_factory.mktemp("stream_in")
    tr = transcripts_df(spark, 60).persist()
    # chunk by event-time tertiles: file arrival order matches event time,
    # as a real at-most-slightly-late stream would, so watermark tests see
    # no artificial lateness
    with_s = tr.withColumn("_s", F.unix_timestamp("ts"))
    t1, t2 = with_s.approxQuantile("_s", [0.33, 0.66], 0.0)
    bounds = [(None, t1), (t1, t2), (t2, None)]
    for i, (lo, hi) in enumerate(bounds):
        chunk = with_s
        if lo is not None:
            chunk = chunk.where(F.col("_s") > F.lit(lo))
        if hi is not None:
            chunk = chunk.where(F.col("_s") <= F.lit(hi))
        chunk = chunk.drop("_s")
        chunk.coalesce(1).write.mode("overwrite").parquet(str(d / f"chunk{i}"))
    # flatten: file source wants a dir of files; stamp strictly increasing
    # mtimes so the source's modification-time ordering processes chunks in
    # arrival (= event-time) order — ties break arbitrarily otherwise
    flat = tmp_path_factory.mktemp("stream_flat")
    import glob
    import os
    import shutil
    import time

    now = time.time()
    for i, f in enumerate(sorted(glob.glob(str(d / "chunk*" / "*.parquet")))):
        dst = str(flat / f"part{i}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    tr.unpersist()
    return str(flat)


def _drain(query):
    query.awaitTermination(300)
    assert not query.isActive


def test_streaming_mentions_equal_batch(spark, stream_dir, tmp_path):
    """The streamed S0→S2 path emits exactly the batch path's mentions."""
    stream = ingest.read_transcript_stream(spark, stream_dir, max_files_per_trigger=1)
    out = (
        ingest.streaming_mentions(stream)
        .writeStream.format("memory")
        .queryName("stream_mentions_t1")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(out)
    streamed = spark.table("stream_mentions_t1")

    batch = extract.detect_mentions(
        assemble.normalize_turns(spark.read.parquet(stream_dir))
    )
    assert streamed.count() == batch.count() > 0
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_windowed_mention_counts(spark, stream_dir, tmp_path):
    """Tumbling-window rollup totals match a batch groupBy on the same data."""
    # multiple micro-batches so the watermark advances between them (append
    # mode emits a window only after the watermark passes its end); the
    # corpus spans ~85 minutes, so a 5-minute watermark closes all but the
    # tail windows by the final batch.
    stream = ingest.read_transcript_stream(spark, stream_dir, max_files_per_trigger=1)
    q = (
        ingest.windowed_mention_counts(stream, watermark="5 minutes", window_dur="10 minutes")
        .writeStream.format("memory")
        .queryName("win_counts_t2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    final_wm = q.lastProgress["eventTime"]["watermark"]
    streamed = spark.table("win_counts_t2")

    turns = assemble.normalize_turns(spark.read.parquet(stream_dir))
    batch = (
        turns.select("ts", F.explode(extract.detect_mentions_udf(F.col("text"))).alias("m"))
        .select(F.window("ts", "10 minutes").alias("win"), F.col("m.entity_type").alias("entity_type"))
        .groupBy(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "entity_type",
        )
        .agg(F.count("*").alias("n_mentions"))
    )
    # append mode emits exactly the windows the final watermark has closed —
    # compare against the batch groupBy restricted to those windows.
    closed = batch.where(
        F.col("window_end") <= F.to_timestamp(F.lit(final_wm))
    ).select("window_start", "entity_type", "n_mentions")
    assert streamed.count() == closed.count() > 0
    assert streamed.exceptAll(closed).count() == 0
    assert closed.exceptAll(streamed).count() == 0


def test_session_windows(spark, stream_dir, tmp_path):
    """Session windows: one session per conversation (gap > intra-conv
    spacing), turn counts match batch per-conv counts."""
    stream = ingest.read_transcript_stream(spark, stream_dir, max_files_per_trigger=1)
    q = (
        ingest.session_windowed_conversations(stream, watermark="5 minutes", gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sessions_t3")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    streamed = spark.table("sessions_t3")
    batch_counts = (
        assemble.normalize_turns(spark.read.parquet(stream_dir))
        .groupBy("conv_id")
        .agg(F.count("*").alias("n_batch"))
    )
    # turn gaps are <= 120s and the session gap is 30min, so each closed
    # conversation appears as exactly one session carrying all its turns
    j = streamed.groupBy("conv_id").agg(F.sum("n_turns").alias("n_stream")).join(
        batch_counts, "conv_id"
    )
    assert j.where(F.col("n_stream") != F.col("n_batch")).count() == 0
    assert streamed.count() > 0


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Re-delivered turns (at-least-once source) are dropped by
    dropDuplicatesWithinWatermark keyed on (conv_id, turn_idx)."""
    src = tmp_path / "dup_in"
    tr = transcripts_df(spark, 10)
    tr.coalesce(1).write.mode("overwrite").parquet(str(src / "a"))
    tr.coalesce(1).write.mode("overwrite").parquet(str(src / "b"))  # duplicate delivery
    import glob
    import shutil

    flat = tmp_path / "dup_flat"
    flat.mkdir()
    for i, f in enumerate(sorted(glob.glob(str(src / "*" / "*.parquet")))):
        shutil.copy(f, str(flat / f"part{i}.parquet"))

    stream = ingest.read_transcript_stream(spark, str(flat))
    q = (
        ingest.dedup_turns_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_t4")
        .option("checkpointLocation", str(tmp_path / "ckpt4"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    out = spark.table("dedup_t4")
    assert out.count() == tr.count()
    assert out.groupBy("conv_id", "turn_idx").count().where(F.col("count") > 1).count() == 0


def test_stateful_close_timer_survives_out_of_order_batch(spark, tmp_path):
    """The close timer must anchor to the conversation's latest turn over
    its WHOLE life (running max in state), not the current micro-batch's
    max: an out-of-order batch — above the watermark but older than
    previously seen turns — must not pull the close earlier.

    Layout (gap=30min, watermark=10s):
      chunk0: A@0min, A@40min, B@0min
      chunk1: A@10min (out of order), B@60min
    After chunk1 the watermark reaches ~60min.  A's true latest turn is
    40min, so its close horizon is 70min — A must still be OPEN.  A
    batch-max timer would have been reset to 10min+30min=40min < 60min
    and closed A early."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 0, 0, 0)

    def turns(rows):
        return spark.createDataFrame(
            [
                (conv, idx, "user", f"turn {idx}", None, base + dt.timedelta(minutes=m))
                for conv, idx, m in rows
            ],
            schema=ingest.TRANSCRIPT_SCHEMA,
        )

    src = tmp_path / "ooo_flat"
    src.mkdir()
    import glob
    import os
    import shutil
    import time

    chunks = [
        turns([("A", 0, 0), ("A", 1, 40), ("B", 0, 0)]),
        turns([("A", 2, 10), ("B", 1, 60)]),
    ]
    now = time.time()
    for i, chunk in enumerate(chunks):
        d = tmp_path / f"ooo_chunk{i}"
        chunk.coalesce(1).write.mode("overwrite").parquet(str(d))
        (f,) = glob.glob(str(d / "*.parquet"))
        dst = str(src / f"part{i}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (now + i * 10, now + i * 10))

    stream = ingest.read_transcript_stream(spark, str(src), max_files_per_trigger=1)
    q = (
        ingest.conversation_progress_stream(stream, gap="30 minutes", watermark="10 seconds")
        .writeStream.format("memory")
        .queryName("ooo_t7")
        .option("checkpointLocation", str(tmp_path / "ckpt7"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    out = spark.table("ooo_t7")
    closed = {r["conv_id"] for r in out.where("closed").collect()}
    assert "A" not in closed, "out-of-order batch pulled A's close timer earlier"
    # counts still accumulate across the out-of-order delivery
    a_total = out.where("conv_id = 'A'").agg(F.max("n_turns_total")).collect()[0][0]
    assert a_total == 3


def test_foreach_batch_merge_idempotent(spark, stream_dir, tmp_path):
    """foreachBatch MERGE sink: streaming mentions land in the catalog
    keyed on content; re-running the whole stream (fresh checkpoint —
    worst-case full replay) changes nothing."""
    from stixtoneodb_spark.plans.catalog import ParquetMergeCatalog

    wh = str(tmp_path / "wh")
    catalog = ParquetMergeCatalog(spark, wh)
    stream = ingest.read_transcript_stream(spark, stream_dir)
    _drain(ingest.start_mention_merge_sink(stream, wh, str(tmp_path / "c1")))
    # snapshot before the re-run: the second merge atomically swaps the
    # touched buckets, so the first DataFrame must be materialized now
    first_rows = sorted(map(tuple, catalog.read_bucketed("stream_mentions").collect()))
    n1 = len(first_rows)

    stream2 = ingest.read_transcript_stream(spark, stream_dir)
    _drain(ingest.start_mention_merge_sink(stream2, wh, str(tmp_path / "c2")))
    second_rows = sorted(map(tuple, catalog.read_bucketed("stream_mentions").collect()))
    assert second_rows == first_rows

    batch = extract.detect_mentions(
        assemble.normalize_turns(spark.read.parquet(stream_dir))
    )
    assert n1 == batch.count()


def test_custom_stateful_progress_operator(spark, stream_dir, tmp_path):
    """applyInPandasWithState with EVENT-TIME timeouts: per-conversation
    state must accumulate ACROSS micro-batches (one file per trigger =>
    3 batches), cumulative counts must equal batch truth, and the
    watermark-driven close must fire for exactly the conversations whose
    last turn fell a full gap behind the final watermark."""
    gap, wm_delay = "30 minutes", "10 seconds"
    stream = ingest.read_transcript_stream(spark, stream_dir, max_files_per_trigger=1)
    q = (
        ingest.conversation_progress_stream(stream, gap=gap, watermark=wm_delay)
        .writeStream.format("memory")
        .queryName("progress_t6")
        .option("checkpointLocation", str(tmp_path / "ckpt6"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    out = spark.table("progress_t6")

    # cumulative totals: last progress row per conversation == batch truth
    batch = spark.read.parquet(stream_dir).groupBy("conv_id").count()
    last = (
        out.groupBy("conv_id")
        .agg(F.max("n_turns_total").alias("n_turns_total"), F.sum("n_turns_batch").alias("sum_batches"))
    )
    j = last.join(batch, "conv_id")
    assert j.where(F.col("n_turns_total") != F.col("count")).count() == 0
    # per-batch increments must add up to the same total (state really
    # accumulated per micro-batch rather than recomputing; closed rows
    # carry n_turns_batch=0 so they don't perturb the sum)
    assert j.where(F.col("sum_batches") != F.col("count")).count() == 0
    # at least one conversation spans multiple micro-batches
    assert out.where(~F.col("closed")).groupBy("conv_id").count().where(
        F.col("count") > 1
    ).count() > 0

    # event-time close: final watermark = global max ts - delay; every
    # conversation whose last turn + gap < watermark MUST have closed
    # (strictly-inside cases only — the boundary depends on Spark's
    # internal <=/<), and nothing beyond the watermark may close.
    gap_ms = ingest._duration_ms(gap)
    delay_ms = ingest._duration_ms(wm_delay)
    ts_ms = F.unix_millis("ts")
    turns = spark.read.parquet(stream_dir)
    final_wm = turns.agg(F.max(ts_ms)).collect()[0][0] - delay_ms
    last_ts = turns.groupBy("conv_id").agg(F.max(ts_ms).alias("last_ms"))
    must_close = {
        r["conv_id"]
        for r in last_ts.where(F.col("last_ms") + gap_ms < final_wm - 1000).collect()
    }
    may_not_close = {
        r["conv_id"]
        for r in last_ts.where(F.col("last_ms") + gap_ms > final_wm).collect()
    }
    closed = {r["conv_id"] for r in out.where("closed").select("conv_id").collect()}
    assert must_close, "fixture must contain conversations past the close horizon"
    assert must_close <= closed
    assert not (closed & may_not_close)
    # a closed conversation's final row repeats its cumulative total
    closed_rows = out.where("closed")
    cj = closed_rows.join(batch, "conv_id")
    assert cj.where(F.col("n_turns_total") != F.col("count")).count() == 0
    # close fires exactly once per conversation
    assert closed_rows.groupBy("conv_id").count().where(F.col("count") > 1).count() == 0


def test_sliding_window_rate_equals_batch(spark, stream_dir, tmp_path):
    """Sliding windows: streamed counts equal the batch groupBy on the same
    overlapping window expression (append mode emits only watermark-closed
    windows — compare against the batch restricted to those), and closed
    events appear in exactly window/slide = 2 windows."""
    stream = ingest.read_transcript_stream(spark, stream_dir, max_files_per_trigger=1)
    q = (
        ingest.sliding_window_turn_rate(stream, watermark="5 minutes")
        .writeStream.format("memory")
        .queryName("slide_t1")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_slide"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    final_wm = q.lastProgress["eventTime"]["watermark"]
    streamed = spark.table("slide_t1")

    turns = assemble.normalize_turns(spark.read.parquet(stream_dir))
    batch = (
        turns.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )
    closed = batch.where(F.col("window_end") <= F.to_timestamp(F.lit(final_wm)))
    assert streamed.count() == closed.count() > 0
    assert streamed.exceptAll(closed).count() == 0
    assert closed.exceptAll(streamed).count() == 0
    # overlap factor: every turn whose BOTH covering windows closed
    # contributes twice; turns fully before (final_wm - window) qualify
    fully_closed_turns = turns.where(
        F.col("ts") < F.to_timestamp(F.lit(final_wm)) - F.expr("interval 10 minutes")
    ).count()
    total = streamed.agg(F.sum("n_turns")).collect()[0][0]
    assert total >= 2 * fully_closed_turns > 0


def test_stream_interval_join_equals_batch(spark, stream_dir, tmp_path):
    """Stream-stream interval self-join drains under AvailableNow and
    emits exactly the batch join's pairs."""
    stream = ingest.read_transcript_stream(spark, stream_dir, max_files_per_trigger=1)
    q = (
        ingest.stream_interval_join(stream)
        .writeStream.format("memory")
        .queryName("ivj_t1")
        .option("checkpointLocation", str(tmp_path / "ckpt_ivj"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    streamed = spark.table("ivj_t1")

    turns = assemble.normalize_turns(spark.read.parquet(stream_dir))
    l = turns.where(F.col("role") == "user").select(
        F.col("conv_id").alias("l_conv"),
        F.col("turn_idx").alias("user_turn_idx"),
        F.col("ts").alias("user_ts"),
    )
    r = turns.where(F.col("role") == "assistant").select(
        F.col("conv_id").alias("r_conv"),
        F.col("turn_idx").alias("assistant_turn_idx"),
        F.col("ts").alias("assistant_ts"),
    )
    batch = (
        l.join(
            r,
            F.expr(
                "l_conv = r_conv AND assistant_ts >= user_ts"
                " AND assistant_ts <= user_ts + interval 10 minutes"
                " AND assistant_turn_idx > user_turn_idx"
            ),
        )
        .select(
            F.col("l_conv").alias("conv_id"),
            "user_turn_idx",
            "assistant_turn_idx",
            (F.unix_micros("assistant_ts") - F.unix_micros("user_ts")).alias(
                "latency_us"
            ),
        )
    )
    assert streamed.count() == batch.count() > 0
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    # pairing sanity: every emitted latency is within the bound
    assert streamed.where("latency_us < 0 OR latency_us > 600000000").count() == 0


def test_stream_static_enrich(spark, stream_dir, tmp_path):
    dim = spark.createDataFrame(
        [("user", 1.0), ("assistant", 2.0), ("tool", 0.5)], "role string, weight double"
    )
    stream = ingest.read_transcript_stream(spark, stream_dir, max_files_per_trigger=1)
    q = (
        ingest.stream_static_enrich(stream, dim)
        .writeStream.format("memory")
        .queryName("enrich_t1")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    streamed = spark.table("enrich_t1")
    turns = assemble.normalize_turns(spark.read.parquet(stream_dir))
    assert streamed.count() == turns.count() > 0
    # every known role got its weight; unknown roles (if any) got null
    known = {r["role"]: r["weight"] for r in dim.collect()}
    for row in streamed.select("role", "weight").distinct().collect():
        assert row["weight"] == known.get(row["role"])


def test_streaming_heavy_hitters_sketch(spark, stream_dir, tmp_path):
    """Running MG sketch across micro-batches: in the no-eviction regime
    (capacity > surface vocabulary) the final persisted sketch must equal
    the exact batch groupBy counts over the whole input — the mergeable-
    summaries identity, and proof the per-batch merge neither drops nor
    double-counts across batches."""
    stream = ingest.read_transcript_stream(spark, stream_dir, max_files_per_trigger=1)
    state = tmp_path / "hh_state"
    q = ingest.start_heavy_hitters_sink(
        stream, str(state), str(tmp_path / "hh_ckpt"), capacity=512
    )
    _drain(q)
    got = {
        r["token"]: r["w"]
        for r in ingest.read_heavy_hitters_state(spark, str(state)).collect()
    }
    exact = {
        r["surface"]: r["n"]
        for r in extract.detect_mentions(
            assemble.normalize_turns(spark.read.parquet(stream_dir))
        )
        .groupBy("surface")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exact and got
    # one state version per micro-batch (3 chunks, maxFilesPerTrigger=1)
    import os

    versions = sorted(n for n in os.listdir(state) if n.startswith("v"))
    assert len(versions) == 3


def test_streaming_heavy_hitters_replay_is_idempotent(spark, stream_dir, tmp_path):
    """Re-running the drained stream with the SAME checkpoint must not
    change the sketch (no re-delivery); re-running a batch id manually
    against its own version slot reproduces, not double-counts."""
    stream = ingest.read_transcript_stream(spark, stream_dir, max_files_per_trigger=1)
    state = tmp_path / "hh_state"
    ckpt = tmp_path / "hh_ckpt"
    q = ingest.start_heavy_hitters_sink(stream, str(state), str(ckpt), capacity=512)
    _drain(q)
    before = {
        r["token"]: r["w"]
        for r in ingest.read_heavy_hitters_state(spark, str(state)).collect()
    }
    # same checkpoint: AvailableNow finds nothing new, state unchanged
    q2 = ingest.start_heavy_hitters_sink(
        ingest.read_transcript_stream(spark, stream_dir, max_files_per_trigger=1),
        str(state),
        str(ckpt),
        capacity=512,
    )
    _drain(q2)
    after = {
        r["token"]: r["w"]
        for r in ingest.read_heavy_hitters_state(spark, str(state)).collect()
    }
    assert after == before


def test_transform_with_state_variant_equals_legacy(spark, stream_dir, tmp_path):
    """Spark 4 migration pin: ``conversation_progress_stream_tws``
    (transformWithStateInPandas, the applyInPandasWithState successor)
    must emit the IDENTICAL row multiset as the legacy operator on the
    same bounded chunked stream — progress rows and close rows both.

    Environment gate: the transformWithState driver worker speaks a
    protobuf state-server protocol; this container ships no
    google.protobuf (and installs are unavailable), so the operator
    cannot EXECUTE here — verified by running it: the query fails in
    schema pre-init with `ImportError: cannot import name 'descriptor'
    from 'google.protobuf'`.  The implementation + this pin stay ready
    for any protobuf-equipped deployment; the legacy operator remains
    the executable tier (test_custom_stateful_progress_operator)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf; "
        "not shipped in this container",
    )
    from collections import Counter

    gap, wm_delay = "30 minutes", "10 seconds"
    # transformWithState requires the RocksDB state store provider
    # (HDFS-backed does not implement the new operator's state API)
    sk = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(sk, None)
    spark.conf.set(
        sk,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    outs = []
    for name, fn in (
        ("legacy_tws_a", ingest.conversation_progress_stream),
        ("tws_b", ingest.conversation_progress_stream_tws),
    ):
        stream = ingest.read_transcript_stream(
            spark, stream_dir, max_files_per_trigger=1
        )
        q = (
            fn(stream, gap=gap, watermark=wm_delay)
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        outs.append(
            Counter(
                (r["conv_id"], r["n_turns_total"], r["n_turns_batch"], r["closed"])
                for r in spark.table(name).collect()
            )
        )
    if prev is None:
        spark.conf.unset(sk)
    else:
        spark.conf.set(sk, prev)
    legacy, tws = outs
    assert sum(legacy.values()) > 0
    assert legacy == tws

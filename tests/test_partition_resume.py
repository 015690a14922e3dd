"""Per-partition (conv_id-bucket) checkpointed ingest: kill-and-resume at
bucket granularity (north rule: resumable from per-partition checkpoints
carrying lineage + metrics)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stixtoneodb_spark.plans.pipeline import KgPipeline
from stixtoneodb_spark.sources.transcripts import alias_edges_df, transcripts_df

N_BUCKETS = 4


def test_bucketed_ingest_kill_resume(spark, tmp_path):
    wh = str(tmp_path / "wh")
    tr = transcripts_df(spark, 40)

    # "killed" run: only 2 of 4 buckets complete
    p1 = KgPipeline(spark, wh, run_id="r1", ingest_buckets=N_BUCKETS)
    p1.ingest_partitioned(tr, max_buckets=2)
    ck = p1.catalog.read("_checkpoints")
    assert ck.where((F.col("stage") == "s0_ingest") & (F.col("status") == "done")).count() == 2

    done_dirs = [f"{wh}/turns/bucket={b}" for b in range(2)]
    mtimes_before = {d: os.path.getmtime(d) for d in done_dirs}

    # resume: fresh pipeline object, same run_id — completes the remaining
    # buckets without rewriting the finished ones
    p2 = KgPipeline(spark, wh, run_id="r1", ingest_buckets=N_BUCKETS)
    turns = p2.ingest_partitioned(tr)
    ck2 = p2.catalog.read("_checkpoints")
    assert ck2.where((F.col("stage") == "s0_ingest") & (F.col("status") == "done")).count() == N_BUCKETS
    for d in done_dirs:
        assert os.path.getmtime(d) == mtimes_before[d], f"{d} was rewritten on resume"

    # resumed output == single-pass normalization of the full input
    from stixtoneodb_spark.plans import assemble

    expect = assemble.normalize_turns(tr)
    assert turns.count() == expect.count()
    assert turns.exceptAll(expect).count() == 0
    assert expect.exceptAll(turns).count() == 0

    # lineage rows carry per-part rows + wall metrics
    parts = ck2.where(F.col("stage") == "s0_ingest").select("part", "rows").collect()
    assert sorted(r["part"] for r in parts) == list(range(N_BUCKETS))
    assert sum(r["rows"] for r in parts) == expect.count()


def test_full_pipeline_with_bucketed_ingest(spark, tmp_path):
    """The whole checkpointed pipeline runs on top of bucketed S0 and its
    graph equals the unbucketed pipeline's graph."""
    wh_a = str(tmp_path / "a")
    wh_b = str(tmp_path / "b")
    tr = transcripts_df(spark, 25)
    al = alias_edges_df(spark)

    ra = KgPipeline(spark, wh_a, run_id="x", ingest_buckets=N_BUCKETS).run(tr, alias_edges=al)
    rb = KgPipeline(spark, wh_b, run_id="x").run(tr, alias_edges=al)
    assert ra.nodes.exceptAll(rb.nodes).count() == 0
    assert rb.nodes.exceptAll(ra.nodes).count() == 0
    assert ra.edges.exceptAll(rb.edges).count() == 0
    assert rb.edges.exceptAll(ra.edges).count() == 0

"""spark-submit entry point (python -m stixtoneodb_spark) smoke tests.

Runs the CLI in-process against a tiny corpus: batch mode produces the
warehouse tables and is resumable; a second run with the same run-id
resumes from checkpoints without recomputing.
"""

from __future__ import annotations

import json

import pytest

from stixtoneodb_spark.__main__ import main
from stixtoneodb_spark.sources.transcripts import transcripts_df


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_in")
    transcripts_df(spark, 20).write.mode("overwrite").parquet(str(d / "tr"))
    return str(d / "tr")


def test_cli_batch_mode(spark, corpus_path, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    rc = main(["--input", corpus_path, "--warehouse", wh, "--run-id", "t1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "batch" and out["run_id"] == "t1"
    nodes = spark.read.parquet(wh + "/nodes")
    edges = spark.read.parquet(wh + "/edges")
    assert nodes.count() > 0 and edges.count() > 0
    # graph invariant: every edge endpoint resolves to a node
    ids = nodes.select("id")
    assert edges.join(ids, edges.src == ids.id, "left_anti").count() == 0


def test_cli_resume_same_run_id(spark, corpus_path, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    main(["--input", corpus_path, "--warehouse", wh, "--run-id", "t2"])
    first = sorted(map(tuple, spark.read.parquet(wh + "/nodes").collect()))
    capsys.readouterr()
    rc = main(["--input", corpus_path, "--warehouse", wh, "--run-id", "t2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # resume path: no stage re-ran, so no new stage metrics were recorded
    assert out["metrics"] == {}
    second = sorted(map(tuple, spark.read.parquet(wh + "/nodes").collect()))
    assert second == first


def test_cli_graphml_export(spark, corpus_path, tmp_path, capsys):
    import xml.etree.ElementTree as ET

    wh = str(tmp_path / "wh")
    gml = str(tmp_path / "g.graphml")
    rc = main(
        ["--input", corpus_path, "--warehouse", wh, "--run-id", "t3", "--export-graphml", gml]
    )
    assert rc == 0
    tree = ET.parse(gml)
    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    assert len(tree.findall(".//g:node", ns)) == spark.read.parquet(wh + "/nodes").count()

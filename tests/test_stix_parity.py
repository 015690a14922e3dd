"""F2 — STIX-parity fixture: the reference's own golden corpus through our
generic graph builder must reproduce the exact emitted graph (SURVEY §2.1;
expected values computed over /root/reference/stix-files/testfull.json;
skip semantics per /root/reference/README.md:83-85)."""

import json

import pytest
import pyspark.sql.functions as F

from stixtoneodb_spark.sources.stix import build_graph, read_bundle, read_ndjson, read_zip

BUNDLE = "/root/reference/stix-files/testfull.json"
BUNDLE_ZIP = "/root/reference/stix-files/testfull.zip"


def _graph_signature(g):
    """The full parity signature: node ids, (src, rel_type, dst) edge
    multiset, child-kind counts, dropped count."""
    nodes = tuple(sorted(r.id for r in g.nodes.select("id").collect()))
    edges = tuple(
        sorted((r.src, r.rel_type, r.dst) for r in g.edges.select("src", "rel_type", "dst").collect())
    )
    children = tuple(
        sorted(
            (r.kind, r.cnt)
            for r in g.children.groupBy("kind").agg(F.count("*").alias("cnt")).collect()
        )
    )
    return nodes, edges, children, g.dropped_edges.count()


@pytest.fixture(scope="module")
def graph(spark):
    g = build_graph(read_bundle(spark, BUNDLE))
    g.nodes.cache().count()
    g.edges.cache().count()
    return g


def test_node_count_and_malformed_ids_load(graph):
    assert graph.nodes.count() == 156
    # malformed ids are opaque strings, never validated (testfull.json:67, :3491)
    ids = {r.id for r in graph.nodes.select("id").collect()}
    assert "indicator--3tgverxfryjnujnu" in ids
    assert "marking-definition--340wqsxwsxwxwa" in ids


def test_sro_edge_multiset(graph):
    sro = graph.edges.where(
        F.col("rel_type").isin(
            "indicates", "uses", "attributed-to", "targets", "mitigates", "impersonates"
        )
    )
    assert sro.count() == 138
    dist = {r.rel_type: r.cnt for r in sro.groupBy("rel_type").agg(F.count("*").alias("cnt")).collect()}
    assert dist == {
        "indicates": 70,
        "uses": 44,
        "attributed-to": 11,
        "targets": 10,
        "mitigates": 2,
        "impersonates": 1,
    }


def test_embedded_ref_edges(graph):
    dist = {
        r.rel_type: r.cnt
        for r in graph.edges.groupBy("rel_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert dist["created_by"] == 31
    assert dist["object_marking"] == 16
    assert dist["object"] == 229  # 228 report object_refs + 1 language-content object_ref
    assert dist["sighted"] == 1


def test_children_flattening(graph):
    dist = {
        r.kind: r.cnt
        for r in graph.children.groupBy("kind").agg(F.count("*").alias("cnt")).collect()
    }
    assert dist == {
        "kill_chain_phases": 29,
        "external_references": 21,
        "granular_markings": 3,
        "observable": 2,
    }


def test_dangling_refs_skipped_and_counted(graph):
    dropped = graph.dropped_edges.collect()
    assert len(dropped) == 3
    kinds = {(r.kind, r.ref) for r in dropped}
    assert ("relationship", "threat-actor--aaaaaaaaaaaaaaaa") in kinds
    assert ("sighting", "indicator--xxxxxzzzzzxxxxx") in kinds
    assert ("created_by_ref", "identity--hhhhhhhjjjjjjjjj") in kinds


def test_ndjson_reader_parity(spark, graph, tmp_path):
    """A4 (`-x` line mode, StixToNeoDB.scala:54-55): the same corpus
    split one-object-per-line must build the identical graph."""
    objs = json.load(open(BUNDLE))["objects"]
    nd = tmp_path / "testfull.ndjson"
    nd.write_text("\n".join(json.dumps(o) for o in objs) + "\n")
    g2 = build_graph(read_ndjson(spark, str(nd)))
    assert _graph_signature(g2) == _graph_signature(graph)


def test_zip_ndjson_reader_parity(spark, graph, tmp_path):
    """`-x` + zip (loadLargeZipTextFile, StixToNeoDB.scala:55): the same
    corpus split one-object-per-line across TWO zip entries must build
    the identical graph as the bundle path and as plain NDJSON."""
    import zipfile

    from stixtoneodb_spark.sources.stix import read_zip_ndjson

    objs = json.load(open(BUNDLE))["objects"]
    half = len(objs) // 2
    z = tmp_path / "testfull_nd.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("part1.ndjson", "\n".join(json.dumps(o) for o in objs[:half]))
        zf.writestr("sub/part2.ndjson",
                    "\n".join(json.dumps(o) for o in objs[half:]) + "\n")
    g2 = build_graph(read_zip_ndjson(spark, str(z), str(tmp_path / "staging")))
    assert _graph_signature(g2) == _graph_signature(graph)


def test_ndjson_props_keeps_raw_line_and_malformed_lines_gated(spark, tmp_path):
    """The NDJSON path retains the ORIGINAL line (custom x_* fields
    survive) and malformed lines fail soft through the id-null gate."""
    lines = [
        json.dumps({"type": "identity", "id": "identity--1", "name": "n",
                    "x_custom_flag": "kept"}),
        "{this is not json",
    ]
    nd = tmp_path / "mixed.ndjson"
    nd.write_text("\n".join(lines) + "\n")
    df = read_ndjson(spark, str(nd))
    ok = df.where(F.col("id").isNotNull())
    bad = df.where(F.col("id").isNull())
    assert ok.count() == 1 and bad.count() == 1  # skip-and-continue (README.md:83-85)
    assert "x_custom_flag" in ok.select("props").first()["props"]


def test_bundle_props_keeps_custom_x_fields(spark, tmp_path):
    """`-f` bundle mode keeps custom ``x_*`` properties like the
    reference does (changes.md:40-43): the variant-based splitter keeps
    every field of each object in ``props`` even though the frozen union
    schema does not model it."""
    b = tmp_path / "custom.json"
    b.write_text(json.dumps({
        "type": "bundle", "id": "bundle--c", "objects": [
            {"type": "identity", "id": "identity--1", "name": "n",
             "x_custom_flag": "kept", "x_nested": {"k": [1, 2]}},
        ],
    }))
    df = read_bundle(spark, str(b))
    row = df.where(F.col("id") == "identity--1").select("props", "name").first()
    assert row["name"] == "n"  # typed projection still works
    props = json.loads(row["props"])
    assert props["x_custom_flag"] == "kept"
    assert props["x_nested"] == {"k": [1, 2]}


def test_zip_reader_parity(spark, graph, tmp_path):
    """A3 (zip-of-bundles, StixToNeoDB.scala:51): the corpus split across
    TWO bundle entries of one archive must build the identical graph —
    including refs that now cross entry boundaries (the two-pass barrier
    A13: nodes from all entries load before refs resolve).

    (The reference's shipped testfull.zip is an OLDER corpus revision —
    162,886 B entry vs the 165,553 B testfull.json, 151 node-objects and
    no dangling refs — so byte-parity against the json is asserted on a
    re-zip of the current corpus, and the shipped zip gets a smoke load.)
    """
    import zipfile

    objs = json.load(open(BUNDLE))["objects"]
    half = len(objs) // 2
    z = tmp_path / "split.zip"
    with zipfile.ZipFile(z, "w") as zf:
        for i, chunk in enumerate((objs[:half], objs[half:])):
            zf.writestr(
                f"part{i}.json",
                json.dumps({"type": "bundle", "id": f"bundle--{i}", "objects": chunk}),
            )
    g2 = build_graph(read_zip(spark, str(z), str(tmp_path / "staging")))
    assert _graph_signature(g2) == _graph_signature(graph)

    # the shipped (older-revision) archive still loads through the same path
    g3 = build_graph(read_zip(spark, BUNDLE_ZIP, str(tmp_path / "staging2")))
    assert g3.nodes.count() == 151


def test_typed_node_projection(graph):
    """A7 depth: per-type spec fields are real typed columns (values from
    testfull.json), not JSON-in-a-string."""
    rows = {
        r.id: r
        for r in graph.nodes.where(
            F.col("id").isin(
                "indicator--3tgverxfryjnujnu",
                "identity--f690c992-8e7d-4b9a-9303-3312616c0220",
                "threat-actor--dfaa8d77-07e2-4e28-b2c8-92e9f7b04428",
                "malware--162d917e-766f-4611-b5d6-652791454fca",
                "tool--ce45f721-af14-4fc0-938c-000c16186418",
            )
        ).collect()
    }
    assert rows["indicator--3tgverxfryjnujnu"].pattern == "[ ipv4addr:value = '10.0.0.0' ]"
    assert rows["indicator--3tgverxfryjnujnu"].valid_from == "2014-05-08T09:00:00.000000Z"
    assert rows["identity--f690c992-8e7d-4b9a-9303-3312616c0220"].identity_class == "organization"
    ta = rows["threat-actor--dfaa8d77-07e2-4e28-b2c8-92e9f7b04428"]
    assert ta.aliases == ["Equipo del Discoteca"] and ta.roles == ["agent"]
    assert rows["malware--162d917e-766f-4611-b5d6-652791454fca"].labels == [
        "backdoor", "remote-access-trojan"
    ]
    assert rows["tool--ce45f721-af14-4fc0-938c-000c16186418"].labels == [
        "credential-exploitation"
    ]
    # every typed column is consistent with the raw JSON for every node
    incon = graph.nodes.where(
        F.coalesce(F.get_json_object("props", "$.identity_class"), F.lit(""))
        != F.coalesce(F.col("identity_class"), F.lit(""))
    )
    assert incon.count() == 0


def test_idempotence_load_twice_identical(spark, graph):
    g2 = build_graph(read_bundle(spark, BUNDLE))
    assert g2.edges.select("id").exceptAll(graph.edges.select("id")).count() == 0
    assert graph.edges.select("id").exceptAll(g2.edges.select("id")).count() == 0
    assert g2.nodes.select("id").exceptAll(graph.nodes.select("id")).count() == 0

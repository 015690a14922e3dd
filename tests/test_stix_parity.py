"""F2 — STIX-parity fixture: the reference's own golden corpus through our
generic graph builder must reproduce the exact emitted graph (SURVEY §2.1;
expected values computed over /root/reference/stix-files/testfull.json;
skip semantics per /root/reference/README.md:83-85)."""

import pytest
import pyspark.sql.functions as F

from stixtoneodb_spark.sources.stix import build_graph, read_bundle

BUNDLE = "/root/reference/stix-files/testfull.json"


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


def test_idempotence_load_twice_identical(spark, graph):
    g2 = build_graph(read_bundle(spark, BUNDLE))
    assert g2.edges.select("id").exceptAll(graph.edges.select("id")).count() == 0
    assert graph.edges.select("id").exceptAll(g2.edges.select("id")).count() == 0
    assert g2.nodes.select("id").exceptAll(graph.nodes.select("id")).count() == 0

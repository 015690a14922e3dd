"""Graph export: CSV / JSON-lines / GraphML out of the nodes+edges tables.

Reference correspondence: the reference exports its Neo4j graph to
GraphML / Cypher / CSV via external shell tools
(/root/reference/how-2-convert.md:32-43); here export is a first-class
DataFrame write.  CSV/JSON are plain distributed writes.  GraphML is an
XML document with a single header/footer envelope — the per-element
serialization is distributed (one XML fragment column per node/edge,
built with JVM string expressions), and only the envelope concatenation
is sequential (driver streams part files into one document; a real
cluster writes fragment files to object storage and composes them).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAPHML_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
    '  <key id="label" for="node" attr.name="label" attr.type="string"/>\n'
    '  <key id="node_type" for="node" attr.name="node_type" attr.type="string"/>\n'
    '  <key id="rel_type" for="edge" attr.name="rel_type" attr.type="string"/>\n'
    '  <graph id="G" edgedefault="directed">\n'
)
GRAPHML_FOOTER = "  </graph>\n</graphml>\n"


def _xml_escape(col):
    """Minimal XML text escaping as a JVM expression chain."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    for raw, ent in [("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")]:
        out = F.replace(out, F.lit(raw), F.lit(ent))
    return out


def node_fragments(nodes: DataFrame) -> DataFrame:
    """One GraphML <node> XML fragment per row — distributed serialization."""
    return nodes.select(
        F.concat(
            F.lit('    <node id="'),
            _xml_escape(F.col("id")),
            F.lit('"><data key="label">'),
            _xml_escape(F.col("label")),
            F.lit('</data><data key="node_type">'),
            _xml_escape(F.col("node_type")),
            F.lit("</data></node>"),
        ).alias("xml")
    )


def edge_fragments(edges: DataFrame) -> DataFrame:
    """One GraphML <edge> XML fragment per row."""
    return edges.select(
        F.concat(
            F.lit('    <edge id="'),
            _xml_escape(F.col("id")),
            F.lit('" source="'),
            _xml_escape(F.col("src")),
            F.lit('" target="'),
            _xml_escape(F.col("dst")),
            F.lit('"><data key="rel_type">'),
            _xml_escape(F.col("rel_type")),
            F.lit("</data></edge>"),
        ).alias("xml")
    )


def export_csv(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Distributed CSV export (the neo4j-admin-export analog,
    how-2-convert.md:38-43): header'd part files per table."""
    nodes.write.mode("overwrite").option("header", True).csv(os.path.join(out_dir, "nodes_csv"))
    edges.write.mode("overwrite").option("header", True).csv(os.path.join(out_dir, "edges_csv"))


def export_jsonl(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Distributed JSON-lines export."""
    nodes.write.mode("overwrite").json(os.path.join(out_dir, "nodes_json"))
    edges.write.mode("overwrite").json(os.path.join(out_dir, "edges_json"))


def _cypher_escape(col):
    """Escape a value for a single-quoted Cypher string literal."""
    return F.replace(
        F.replace(col, F.lit("\\"), F.lit("\\\\")), F.lit("'"), F.lit("\\'")
    )


def _cypher_ident(col):
    """Legal Neo4j label / relationship-type identifier: the reference's
    loader maps STIX type names onto Neo4j labels, which cannot carry
    ``-`` (how-2-convert.md targets Neo4j; e.g. ``attack-pattern`` →
    ``attack_pattern``).

    These fields sit in IDENTIFIER position and arrive verbatim from
    untrusted STIX input (read_ndjson deliberately keeps malformed
    objects), so '-'-translation alone was a Cypher-injection hole: a
    crafted relationship_type could break out of the identifier and smuggle
    arbitrary clauses into the replay script.  Anything that does not match
    the bare-identifier whitelist after translation is backtick-quoted with
    backtick doubling — the Cypher escaped-identifier form — so hostile
    text stays an identifier."""
    translated = F.translate(col, "-", "_")
    quoted = F.concat(
        F.lit("`"), F.replace(translated, F.lit("`"), F.lit("``")), F.lit("`")
    )
    return F.when(
        translated.rlike("^[A-Za-z_][A-Za-z0-9_]*$"), translated
    ).otherwise(quoted)


def cypher_node_statements(nodes: DataFrame) -> DataFrame:
    """One ``MERGE (:Label {id: ...})`` statement per node — distributed
    string building, MERGE for the reference's append-to-existing-db
    semantics (README.md:75)."""
    return nodes.select(
        F.concat(
            F.lit("MERGE (n:"),
            _cypher_ident(F.col("node_type")),
            F.lit(" {id: '"),
            _cypher_escape(F.col("id")),
            F.lit("'}) SET n.label = '"),
            _cypher_escape(F.coalesce(F.col("label"), F.lit(""))),
            F.lit("';"),
        ).alias("stmt")
    )


def cypher_edge_statements(edges: DataFrame) -> DataFrame:
    """One ``MATCH ... MERGE (a)-[:REL]->(b)`` statement per edge."""
    return edges.select(
        F.concat(
            F.lit("MATCH (a {id: '"),
            _cypher_escape(F.col("src")),
            F.lit("'}), (b {id: '"),
            _cypher_escape(F.col("dst")),
            F.lit("'}) MERGE (a)-[:"),
            _cypher_ident(F.col("rel_type")),
            F.lit(" {id: '"),
            _cypher_escape(F.col("id")),
            F.lit("'}]->(b);"),
        ).alias("stmt")
    )


def export_cypher(nodes: DataFrame, edges: DataFrame, out_path: str) -> None:
    """Cypher-statement export (how-2-convert.md:41 "To export your data
    as Cypher statements"): node MERGEs first, then edge MATCH..MERGEs —
    the file replays into any Neo4j in one pass because every endpoint
    exists before its edges (the A13 two-pass barrier, re-expressed as
    statement order).  Statement strings are built by executors; the
    driver only streams part files into one .cypher document."""
    tmp_nodes = out_path + ".nodes.tmp"
    tmp_edges = out_path + ".edges.tmp"
    cypher_node_statements(nodes).write.mode("overwrite").text(tmp_nodes)
    cypher_edge_statements(edges).write.mode("overwrite").text(tmp_edges)
    with open(out_path, "w", encoding="utf-8") as out:
        for d in (tmp_nodes, tmp_edges):
            for part in sorted(glob.glob(os.path.join(d, "part-*"))):
                with open(part, encoding="utf-8") as f:
                    for line in f:
                        out.write(line)
    import shutil

    shutil.rmtree(tmp_nodes, ignore_errors=True)
    shutil.rmtree(tmp_edges, ignore_errors=True)


def export_graphml(nodes: DataFrame, edges: DataFrame, out_path: str) -> None:
    """Single-document GraphML export.

    The XML fragments are produced by executors (text part files, ordered
    nodes-then-edges); the driver only streams the parts into the envelope
    — O(output bytes) sequential I/O, no row materialization in memory.
    """
    tmp_nodes = out_path + ".nodes.tmp"
    tmp_edges = out_path + ".edges.tmp"
    node_fragments(nodes).write.mode("overwrite").text(tmp_nodes)
    edge_fragments(edges).write.mode("overwrite").text(tmp_edges)
    with open(out_path, "w", encoding="utf-8") as out:
        out.write(GRAPHML_HEADER)
        for d in (tmp_nodes, tmp_edges):
            for part in sorted(glob.glob(os.path.join(d, "part-*"))):
                with open(part, encoding="utf-8") as f:
                    for line in f:
                        out.write(line)
        out.write(GRAPHML_FOOTER)
    import shutil

    shutil.rmtree(tmp_nodes, ignore_errors=True)
    shutil.rmtree(tmp_edges, ignore_errors=True)

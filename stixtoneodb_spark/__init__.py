"""stixtoneodb_spark — a PySpark-native knowledge-graph construction engine.

Rebuilds the capabilities of the reference loader (workingDog/StixToNeoDB:
parse typed documents -> emit property-graph nodes and edges, with dedup on
id, dangling-ref skipping, and append/MERGE semantics; see
/root/reference/src/main/scala/com/kodekutters/StixToNeoDB.scala:32-58 and
/root/reference/README.md:69-85) as an idiomatic Spark DataFrame pipeline
over conversation-transcript corpora, plus the relational / dedup /
similarity / text-analysis operator library a large-scale training-data
pipeline needs.

Everything here is DataFrame-first: Catalyst plans the physical execution;
Python UDFs appear only as Arrow-vectorized pandas UDFs where built-in
functions genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

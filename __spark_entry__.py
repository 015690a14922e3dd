"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (entity co-mention pairs — the KG
pipeline's headline shape) on sf0.001.  ``queries``/``oracle_sql`` expose
the full operator registry (stixtoneodb_spark/operators/registry.py); the
driver compares each Spark result against its DuckDB oracle at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stixtoneodb_spark.operators.registry import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top co-mentioned entity pairs over the document corpus —
    the 'top entity pairs by co-mention' query of SURVEY §7 M0."""
    from stixtoneodb_spark.operators.text import kg_cooccurrence

    return kg_cooccurrence(spark, "/root/testdata/sf0.001").orderBy(
        F.desc("n_docs"), "mention_a", "mention_b"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """ANSI-SQL oracles (DuckDB dialect) for every SQL-expressible query;
    hash-seeded LSH/MinHash structures are rows-only by design."""
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}

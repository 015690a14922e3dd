"""Keyed-table catalog with MERGE-INTO semantics (parquet fallback).

The reference appends into an existing Neo4j store keyed on STIX id: "If the
database already exists, the data will be added to it"
(/root/reference/README.md:75) — i.e. MERGE/upsert.  The Spark-idiomatic
target is an Iceberg table with ``MERGE INTO``; this sandbox has no Iceberg
runtime jar, so the catalog interface here has two backends:

- ``IcebergCatalog`` (used when ``spark.sql.catalog.*`` is configured):
  straight ``MERGE INTO t USING s ON t.<key> = s.<key> WHEN NOT MATCHED
  THEN INSERT *`` — storage handles idempotence.
- ``ParquetMergeCatalog`` (sandbox default): read-merge-overwrite that
  preserves the same contract: upsert keyed on ``key_col``, latest-wins via
  a deterministic precedence column.  Writes to a temp dir then swaps, so a
  failed job never corrupts the table.

Both expose the same three calls the pipeline uses: ``merge_upsert``,
``read``, ``overwrite``.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class ParquetMergeCatalog:
    """MERGE-INTO-faithful parquet tables under a warehouse dir.

    Idempotence contract (tested): merging the same batch twice yields a
    byte-identical table.  Precedence: existing row wins unless the source
    row has a strictly larger ``version_col`` (latest-version-wins dedup,
    reference A15 semantics: row_number over id ordered by modified desc).
    """

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def exists(self, table: str) -> bool:
        return os.path.exists(os.path.join(self._path(table), "_SUCCESS"))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self._path(table))

    def overwrite(self, table: str, df: DataFrame) -> None:
        self._atomic_write(table, df)

    def merge_upsert(
        self, table: str, source: DataFrame, key_col: str, version_col: str | None = None
    ) -> None:
        """Upsert ``source`` into ``table`` on ``key_col``.

        Equivalent Iceberg SQL:
            MERGE INTO t USING s ON t.key = s.key
            WHEN MATCHED AND s.version > t.version THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
        """
        src = source.dropDuplicates([key_col])
        if not self.exists(table):
            self._atomic_write(table, src)
            return
        existing = self.read(table)
        tagged = existing.withColumn("_prio", F.lit(0)).unionByName(
            src.withColumn("_prio", F.lit(1))
        )
        if version_col is not None:
            order = [F.col(version_col).desc(), F.col("_prio").asc()]
        else:
            order = [F.col("_prio").asc()]  # existing wins: insert-if-absent
        w = Window.partitionBy(key_col).orderBy(*order)
        merged = (
            tagged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_prio")
        )
        self._atomic_write(table, merged)

    def append(self, table: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(self._path(table))

    def overwrite_partition(self, table: str, partition: str, df: DataFrame) -> None:
        """Write one hive-style partition dir (e.g. ``bucket=3``) atomically;
        other partitions untouched — the parquet stand-in for Iceberg's
        partition-scoped overwrite."""
        final = os.path.join(self._path(table), partition)
        tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):
            old = final + ".old-" + uuid.uuid4().hex[:8]
            os.rename(final, old)
            os.rename(tmp, final)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.makedirs(os.path.dirname(final), exist_ok=True)
            os.rename(tmp, final)

    def partition_exists(self, table: str, partition: str) -> bool:
        return os.path.exists(os.path.join(self._path(table), partition, "_SUCCESS"))

    def read_partitioned(self, table: str) -> DataFrame:
        """Read a table written via overwrite_partition (partition discovery
        on; no table-level _SUCCESS marker)."""
        return self.spark.read.option("basePath", self._path(table)).parquet(
            self._path(table) + "/*"
        )

    def _atomic_write(self, table: str, df: DataFrame) -> None:
        final = self._path(table)
        tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):
            old = final + ".old-" + uuid.uuid4().hex[:8]
            os.rename(final, old)
            os.rename(tmp, final)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(tmp, final)


class IcebergCatalog:
    """Real Iceberg backend — activates when an Iceberg catalog is
    configured on the session.  Same interface; tables are
    ``<namespace>.<name>`` in the configured catalog, partitioned by
    ``bucket(256, key)`` at creation (done DDL-side, not here)."""

    def __init__(self, spark: SparkSession, namespace: str):
        self.spark = spark
        self.namespace = namespace

    def read(self, table: str) -> DataFrame:
        return self.spark.read.table(f"{self.namespace}.{table}")

    def merge_upsert(
        self, table: str, source: DataFrame, key_col: str, version_col: str | None = None
    ) -> None:
        view = f"_merge_src_{table}"
        source.dropDuplicates([key_col]).createOrReplaceTempView(view)
        matched = (
            f"WHEN MATCHED AND s.{version_col} > t.{version_col} THEN UPDATE SET * "
            if version_col
            else ""
        )
        self.spark.sql(
            f"MERGE INTO {self.namespace}.{table} t USING {view} s "
            f"ON t.{key_col} = s.{key_col} "
            f"{matched}WHEN NOT MATCHED THEN INSERT *"
        )

    def overwrite(self, table: str, df: DataFrame) -> None:
        df.writeTo(f"{self.namespace}.{table}").createOrReplace()


def get_catalog(spark: SparkSession, warehouse: str):
    """Pick the backend: Iceberg when a spark catalog is configured with an
    Iceberg implementation, else the parquet MERGE fallback."""
    impl = spark.conf.get("spark.sql.catalog.kg", None)
    if impl:
        return IcebergCatalog(spark, "kg")
    return ParquetMergeCatalog(spark, warehouse)

"""Catalog MERGE-INTO contract (the Neo4j append-to-existing-db analog,
/root/reference/README.md:75): idempotent upsert, insert-if-absent
precedence, latest-version-wins when a version column is given."""

import pytest

from stixtoneodb_spark.plans.catalog import ParquetMergeCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return ParquetMergeCatalog(spark, str(tmp_path / "wh"))


def _rows(catalog, table):
    return {(r.id, r.val) for r in catalog.read(table).collect()}


def test_merge_upsert_is_idempotent(spark, catalog):
    batch = spark.createDataFrame([("a", 1), ("b", 2)], "id string, val int")
    catalog.merge_upsert("t", batch, "id")
    catalog.merge_upsert("t", batch, "id")
    assert _rows(catalog, "t") == {("a", 1), ("b", 2)}


def test_merge_insert_if_absent_keeps_existing(spark, catalog):
    catalog.merge_upsert("t", spark.createDataFrame([("a", 1)], "id string, val int"), "id")
    catalog.merge_upsert(
        "t", spark.createDataFrame([("a", 99), ("b", 2)], "id string, val int"), "id"
    )
    # no version column -> existing row wins, new key inserted
    assert _rows(catalog, "t") == {("a", 1), ("b", 2)}


def test_merge_latest_version_wins(spark, catalog):
    catalog.merge_upsert(
        "t",
        spark.createDataFrame([("a", 1, 10), ("b", 2, 10)], "id string, val int, ver int"),
        "id",
        version_col="ver",
    )
    catalog.merge_upsert(
        "t",
        spark.createDataFrame([("a", 99, 20), ("b", 0, 5)], "id string, val int, ver int"),
        "id",
        version_col="ver",
    )
    got = {(r.id, r.val, r.ver) for r in catalog.read("t").collect()}
    # a: newer version replaces; b: older version ignored
    assert got == {("a", 99, 20), ("b", 2, 10)}


def test_merge_dedups_within_batch(spark, catalog):
    batch = spark.createDataFrame([("a", 1), ("a", 1), ("b", 2)], "id string, val int")
    catalog.merge_upsert("t", batch, "id")
    assert catalog.read("t").count() == 2

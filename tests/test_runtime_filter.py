"""Runtime Bloom-filter join pruning: Catalyst's runtime-filtering tier
(SURVEY §4.2 — what the optimizer gives a declarative plan that the
reference's record-at-a-time loop can never have).

At 100 TB the shape that matters is fact ⋈ selectively-filtered dim
without broadcast: the optimizer builds a Bloom filter from the dim's
join keys at runtime and pushes it into the fact scan, so the shuffle
carries only probable matches.  The proof is on the optimized plan
(bloom_filter_agg on the creation side, might_contain on the fact side)
plus result equality with the filter disabled.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def _bloom_conf(spark):
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.enabled": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled"
        ),
    }
    # no broadcast (the 100-TB regime: dim too big to ship whole) and
    # thresholds lowered so the sf0.01 fixture qualifies
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def _query(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    )


def test_bloom_runtime_filter_injected_and_result_identical(spark, _bloom_conf):
    with_filter = _query(spark)
    plan = with_filter._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in plan  # built from the dim's keys
    assert "might_contain" in plan  # pushed into the fact side
    got = {r["o_orderpriority"]: (r["n"], r["qty"]) for r in with_filter.collect()}

    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    plain = _query(spark)
    assert "bloom_filter_agg" not in plain._jdf.queryExecution().optimizedPlan().toString()
    want = {r["o_orderpriority"]: (r["n"], r["qty"]) for r in plain.collect()}
    assert got == want and got

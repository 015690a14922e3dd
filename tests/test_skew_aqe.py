"""AQE skew-join splitting: the north rule's skew discipline has two
tiers — explicit salting of KNOWN hot keys (plans/link.py, tested by the
salted-vs-plain equality test) and AQE's runtime splitting of skewed
shuffle partitions for the skew nobody predicted.  This pins the second
tier on the EXECUTED plan: a planted hot key must make AQE mark the
sort-merge join skew=true and split the partition, with results
identical to the unskewed computation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

HOT_ROWS = 200_000
COLD_KEYS = 50
ROWS_PER_COLD = 200


@pytest.fixture()
def _skew_conf(spark):
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # thresholds scaled to the fixture so the planted key qualifies as
    # skewed the same way a 100x-median partition does at production size
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB")
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5.0")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")


def test_aqe_splits_planted_hot_key(spark, _skew_conf):
    hot = spark.range(HOT_ROWS).select(
        F.lit(0).alias("k"), (F.col("id") % 1000).alias("v")
    )
    cold = spark.range(COLD_KEYS * ROWS_PER_COLD).select(
        (F.col("id") % COLD_KEYS + 1).alias("k"), (F.col("id") % 1000).alias("v")
    )
    fact = hot.unionByName(cold)
    dim = spark.range(COLD_KEYS + 1).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    # The skew assertion runs on the BARE join: OptimizeSkewedJoin refuses
    # to split when a downstream operator (e.g. a groupBy on the same key)
    # requires the join's hash distribution — splitting would force an
    # extra shuffle.  That refusal is itself correct planner behavior; the
    # split tier exists for join outputs that are consumed shuffle-free.
    joined = fact.join(dim, "k")
    rows = joined.collect()

    # executed (adaptive-final) plan must carry the skew=true SMJ marker
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan

    # ground truth, computed driver-side without the join
    from collections import Counter

    n_by_k = Counter(r["k"] for r in rows)
    assert n_by_k[0] == HOT_ROWS
    for k in range(1, COLD_KEYS + 1):
        assert n_by_k[k] == ROWS_PER_COLD
    # spot-check values: key k carries dim.w = 10k on every row
    s_hot = sum(r["v"] + r["w"] for r in rows if r["k"] == 0)
    assert s_hot == sum(i % 1000 for i in range(HOT_ROWS))
    s_one = sum(r["v"] + r["w"] for r in rows if r["k"] == 1)
    # k=1 ← cold ids ≡ 0 (mod COLD_KEYS); v = id % 1000, w = 10
    assert s_one == sum(
        i % 1000 + 10 for i in range(0, COLD_KEYS * ROWS_PER_COLD, COLD_KEYS)
    )

"""Bucketed-table co-located join: the shuffle-free join SURVEY §2/§4
promises for repeated joins at 100 TB (write once bucketed by the join
key; every later join on that key skips BOTH shuffles).

The proof is on the PHYSICAL PLAN, not just the result: with bucketing
the sort-merge join reads the two tables' buckets pairwise and the plan
contains no Exchange; a plain (unbucketed) copy of the same data joins
with two Exchanges.  Results are asserted identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stixtoneodb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
N_BUCKETS = 4


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, SF, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(tmp_path / "orders_bkt"))
        .saveAsTable("orders_bkt")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .option("path", str(tmp_path / "customer_bkt"))
        .saveAsTable("customer_bkt")
    )
    try:
        # force SMJ so the test sees the bucket-reader path, not a broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bkt = (
            spark.table("orders_bkt")
            .join(
                spark.table("customer_bkt"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("rev"))
        )
        plan = _plan(bkt)
        # the join itself is exchange-free: the only Exchange allowed is the
        # final groupBy's (its key differs from the bucket key)
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part, join_part

        plain = (
            orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("rev"))
        )
        plain_join_part = _plan(plain).split("HashAggregate")[-1]
        assert "Exchange" in plain_join_part  # the cost bucketing removes

        got = {r["c_nationkey"]: (r["n"], round(r["rev"], 2)) for r in bkt.collect()}
        want = {r["c_nationkey"]: (r["n"], round(r["rev"], 2)) for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS customer_bkt")

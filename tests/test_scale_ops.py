"""Tests for the 100 TB scale path: salted aggregation and bucketed
(shuffle-free) joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from garmin_data_pipeline_spark.operators.skew import salted_agg
from garmin_data_pipeline_spark.sources import sinks


class TestSaltedAgg:
    def test_matches_direct_aggregate(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        got = salted_agg(
            li,
            ["l_returnflag"],
            {"l_quantity": "sum", "l_extendedprice": "avg", "l_orderkey": "count"},
            salt_col="l_orderkey",
            buckets=8,
        )
        want = li.groupBy("l_returnflag").agg(
            F.sum("l_quantity").alias("sum_l_quantity"),
            F.avg("l_extendedprice").alias("avg_l_extendedprice"),
            F.count("l_orderkey").alias("count_l_orderkey"),
        )
        g = {r["l_returnflag"]: r for r in got.collect()}
        w = {r["l_returnflag"]: r for r in want.collect()}
        assert set(g) == set(w)
        for k in w:
            assert g[k]["count_l_orderkey"] == w[k]["count_l_orderkey"]
            assert abs(g[k]["sum_l_quantity"] - w[k]["sum_l_quantity"]) < 1e-6
            assert (
                abs(g[k]["avg_l_extendedprice"] - w[k]["avg_l_extendedprice"])
                < 1e-6
            )

    def test_min_max(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        got = salted_agg(
            li,
            ["l_linestatus"],
            {"l_shipdate": "min", "l_discount": "max"},
            salt_col="l_orderkey",
        ).collect()
        want = (
            li.groupBy("l_linestatus")
            .agg(F.min("l_shipdate"), F.max("l_discount"))
            .collect()
        )
        assert {tuple(r) for r in got} == {tuple(r) for r in want}


class TestBucketedJoin:
    def test_bucketed_join_is_shuffle_free(self, spark, sf_dir):
        import shutil

        for t in ("b_lineitem", "b_orders"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"/tmp/spark-test-warehouse/{t}", ignore_errors=True)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        sinks.load_table(
            li.select("l_orderkey", "l_quantity"),
            "b_lineitem",
            bucket_by=["l_orderkey"],
            buckets=8,
        )
        sinks.load_table(
            orders.select("o_orderkey", "o_totalprice"),
            "b_orders",
            bucket_by=["o_orderkey"],
            buckets=8,
        )
        # Disable auto-broadcast: at test scale Catalyst would (rightly)
        # broadcast the small side; the point here is the big-big path,
        # where bucketing must remove the shuffle before the merge join.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_lineitem").join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan, plan
            assert "Exchange hashpartitioning" not in plan, plan
            assert joined.count() == li.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE b_lineitem")
        spark.sql("DROP TABLE b_orders")

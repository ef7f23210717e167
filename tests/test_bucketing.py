"""Bucketing: pre-partitioned co-located joins — the 100 TB pattern for
repeated large-table joins (write once bucketed by the join key, every
later join skips its shuffle)."""

import re

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # tables land in ./spark-warehouse (gitignored) — warehouse.dir is a
    # static conf and cannot be pointed at a tmp dir on a live session
    spark.sql("CREATE DATABASE IF NOT EXISTS buckdemo")
    spark.sql("DROP TABLE IF EXISTS buckdemo.li_b")
    spark.sql("DROP TABLE IF EXISTS buckdemo.od_b")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "buckdemo.li_b"
    )
    od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "buckdemo.od_b"
    )

    joined = (
        spark.table("buckdemo.li_b")
        .join(
            spark.table("buckdemo.od_b").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must not shuffle: both sides are bucketed on the
    # key, so the only Exchange allowed is the one for the final groupBy
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan
    assert len(re.findall(r"Exchange hashpartitioning\(l_orderkey", plan)) == 0
    assert len(re.findall(r"Exchange hashpartitioning\(o_orderkey", plan)) == 0

    # correctness unchanged vs the plain-parquet join
    expected = (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert joined.count() == expected.count()

    spark.sql("DROP TABLE IF EXISTS buckdemo.li_b")
    spark.sql("DROP TABLE IF EXISTS buckdemo.od_b")

"""Warehouse patterns: SCD2 invariants, MERGE dispatch, rolling frame,
and the decorrelation plan guarantees for the correlated-subquery
shapes (queries/warehouse.py)."""

import re

from pyspark.sql import functions as F

from pyield_spark.queries import QUERIES, load_all

load_all()


def _plan(spark, sf_dir, name):
    return (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def _exchanges(plan):
    return len(re.findall(r"\bExchange hashpartitioning", plan))


def test_scd2_invariants(spark, sf_dir):
    df = QUERIES["q_scd2_dim"](spark, sf_dir).cache()
    # exactly one open (current) interval per customer
    bad_current = (
        df.groupBy("custkey")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n"))
        .filter(F.col("n") != 1)
        .count()
    )
    assert bad_current == 0
    # intervals are well-formed and chain without overlap: valid_to of
    # row i equals valid_from of row i+1 (by construction via lead)
    from pyspark.sql import Window

    w = Window.partitionBy("custkey").orderBy("valid_from")
    chained = df.withColumn("_next_from", F.lead("valid_from").over(w))
    broken = chained.filter(
        F.col("_next_from").isNotNull() & (F.col("valid_to") != F.col("_next_from"))
    ).count()
    assert broken == 0
    # consecutive segments always differ (change compression)
    no_change = (
        df.withColumn("_prev_seg", F.lag("segment").over(w))
        .filter(F.col("_prev_seg") == F.col("segment"))
        .count()
    )
    assert no_change == 0
    df.unpersist()


def test_scd2_single_exchange(spark, sf_dir):
    # dedup agg + lag filter + lead close all partition on custkey:
    # one shuffle for the whole build
    plan = _plan(spark, sf_dir, "q_scd2_dim")
    assert _exchanges(plan) == 1, plan


def test_merge_dispatch_covers_all_keys(spark, sf_dir):
    out = QUERIES["q_merge_upsert"](spark, sf_dir).cache()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_cust = cust.count()
    keys_with_orders = od.select("o_custkey").distinct().count()
    counts = dict(
        out.groupBy("action").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    assert counts.get("update", 0) + counts.get("insert", 0) == keys_with_orders
    assert counts.get("update", 0) + counts.get("keep", 0) == n_cust
    # one output row per key (MERGE determinism)
    assert out.select("custkey").distinct().count() == out.count()
    out.unpersist()


def test_rolling_window_is_range_frame(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_rolling_revenue_30d")
    assert "RangeFrame, -29" in plan, plan
    assert _exchanges(plan) == 1, plan


def test_correlated_shapes_decorrelate(spark, sf_dir):
    # every correlated subquery must become a hash join, never a
    # nested-loop re-execution per row
    for name in (
        "q_sql_min_price_part",
        "q_sql_small_qty_revenue",
        "q_sql_exists_discount",
        "q_sql_top_supplier",
        "q_sql_big_orders",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan), name
    # the EXISTS specifically plans as a left-semi join
    plan = _plan(spark, sf_dir, "q_sql_exists_discount")
    assert "LeftSemi" in plan, plan


def test_sketch_rollup_merge_equals_direct(spark, sf_dir):
    """The union-merged two-level sketch estimate equals the single-pass
    sketch estimate built directly at the coarse level: mergeability is
    exact for HLL, not approximate — the property that lets partial
    sketches persist per partition/day and roll up later."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    direct = li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey", F.lit(14))).alias("d")
    )
    merged = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.hll_sketch_agg("l_orderkey", F.lit(14)).alias("s"))
        .groupBy("l_returnflag")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("s")).alias("m"))
    )
    rows = direct.join(merged, "l_returnflag").collect()
    assert rows and all(r.d == r.m for r in rows)


def test_theta_set_algebra(spark, sf_dir):
    """Theta sketch set algebra: |A| >= |A - B| + |A ∩ B| estimates are
    consistent, and on small (exact-mode) data the intersection estimate
    equals the exact intersect count."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sk = li.groupBy("l_linestatus").agg(
        F.theta_sketch_agg("l_orderkey", F.lit(14)).alias("s")
    )
    both = sk.filter(F.col("l_linestatus").isin("O", "F")).agg(
        F.theta_sketch_estimate(F.theta_intersection_agg("s")).alias("est")
    ).collect()[0].est
    exact = (
        li.filter(F.col("l_linestatus") == "O").select("l_orderkey")
        .intersect(li.filter(F.col("l_linestatus") == "F").select("l_orderkey"))
        .count()
    )
    # sf0.001 distinct counts sit in theta exact mode -> estimate exact;
    # larger SFs bound by the oracle's 5% flag
    if exact < 4000:
        assert round(both) == exact
    else:
        assert abs(both - exact) / exact <= 0.05

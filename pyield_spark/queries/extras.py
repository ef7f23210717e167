"""Remaining coverage: set-intersection (U3), approximate aggregates
(Spark-native extension), and the PRE-curve composition (§7 step 6 —
LTN points ∪ bootstrap output with an anti-join, the reference's
pyield/tpf/titulos/pre.py:53-100 shape).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyield_spark.queries import query, tables


# === U3: INTERSECT / EXCEPT ==============================================


@query(
    "q_intersect_except",
    oracle="""
    SELECT 'both' AS bucket, CAST(k AS BIGINT) AS partkey FROM (
      SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 48
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_quantity < 2
    )
    UNION ALL
    SELECT 'only_high', CAST(k AS BIGINT) FROM (
      SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 48
      EXCEPT
      SELECT l_partkey FROM lineitem WHERE l_quantity < 2
    )
    """,
)
def q_intersect_except(spark, sf_dir):
    li = tables(spark, sf_dir, "lineitem")
    hi = li.filter(F.col("l_quantity") > 48).select(F.col("l_partkey").alias("k"))
    lo = li.filter(F.col("l_quantity") < 2).select(F.col("l_partkey").alias("k"))
    both = hi.intersect(lo).select(
        F.lit("both").alias("bucket"), F.col("k").alias("partkey")
    )
    # subtract == set EXCEPT (exceptAll+distinct differs: a key with
    # leftover duplicates after bag-subtraction would survive)
    only_high = hi.subtract(lo).select(
        F.lit("only_high").alias("bucket"), F.col("k").alias("partkey")
    )
    return both.unionByName(only_high)


# === approximate aggregates (Spark-native; estimator-specific values →
# rows-only check, but exact companions are asserted via the oracle-less
# invariant in tests) ======================================================


@query("q_approx_stats")
def q_approx_stats(spark, sf_dir):
    li = tables(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median_price"),
    )


# === §7 step 6: PRE curve = LTN zero points ∪ coupon-bootstrap points,
# anti-joined on overlapping maturities (rows-only: contains the K5
# sequential kernel) =======================================================


@query("q_curva_pre")
def q_curva_pre(spark, sf_dir):
    from pyield_spark.bonds.bootstrap import bootstrap_zero_curve
    from pyield_spark.queries.fixed_income import _curve_df

    curve = _curve_df(spark, sf_dir)
    # "LTN-like" zero points: short tenors are zero-coupon by nature
    ltn_points = curve.filter(F.col("du") <= 150).select(
        "grupo", "du", F.col("taxa").alias("taxa_zero"), F.lit("LTN").alias("fonte")
    )
    # coupon-bond bootstrap for the long end
    boot = bootstrap_zero_curve(
        curve.filter(F.col("du") > 100), by="grupo", du_col="du", par_rate="taxa"
    ).select("grupo", "du", F.round("taxa_zero", 9).alias("taxa_zero"), F.lit("NTN-F").alias("fonte"))
    # anti-join: bootstrap vertices that an LTN point already covers drop
    # out (reference: pre.py:88-91)
    boot_only = boot.join(ltn_points.select("grupo", "du"), ["grupo", "du"], "left_anti")
    return ltn_points.unionByName(boot_only)


# === bond-over-DI relative value (rentabilidade + premio, reference:
# pyield/tpf/titulos/ltn.py:200-258, _utils.py:51) ========================

from pyield_spark.queries.oracle_helpers import pround_sql


@query(
    "q_rentabilidade",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey,
             round(0.08 + (o_orderkey % 1000) / 10000.0, 6) AS taxa_titulo,
             round(0.075 + (o_orderkey % 900) / 10000.0, 6) AS taxa_di
      FROM orders WHERE o_orderkey % 11 = 0
    )
    SELECT o_orderkey, taxa_titulo, taxa_di,
      {pround_sql("(power(1 + taxa_titulo, 1.0/252.0) - 1) / (power(1 + taxa_di, 1.0/252.0) - 1)", 9)}
        AS rentabilidade,
      {pround_sql("(taxa_titulo - taxa_di) * 10000.0", 4)} AS premio_bps
    FROM base
    """,
)
def q_rentabilidade(spark, sf_dir):
    from pyield_spark.bonds.pricing import premio_bps_expr, rentabilidade_expr
    from pyield_spark.functions.numbers import pround_expr

    od = tables(spark, sf_dir, "orders")
    base = od.filter(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey",
        F.round(F.lit(0.08) + (F.col("o_orderkey") % 1000) / 10000.0, 6).alias(
            "taxa_titulo"
        ),
        F.round(F.lit(0.075) + (F.col("o_orderkey") % 900) / 10000.0, 6).alias(
            "taxa_di"
        ),
    )
    return base.select(
        "o_orderkey",
        "taxa_titulo",
        "taxa_di",
        pround_expr(rentabilidade_expr("taxa_titulo", "taxa_di"), 9).alias(
            "rentabilidade"
        ),
        pround_expr(premio_bps_expr("taxa_titulo", "taxa_di"), 4).alias("premio_bps"),
    )

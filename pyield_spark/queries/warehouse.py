"""Warehouse-maintenance patterns + correlated-subquery (decorrelation)
query shapes.

A 100 TB lake needs more than scans and aggregates: dimensions must be
maintained (SCD2 history build, MERGE upsert), sliding business metrics
need range-frame windows, and analysts write correlated subqueries that
the optimizer must decorrelate into joins (Catalyst rewrites every
shape below into aggregate + equi-join — no per-row re-execution, which
is what makes them feasible at scale at all).

Reference anchor: the reference has no warehouse layer (it is a
client-side library over published panels), so these are engine
extensions in the spirit of SURVEY §7 steps 8/10; the SCD2/upsert
shapes are exactly what its bronze→silver layering
(/root/reference/pyield/tpf/secundario/_mensal.py:192-236) would need
once the silver tables live in a lake instead of memory.

Scale design:
- SCD2: the dedup, the change filter, and both windows share ONE
  exchange on the entity key (same partitioning end to end).
- MERGE: one full-outer shuffle join on the key (or shuffle-free on
  bucketed tables — tests/test_bucketing.py discipline applies); the
  per-key "latest update" pre-aggregation is map-side combinable.
- Rolling range-frame: one window exchange; the frame is evaluated by
  a streaming sliding accumulator, O(n) per partition, no self-join
  (the naive equivalent is a range self-join that explodes 30× at
  daily grain).
- Correlated subqueries: decorrelated by Catalyst; the EXISTS becomes
  a left-semi hash join, the scalar aggregates become one grouped
  aggregation + equi-join each (plan-asserted in
  tests/test_warehouse.py — no nested-loop, no per-row subquery).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from pyield_spark.queries import query, tables

DEC = "decimal(18,6)"


# === SCD2 dimension build (change log → validity intervals) ==============

_SCD2_ORACLE = """
    WITH ev AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) AS d,
             MAX_BY(o_orderpriority, o_orderkey) AS segment
      FROM orders GROUP BY 1, 2
    ),
    ch AS (
      SELECT * FROM (
        SELECT o_custkey, d, segment,
               LAG(segment) OVER (PARTITION BY o_custkey ORDER BY d) AS _prev
        FROM ev)
      WHERE _prev IS NULL OR _prev <> segment
    )
    SELECT o_custkey AS custkey, segment,
           d AS valid_from,
           LEAD(d) OVER (PARTITION BY o_custkey ORDER BY d) AS valid_to,
           LEAD(d) OVER (PARTITION BY o_custkey ORDER BY d) IS NULL AS is_current
    FROM ch
"""


@query("q_scd2_dim", oracle=_SCD2_ORACLE)
def q_scd2_dim(spark, sf_dir):
    """Type-2 slowly-changing dimension from a change log: orders are
    read as (customer, day) attribute observations (same-day conflicts
    deduped keep-highest-orderkey), consecutive no-change observations
    are compressed away, and each surviving change opens a validity
    interval closed by the next change (open-ended ⇒ current row).

    All three steps — same-day dedup, lag change-filter, lead interval
    close — are windows over the SAME entity-key partitioning, so
    Catalyst plans ONE exchange for the whole build (a groupBy dedup
    would partition on (key, day) and force a second shuffle down to
    the key; plan-asserted in tests/test_warehouse.py).
    """
    od = tables(spark, sf_dir, "orders")
    ev = od.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.col("o_orderpriority").alias("segment"),
        "o_orderkey",
    )
    # keep-last within a day (A4 keep='last' with orderkey as arrival
    # order): the row whose successor is a different day
    w_ord = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    nd = F.lead("d").over(w_ord)
    ev = ev.withColumn("_keep", nd.isNull() | (nd != F.col("d"))).filter(
        "_keep"
    )
    w = Window.partitionBy("o_custkey").orderBy("d")
    ch = (
        ev.withColumn("_prev", F.lag("segment").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("segment")))
    )
    out = ch.withColumn("valid_to", F.lead("d").over(w))
    return out.select(
        F.col("o_custkey").alias("custkey"),
        "segment",
        F.col("d").alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


# === MERGE / upsert without a table format ===============================

_MERGE_ORACLE = """
    WITH upd AS (
      SELECT o_custkey AS custkey,
             round(MAX_BY(o_totalprice, o_orderkey), 2) AS new_bal,
             MAX_BY(o_orderpriority, o_orderkey) AS new_segment
      FROM orders GROUP BY 1
    )
    SELECT COALESCE(c.c_custkey, u.custkey) AS custkey,
           CASE WHEN c.c_custkey IS NULL THEN 'insert'
                WHEN u.custkey IS NULL THEN 'keep'
                ELSE 'update' END AS action,
           COALESCE(u.new_bal, round(c.c_acctbal, 2)) AS balance,
           COALESCE(u.new_segment, c.c_mktsegment) AS segment
    FROM customer c FULL OUTER JOIN upd u ON c.c_custkey = u.custkey
"""


@query("q_merge_upsert", oracle=_MERGE_ORACLE)
def q_merge_upsert(spark, sf_dir):
    """MERGE semantics on plain parquet (no Delta in this image): the
    update set is pre-aggregated to one row per key (latest order by
    orderkey — MERGE requires a deterministic single match), then a
    full-outer join dispatches matched → update, target-only → keep,
    source-only → insert. This exact shape is the ``foreachBatch``
    upsert body for the streaming path, and is shuffle-free when both
    sides are bucketed on the key."""
    cust, od = tables(spark, sf_dir, "customer", "orders")
    upd = od.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(F.max_by("o_totalprice", "o_orderkey"), 2).alias("new_bal"),
        F.max_by("o_orderpriority", "o_orderkey").alias("new_segment"),
    )
    j = cust.join(upd, cust.c_custkey == upd.custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "custkey").alias("custkey"),
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("custkey").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
        F.coalesce("new_bal", F.round("c_acctbal", 2)).alias("balance"),
        F.coalesce("new_segment", "c_mktsegment").alias("segment"),
    )


# === rolling metric via a range frame (no self-join) =====================

_ROLL_ORACLE = """
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
                  PARTITION BY o_custkey
                  ORDER BY datediff('day', DATE '1990-01-01',
                                    CAST(o_orderdate AS DATE))
                  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS rolling_30d
    FROM orders
"""


@query("q_rolling_revenue_30d", oracle=_ROLL_ORACLE)
def q_rolling_revenue_30d(spark, sf_dir):
    """Per-customer trailing-30-day spend at each order: a RANGE frame
    over an integer day key — evaluated as a streaming sliding
    accumulator inside one window exchange. The naive formulation is a
    range self-join (orders × 30 days of orders); the frame form reads
    each row once. Decimal accumulation keeps the sliding sum exact and
    partition-order-free."""
    od = tables(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-29, Window.currentRow)
    )
    return od.select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias(
            "rolling_30d"
        ),
    )


# === correlated subqueries — Catalyst decorrelation ======================

def _register(spark, sf_dir, *names):
    for n in names:
        tables(spark, sf_dir, n).createOrReplaceTempView(n)


_SQL_MIN_PRICE = """
    SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice AS min_price
    FROM lineitem l1
    WHERE l_extendedprice = (SELECT MIN(l_extendedprice)
                             FROM lineitem l2
                             WHERE l2.l_partkey = l1.l_partkey)
"""


@query("q_sql_min_price_part", oracle=_SQL_MIN_PRICE)
def q_sql_min_price_part(spark, sf_dir):
    """TPC-H Q2-shaped correlated scalar MIN: the cheapest lineitem(s)
    per part. Catalyst decorrelates the subquery into one grouped MIN +
    an equi-join back on the part key (ties all survive, same set on
    both engines) — identical SQL text runs on DuckDB."""
    _register(spark, sf_dir, "lineitem")
    return spark.sql(_SQL_MIN_PRICE)


_SQL_SMALL_QTY = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem l1
    WHERE l_quantity < (SELECT AVG(l_quantity) * 0.5
                        FROM lineitem l2
                        WHERE l2.l_partkey = l1.l_partkey)
"""


@query("q_sql_small_qty_revenue", oracle=_SQL_SMALL_QTY)
def q_sql_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: lineitems below half their part's average
    quantity. The correlated AVG decorrelates to one aggregation over
    lineitem + a join — not a per-row rescan. AVG here is exact on both
    engines: quantities are integer-valued doubles, so the double sum
    is exact (< 2^53) regardless of association order."""
    _register(spark, sf_dir, "lineitem")
    return spark.sql(_SQL_SMALL_QTY)


_SQL_EXISTS = """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_discount > 0.05
                    AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE))
    GROUP BY o_orderpriority
"""


@query("q_sql_exists_discount", oracle=_SQL_EXISTS)
def q_sql_exists_discount(spark, sf_dir):
    """TPC-H Q4 shape: orders having at least one discounted line
    shipped after the order date, counted per priority. The EXISTS
    becomes a left-semi hash join (each order tested once, short-
    circuit on first match) — plan-asserted in tests."""
    _register(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_SQL_EXISTS)


_SQL_GSETS = """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@query("q_sql_grouping_sets", oracle=_SQL_GSETS)
def q_sql_grouping_sets(spark, sf_dir):
    """Arbitrary GROUPING SETS (the general form behind rollup/cube,
    both already covered): three independent aggregation granularities
    in one pass, with GROUPING() markers disambiguating real nulls from
    subtotal rows. Catalyst plans this as one Expand (3× row expansion)
    + one partial-aggregated groupBy — a single shuffle for all three
    granularities instead of three scans + a union. Identical SQL text
    runs on DuckDB."""
    _register(spark, sf_dir, "lineitem")
    return spark.sql(_SQL_GSETS)


_SQL_TOP_SUPPLIER = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01'
                                         AND DATE '1996-03-31'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("q_sql_top_supplier", oracle=_SQL_TOP_SUPPLIER)
def q_sql_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: a revenue view referenced twice — once as the
    join input, once inside an uncorrelated scalar MAX subquery.
    Catalyst evaluates the scalar subquery once (a 1-row broadcast) and
    reuses the aggregated view; the DOUBLE equality is safe because the
    revenue comes through an exact decimal sum on both engines (ties
    all survive, same set)."""
    _register(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_SQL_TOP_SUPPLIER)


_SQL_BIG_ORDERS = """
    SELECT c_custkey, o_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 180)
    GROUP BY c_custkey, o_orderkey
"""


@query("q_sql_big_orders", oracle=_SQL_BIG_ORDERS)
def q_sql_big_orders(spark, sf_dir):
    """TPC-H Q18 shape: large-volume orders via an IN over a grouped
    HAVING subquery. The IN-list is itself an aggregation result —
    Catalyst plans it as a left-semi join against the aggregated
    lineitem (no materialized list, no per-row membership scan); the
    HAVING sum is exact (integer-valued doubles)."""
    _register(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_SQL_BIG_ORDERS)

"""Core relational operators over the TPC-H-ish tables.

Covers SURVEY §2.2 (projection/filter/predicates), §2.3 J1/J2/J6 +
semi-join, §2.4 aggregations, §2.5 W1-W5 windows, §2.6 sorts/top-k,
§2.7 set ops, §2.8 scalar functions. Each query is deliberately shaped
like the reference's pipelines (canonical select + explicit aliases +
final sort keys) and kept deterministic for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from pyield_spark.queries import query, tables
from pyield_spark.functions.numbers import truncar_expr

# --- helpers ---------------------------------------------------------------

DEC = "decimal(18,6)"  # exact, order-independent accumulator for double sums


def dsum(c):
    """Deterministic double sum: decimal-accumulate then cast back."""
    return F.sum(c.cast(DEC)).cast("double")


# === A: aggregation pipeline (TPC-H Q1 shape; reference analogue: the
# canonical groupBy-agg enrichment exits, e.g. pyield/bc/leiloes.py) =======


@query(
    "q_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark, sf_dir):
    li = tables(spark, sf_dir, "lineitem")
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


# === J1/J2: multi-join + broadcast dims (reference: di1 maturities ∩ TPF,
# pyield/futuro/di1.py:108-110) ============================================


@query(
    "q_region_volume",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_region_volume(spark, sf_dir):
    li, su, na, re = tables(spark, sf_dir, "lineitem", "supplier", "nation", "region")
    return (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# === J6 anti / semi joins (reference anti-join: pyield/tpf/titulos/pre.py:88-91,
# is_in semi-filter: pyield/futuro/historico.py:155) ========================


@query(
    "q_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_customers_without_orders(spark, sf_dir):
    cu, od = tables(spark, sf_dir, "customer", "orders")
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q_parts_shipped",
    oracle="""
    SELECT p_partkey, p_brand, p_size
    FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey
                  AND l.l_quantity > 45)
    """,
)
def q_parts_shipped(spark, sf_dir):
    pa, li = tables(spark, sf_dir, "part", "lineitem")
    return pa.join(
        li.filter(F.col("l_quantity") > 45), pa.p_partkey == li.l_partkey, "left_semi"
    ).select("p_partkey", "p_brand", "p_size")


# === O2/W4: top-k per group with deterministic tie-break (reference top-1:
# pyield/selic/copom.py:199-201) ===========================================


@query(
    "q_top_customers_per_nation",
    oracle="""
    SELECT nation_name, c_custkey, c_name, c_acctbal, CAST(rnk AS INT) AS rnk FROM (
      SELECT n.n_name AS nation_name, c.c_custkey, c.c_name, c.c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n.n_name
                                ORDER BY c.c_acctbal DESC, c.c_custkey) AS rnk
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) WHERE rnk <= 3
    """,
)
def q_top_customers_per_nation(spark, sf_dir):
    cu, na = tables(spark, sf_dir, "customer", "nation")
    w = Window.partitionBy("nation_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .select(
            F.col("n_name").alias("nation_name"), "c_custkey", "c_name", "c_acctbal"
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


# === W1 lag / W5 cumulative sum (reference: pyield/fwd.py:161-162,
# pyield/selic/probabilities.py:196-205) ===================================


@query(
    "q_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(datediff('day', prev_date, o_orderdate) AS BIGINT) AS days_since_prev
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             LAG(o_orderdate, 1) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS prev_date
      FROM orders
    ) WHERE prev_date IS NOT NULL
    """,
)
def q_order_gaps(spark, sf_dir):
    od = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        od.withColumn("prev_date", F.lag("o_orderdate", 1).over(w))
        .filter(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.datediff(F.col("o_orderdate"), F.col("prev_date"))
            .cast("long")
            .alias("days_since_prev"),
        )
    )


@query(
    "q_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
    FROM orders WHERE o_custkey <= 200
    """,
)
def q_running_revenue(spark, sf_dir):
    od = tables(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        od.filter(F.col("o_custkey") <= 200)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_total"),
        )
    )


# === W2 duplicate detection + A4 dedup keep-"last" (reference:
# pyield/fwd.py:157, unique(keep='last') pyield/interpolador.py:431) =======


@query(
    "q_dedup_orders_keep_latest",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q_dedup_orders_keep_latest(spark, sf_dir):
    od = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        od.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@query(
    "q_duplicate_ship_pairs",
    oracle="""
    SELECT l_suppkey, l_shipdate, CAST(n AS BIGINT) AS n FROM (
      SELECT l_suppkey, l_shipdate, COUNT(*) AS n
      FROM lineitem GROUP BY l_suppkey, l_shipdate
    ) WHERE n > 1
    """,
)
def q_duplicate_ship_pairs(spark, sf_dir):
    li = tables(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey", "l_shipdate")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


# === A1 min/max_by — ordered first/last per group (reference:
# pyield/interpolador.py:440-445) ==========================================


@query(
    "q_first_last_ship",
    oracle="""
    SELECT l_orderkey,
           CAST(MIN(l_linenumber) AS INT) AS first_line,
           MIN(CAST(l_shipdate AS DATE)) AS first_ship,
           MAX(CAST(l_shipdate AS DATE)) AS last_ship,
           MIN_BY(l_extendedprice,
                  (datediff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)) * 100 + l_linenumber)
                  * 100000000 + CAST(round(l_extendedprice * 100) AS BIGINT)) AS first_price,
           MAX_BY(l_extendedprice,
                  (datediff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)) * 100 + l_linenumber)
                  * 100000000 + CAST(round(l_extendedprice * 100) AS BIGINT)) AS last_price
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def q_first_last_ship(spark, sf_dir):
    li = tables(spark, sf_dir, "lineitem")
    # deterministic min_by/max_by key: (epoch-days, linenumber, price-cents)
    # folded into one BIGINT — the synthetic data contains full
    # (orderkey, linenumber, shipdate) duplicates, so the price itself
    # must join the key (equal keys then imply equal selected values).
    ordkey = (
        (
            F.datediff(F.to_date("l_shipdate"), F.lit("1990-01-01")) * 100
            + F.col("l_linenumber")
        ).cast("long")
        * 100000000
        + F.round(F.col("l_extendedprice") * 100).cast("long")
    )
    return li.groupBy("l_orderkey").agg(
        F.min("l_linenumber").alias("first_line"),
        F.min(F.to_date("l_shipdate")).alias("first_ship"),
        F.max(F.to_date("l_shipdate")).alias("last_ship"),
        F.min_by(F.col("l_extendedprice"), ordkey).alias("first_price"),
        F.max_by(F.col("l_extendedprice"), ordkey).alias("last_price"),
    )


# === P6/P7 conditional columns + null-out (reference when/then ladders:
# pyield/bc/leiloes.py:92-112,176-181) =====================================


@query(
    "q_order_buckets",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'large' END AS bucket,
           CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_totalprice END AS open_value,
           CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
                THEN TRUE ELSE FALSE END AS urgent
    FROM orders
    """,
)
def q_order_buckets(spark, sf_dir):
    od = tables(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_totalprice") < 50000, F.lit("small"))
        .when(F.col("o_totalprice") < 150000, F.lit("mid"))
        .otherwise(F.lit("large"))
        .alias("bucket"),
        F.when(F.col("o_orderstatus") == "F", F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice"))
        .alias("open_value"),
        (
            F.col("o_orderpriority").startswith("1-")
            | F.col("o_orderpriority").startswith("2-")
        ).alias("urgent"),
    )


# === F1-F7 string kernel (reference ticker dissection:
# pyield/selic/cpm.py:286-312; BR numbers: pyield/_internal/br_numbers.py) ==


@query(
    "q_part_dissect",
    oracle="""
    WITH b AS (
      SELECT *, REPLACE(CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR), '.', ',') AS price_br
      FROM part
    )
    SELECT p_partkey,
           UPPER(SUBSTR(p_type, 1, 8)) AS type_prefix,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           CASE WHEN REGEXP_MATCHES(p_type, '^(STANDARD|SMALL)') THEN TRUE ELSE FALSE END AS is_std,
           price_br,
           round_even((CAST(REPLACE(REPLACE(price_br, '.', ''), ',', '.') AS DOUBLE) / 100)
                      * 10000000000.0, 0) / 10000000000.0
             AS price_pct_decimal
    FROM b
    """,
)
def q_part_dissect(spark, sf_dir):
    pa = tables(spark, sf_dir, "part")
    # round-trip: format a BR-style 'price' string then parse it back
    price_br = F.regexp_replace(
        F.col("p_retailprice").cast("decimal(12,2)").cast("string"), r"\.", ","
    )
    from pyield_spark.functions.numbers import br_num_expr, pct_para_decimal_expr

    return pa.select(
        "p_partkey",
        F.upper(F.substring("p_type", 1, 8)).alias("type_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.col("p_type").rlike("^(STANDARD|SMALL)").alias("is_std"),
        price_br.alias("price_br"),
        pct_para_decimal_expr(br_num_expr(price_br)).alias("price_pct_decimal"),
    )


# === F8-F13 date kernel + F19 truncation (reference: pyield/futuro/di1.py:112-113,
# converters; truncation pyield/_internal/numbers.py) ======================


@query(
    "q_monthly_orders",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS month_revenue,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
             - (SUM(CAST(o_totalprice AS DECIMAL(18,6))) % 0.000001) AS DOUBLE)
             AS month_revenue_trunc6,
           MAKE_DATE(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 15) AS mid_month
    FROM orders
    GROUP BY 1, 5
    """,
)
def q_monthly_orders(spark, sf_dir):
    od = tables(spark, sf_dir, "orders")
    month_rev = F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
    return od.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(15)).alias(
            "mid_month"
        ),
    ).agg(
        F.count("*").alias("n_orders"),
        month_rev.alias("month_revenue"),
        truncar_expr(month_rev, 6).alias("month_revenue_trunc6"),
    ).select("order_month", "n_orders", "month_revenue", "month_revenue_trunc6", "mid_month")


# === U1/U2 set ops with schema union (reference diagonal concat:
# pyield/selic/copom.py:163-167) ===========================================


@query(
    "q_union_mixed",
    oracle="""
    SELECT * FROM (
      SELECT o_orderkey AS entity_key, CAST(o_orderdate AS DATE) AS d,
             o_totalprice AS amount, CAST(NULL AS VARCHAR) AS kind
      FROM orders WHERE o_orderkey % 1000 = 0
      UNION ALL
      SELECT l_orderkey AS entity_key, CAST(l_shipdate AS DATE) AS d,
             CAST(NULL AS DOUBLE) AS amount, l_returnflag AS kind
      FROM lineitem WHERE l_orderkey % 1000 = 0 AND l_linenumber = 1
    )
    """,
)
def q_union_mixed(spark, sf_dir):
    od, li = tables(spark, sf_dir, "orders", "lineitem")
    a = od.filter(F.col("o_orderkey") % 1000 == 0).select(
        F.col("o_orderkey").alias("entity_key"),
        F.to_date("o_orderdate").alias("d"),
        F.col("o_totalprice").alias("amount"),
    )
    b = li.filter((F.col("l_orderkey") % 1000 == 0) & (F.col("l_linenumber") == 1)).select(
        F.col("l_orderkey").alias("entity_key"),
        F.to_date("l_shipdate").alias("d"),
        F.col("l_returnflag").alias("kind"),
    )
    return a.unionByName(b, allowMissingColumns=True)

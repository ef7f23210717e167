"""Fixed-income operator queries: business days, as-of joins, curve
interpolation, forward rates, STN bond pricing.

These are the reference's core semantics (SURVEY §2.3 J3-J5, §2.5
W6-W8, §2.9 K1/K2/K6/K7, §4.2-4.3) demonstrated over the driver's
synthetic tables: curves are derived deterministically from lineitem
(monthly groups, day-scaled tenors, discount-derived rates) and bonds
from orders (maturities on Jan/Jul 1, rates hashed from keys into
(0, 0.2)), so every pipeline is oracle-checkable end to end.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pyield_spark import du as du_mod
from pyield_spark.bonds.pricing import (
    dv01_expr,
    ltn_pu_expr,
    price_coupon_bond,
)
from pyield_spark.curves.forwards import forwards_expr
from pyield_spark.curves.interpolate import interpolar
from pyield_spark.operators.asof import asof_join
from pyield_spark.queries import query, tables
from pyield_spark.queries.oracle_helpers import (
    bd_count_sql,
    calendar_cte,
    pround_sql,
    trunc_decimal_sum_sql,
    trunc_sql,
)

_CAL_LO = dt.date(1994, 1, 1)
_CAL_HI = dt.date(2012, 12, 31)
_CAL = calendar_cte(_CAL_LO, _CAL_HI)


# === W6: business-day count (pyield/du/core.py:82-86) =====================


@query(
    "q_bd_count",
    oracle=f"""
    WITH {_CAL}
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(l.l_shipdate AS DATE) AS ship_date,
           CAST({bd_count_sql("CAST(o.o_orderdate AS DATE)", "CAST(l.l_shipdate AS DATE)")} AS BIGINT)
             AS dias_uteis
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN cal cs ON cs.data = CAST(o.o_orderdate AS DATE)
    JOIN cal ce ON ce.data = CAST(l.l_shipdate AS DATE)
    """,
)
def q_bd_count(spark, sf_dir):
    li, od = tables(spark, sf_dir, "lineitem", "orders")
    df = li.join(od, li.l_orderkey == od.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.to_date("o_orderdate").alias("order_date"),
        F.to_date("l_shipdate").alias("ship_date"),
    )
    return du_mod.contar(df, "order_date", "ship_date", alias="dias_uteis")


# === W7: business-day offset with roll (pyield/du/core.py:273-346) ========


@query(
    "q_bd_offset",
    oracle=f"""
    WITH {_CAL}
    SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS order_date,
           bf.data AS settle_t2, bb.data AS prev_bd3
    FROM orders o
    JOIN cal c ON c.data = CAST(o.o_orderdate AS DATE)
    LEFT JOIN bdinv bf ON bf.regime = 'antigo'
      AND bf.ordinal = c.cum_ant + 2
    LEFT JOIN bdinv bb ON bb.regime = 'antigo'
      AND bb.ordinal = (CASE WHEN c.is_bd_ant THEN c.cum_ant ELSE c.cum_ant - 1 END) - 3
    """,
)
def q_bd_offset(spark, sf_dir):
    od = tables(spark, sf_dir, "orders")
    df = od.select("o_orderkey", F.to_date("o_orderdate").alias("order_date"))
    df = du_mod.deslocar(df, "order_date", 2, "forward", alias="settle_t2")
    df = du_mod.deslocar(df, "order_date", -3, "backward", alias="prev_bd3")
    return df


# === W8: is-business-day (pyield/du/core.py:598-600) ======================


@query(
    "q_is_bd",
    oracle=f"""
    WITH {_CAL}
    SELECT d.order_date, c.is_bd_ant AS eh_dia_util, CAST(d.n AS BIGINT) AS n_orders
    FROM (
      SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(*) AS n
      FROM orders GROUP BY 1
    ) d JOIN cal c ON c.data = d.order_date
    """,
)
def q_is_bd(spark, sf_dir):
    od = tables(spark, sf_dir, "orders")
    df = (
        od.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(F.count("*").alias("n_orders"))
    )
    return du_mod.eh_dia_util(df, "order_date", alias="eh_dia_util").select(
        "order_date", "eh_dia_util", "n_orders"
    )


# === J3/J5: grouped as-of join (pyield/interpolador.py:452-460,
# pyield/bc/leiloes.py:242-246) ============================================


@query(
    "q_asof_last_order",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
             CAST(l.l_shipdate AS DATE) AS ship_date
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    ord_day AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date,
             MAX(o_totalprice) AS day_max_price
      FROM orders GROUP BY 1, 2
    )
    SELECT li.l_orderkey, li.l_linenumber, li.o_custkey, li.ship_date,
           r.order_date AS last_order_date, r.day_max_price AS last_order_price
    FROM li ASOF LEFT JOIN ord_day r
      ON li.o_custkey = r.o_custkey AND li.ship_date >= r.order_date
    """,
)
def q_asof_last_order(spark, sf_dir):
    li, od = tables(spark, sf_dir, "lineitem", "orders")
    left = li.join(od, li.l_orderkey == od.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_custkey", F.to_date("l_shipdate").alias("ship_date")
    )
    right = (
        od.groupBy("o_custkey", F.to_date("o_orderdate").alias("order_date"))
        .agg(F.max("o_totalprice").alias("day_max_price"))
        .select(
            "o_custkey",
            F.col("order_date").alias("last_order_date"),
            F.col("day_max_price").alias("last_order_price"),
        )
    )
    return asof_join(
        left,
        right,
        on="ship_date",
        right_on="last_order_date",
        by="o_custkey",
        strategy="backward",
        values=["last_order_date", "last_order_price"],
    )


# === curve derivation shared by interpolation/forwards ====================
# curve: one group per ship-month; vertices du = day*10; rate from the
# (decimal-exact) average discount. SQL twin must match bit-for-bit.

_CURVE_SQL = """
curve AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS grupo,
         CAST(day(CAST(l_shipdate AS DATE)) * 10 AS BIGINT) AS du,
         round(0.05 + CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS taxa
  FROM lineitem
  GROUP BY 1, 2
)"""


def _curve_df(spark, sf_dir):
    li = tables(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.date_trunc("month", "l_shipdate").cast("date").alias("grupo"),
            (F.dayofmonth(F.to_date("l_shipdate")) * 10).cast("long").alias("du"),
        )
        .agg(
            F.round(
                F.lit(0.05)
                + F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("taxa")
        )
    )


# === J3+J4+flat-forward: the flagship interpolation pipeline
# (pyield/interpolador.py:306-497) =========================================

_INTERP_LADDER = """CASE
        WHEN du_alvo IS NULL OR du_min IS NULL THEN NULL
        WHEN du_j = du_alvo THEN tx_j
        WHEN du_alvo < du_min THEN tx_min
        WHEN du_alvo > du_max THEN NULL
        ELSE power(power(1 + tx_j, au_j)
                   * power(power(1 + tx_k, au_k) / power(1 + tx_j, au_j),
                           (au - au_j) / (au_k - au_j)),
                   1.0 / au) - 1
      END"""


@query(
    "q_interp_flat_forward",
    oracle=f"""
    WITH {_CURVE_SQL},
    targets AS (
      SELECT o_orderkey,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS grupo,
             CAST(day(CAST(o_orderdate AS DATE)) * 10 + (o_orderkey % 7) - 3 AS BIGINT) AS du_alvo
      FROM orders
    ),
    extremes AS (
      SELECT grupo, MIN(du) AS du_min, MAX(du) AS du_max,
             MIN_BY(taxa, du) AS tx_min, MAX_BY(taxa, du) AS tx_max
      FROM curve GROUP BY grupo
    ),
    j AS (
      SELECT t.*, c.du AS du_j, c.taxa AS tx_j
      FROM targets t ASOF LEFT JOIN curve c
        ON t.grupo = c.grupo AND t.du_alvo >= c.du
    ),
    jk AS (
      SELECT j.*, c.du AS du_k, c.taxa AS tx_k
      FROM j ASOF LEFT JOIN (SELECT grupo, -du AS ndu, du, taxa FROM curve) c
        ON j.grupo = c.grupo AND -j.du_alvo >= c.ndu
    ),
    fin AS (
      SELECT jk.*, e.du_min, e.du_max, e.tx_min, e.tx_max,
        (jk.du_alvo / 252.0) AS au, (jk.du_j / 252.0) AS au_j, (jk.du_k / 252.0) AS au_k
      FROM jk LEFT JOIN extremes e ON jk.grupo = e.grupo
    )
    SELECT o_orderkey, grupo, du_alvo,
      {pround_sql(_INTERP_LADDER, 6)} AS taxa_interpolada
    FROM fin
    """,
)
def q_interp_flat_forward(spark, sf_dir):
    od = tables(spark, sf_dir, "orders")
    targets = od.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("grupo"),
        (
            F.dayofmonth(F.to_date("o_orderdate")) * 10 + (F.col("o_orderkey") % 7) - 3
        ).cast("long").alias("du_alvo"),
    )
    curve = _curve_df(spark, sf_dir)
    out = interpolar(
        targets,
        curve,
        du_col="du_alvo",
        curve_du="du",
        curve_rate="taxa",
        by="grupo",
        extrapolar=False,
    )
    from pyield_spark.functions.numbers import pround_expr

    return out.select(
        "o_orderkey",
        "grupo",
        "du_alvo",
        pround_expr("taxa_interpolada", 6).alias("taxa_interpolada"),
    )


# === W1-W3: forward rates with the duplicate-vertex null cascade
# (pyield/fwd.py:144-171) ==================================================


@query(
    "q_forwards_curve",
    oracle=f"""
    WITH {_CURVE_SQL},
    curve2 AS (
      SELECT * FROM curve
      UNION ALL
      SELECT grupo, du, round(taxa + 0.001, 6) AS taxa
      FROM curve WHERE month(grupo) % 3 = 0 AND du = 150
    ),
    flagged AS (
      SELECT grupo, du, taxa,
             COUNT(*) OVER (PARTITION BY grupo, du) > 1 AS is_dup
      FROM curve2
    ),
    valid AS (
      SELECT grupo, du, taxa,
             CASE WHEN is_dup THEN NULL ELSE taxa END AS tx_valid,
             du / 252.0 AS au
      FROM flagged
    ),
    lagged AS (
      SELECT grupo, du, taxa, tx_valid, au,
             LAG(tx_valid) OVER (PARTITION BY grupo ORDER BY du) AS tx_j,
             LAG(au) OVER (PARTITION BY grupo ORDER BY du) AS au_j,
             MIN(du) OVER (PARTITION BY grupo) AS du_min
      FROM valid
    )
    SELECT grupo, du, taxa,
      {pround_sql("CASE WHEN du = du_min THEN tx_valid ELSE power(power(1 + tx_valid, au) / power(1 + tx_j, au_j), 1.0 / (au - au_j)) - 1 END", 6)} AS taxa_forward
    FROM lagged
    """,
)
def q_forwards_curve(spark, sf_dir):
    curve = _curve_df(spark, sf_dir)
    dups = curve.filter(
        (F.month("grupo") % 3 == 0) & (F.col("du") == 150)
    ).withColumn("taxa", F.round(F.col("taxa") + 0.001, 6))
    curve2 = curve.unionByName(dups)
    from pyield_spark.functions.numbers import pround_expr

    return curve2.withColumn(
        "taxa_forward", pround_expr(forwards_expr("du", "taxa", "grupo"), 6)
    )


# === K6/K7 + F16/F19: LTN pricing + DV01 over synthetic bonds
# (pyield/tpf/titulos/ltn.py:137-156, pyield/futuro/contratos.py:29-46) ====

_BONDS_SQL = """
bonds AS (
  SELECT o_orderkey,
         CAST(o_orderdate AS DATE) AS liq,
         CAST(CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
              + TO_MONTHS(CAST(24 + (o_orderkey % 5) * 6 AS INT)) AS DATE) AS ven,
         round(0.08 + (o_orderkey % 1000) / 10000.0, 6) AS taxa
  FROM orders
)"""


def _bonds_df(spark, sf_dir):
    od = tables(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("liq"),
        F.add_months(
            F.date_trunc("month", "o_orderdate").cast("date"),
            F.lit(24) + (F.col("o_orderkey") % 5).cast("int") * 6,
        ).alias("ven"),
        F.round(F.lit(0.08) + (F.col("o_orderkey") % 1000) / 10000.0, 6).alias("taxa"),
    )


@query(
    "q_ltn_pricing",
    oracle=f"""
    WITH {_CAL},
    {_BONDS_SQL.lstrip()},
    wdu AS (
      SELECT b.o_orderkey, b.liq, b.ven, b.taxa,
             CAST({bd_count_sql("b.liq", "b.ven")} AS BIGINT) AS dias_uteis
      FROM bonds b
      JOIN cal cs ON cs.data = b.liq
      JOIN cal ce ON ce.data = b.ven
    )
    SELECT o_orderkey, liq, ven, taxa, dias_uteis,
      {trunc_sql(f"1000.0 / power(1 + {trunc_sql('taxa', 8)}, {trunc_sql('dias_uteis / 252.0', 14)})", 6)} AS pu,
      {pround_sql(f"0.0001 * (dias_uteis / 252.0) / (1 + taxa) * ({trunc_sql(f'1000.0 / power(1 + ' + trunc_sql('taxa', 8) + ', ' + trunc_sql('dias_uteis / 252.0', 14) + ')', 6)})", 6)} AS dv01
    FROM wdu
    """,
)
def q_ltn_pricing(spark, sf_dir):
    bonds = _bonds_df(spark, sf_dir)
    bonds = du_mod.contar(bonds, "liq", "ven", alias="dias_uteis")
    bonds = bonds.withColumn("pu", ltn_pu_expr("dias_uteis", "taxa"))
    from pyield_spark.functions.numbers import pround_expr

    return bonds.withColumn(
        "dv01", pround_expr(dv01_expr("dias_uteis", "taxa", "pu"), 6)
    ).select("o_orderkey", "liq", "ven", "taxa", "dias_uteis", "pu", "dv01")


# === ltn.taxas_forward (pyield/tpf/titulos/ltn.py:348-407): LTN
# indicative rates are already spot (zero-coupon), so forwards apply
# directly over the (dias_uteis, taxa) maturity structure =================


@query(
    "q_ltn_forwards",
    oracle=f"""
    WITH {_CAL},
    {_BONDS_SQL.lstrip()},
    panel AS (
      SELECT CAST(date_trunc('month', liq) AS DATE) AS grupo,
             ven AS data_vencimento,
             MAX(taxa) AS taxa_indicativa
      FROM bonds GROUP BY 1, 2
    ),
    wdu AS (
      SELECT p.*, CAST({bd_count_sql("p.grupo", "p.data_vencimento")} AS BIGINT)
               AS dias_uteis
      FROM panel p
      JOIN cal cs ON cs.data = p.grupo
      JOIN cal ce ON ce.data = p.data_vencimento
    ),
    lagged AS (
      SELECT *, dias_uteis / 252.0 AS au,
             LAG(taxa_indicativa) OVER (PARTITION BY grupo ORDER BY dias_uteis) AS tx_j,
             LAG(dias_uteis / 252.0) OVER (PARTITION BY grupo ORDER BY dias_uteis) AS au_j,
             MIN(dias_uteis) OVER (PARTITION BY grupo) AS du_min
      FROM wdu
    )
    SELECT grupo, data_vencimento, dias_uteis, taxa_indicativa,
      {pround_sql("CASE WHEN dias_uteis = du_min THEN taxa_indicativa ELSE power(power(1 + taxa_indicativa, au) / power(1 + tx_j, au_j), 1.0 / (au - au_j)) - 1 END", 6)} AS taxa_forward
    FROM lagged
    """,
)
def q_ltn_forwards(spark, sf_dir):
    """``ltn.taxas_forward``: per reference month, the LTN maturity
    structure (data_vencimento, dias_uteis, taxa_indicativa) with the
    forward between consecutive vertices — first vertex's forward IS its
    spot (reference output, ltn.py:361-388). One window shuffle on the
    curve key; the (grupo, ven) groupBy guarantees unique vertices so
    the duplicate null-cascade stays inert."""
    bonds = _bonds_df(spark, sf_dir)
    panel = bonds.groupBy(
        F.date_trunc("month", "liq").cast("date").alias("grupo"),
        F.col("ven").alias("data_vencimento"),
    ).agg(F.max("taxa").alias("taxa_indicativa"))
    panel = du_mod.contar(panel, "grupo", "data_vencimento", alias="dias_uteis")
    from pyield_spark.functions.numbers import pround_expr

    return panel.select(
        "grupo",
        "data_vencimento",
        "dias_uteis",
        "taxa_indicativa",
        pround_expr(
            forwards_expr("dias_uteis", "taxa_indicativa", "grupo"), 6
        ).alias("taxa_forward"),
    )


# === K1/K2/K6/K7: coupon-bond (NTN-F) pricing + Macaulay duration by
# explode-and-aggregate (pyield/tpf/titulos/ntnf.py:283-301,870-901) =======


@query(
    "q_ntnf_pricing",
    oracle=f"""
    WITH {_CAL},
    bonds AS (
      SELECT o_orderkey,
             CAST(o_orderdate AS DATE) AS liq,
             CAST(CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
                  + TO_MONTHS(CAST(24 + (o_orderkey % 4) * 12 AS INT)) AS DATE) AS ven,
             round(0.09 + (o_orderkey % 500) / 10000.0, 6) AS taxa
      FROM orders WHERE o_orderkey % 37 = 0
    ),
    flows AS (
      SELECT b.*, CAST(b.ven - TO_MONTHS(CAST(6 * i AS INT)) AS DATE) AS pay_date
      FROM bonds b, generate_series(0, 20) t(i)
      WHERE CAST(b.ven - TO_MONTHS(CAST(6 * i AS INT)) AS DATE) > b.liq
    ),
    wdu AS (
      SELECT f.*,
             CAST({bd_count_sql("f.liq", "f.pay_date")} AS BIGINT) AS du,
             CASE WHEN f.pay_date = f.ven THEN 1048.80885 ELSE 48.80885 END AS cf
      FROM flows f
      JOIN cal cs ON cs.data = f.liq
      JOIN cal ce ON ce.data = f.pay_date
    ),
    pv AS (
      SELECT o_orderkey, liq, ven, taxa, du, cf,
        {trunc_sql("du / 252.0", 14)} AS au,
        round_even(cf / power(1 + {trunc_sql("taxa", 8)}, {trunc_sql("du / 252.0", 14)}), 9) AS vp
      FROM wdu
    )
    SELECT o_orderkey, MIN(liq) AS liq, MIN(ven) AS ven, MIN(taxa) AS taxa,
      CAST(COUNT(*) AS BIGINT) AS n_flows,
      {trunc_decimal_sum_sql("SUM(CAST(vp AS DECIMAL(28,12)))", 6)} AS pu,
      {pround_sql(
          "CAST(SUM(CAST(au AS DECIMAL(16,14)) * CAST(vp AS DECIMAL(20,9))) AS DOUBLE)"
          " / CAST(SUM(CAST(vp AS DECIMAL(20,9))) AS DOUBLE)", 9)} AS duration
    FROM pv GROUP BY o_orderkey
    """,
)
def q_ntnf_pricing(spark, sf_dir):
    od = tables(spark, sf_dir, "orders")
    bonds = od.filter(F.col("o_orderkey") % 37 == 0).select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("liq"),
        F.add_months(
            F.date_trunc("month", "o_orderdate").cast("date"),
            F.lit(24) + (F.col("o_orderkey") % 4).cast("int") * 12,
        ).alias("ven"),
        F.round(F.lit(0.09) + (F.col("o_orderkey") % 500) / 10000.0, 6).alias("taxa"),
    )
    priced = price_coupon_bond(
        bonds,
        ["o_orderkey"],
        settlement="liq",
        maturity="ven",
        taxa="taxa",
        with_duration=True,
    )
    from pyield_spark.bonds.cashflows import explode_payment_dates

    counts = (
        explode_payment_dates(bonds, "liq", "ven")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_flows"))
    )
    meta = bonds.select("o_orderkey", "liq", "ven", "taxa")
    return (
        meta.join(counts, "o_orderkey")
        .join(priced, "o_orderkey")
        .select(
            "o_orderkey", "liq", "ven", "taxa", "n_flows", "pu", "duration"
        )
    )


# === carry / roll-down on the curve (interpolation composed) ==============

_ROLL_DU = 21  # one business month


@query(
    "q_carry_rolldown",
    oracle=f"""
    WITH {_CURVE_SQL},
    targets AS (
      SELECT grupo, du, taxa,
             CAST(du - {_ROLL_DU} AS BIGINT) AS du_alvo
      FROM curve
    ),
    extremes AS (
      SELECT grupo, MIN(du) AS du_min, MAX(du) AS du_max,
             MIN_BY(taxa, du) AS tx_min, MAX_BY(taxa, du) AS tx_max
      FROM curve GROUP BY grupo
    ),
    j AS (
      SELECT t.*, c.du AS du_j, c.taxa AS tx_j
      FROM targets t ASOF LEFT JOIN curve c
        ON t.grupo = c.grupo AND t.du_alvo >= c.du
    ),
    jk AS (
      SELECT j.*, c.du AS du_k, c.taxa AS tx_k
      FROM j ASOF LEFT JOIN (SELECT grupo, -du AS ndu, du, taxa FROM curve) c
        ON j.grupo = c.grupo AND -j.du_alvo >= c.ndu
    ),
    fin AS (
      SELECT jk.*, e.du_min, e.du_max, e.tx_min, e.tx_max,
        (jk.du_alvo / 252.0) AS au, (jk.du_j / 252.0) AS au_j, (jk.du_k / 252.0) AS au_k
      FROM jk LEFT JOIN extremes e ON jk.grupo = e.grupo
    ),
    rolled AS (
      SELECT grupo, du, taxa,
        {pround_sql(_INTERP_LADDER, 6)} AS taxa_roll
      FROM fin
    )
    SELECT grupo, du, taxa, taxa_roll,
      {pround_sql("(taxa - taxa_roll) * 10000.0", 4)} AS rolldown_bps
    FROM rolled ORDER BY grupo, du
    """,
)
def q_carry_rolldown(spark, sf_dir):
    """Roll-down per curve vertex: today's rate minus the rate the same
    position will carry after rolling {_ROLL_DU} business days down the
    (unchanged) curve — the standard curve-carry number a rates desk
    quotes in bps.

    Pure composition: the target set IS the curve shifted by
    −{_ROLL_DU} du, fed through the same flat-forward interpolation
    engine (one extra window over the already-aggregated curve — the
    fact table is touched once, by the curve derivation). Below-minimum
    targets take the short-end flat extrapolation, exactly the
    reference's interpolador ladder."""
    curve = _curve_df(spark, sf_dir)
    targets = curve.select(
        "grupo", "du", "taxa", (F.col("du") - _ROLL_DU).cast("long").alias("du_alvo")
    )
    out = interpolar(
        targets,
        _curve_df(spark, sf_dir),
        du_col="du_alvo",
        curve_du="du",
        curve_rate="taxa",
        by="grupo",
        extrapolar=False,
        alias="_raw_roll",
    )
    from pyield_spark.functions.numbers import pround_expr

    taxa_roll = pround_expr("_raw_roll", 6)
    return (
        out.withColumn("taxa_roll", taxa_roll)
        .select(
            "grupo",
            "du",
            "taxa",
            "taxa_roll",
            pround_expr(
                (F.col("taxa") - F.col("taxa_roll")) * 10000.0, 4
            ).alias("rolldown_bps"),
        )
        .orderBy("grupo", "du")
    )

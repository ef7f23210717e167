"""q_ntnb_total_return — the reference's article-level NTN-B
total-return decomposition (docs/articles/ntnb_total_return/utils.py)
as a registered engine query with a full DuckDB oracle.

Synthetic inputs from ``orders`` (same construction family as
q_ntnb_pricing): every 97th order is a position with

- ``data_inicial`` = the order date,
- ``data_final``   = month-start + (12 + key%4·6) months + 24 days
  (day 25 of a month — never the 15th, so it cannot coincide with a
  coupon payment date; see the operator docstring's dedupe note),
- ``data_vencimento`` = month-start + (36 + key%3·24) months + 14 days
  (the 15th — the NTN-B payment-grid anchor, as in q_ntnb_pricing).

The VNA and indicative-rate series are deterministic date functions
materialized over the composite-regime business-day calendar inside the
oracle window (1994–2012), so both engines see the identical tables:

- ``vna(d)  = 3500.0 + (days_since_1990(d) % 4000) · 0.731``
- ``taxa(d, ven) = 0.04 + ((days(ven)·7 + days(d)) % 250) / 10000``

Both are pure IEEE-double arithmetic on exact integers — bit-identical
across engines without rounding helpers; the quote chain itself reuses
the proven q_ntnb_pricing truncation fragments.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pyield_spark import calendar_br as calmod
from pyield_spark.analytics.total_return import (
    TAXA_REINVESTIMENTO_CUPOM,
    TOLERANCIA_CHECAGEM,
    decompor_retorno_ntnb,
)
from pyield_spark.bonds.pricing import NTNB_CUPOM
from pyield_spark.queries import query, tables
from pyield_spark.queries.fixed_income import _CAL, _CAL_HI, _CAL_LO
from pyield_spark.queries.oracle_helpers import (
    bd_count_sql,
    trunc_decimal_sum_sql,
    trunc_sql,
)

_D0 = "DATE '1990-01-01'"
_TR = repr(TAXA_REINVESTIMENTO_CUPOM)  # round-trips to the same double
_CUP = f"(CASE WHEN v.fim_cup THEN CAST({_TR} AS DOUBLE) ELSE 0.0 END)"
_DU = "CAST(" + bd_count_sql("f.liq", "f.pay") + " AS BIGINT) / 252.0"
_VP = (
    "round_even((CASE WHEN f.pay = f.ven THEN 1.02956301 ELSE 0.02956301 END)"
    " / power(1 + " + trunc_sql("f.tx", 8) + ", " + trunc_sql(_DU, 14) + "), 12)"
)
_COT = trunc_decimal_sum_sql("SUM(CAST(vp AS DECIMAL(28,12)))", 6)
_REGIME = "(CASE WHEN {d} < DATE '2023-12-26' THEN 'antigo' ELSE 'novo' END)"
_ORDINAL = "(CASE WHEN {d} < DATE '2023-12-26' THEN {c}.cum_ant ELSE {c}.cum_nov END)"


def _composite_bdays(spark):
    """Business days under the per-date regime rule, restricted to the
    oracle calendar window so both engines see one series domain."""
    return (
        calmod.business_dates_df(spark)
        .filter(
            (
                (F.col("regime") == "antigo")
                & (F.col("data") < F.lit(calmod.TRANSITION_DATE))
            )
            | (
                (F.col("regime") == "novo")
                & (F.col("data") >= F.lit(calmod.TRANSITION_DATE))
            )
        )
        .filter(
            (F.col("data") >= F.lit(_CAL_LO)) & (F.col("data") <= F.lit(_CAL_HI))
        )
        .select("data")
    )


def _dd(c):
    return F.datediff(c, F.to_date(F.lit("1990-01-01")))


@query(
    "q_ntnb_total_return",
    oracle=f"""
    WITH {_CAL},
    bonds AS (
      SELECT o_orderkey,
             CAST(o_orderdate AS DATE) AS ini,
             CAST(CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
                  + TO_MONTHS(CAST(12 + (o_orderkey % 4) * 6 AS INT)) AS DATE) + 24 AS fin,
             CAST(CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
                  + TO_MONTHS(CAST(36 + (o_orderkey % 3) * 24 AS INT)) AS DATE) + 14 AS ven
      FROM orders WHERE o_orderkey % 97 = 0
    ),
    vna AS (
      -- DOUBLE casts are load-bearing: DuckDB would otherwise run the
      -- decimal literals in exact DECIMAL arithmetic (and return
      -- Decimal values), diverging from Spark's IEEE chain by 1 ulp
      SELECT data,
             CAST(3500.0 AS DOUBLE)
               + (datediff('day', {_D0}, data) % 4000)
                 * CAST(0.731 AS DOUBLE) AS vv
      FROM cal
      WHERE (CASE WHEN data < DATE '2023-12-26' THEN is_bd_ant ELSE is_bd_nov END)
    ),
    cps AS (
      SELECT b.o_orderkey, CAST(b.ven - TO_MONTHS(CAST(6 * i AS INT)) AS DATE) AS dc
      FROM bonds b, generate_series(0, 20) t(i)
      WHERE CAST(b.ven - TO_MONTHS(CAST(6 * i AS INT)) AS DATE) > b.ini
        AND CAST(b.ven - TO_MONTHS(CAST(6 * i AS INT)) AS DATE) <= b.fin
    ),
    lad0 AS (
      SELECT o_orderkey, ini AS dc, FALSE AS cup FROM bonds
      UNION ALL SELECT o_orderkey, dc, TRUE FROM cps
      UNION ALL SELECT o_orderkey, fin, FALSE FROM bonds
    ),
    lad AS (SELECT o_orderkey, dc, MAX(cup) AS cup FROM lad0 GROUP BY 1, 2),
    seq AS (
      SELECT l.o_orderkey, l.dc, l.cup, b.ven,
        LEAD(l.dc) OVER w AS fim, LEAD(l.cup) OVER w AS fim_cup,
        CAST(ROW_NUMBER() OVER w AS INT) AS periodo
      FROM lad l JOIN bonds b USING (o_orderkey)
      WINDOW w AS (PARTITION BY l.o_orderkey ORDER BY l.dc)
    ),
    per AS (SELECT * FROM seq WHERE fim IS NOT NULL),
    adj AS (
      SELECT p.*, bi.data AS iniu, bf.data AS fimu
      FROM per p
      JOIN cal ci ON ci.data = p.dc
      JOIN cal cf ON cf.data = p.fim
      LEFT JOIN bdinv bi ON bi.regime = {_REGIME.format(d="p.dc")}
        AND bi.ordinal = {_ORDINAL.format(d="p.dc", c="ci")}
      LEFT JOIN bdinv bf ON bf.regime = {_REGIME.format(d="p.fim")}
        AND bf.ordinal = {_ORDINAL.format(d="p.fim", c="cf")}
    ),
    enr AS (
      SELECT a.*,
        0.04 + ((datediff('day', {_D0}, a.ven) * 7
                 + datediff('day', {_D0}, a.iniu)) % 250) / 10000.0 AS txi,
        0.04 + ((datediff('day', {_D0}, a.ven) * 7
                 + datediff('day', {_D0}, a.fimu)) % 250) / 10000.0 AS txf
      FROM adj a
    ),
    v1 AS (SELECT e.*, v.vv AS vna_ini FROM enr e ASOF LEFT JOIN vna v ON e.iniu >= v.data),
    v2 AS (SELECT e.*, v.vv AS vna_fim FROM v1 e ASOF LEFT JOIN vna v ON e.fimu >= v.data),
    v3 AS (SELECT e.*, v.vv AS vna_pag FROM v2 e ASOF LEFT JOIN vna v ON e.fim >= v.data),
    roles AS (
      SELECT o_orderkey, periodo, ven, 'i' AS r, iniu AS liq, txi AS tx FROM v3
      UNION ALL
      SELECT o_orderkey, periodo, ven, 'f', fimu, txf FROM v3
      UNION ALL
      SELECT o_orderkey, periodo, ven, 'h', fimu, txi FROM v3
    ),
    rfl AS (
      SELECT ro.*, CAST(ro.ven - TO_MONTHS(CAST(6 * i AS INT)) AS DATE) AS pay
      FROM roles ro, generate_series(0, 20) t(i)
      WHERE CAST(ro.ven - TO_MONTHS(CAST(6 * i AS INT)) AS DATE) > ro.liq
    ),
    rpv AS (
      SELECT f.o_orderkey, f.periodo, f.r, {_VP} AS vp
      FROM rfl f
      JOIN cal cs ON cs.data = f.liq
      JOIN cal ce ON ce.data = f.pay
    ),
    rq AS (
      SELECT o_orderkey, periodo, r, {_COT} AS cot
      FROM rpv GROUP BY 1, 2, 3
    ),
    pv AS (
      SELECT o_orderkey, periodo,
        MAX(CASE WHEN r = 'i' THEN cot END) AS cot_i,
        MAX(CASE WHEN r = 'f' THEN cot END) AS cot_f,
        MAX(CASE WHEN r = 'h' THEN cot END) AS cot_h
      FROM rq GROUP BY 1, 2
    )
    SELECT v.o_orderkey, v.periodo,
      v.dc AS data_inicio, v.fim AS data_fim,
      v.iniu AS data_inicio_util, v.fimu AS data_fim_util,
      {_CUP} AS cupom,
      CASE WHEN v.fim_cup THEN v.vna_pag * {NTNB_CUPOM!r} END AS valor_pagamento,
      ((p.cot_f + {_CUP}) * v.vna_fim) / (p.cot_i * v.vna_ini) - 1.0 AS retorno_total,
      v.vna_fim / v.vna_ini AS retorno_inflacao,
      (p.cot_f + {_CUP}) / (p.cot_h + {_CUP}) AS retorno_mm,
      (p.cot_h + {_CUP}) / p.cot_i AS retorno_real,
      (abs(((p.cot_f + {_CUP}) / (p.cot_h + {_CUP}))
           * ((p.cot_h + {_CUP}) / p.cot_i)
           * (v.vna_fim / v.vna_ini) - 1.0
           - (((p.cot_f + {_CUP}) * v.vna_fim) / (p.cot_i * v.vna_ini) - 1.0))
       <= {TOLERANCIA_CHECAGEM!r}) AS checagem_ok
    FROM v3 v JOIN pv p USING (o_orderkey, periodo)
    """,
)
def q_ntnb_total_return(spark, sf_dir):
    """Reference docs/articles/ntnb_total_return/utils.py:13-118 as an
    engine pipeline: coupon ladder → deslocar(0) adjustments → VNA
    backward as-ofs → one ntnb_cotacao pass for the (i, f, h) quote
    roles → per-period inflation / market-marking / real-rate
    decomposition with the reference's consistency check."""
    od = tables(spark, sf_dir, "orders")
    mtrunc = F.date_trunc("month", "o_orderdate").cast("date")
    bonds = od.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("data_inicial"),
        F.date_add(
            F.add_months(mtrunc, F.lit(12) + (F.col("o_orderkey") % 4).cast("int") * 6),
            24,
        ).alias("data_final"),
        F.date_add(
            F.add_months(mtrunc, F.lit(36) + (F.col("o_orderkey") % 3).cast("int") * 24),
            14,
        ).alias("data_vencimento"),
    )
    bdays = _composite_bdays(spark)
    vna = bdays.select(
        "data",
        (F.lit(3500.0) + (_dd(F.col("data")) % 4000) * F.lit(0.731)).alias("vna"),
    )
    # rate series: business days inside each maturity's position window
    # (maturity count is dimension-sized → broadcast range join)
    mats = bonds.groupBy("data_vencimento").agg(
        F.min("data_inicial").alias("_lo"),
        F.date_add(F.max("data_final"), 7).alias("_hi"),
    )
    taxas = bdays.join(
        F.broadcast(mats),
        (F.col("data") >= F.col("_lo")) & (F.col("data") <= F.col("_hi")),
    ).select(
        "data",
        "data_vencimento",
        (
            F.lit(0.04)
            + ((_dd(F.col("data_vencimento")) * 7 + _dd(F.col("data"))) % 250)
            / F.lit(10000.0)
        ).alias("taxa"),
    )
    return decompor_retorno_ntnb(bonds, vna, taxas, ["o_orderkey"])

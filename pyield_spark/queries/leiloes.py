"""Treasury-auction (leilões) composite pipeline.

The densest composite in the reference (pyield/bc/leiloes.py:88-246 +
pyield/tpf/leiloes.py:178-186): per-title when/then dispatch of
duration/DV01 (LTN closed-form, NTN-F/NTN-B repriced coupon flows, LFT
zero), ``sum_horizontal`` first+second-round totals, financeiro
proration, the pre-2024-06-11 NTN-B/LFT pu restatement, the
zero-acceptance null-out, and a PTAX ungrouped backward as-of join with
USD DV01 conversion.

DV01 is the reference's repricing definition (ltn.py:251-289,
ntnf.py:904-939, ntnb.py:779-819): ``pu_feed · (1 − price(taxa+1bp) /
price(taxa))`` with the +1bp rate re-rounded to 8 decimals.

Spark design: both coupon families price BOTH rate scenarios in ONE
exploded pass (one narrow explode + one groupBy — no second flow
shuffle); the LTN branch is pure column arithmetic; the PTAX attach uses
the distributed ungrouped as-of (operators/asof.py range buckets).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pyield_spark import du as du_mod
from pyield_spark.bonds.pricing import anos_uteis_expr, ltn_pu_expr
from pyield_spark.functions.numbers import (
    pround_expr,
    trunc_decimal_sum_expr,
    truncar_expr,
)
from pyield_spark.operators.asof import asof_join
from pyield_spark.queries import query, tables
from pyield_spark.queries.fixed_income import _CAL
from pyield_spark.queries.oracle_helpers import (
    bd_count_sql,
    pround_sql,
    trunc_decimal_sum_sql,
    trunc_sql,
)

_DATA_MUDANCA = dt.date(2024, 6, 11)  # leiloes.py:90 pu-restatement cutoff


def _panel(spark, sf_dir):
    # widen: everything between the scan and the pricing groupBy is
    # narrow (title dispatch, calendar joins, the ~13-flow explode with
    # two decimal-scale brounds per flow) — serial on a single-row-group
    # scan; in-session A/B at sf0.1 shows a consistent ~12% win
    od = tables(spark, sf_dir, "orders", widen=True)
    k = F.col("o_orderkey")
    titulo = (
        F.when(k % 4 == 0, "LTN")
        .when(k % 4 == 1, "NTN-F")
        .when(k % 4 == 2, "NTN-B")
        .otherwise("LFT")
    )
    return od.select(
        "o_orderkey",
        titulo.alias("titulo"),
        F.to_date("o_orderdate").alias("data_leilao"),
        F.to_date("o_orderdate").alias("liq"),
        F.add_months(
            F.date_trunc("month", "o_orderdate").cast("date"),
            F.lit(12) + (k % 6).cast("int") * 6,
        ).alias("data_vencimento"),
        F.round(F.lit(0.08) + (k % 700) / 10000.0, 6).alias("taxa_media"),
        F.round(
            F.lit(0.08) + (k % 700) / 10000.0 + (k % 3) * 0.0001, 6
        ).alias("taxa_corte"),
        F.round(F.lit(700.0) + (k % 3000) / 10.0, 2).alias("pu_medio_raw"),
        F.round(
            F.lit(700.0) + (k % 3000) / 10.0 - (k % 5) * 0.01, 2
        ).alias("pu_corte_raw"),
        (k % 1000).alias("quantidade_aceita_1v"),
        F.expr(
            "CASE WHEN o_orderkey % 11 = 0 THEN CAST(NULL AS BIGINT)"
            " ELSE (o_orderkey DIV 7) % 500 END"
        ).alias("quantidade_aceita_2v"),
        (F.round("o_totalprice", 2) * 1000).alias("financeiro_total"),
    )


def _family_pricing_single_pass(p):
    """Panel + coupon-family pricing in ONE orders pass.

    The r10 baseline plan scanned orders TWICE — once for the enriched
    panel, once under the family-pricing aggregate — and re-attached
    the aggregate with a fact⋈fact-aggregate SortMergeJoin (2 sorts +
    3 Exchanges). Here the coupon flows are exploded IN-LINE
    (``explode_outer`` keeps LTN/LFT and empty-flow bonds as sentinel
    ``pay IS NULL`` rows) and the pricing aggregate carries the panel
    columns through ``first()``, so the fact table is scanned once and
    the only fact shuffle is the groupBy exchange (guide §2.4: remove
    shuffles outright; §8: one pass over the payload). Values are
    identical by construction: decimal sums are exact
    (order-independent), NTN-F (base-1000, vp bround9) / NTN-B
    (base-1, vp bround12) price at taxa and taxa+1bp exactly as
    before, and SUM/ratio over the all-NULL sentinel groups reproduces
    the old LEFT JOIN's null semantics for LTN/LFT and empty flow
    sets (Spark SUM skips nulls and returns NULL for all-null groups).

    The reference's dv01 truncates the rate, adds 1bp with round8, and
    the pricing function then re-truncates (normalizar) — re-truncation
    is NOT a no-op in float (trunc8(0.1445) = 0.14449999), so the
    double application is mirrored exactly (ltn.py:281-289,
    _utils.py:195-197). Both rate scenarios are computed BEFORE the
    flow explode: the Generate is a projection barrier, so the nested
    truncation chains evaluate once per bond, not once per cash flow.
    """
    carry = [c for c in p.columns if c != "o_orderkey"]
    fam_cond = F.col("titulo").isin("NTN-F", "NTN-B")
    p = p.withColumns(
        {
            "_t1": truncar_expr(truncar_expr(F.col("taxa_media"), 8), 8),
            "_t2": truncar_expr(
                pround_expr(
                    truncar_expr(F.col("taxa_media"), 8) + F.lit(0.0001), 8
                ),
                8,
            ),
        }
    )
    # the payment grid of explode_payment_dates, built as an ARRAY so
    # non-coupon / empty-flow rows survive the explode as one sentinel
    # row: dates at ven - 6i months for i = 0.. while date > liq
    liq = F.col("liq")
    ven = F.col("data_vencimento")
    n_max = F.greatest(
        F.ceil(F.months_between(ven, liq) / F.lit(6.0)).cast("int")
        + F.lit(1),
        F.lit(0),
    )
    pays = F.filter(
        F.transform(
            F.sequence(F.lit(0), n_max),
            lambda i: F.add_months(ven, -i * F.lit(6)),
        ),
        lambda d: d > liq,
    )
    flows = p.withColumn(
        "pay", F.explode_outer(F.when(fam_cond, pays).otherwise(F.array()))
    )
    flows = du_mod.contar(flows, "liq", "pay", alias="_du_f")
    au = anos_uteis_expr("_du_f")
    is_f = F.col("titulo") == "NTN-F"
    cf = F.when(
        F.col("pay") == F.col("data_vencimento"),
        F.when(is_f, F.lit(1048.80885)).otherwise(F.lit(1.02956301)),
    ).otherwise(F.when(is_f, F.lit(48.80885)).otherwise(F.lit(0.02956301)))
    t1 = F.col("_t1")
    t2 = F.col("_t2")
    vp1 = F.when(is_f, F.bround(cf / F.pow(1 + t1, au), 9)).otherwise(
        F.bround(cf / F.pow(1 + t1, au), 12)
    )
    vp2 = F.when(is_f, F.bround(cf / F.pow(1 + t2, au), 9)).otherwise(
        F.bround(cf / F.pow(1 + t2, au), 12)
    )
    au_dec = au.cast("decimal(16,14)")
    vp1_dec = F.when(is_f, vp1.cast("decimal(20,9)").cast("decimal(23,12)")).otherwise(
        vp1.cast("decimal(20,12)").cast("decimal(23,12)")
    )
    return (
        flows.withColumns(
            {"_vp1": vp1, "_vp2": vp2, "_aud": au_dec, "_vpd": vp1_dec}
        )
        .groupBy("o_orderkey")
        .agg(
            *[F.first(c).alias(c) for c in carry],
            trunc_decimal_sum_expr(
                F.sum(F.col("_vp1").cast("decimal(28,12)")), 6
            ).alias("_preco1"),
            trunc_decimal_sum_expr(
                F.sum(F.col("_vp2").cast("decimal(28,12)")), 6
            ).alias("_preco2"),
            pround_expr(
                F.sum(F.col("_aud") * F.col("_vpd")).cast("double")
                / F.sum(F.col("_vpd")).cast("double"),
                9,
            ).alias("_dur"),
        )
    )


def _leiloes_oracle() -> str:
    au14 = trunc_sql("f.du_f / 252.0", 14)
    # double trunc8 mirrors the reference: dv01 normalizes the rate, and
    # the pricing call re-normalizes (not a float no-op)
    t1 = trunc_sql(trunc_sql("f.taxa_media", 8), 8)
    t2 = trunc_sql(pround_sql(trunc_sql("f.taxa_media", 8) + " + 0.0001", 8), 8)
    ltn_t1 = trunc_sql(trunc_sql("taxa_media", 8), 8)
    ltn_t2 = trunc_sql(
        pround_sql(trunc_sql("taxa_media", 8) + " + 0.0001", 8), 8
    )
    ltn_au = trunc_sql("dias_uteis / 252.0", 14)
    ltn_p1 = trunc_sql(f"1000.0 / power(1 + {ltn_t1}, {ltn_au})", 6)
    ltn_p2 = trunc_sql(f"1000.0 / power(1 + {ltn_t2}, {ltn_au})", 6)
    return f"""
    WITH {_CAL},
    lpan AS (
      SELECT o_orderkey,
        CASE o_orderkey % 4 WHEN 0 THEN 'LTN' WHEN 1 THEN 'NTN-F'
                            WHEN 2 THEN 'NTN-B' ELSE 'LFT' END AS titulo,
        CAST(o_orderdate AS DATE) AS data_leilao,
        CAST(o_orderdate AS DATE) AS liq,
        CAST(CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
             + TO_MONTHS(CAST(12 + (o_orderkey % 6) * 6 AS INT)) AS DATE) AS ven,
        round(0.08 + (o_orderkey % 700) / 10000.0, 6) AS taxa_media,
        round(0.08 + (o_orderkey % 700) / 10000.0 + (o_orderkey % 3) * 0.0001, 6) AS taxa_corte,
        round(700.0 + (o_orderkey % 3000) / 10.0, 2) AS pu_medio_raw,
        round(700.0 + (o_orderkey % 3000) / 10.0 - (o_orderkey % 5) * 0.01, 2) AS pu_corte_raw,
        CAST(o_orderkey % 1000 AS BIGINT) AS q1,
        CASE WHEN o_orderkey % 11 = 0 THEN NULL
             ELSE CAST((o_orderkey // 7) % 500 AS BIGINT) END AS q2,
        round(o_totalprice, 2) * 1000 AS financeiro_total
      FROM orders
    ),
    ldu AS (
      SELECT p.*, CAST({bd_count_sql("p.liq", "p.ven")} AS BIGINT) AS dias_uteis
      FROM lpan p JOIN cal cs ON cs.data = p.liq JOIN cal ce ON ce.data = p.ven
    ),
    lfl AS (
      SELECT b.o_orderkey, b.titulo, b.liq, b.ven, b.taxa_media,
             CAST(b.ven - TO_MONTHS(CAST(6 * i AS INT)) AS DATE) AS pay
      FROM lpan b, generate_series(0, 12) t(i)
      WHERE b.titulo IN ('NTN-F', 'NTN-B')
        AND CAST(b.ven - TO_MONTHS(CAST(6 * i AS INT)) AS DATE) > b.liq
    ),
    lpv AS (
      SELECT f.o_orderkey, f.titulo,
        CASE WHEN f.pay = f.ven THEN
               CASE WHEN f.titulo = 'NTN-F' THEN 1048.80885 ELSE 1.02956301 END
             ELSE CASE WHEN f.titulo = 'NTN-F' THEN 48.80885 ELSE 0.02956301 END
        END AS cf,
        {au14} AS au,
        {t1} AS tx1, {t2} AS tx2
      FROM (
        SELECT l.*, CAST({bd_count_sql("l.liq", "l.pay")} AS BIGINT) AS du_f
        FROM lfl l JOIN cal cs ON cs.data = l.liq JOIN cal ce ON ce.data = l.pay
      ) f
    ),
    lvp AS (
      SELECT o_orderkey, titulo, au,
        CASE WHEN titulo = 'NTN-F' THEN round_even(cf / power(1 + tx1, au), 9)
             ELSE round_even(cf / power(1 + tx1, au), 12) END AS vp1,
        CASE WHEN titulo = 'NTN-F' THEN round_even(cf / power(1 + tx2, au), 9)
             ELSE round_even(cf / power(1 + tx2, au), 12) END AS vp2
      FROM lpv
    ),
    lfam AS (
      SELECT o_orderkey,
        {trunc_decimal_sum_sql("SUM(CAST(vp1 AS DECIMAL(28,12)))", 6)} AS fpreco1,
        {trunc_decimal_sum_sql("SUM(CAST(vp2 AS DECIMAL(28,12)))", 6)} AS fpreco2,
        {pround_sql(
            "CAST(SUM(CAST(au AS DECIMAL(16,14)) *"
            " (CASE WHEN titulo = 'NTN-F'"
            "  THEN CAST(CAST(vp1 AS DECIMAL(20,9)) AS DECIMAL(23,12))"
            "  ELSE CAST(CAST(vp1 AS DECIMAL(20,12)) AS DECIMAL(23,12)) END)) AS DOUBLE)"
            " / CAST(SUM(CASE WHEN titulo = 'NTN-F'"
            "  THEN CAST(CAST(vp1 AS DECIMAL(20,9)) AS DECIMAL(23,12))"
            "  ELSE CAST(CAST(vp1 AS DECIMAL(20,12)) AS DECIMAL(23,12)) END) AS DOUBLE)",
            9)} AS fdur
      FROM lvp GROUP BY o_orderkey
    ),
    lbase AS (
      SELECT d.*, f.fpreco1, f.fpreco2, f.fdur,
             d.q1 + COALESCE(d.q2, 0) AS qtot
      FROM ldu d LEFT JOIN lfam f USING (o_orderkey)
    ),
    lfin AS (
      SELECT *,
        CASE WHEN q1 <> 0
             THEN CAST(q1 AS DOUBLE) / CAST(qtot AS DOUBLE) * financeiro_total
             ELSE 0.0 END AS financeiro_1v
      FROM lbase
    ),
    lpu AS (
      SELECT *, financeiro_total - financeiro_1v AS financeiro_2v,
        CASE WHEN q1 = 0 THEN NULL
             WHEN data_leilao >= DATE '2024-06-11' OR titulo IN ('LTN', 'NTN-F')
               THEN pu_medio_raw
             ELSE round_even(financeiro_1v / q1, 6) END AS pu_medio,
        CASE WHEN q1 = 0 THEN NULL ELSE pu_corte_raw END AS pu_corte,
        CASE WHEN q1 = 0 THEN NULL ELSE taxa_media END AS taxa_media_out,
        CASE WHEN q1 = 0 THEN NULL ELSE taxa_corte END AS taxa_corte_out
      FROM lfin
    ),
    ldur2 AS (
      SELECT *,
        CASE WHEN titulo = 'LTN' THEN dias_uteis / 252.0
             WHEN titulo IN ('NTN-F', 'NTN-B') THEN
               CASE WHEN q1 = 0 THEN NULL ELSE fdur END
             ELSE 0.0 END AS duration,
        CASE WHEN titulo = 'LFT' THEN 0.0
             WHEN titulo = 'LTN' THEN pu_medio * (1 - ({ltn_p2}) / ({ltn_p1}))
             ELSE pu_medio * (1 - fpreco2 / fpreco1) END AS dv01_unitario
      FROM lpu
    ),
    lptax AS (
      SELECT data AS data_ref,
        CAST(4500 + (day(data) * 7 % 100) * 10 + month(data) AS DOUBLE)
          / 1000.0 AS ptax
      FROM cal
      WHERE data BETWEEN DATE '1994-12-01' AND DATE '2001-12-31'
        AND (day(data) + month(data)) % 3 <> 1
    ),
    lasof AS (
      SELECT d.*, pt.data_ref, pt.ptax
      FROM ldur2 d ASOF LEFT JOIN lptax pt ON d.data_leilao >= pt.data_ref
    )
    SELECT o_orderkey, titulo, data_leilao, ven AS data_vencimento, dias_uteis,
      taxa_media_out AS taxa_media, taxa_corte_out AS taxa_corte,
      pu_medio, pu_corte,
      q1 AS quantidade_aceita_1v, q2 AS quantidade_aceita_2v,
      qtot AS quantidade_aceita_total,
      financeiro_total, financeiro_1v, financeiro_2v,
      duration,
      CASE WHEN titulo = 'LFT' THEN dias_uteis / 252.0 ELSE duration END AS prazo_medio,
      dv01_unitario,
      dv01_unitario * qtot AS dv01_total,
      dv01_unitario * q1 AS dv01_1v,
      dv01_unitario * q2 AS dv01_2v,
      ptax,
      round_even(dv01_unitario * qtot / ptax, 2) AS dv01_total_usd,
      round_even(dv01_unitario * q1 / ptax, 2) AS dv01_1v_usd,
      round_even(dv01_unitario * q2 / ptax, 2) AS dv01_2v_usd
    FROM lasof
    """


@query("q_leiloes", oracle=_leiloes_oracle())
def q_leiloes(spark, sf_dir):
    # ONE orders pass: the panel (with its business-day count) flows
    # straight into the in-line family-pricing aggregate — see
    # _family_pricing_single_pass for why this replaced the former
    # fact⋈fact-aggregate join (one scan + one groupBy exchange vs two
    # scans + SortMergeJoin in the r10 baseline plan)
    pnl = _panel(spark, sf_dir)
    p = du_mod.contar(pnl, "liq", "data_vencimento", alias="dias_uteis")
    p = _family_pricing_single_pass(p)

    q1 = F.col("quantidade_aceita_1v")
    q2 = F.col("quantidade_aceita_2v")
    qtot = q1 + F.coalesce(q2, F.lit(0))  # sum_horizontal: null counts as 0
    fin1 = F.when(
        q1 != 0,
        q1.cast("double") / qtot.cast("double") * F.col("financeiro_total"),
    ).otherwise(F.lit(0.0))

    # pre-2024-06-11 NTN-B/LFT pu restatement, then zero-acceptance null-out
    keep_pu = (F.col("data_leilao") >= F.lit(_DATA_MUDANCA)) | F.col(
        "titulo"
    ).isin("LTN", "NTN-F")
    pu_med = F.when(keep_pu, F.col("pu_medio_raw")).otherwise(
        F.when(q1 != 0, F.bround(fin1 / q1, 6))
    )
    nz = q1 != 0
    # batched withColumns: each single-column withColumn is a full py4j
    # plan-transform round trip; one call adds them all
    p = p.withColumns(
        {
            "quantidade_aceita_total": qtot,
            "financeiro_1v": fin1,
            "financeiro_2v": F.col("financeiro_total") - fin1,
            "pu_medio": F.when(nz, pu_med),
            "pu_corte": F.when(nz, F.col("pu_corte_raw")),
            "taxa_media_o": F.when(nz, F.col("taxa_media")),
            "taxa_corte_o": F.when(nz, F.col("taxa_corte")),
        }
    )

    # per-title dispatch (leiloes.py:92-118,181-199)
    is_ltn = F.col("titulo") == "LTN"
    is_coupon = F.col("titulo").isin("NTN-F", "NTN-B")
    duration = (
        F.when(is_ltn, F.col("dias_uteis") / 252.0)
        .when(is_coupon, F.when(nz, F.col("_dur")))
        .otherwise(F.lit(0.0))
    )
    t1 = truncar_expr(F.col("taxa_media"), 8)
    t2 = pround_expr(t1 + F.lit(0.0001), 8)
    ltn_p1 = ltn_pu_expr("dias_uteis", t1)
    ltn_p2 = ltn_pu_expr("dias_uteis", t2)
    dv01_unit = (
        F.when(F.col("titulo") == "LFT", F.lit(0.0))
        .when(is_ltn, F.col("pu_medio") * (1 - ltn_p2 / ltn_p1))
        .otherwise(F.col("pu_medio") * (1 - F.col("_preco2") / F.col("_preco1")))
    )
    p = p.withColumns({"duration": duration, "dv01_unitario": dv01_unit})

    # PTAX series + ungrouped backward as-of + USD conversion. The
    # series derives from the session-cached calendar dimension, NOT a
    # distinct() over the fact table: the as-of references its right
    # side ~3× (percentile boundaries, per-bucket bests, the union), and
    # a fact-derived series would re-scan + re-shuffle the fact table
    # each time (the measured lineage-recompute hazard). A gappy 2/3-of
    # -days slice keeps the backward match doing real work, and bounding
    # the slice to the auction-date span keeps the as-of's range-bucket
    # boundaries aligned with the left key distribution.
    from pyield_spark.calendar_br import calendar_df

    ptax = (
        calendar_df(spark)
        .select(F.col("data").alias("data_ref"))
        .filter(
            F.col("data_ref").between("1994-12-01", "2001-12-31")
            & ((F.dayofmonth("data_ref") + F.month("data_ref")) % 3 != 1)
        )
        .withColumn(
            "ptax",
            (
                F.lit(4500)
                + (F.dayofmonth("data_ref") * 7 % 100) * 10
                + F.month("data_ref")
            ).cast("double")
            / 1000.0,
        )
    )
    # the PTAX series is dimension-sized → broadcast as-of (no fact
    # shuffle for the attach)
    p = asof_join(
        p, ptax, on="data_leilao", right_on="data_ref",
        strategy="backward", values=["data_ref", "ptax"],
        distribution="broadcast",
    )

    unit = F.col("dv01_unitario")
    return p.select(
        "o_orderkey",
        "titulo",
        "data_leilao",
        "data_vencimento",
        "dias_uteis",
        F.col("taxa_media_o").alias("taxa_media"),
        F.col("taxa_corte_o").alias("taxa_corte"),
        "pu_medio",
        "pu_corte",
        "quantidade_aceita_1v",
        "quantidade_aceita_2v",
        "quantidade_aceita_total",
        "financeiro_total",
        "financeiro_1v",
        "financeiro_2v",
        "duration",
        F.when(F.col("titulo") == "LFT", F.col("dias_uteis") / 252.0)
        .otherwise(F.col("duration"))
        .alias("prazo_medio"),
        "dv01_unitario",
        (unit * F.col("quantidade_aceita_total")).alias("dv01_total"),
        (unit * q1).alias("dv01_1v"),
        (unit * q2).alias("dv01_2v"),
        "ptax",
        F.bround(unit * F.col("quantidade_aceita_total") / F.col("ptax"), 2).alias(
            "dv01_total_usd"
        ),
        F.bround(unit * q1 / F.col("ptax"), 2).alias("dv01_1v_usd"),
        F.bround(unit * q2 / F.col("ptax"), 2).alias("dv01_2v_usd"),
    )

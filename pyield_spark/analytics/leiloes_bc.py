"""BCB treasury-auction pipeline over the REAL OData CSV shape.

Reference: pyield/bc/leiloes.py:26-250 — the full silver chain from the
Olinda ``leiloesTitulosPublicos`` CSV to the published auction panel:
BR-number parsing, the Selic-code→title map, quantity totals
(null-as-zero horizontal sums), financeiro proration, the
pre-2024-06-11 NTN-B/LFT pu restatement, zero-acceptance null-outs,
per-family Macaulay duration and repricing DV01, the PTAX backward
as-of and USD conversion, canonical column order and sort.

Spark design: one pass of column expressions; the per-family coupon
math (duration + BOTH DV01 rate scenarios) runs over ONE exploded
payment-date pass per bond collected into a sorted flow array, with
duration folded SEQUENTIALLY in ascending payment order (the reference
sums Polars series in flow order — an unordered SQL sum would differ in
the last ulp) and prices accumulated in DECIMAL (order-free). The PTAX
attach is the broadcast as-of (a currency series is dimension-sized).

Golden parity: tests/test_intradia_reference_fixtures.py runs this over
the reference's captured 2025-08-19 CSV + PTAX and compares against its
golden parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pyield_spark import du as du_mod
from pyield_spark.bonds.cashflows import explode_payment_dates
from pyield_spark.bonds.pricing import anos_uteis_expr, ltn_pu_expr
from pyield_spark.functions.numbers import (
    br_num_expr,
    round_pl_expr,
    trunc_decimal_sum_expr,
    truncar_expr,
)
from pyield_spark.operators.asof import asof_join

# Selic instrument code → title (pyield/bc/leiloes.py:26-31)
MAPA_TITULOS = {100000: "LTN", 210100: "LFT", 760199: "NTN-B", 950199: "NTN-F"}

ORDEM_COLUNAS_FINAL = [
    "data_leilao", "data_liquidacao", "tipo_leilao", "numero_edital",
    "tipo_publico", "titulo", "codigo_selic", "data_vencimento",
    "dias_uteis", "duration", "prazo_medio", "pu_medio", "pu_corte",
    "taxa_media", "taxa_corte", "dv01_1v", "dv01_2v", "dv01_total",
    "ptax", "dv01_1v_usd", "dv01_2v_usd", "dv01_total_usd",
    "quantidade_liquidada_1v", "quantidade_liquidada_2v",
    "quantidade_liquidada_total", "quantidade_ofertada_1v",
    "quantidade_ofertada_2v", "quantidade_ofertada_total",
    "quantidade_aceita_1v", "quantidade_aceita_2v",
    "quantidade_aceita_total", "financeiro_1v", "financeiro_2v",
    "financeiro_total",
]

CHAVES_ORDENACAO = ["data_leilao", "tipo_leilao", "titulo", "data_vencimento"]

_DATA_MUDANCA = "2024-06-11"  # pu-restatement cutoff (leiloes.py:90)

_NTNF_CUPOM, _NTNF_FINAL = 48.80885, 1048.80885
_NTNB_CUPOM, _NTNB_FINAL = 0.02956301, 1.02956301


def _taxa_br(col: str) -> F.Column:
    """taxa_br: BR percent string → decimal, round 10
    (pyield/_internal/br_numbers.py:10-39). Half-to-even: the pinned
    Polars (>=1.39) ``Expr.round`` default is mode='half_to_even', so
    every reference-parity ``.round`` site uses bround (ADVICE r4 —
    both auction pipelines now share one rounding mode)."""
    return round_pl_expr(br_num_expr(col) / 100.0, 10)


def _titulo_expr() -> F.Column:
    """codigo_selic → titulo, STRICT like the reference's
    replace_strict (pyield/bc/leiloes.py:143-145): an unmapped NON-NULL
    code raises instead of silently publishing a row with titulo null,
    duration 0 and a restated pu it was never supposed to get (round-6
    review fix — e.g. a new Treasury instrument code appearing in the
    Olinda feed must fail loudly). Documented deviation: a NULL code
    (malformed cell nulled by the lenient parse layer) stays null —
    strictness is for unknown INSTRUMENTS, not transport noise."""
    out = F.raise_error(
        F.concat(
            F.lit("unmapped codigo_selic: "),
            F.col("codigo_selic").cast("string"),
        )
    ).cast("string")
    out = F.when(F.col("codigo_selic").isNull(), F.lit(None).cast("string")).otherwise(
        out
    )
    for code, name in MAPA_TITULOS.items():
        out = F.when(F.col("codigo_selic") == code, F.lit(name)).otherwise(out)
    return out


def _coupon_metrics(typed: DataFrame) -> DataFrame:
    """Per coupon bond (NTN-F base-1000 / NTN-B base-1): raw-rate
    Macaulay duration (sequential fold in payment order; NTN-B result
    trunc14, NTN-F raw — ntnf.py:836-867, ntnb.py:700-748) and the two
    DV01 price scenarios (taxa normalized trunc8∘trunc8 and
    bround8(trunc8 taxa + 1bp) re-truncated; vp bround9 base 1000 /
    bround12 base 1; decimal Σ trunc6 — ltn.py:278-289 chain shape,
    ntnf.py:904-939, ntnb.py:779-819)."""
    fam = typed.filter(F.col("titulo").isin("NTN-F", "NTN-B")).select(
        "id", "titulo", "data_liquidacao", "data_vencimento", "taxa_media"
    )
    flows = explode_payment_dates(fam, "data_liquidacao", "data_vencimento", 6, "pay")
    flows = du_mod.contar(flows, "data_liquidacao", "pay", alias="_du")
    is_f = F.col("titulo") == "NTN-F"
    cf = F.when(
        F.col("pay") == F.col("data_vencimento"),
        F.when(is_f, F.lit(_NTNF_FINAL)).otherwise(F.lit(_NTNB_FINAL)),
    ).otherwise(F.when(is_f, F.lit(_NTNF_CUPOM)).otherwise(F.lit(_NTNB_CUPOM)))
    packed = (
        flows.withColumn("_cf", cf)
        .groupBy("id")
        .agg(
            F.first("titulo").alias("titulo"),
            F.first("taxa_media").alias("_tx"),
            F.sort_array(
                F.collect_list(F.struct(F.col("_du").alias("du"), F.col("_cf").alias("cf")))
            ).alias("_fl"),
        )
    )
    is_f = F.col("titulo") == "NTN-F"
    tx_raw = F.col("_tx")
    # duration: RAW taxa, RAW vp, PLAIN du/252, sequential (num, den) fold
    fold = F.aggregate(
        "_fl",
        F.struct(
            F.lit(0.0).alias("num"), F.lit(0.0).alias("den")
        ),
        lambda acc, s: F.struct(
            (
                acc["num"]
                + s["cf"] / F.pow(1.0 + tx_raw, s["du"] / F.lit(252.0))
                * (s["du"] / F.lit(252.0))
            ).alias("num"),
            (
                acc["den"] + s["cf"] / F.pow(1.0 + tx_raw, s["du"] / F.lit(252.0))
            ).alias("den"),
        ),
    )
    dur_raw = fold["num"] / fold["den"]
    dur = F.when(is_f, dur_raw).otherwise(truncar_expr(dur_raw, 14))

    # DV01 scenarios: normalized taxa chains (double truncation mirrors
    # normalizar applied twice: by dv01() then inside the price fn)
    t1 = truncar_expr(truncar_expr(tx_raw, 8), 8)
    t2 = truncar_expr(F.bround(truncar_expr(tx_raw, 8) + F.lit(0.0001), 8), 8)

    def preco(t):
        vp = F.aggregate(
            "_fl",
            F.lit(0).cast("decimal(28,12)"),
            # decimal addition widens the scale — cast each partial back
            # to the accumulator type so the lambda type-checks
            lambda acc, s: (
                acc
                + F.when(
                    is_f,
                    F.bround(s["cf"] / F.pow(1.0 + t, anos_uteis_expr(s["du"])), 9),
                )
                .otherwise(
                    F.bround(s["cf"] / F.pow(1.0 + t, anos_uteis_expr(s["du"])), 12)
                )
                .cast("decimal(28,12)")
            ).cast("decimal(28,12)"),
        )
        # trunc6 in the decimal domain (totals are positive). NOT
        # `vp % F.lit(0.000001)`: the double literal coerces the decimal
        # accumulator to DOUBLE, which loses grid exactness (review-
        # confirmed: a sum exactly on the 1e-6 grid came back one grid
        # step low and off-grid) — use the shared decimal-domain helper
        return trunc_decimal_sum_expr(vp, 6)

    return packed.select(
        "id",
        dur.alias("_dur"),
        preco(t1).alias("_preco1"),
        preco(t2).alias("_preco2"),
    )


def dv01_unit_expr(is_ltn: F.Column, is_coupon: F.Column) -> F.Column:
    """DV01 per unit from (taxa_media, pu_medio, dias_uteis, _preco1/2):
    LTN closed form, coupon families from the two repriced scenarios,
    LFT zero (pyield/bc/leiloes.py:92-118). Shared by BOTH auction
    pipelines (review: the twin blocks were hand-synced copies — the
    rounding-mode drift fixed in ADVICE r4 started exactly there)."""
    t1 = truncar_expr(F.col("taxa_media"), 8)
    t2 = F.bround(t1 + F.lit(0.0001), 8)
    return (
        F.when(
            is_ltn,
            F.col("pu_medio")
            * (1 - ltn_pu_expr("dias_uteis", t2) / ltn_pu_expr("dias_uteis", t1)),
        )
        .when(
            is_coupon,
            F.col("pu_medio") * (1 - F.col("_preco2") / F.col("_preco1")),
        )
        .otherwise(F.lit(0.0))
    )


def attach_ptax_usd(
    typed: DataFrame, ptax: DataFrame | None, date_col: str
) -> DataFrame:
    """Backward as-of PTAX attach on ``date_col`` + the three
    ``dv01_*_usd`` legs (Polars-parity round 2); ``ptax=None`` yields
    typed nulls. Shared by both auction pipelines."""
    if ptax is not None:
        typed = asof_join(
            typed,
            ptax,
            on=date_col,
            right_on="data_ref",
            strategy="backward",
            values=["data_ref", "ptax"],
            distribution="broadcast",
        )
        for c in ("dv01_1v", "dv01_2v", "dv01_total"):
            typed = typed.withColumn(
                f"{c}_usd", round_pl_expr(F.col(c) / F.col("ptax"), 2)
            )
    else:
        typed = typed.withColumn("ptax", F.lit(None).cast("double"))
        for c in ("dv01_1v", "dv01_2v", "dv01_total"):
            typed = typed.withColumn(f"{c}_usd", F.lit(None).cast("double"))
    return typed


def processar_leiloes(raw: DataFrame, ptax: DataFrame | None = None) -> DataFrame:
    """Olinda CSV (all-string bronze, e.g. ``read_odata_csv``) → the
    published auction panel (pyield/bc/leiloes.py:88-250).

    ``ptax`` optionally carries (data_ref DATE, ptax DOUBLE); when given,
    dv01*_usd columns are attached via a backward as-of on data_leilao.
    """
    ts = "yyyy-MM-dd HH:mm:ss"
    typed = (
        raw.filter(F.col("ofertante") == "Tesouro Nacional")
        .select(
            F.col("id"),
            F.try_to_timestamp("dataMovimento", F.lit(ts)).cast("date").alias("data_leilao"),
            F.try_to_timestamp("dataLiquidacao", F.lit(ts)).cast("date").alias("data_liquidacao"),
            F.col("edital").try_cast("long").alias("numero_edital"),
            F.col("tipoPublico").alias("tipo_publico"),
            F.col("codigoTitulo").try_cast("long").alias("codigo_selic"),
            F.try_to_timestamp("dataVencimento", F.lit(ts)).cast("date").alias("data_vencimento"),
            F.col("tipoOferta").alias("tipo_leilao"),
            br_num_expr("cotacaoMedia").alias("pu_medio_raw"),
            br_num_expr("cotacaoCorte").alias("pu_corte_raw"),
            _taxa_br("taxaMedia").alias("taxa_media"),
            _taxa_br("taxaCorte").alias("taxa_corte"),
            (br_num_expr("financeiro") * F.lit(1_000_000.0)).alias("financeiro_total"),
            F.col("quantidadeOfertada").try_cast("long").alias("quantidade_ofertada_1v"),
            F.col("quantidadeAceita").try_cast("long").alias("quantidade_aceita_1v"),
            F.col("quantidadeLiquidada").try_cast("long").alias("quantidade_liquidada_1v"),
            F.col("quantidadeOfertadaSegundaRodada").try_cast("long").alias(
                "quantidade_ofertada_2v"
            ),
            F.col("quantidadeAceitaSegundaRodada").try_cast("long").alias(
                "quantidade_aceita_2v"
            ),
            F.col("quantidadeLiquidadaSegundaRodada").try_cast("long").alias(
                "quantidade_liquidada_2v"
            ),
        )
        .withColumn("titulo", _titulo_expr())
    )

    def hsum(a: str, b: str) -> F.Column:
        # pl.sum_horizontal: nulls count as zero
        return F.coalesce(F.col(a), F.lit(0)) + F.coalesce(F.col(b), F.lit(0))

    typed = (
        typed.withColumn(
            "quantidade_ofertada_total",
            hsum("quantidade_ofertada_1v", "quantidade_ofertada_2v"),
        )
        .withColumn(
            "quantidade_aceita_total",
            hsum("quantidade_aceita_1v", "quantidade_aceita_2v"),
        )
        .withColumn(
            "quantidade_liquidada_total",
            hsum("quantidade_liquidada_1v", "quantidade_liquidada_2v"),
        )
    )
    typed = du_mod.contar(
        typed, "data_liquidacao", "data_vencimento", alias="dias_uteis"
    )

    q1 = F.col("quantidade_aceita_1v")
    typed = typed.withColumn(
        "financeiro_1v",
        # NULL-predicate parity (review fix): Polars pl.when(null)
        # yields null, Spark's F.when falls through to otherwise — a
        # null quantidade_aceita_1v must give a NULL financeiro_1v
        # (and, via the subtraction, NULL financeiro_2v), not 0.0 with
        # the whole auction value attributed to the second round
        # (pyield/bc/leiloes.py:158-166)
        F.when(q1.isNull(), F.lit(None).cast("double"))
        .when(
            q1 != 0,
            q1.cast("double")
            / F.col("quantidade_aceita_total").cast("double")
            * F.col("financeiro_total"),
        )
        .otherwise(F.lit(0.0)),
    ).withColumn(
        "financeiro_2v", F.col("financeiro_total") - F.col("financeiro_1v")
    )

    # pre-2024-06-11 NTN-B/LFT pu restatement, then zero-acceptance null-out
    keep_pu = (F.col("data_leilao") >= F.lit(_DATA_MUDANCA).cast("date")) | F.col(
        "titulo"
    ).isin("LTN", "NTN-F")
    # round_pl_expr, not bround (review fix): the reference restates
    # with Polars .round(6) — scaled-double half-even — and the two
    # modes flip on grid-adjacent quotients (round_pl_expr docstring);
    # leiloes_tpf.py already uses round_pl_expr for this operation
    pu_med = F.when(keep_pu, F.col("pu_medio_raw")).otherwise(
        round_pl_expr(F.col("financeiro_1v") / q1, 6)
    )
    nz = q1 != 0
    typed = (
        typed.withColumn("pu_medio", F.when(nz, pu_med))
        .withColumn("pu_corte", F.when(nz, F.col("pu_corte_raw")))
        .withColumn("taxa_media", F.when(nz, F.col("taxa_media")))
        .withColumn("taxa_corte", F.when(nz, F.col("taxa_corte")))
    )

    typed = typed.join(_coupon_metrics(typed), "id", "left")

    is_ltn = F.col("titulo") == "LTN"
    is_coupon = F.col("titulo").isin("NTN-F", "NTN-B")
    typed = typed.withColumn(
        "duration",
        F.when(is_ltn, F.col("dias_uteis") / F.lit(252.0))
        .when(is_coupon, F.col("_dur"))
        .otherwise(F.lit(0.0)),
    )

    typed = (
        typed.withColumn("_dv01u", dv01_unit_expr(is_ltn, is_coupon))
        .withColumn("dv01_total", F.col("_dv01u") * F.col("quantidade_aceita_total"))
        .withColumn("dv01_1v", F.col("_dv01u") * F.col("quantidade_aceita_1v"))
        .withColumn("dv01_2v", F.col("_dv01u") * F.col("quantidade_aceita_2v"))
        .withColumn(
            "prazo_medio",
            F.when(
                F.col("titulo") == "LFT", F.col("dias_uteis") / F.lit(252.0)
            ).otherwise(F.col("duration")),
        )
    )

    typed = attach_ptax_usd(typed, ptax, "data_leilao")

    # NaN → null at the pipeline exit (leiloes.py:209 fill_nan(None))
    for c, t in typed.dtypes:
        if t == "double":
            typed = typed.withColumn(
                c, F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c))
            )

    return typed.select(*ORDEM_COLUNAS_FINAL).orderBy(*CHAVES_ORDENACAO)

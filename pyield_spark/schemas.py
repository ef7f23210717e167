"""Canonical StructType registry (§1.3 of the survey).

The reference declares explicit output schemas per source and always
parses all-string then casts tolerantly (e.g. SCHEMA_PRICE_REPORT's 38
typed columns, pyield/b3/boletim.py:57-100; ANBIMA taxas
pyield/anbima/taxas.py:148-166). These are the Spark equivalents for
the canonical tables the engine emits.
"""

from __future__ import annotations

from pyspark.sql import types as T

# B3 price report — the downstream-consumed subset of the 38-column
# schema (pyield/b3/boletim.py:57-100; FIXTURES.md F2)
B3_PRICE_REPORT = T.StructType(
    [
        T.StructField("TradDt", T.DateType()),
        T.StructField("TckrSymb", T.StringType()),
        T.StructField("OpnIntrst", T.LongType()),
        T.StructField("TradQty", T.LongType()),
        T.StructField("FinInstrmQty", T.LongType()),
        T.StructField("NtlFinVol", T.DoubleType()),
        T.StructField("BestBidPric", T.DoubleType()),
        T.StructField("BestAskPric", T.DoubleType()),
        T.StructField("FrstPric", T.DoubleType()),
        T.StructField("MinPric", T.DoubleType()),
        T.StructField("MaxPric", T.DoubleType()),
        T.StructField("TradAvrgPric", T.DoubleType()),
        T.StructField("LastPric", T.DoubleType()),
        T.StructField("AdjstdQt", T.DoubleType()),
        T.StructField("AdjstdQtTax", T.DoubleType()),
        T.StructField("MaxTradLmt", T.DoubleType()),
        T.StructField("MinTradLmt", T.DoubleType()),
    ]
)

# ANBIMA indicative rates (pyield/anbima/taxas.py:148-166; FIXTURES F3)
ANBIMA_TPF = T.StructType(
    [
        T.StructField("titulo", T.StringType()),
        T.StructField("data_referencia", T.DateType()),
        T.StructField("codigo_selic", T.LongType()),
        T.StructField("data_base", T.DateType()),
        T.StructField("data_vencimento", T.DateType()),
        T.StructField("taxa_compra", T.DoubleType()),
        T.StructField("taxa_venda", T.DoubleType()),
        T.StructField("taxa_indicativa", T.DoubleType()),
        T.StructField("pu", T.DoubleType()),
        T.StructField("desvio_padrao", T.DoubleType()),
        T.StructField("taxa_intervalo_inf_d0", T.DoubleType()),
        T.StructField("taxa_intervalo_sup_d0", T.DoubleType()),
        T.StructField("taxa_intervalo_inf_d1", T.DoubleType()),
        T.StructField("taxa_intervalo_sup_d1", T.DoubleType()),
        T.StructField("criterio", T.StringType()),
    ]
)

# enriched DI1 curve (pyield/futuro/historico.py:53-77; FIXTURES F4)
DI1_CURVE = T.StructType(
    [
        T.StructField("data_referencia", T.DateType()),
        T.StructField("codigo_negociacao", T.StringType()),
        T.StructField("data_vencimento", T.DateType()),
        T.StructField("dias_uteis", T.LongType()),
        T.StructField("dias_corridos", T.LongType()),
        T.StructField("taxa_ajuste", T.DoubleType()),
        T.StructField("taxa_fechamento", T.DoubleType()),
        T.StructField("preco_ajuste", T.DoubleType()),
        T.StructField("dv01", T.DoubleType()),
        T.StructField("taxa_forward", T.DoubleType()),
    ]
)

# SGS daily scalar series (pyield/bc/sgs.py:39; FIXTURES F8)
SGS_SERIES = T.StructType(
    [
        T.StructField("serie", T.StringType()),
        T.StructField("data", T.DateType()),
        T.StructField("valor", T.DoubleType()),
    ]
)

# COPOM meeting calendar (pyield/selic/copom.py:32-36; FIXTURES F10)
COPOM_CALENDAR = T.StructType(
    [
        T.StructField("MeetingNumber", T.IntegerType()),
        T.StructField("StartDate", T.DateType()),
        T.StructField("EndDate", T.DateType()),
        T.StructField("ExpiryDate", T.DateType()),
    ]
)

REGISTRY: dict[str, T.StructType] = {
    "b3_price_report": B3_PRICE_REPORT,
    "anbima_tpf": ANBIMA_TPF,
    "di1_curve": DI1_CURVE,
    "sgs_series": SGS_SERIES,
    "copom_calendar": COPOM_CALENDAR,
}

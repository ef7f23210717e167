"""B3 futures enrichment pipeline.

Reference semantics:
- ticker dissection → maturity (pyield/futuro/contratos.py:96-153):
  prefix(3) + month-code letter (FGHJKMNQUVXZ → 1..12) + 2-digit year;
  maturity day 1 (15 for DAP), rolled forward to a business day;
- rate contracts {DI1, DAP, DDI, FRC, FRO} quote OHLC as percent →
  ÷100, and bid/ask INVERT on the price→rate rename
  (pyield/futuro/historico.py:15-28,119-122);
- enrich: dias_uteis (settlement→maturity), dias_corridos, DV01
  (contratos.py:29-46), forward rates per reference date
  (historico.py:129-136 → fwd.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pyield_spark import du as du_mod
from pyield_spark.bonds.pricing import dv01_expr
from pyield_spark.curves.forwards import forwards_expr

MONTH_CODES = "FGHJKMNQUVXZ"  # Jan..Dec
RATE_CONTRACTS = {"DI1", "DAP", "DDI", "FRC", "FRO"}


def normalizar_contrato_expr(contrato: str | Column) -> Column:
    """Contract-code normalization (pyield/b3/_contratos.py:8-21):
    trim + upper-case, empty/null → null (the engine's null is the
    reference's dropped-empty)."""
    c = F.col(contrato) if isinstance(contrato, str) else contrato
    up = F.upper(F.trim(c.cast("string")))
    return F.when(up == "", F.lit(None).cast("string")).otherwise(up)


def normalizar_contratos(valores) -> list[str]:
    """Scalar twin (pyield/b3/_contratos.py:24-50): normalize a
    str/sequence to a deduped upper-case list, input order kept."""
    if isinstance(valores, str):
        valores = [valores]
    out: list[str] = []
    for v in valores or []:
        if v is None:
            continue
        code = str(v).strip().upper()
        if code and code not in out:
            out.append(code)
    return out


def month_from_code_expr(code: str | Column) -> Column:
    """Month-code letter → month number (invalid → null)."""
    c = F.upper(F.col(code) if isinstance(code, str) else code)
    out = F.lit(None).cast("int")
    for i, letter in enumerate(MONTH_CODES, start=1):
        out = F.when(c == letter, F.lit(i)).otherwise(out)
    return out


def raw_maturity_expr(ticker: str | Column, contrato: str) -> Column:
    """Unrolled maturity date from a 6-char ticker (day 1; 15 for DAP)."""
    t = F.upper(F.col(ticker) if isinstance(ticker, str) else ticker)
    day = 15 if "DAP" in contrato.upper() else 1
    return F.make_date(
        F.substring(t, 5, 2).cast("int") + 2000,
        month_from_code_expr(F.substring(t, 4, 1)),
        F.lit(day),
    )


def with_vencimento(
    df: DataFrame, ticker: str, contrato: str, alias: str = "data_vencimento"
) -> DataFrame:
    """Maturity from ticker, rolled forward to a business day
    (deslocar(…, 0, 'forward') — contratos.py:153)."""
    df2 = df.withColumn("_raw_ven", raw_maturity_expr(ticker, contrato))
    return du_mod.deslocar(df2, "_raw_ven", 0, "forward", alias=alias).drop("_raw_ven")


def enrich(
    df: DataFrame,
    contrato: str,
    data_ref: str = "data_referencia",
    ticker: str = "codigo_negociacao",
    preco_ajuste: str = "preco_ajuste",
    taxa_ajuste_pct: str = "taxa_ajuste_pct",
) -> DataFrame:
    """Full enrichment: maturity, day counts, decimal rate, DV01,
    per-date forward curve."""
    out = with_vencimento(df, ticker, contrato)
    out = du_mod.contar(out, data_ref, "data_vencimento", alias="dias_uteis")
    out = out.withColumn(
        "dias_corridos", F.datediff(F.col("data_vencimento"), F.col(data_ref))
    )
    if contrato.upper() in RATE_CONTRACTS:
        out = out.withColumn(
            "taxa_ajuste", F.round(F.col(taxa_ajuste_pct) / 100.0, 10)
        )
        out = out.withColumn(
            "dv01", dv01_expr("dias_uteis", "taxa_ajuste", preco_ajuste)
        )
        out = out.withColumn(
            "taxa_forward",
            forwards_expr("dias_uteis", "taxa_ajuste", F.col(data_ref)),
        )
    return out


def invert_bid_ask(df: DataFrame, bid: str, ask: str) -> DataFrame:
    """Price bid/ask become rate ask/bid on rate-quoted contracts
    (historico.py:15-28): highest price bid = lowest rate ask."""
    return df.withColumns(
        {
            "taxa_compra": F.round(F.col(ask) / 100.0, 10),
            "taxa_venda": F.round(F.col(bid) / 100.0, 10),
        }
    )

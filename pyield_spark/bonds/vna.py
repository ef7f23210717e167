"""Projected VNA (pró-rata exponencial) — the reference's tpf/vna package.

STN precision chain (pyield/tpf/vna/_utils.py:38-65): base VNA trunc6,
projection percentage round half-even 2dp, calendar-day exponent
trunc14, result trunc6. Vigência windows differ per family
(ntnb.py:78-88 day-15 → day-15; ntnc.py:103-107 day-1 → day-1).

All pure column arithmetic — no UDFs, no joins (the exponent uses
calendar days, not business days).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from pyield_spark.functions.numbers import truncar_expr


def vigencia_expr(data: str | Column, day_start: int = 15) -> tuple[Column, Column]:
    """(inicio, fim) of the monthly vigência containing ``data``.

    day_start=15: NTN-B IPCA windows (15th → 15th, ntnb.py:78-88);
    day_start=1: NTN-C IGP-M windows (1st → 1st, ntnc.py:103-107).
    """
    d = F.to_date(F.col(data) if isinstance(data, str) else data)
    anchor = F.make_date(F.year(d), F.month(d), F.lit(day_start))
    if day_start == 1:
        inicio = anchor
    else:
        inicio = F.when(F.dayofmonth(d) >= day_start, anchor).otherwise(
            F.add_months(anchor, -1)
        )
    # add_months keeps the day for day 1/15 (no month-end clamp in range)
    return inicio, F.add_months(inicio, 1)


def vna_projetado_expr(
    data: str | Column,
    vna_base: str | Column,
    inflacao_pct: str | Column,
    day_start: int = 15,
) -> Column:
    """Projected VNA at ``data``: trunc6(trunc6(base) ·
    (1 + bround2(pct)/100)^trunc14(dias_corridos/dias_vigencia))
    (pyield/tpf/vna/_utils.py:38-65 + ntnb.py:91-139)."""
    d = F.to_date(F.col(data) if isinstance(data, str) else data)
    base = F.col(vna_base) if isinstance(vna_base, str) else vna_base
    pct = F.col(inflacao_pct) if isinstance(inflacao_pct, str) else inflacao_pct
    inicio, fim = vigencia_expr(d, day_start)
    expoente = truncar_expr(
        F.datediff(d, inicio).cast("double") / F.datediff(fim, inicio), 14
    )
    variacao = F.bround(pct, 2) / 100.0
    valor = truncar_expr(base, 6) * F.pow(F.lit(1.0) + variacao, expoente)
    return truncar_expr(valor, 6)


def vna_sheet_silver(grid) -> "DataFrame":  # noqa: F821
    """Official-VNA workbook tab → typed series (data date, vna double).

    The reference reads the Tesouro Transparente sheet headerless and
    normalizes two columns: column_1 text → datetime → date, column_2 →
    float (strict=False ≈ tolerant cast), drop nulls, unique keep='last'
    by data, sort (pyield/tpf/vna/_utils.py:12-15, ntnb.py:18-28).

    ``grid`` is the S10 scan output (``sources.xlsx.read_xlsx``):
    (source_file, sheet_name, row_idx, cells). keep='last' is arrival
    order in the sheet → max_by(row_idx) — scoped PER WORKBOOK
    (grouped by source_file: the reference's keep='last' is within one
    downloaded sheet; deduping by bare row_idx across a glob of
    workbooks would let an older, longer file shadow a newer revision).
    The sort is left to consumers (an unordered series distributes).
    """
    # try_element_at: NULL out of bounds regardless of the session's
    # ANSI setting — the grid parser emits empty rows as [] to keep
    # positional indices, and plain element_at throws under ANSI mode
    c0 = F.try_element_at("cells", F.lit(1))
    c1 = F.try_element_at("cells", F.lit(2))
    typed = grid.select(
        F.col("source_file"),
        F.col("sheet_name"),
        F.coalesce(
            F.try_to_timestamp(c0),
            F.try_to_timestamp(c0, F.lit("dd/MM/yyyy")),
        ).cast("date").alias("data"),
        c1.cast("double").alias("vna"),
        F.col("row_idx"),
    ).filter(F.col("data").isNotNull() & F.col("vna").isNotNull())
    # ONE row per (workbook, data), as the docstring promises (review
    # fix — the old (source_file, sheet_name, data) scope let the same
    # date on two tabs emit duplicate rows): keep-last by row WITHIN a
    # tab, and across tabs the lexicographically-last sheet_name wins —
    # a deterministic stand-in (the reference reads a single sheet;
    # row_idx restarts per sheet, so it alone cannot order across tabs)
    return typed.groupBy("source_file", "data").agg(
        F.max_by(
            "vna", F.struct(F.col("sheet_name"), F.col("row_idx"))
        ).alias("vna")
    )


def ipca_projecao_silver(grid) -> "DataFrame":  # noqa: F821
    """ANBIMA indicators workbook → the IPCA projection record
    (pyield/ipca/projetado.py:32-104): header cell "Data e Hora da
    Última Atualização: DD/MM/YYYY - HH:MM h" → timestamp; the row whose
    column_1 starts with "IPCA" and column_2 with "Projeção" carries the
    reference period "(mmm/yy)" and the projected value (percent → /100
    round 4). One row out per workbook — pure column expressions over
    the S10 grid (the reference's .xls transport differs; the parse is
    the semantics).
    """
    c1 = F.try_element_at("cells", F.lit(1))
    c2 = F.try_element_at("cells", F.lit(2))
    c3 = F.try_element_at("cells", F.lit(3))
    # ONE header row per workbook (review fix — a per-sheet filter +
    # join would fan the output out when a multi-tab workbook repeats
    # the header): first match by (sheet_name, row_idx), the same
    # deterministic cross-tab order as the projection pick below.
    hdr = (
        grid.filter(c1.startswith("Data e Hora da Última Atualização:"))
        .groupBy("source_file")
        .agg(
            F.min_by(
                # try_to_timestamp: regexp_extract yields '' when the
                # header carries the prefix but not the full timestamp
                # pattern — under ANSI (Spark 4 default) a plain
                # to_timestamp('') throws
                F.try_to_timestamp(
                    F.regexp_extract(
                        c1, r":\s*(\d{2}/\d{2}/\d{4} - \d{2}:\d{2})", 1
                    ),
                    F.lit("dd/MM/yyyy - HH:mm"),
                ),
                F.struct(F.col("sheet_name"), F.col("row_idx")),
            ).alias("ultima_atualizacao")
        )
    )
    # the reference takes the FIRST matching row (item(0), a workbook
    # can carry more IPCA-prefixed rows, e.g. IPCA-15) → min_by over
    # (sheet_name, row_idx): row_idx restarts per sheet, so bare
    # row_idx would mix tabs (review fix; lexicographic sheet order is
    # the deterministic stand-in — the reference reads one sheet)
    proj = (
        grid.filter(c1.startswith("IPCA") & c2.startswith("Projeção"))
        .groupBy("source_file")
        .agg(
            F.min_by(
                F.struct(
                    F.regexp_extract(c2, r"\(([^)]*)\)", 1).alias("per"),
                    F.round(c3.cast("double") / 100.0, 4).alias("val"),
                ),
                F.struct(F.col("sheet_name"), F.col("row_idx")),
            ).alias("_p")
        )
        .select(
            "source_file",
            F.col("_p.per").alias("periodo_referencia"),
            F.col("_p.val").alias("valor_projetado"),
        )
    )
    return proj.join(hdr, "source_file")

"""S11: HTML table scan — stdlib ``html.parser``, distributed.

The reference XPaths nested tables out of an HTML page and re-parses
them as TSV (pyield/anbima/imaq.py:59-100). Here the parse runs as
binaryFile → ``mapInPandas`` with a small HTMLParser state machine
collecting <table>/<tr>/<td|th> cells — one row per <tr> with a table
index, so callers pick the table they need and apply their silver
casts.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


class _Frame:
    """Per-open-table parse state (rows is the SAME list object stored
    in the collector's tables, so appends land in document order)."""

    __slots__ = ("rows", "row", "cell")

    def __init__(self, rows: list[list[str]]) -> None:
        self.rows = rows
        self.row: list[str] | None = None
        self.cell: list[str] | None = None


class _TableCollector(HTMLParser):
    """Stack-based: tables nest inside cells (ANBIMA layout tables), so
    each open <table> keeps its OWN row/cell state. A flat tables[-1]
    would misfile every outer row that follows a nested </table> (the
    inner table stays last in the list) and an inner <tr> would clobber
    the outer row in flight. ``tables`` indexes by <table> OPENING
    order — the same document order the reference's XPath //table
    enumeration yields."""

    def __init__(self) -> None:
        super().__init__()
        self.tables: list[list[list[str]]] = []
        self._stack: list[_Frame] = []

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            rows: list[list[str]] = []
            self.tables.append(rows)
            self._stack.append(_Frame(rows))
        elif not self._stack:
            return
        elif tag == "tr":
            self._stack[-1].row = []
        elif tag in ("td", "th") and self._stack[-1].row is not None:
            self._stack[-1].cell = []

    def handle_endtag(self, tag):
        if not self._stack:
            return
        top = self._stack[-1]
        if tag == "table":
            self._stack.pop()
        elif tag == "tr" and top.row is not None:
            top.rows.append(top.row)
            top.row = None
        elif tag in ("td", "th") and top.cell is not None:
            if top.row is not None:
                top.row.append(" ".join(top.cell).strip())
            top.cell = None

    def handle_data(self, data):
        if self._stack and self._stack[-1].cell is not None:
            self._stack[-1].cell.append(data.strip())


def read_html_tables(
    spark: SparkSession, path: str, encoding: str = "latin1"
) -> DataFrame:
    """All table rows from HTML files: (source_file, table_idx, row_idx,
    cells array<string>)."""
    bin_df = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"source_file": [], "table_idx": [], "row_idx": [], "cells": []}
            for fname, content in zip(pdf["path"], pdf["content"]):
                collector = _TableCollector()
                collector.feed(bytes(content).decode(encoding, errors="replace"))
                for t_i, table in enumerate(collector.tables):
                    for r_i, cells in enumerate(table):
                        out["source_file"].append(fname)
                        out["table_idx"].append(t_i)
                        out["row_idx"].append(r_i)
                        out["cells"].append(cells)
            if next(iter(out.values()), None):
                # all-empty batch: pandas would type the list column
                # float64 and Arrow can't cast that to array<string>;
                # yielding nothing is valid for mapInPandas
                yield pd.DataFrame(out)

    return bin_df.select("path", "content").mapInPandas(
        parse,
        "source_file string, table_idx int, row_idx int, cells array<string>",
    )


def imaq_estoque_silver(tables_df: DataFrame, data_referencia) -> DataFrame:
    """ANBIMA IMA-Q treasury-stock silver (pyield/anbima/imaq.py:103-126).

    Takes :func:`read_html_tables` output, finds the estoque table by its
    header row, and applies the reference's typed transform: strip, drop
    repeated in-body header rows and null maturities, dedupe by ISIN
    (deterministic keep-first by row order), BR-number casts — ``pu`` as
    float_br, the three quantity columns as inteiro_m (thousands →
    units).
    """
    from pyspark.sql import functions as F

    from pyield_spark.functions.numbers import br_num_expr, inteiro_m_expr

    # header row (row_idx 0 of its table) identifies the estoque table
    hdr = (
        tables_df.filter(F.col("row_idx") == 0)
        .filter(F.array_contains(F.col("cells"), "Código ISIN"))
        .select("source_file", "table_idx")
    )
    body = tables_df.join(F.broadcast(hdr), ["source_file", "table_idx"]).filter(
        F.col("row_idx") > 0
    )
    c = lambda i: F.trim(F.col("cells").getItem(i))  # noqa: E731
    rows = body.select(
        F.col("source_file"),
        F.col("table_idx"),
        F.col("row_idx"),
        c(0).alias("titulo"),
        c(1).alias("codigo_selic_raw"),
        c(2).alias("isin"),
        c(3).alias("venc_raw"),
        c(4).alias("qtd_raw"),
        c(5).alias("pu_raw"),
        c(6).alias("vm_raw"),
        c(7).alias("var_raw"),
        c(8).alias("status_titulo"),
    ).filter((F.col("titulo") != "Título") & F.col("venc_raw").isNotNull())
    # unique(subset='ISIN'): deterministic keep-first by document order,
    # PER PAGE — the reference dedups globally across the whole page
    # (unique(subset='ISIN')), so if one page carries two matching
    # tables the first table's row must win. Group by (source_file,
    # isin) and order by (table_idx, row_idx): table_idx disambiguates
    # across tables, row_idx within one (row_idx alone would tie across
    # tables of the same page and pick an arbitrary winner per run).
    first = rows.groupBy("source_file", "isin").agg(
        F.min_by(
            F.struct(
                "titulo", "codigo_selic_raw", "venc_raw", "qtd_raw",
                "pu_raw", "vm_raw", "var_raw", "status_titulo",
            ),
            F.struct(F.col("table_idx"), F.col("row_idx")),
        ).alias("r")
    )
    return first.select(
        F.lit(data_referencia).cast("date").alias("data_referencia"),
        F.col("r.titulo").alias("titulo"),
        F.try_to_date("r.venc_raw", "dd/MM/yyyy").alias("data_vencimento"),
        F.col("r.codigo_selic_raw").try_cast("long").alias("codigo_selic"),
        "isin",
        br_num_expr(F.col("r.pu_raw")).alias("pu"),
        inteiro_m_expr(F.col("r.qtd_raw")).alias("quantidade_mercado"),
        inteiro_m_expr(F.col("r.vm_raw")).alias("valor_mercado"),
        inteiro_m_expr(F.col("r.var_raw")).alias("variacao_quantidade"),
        F.col("r.status_titulo").alias("status_titulo"),
    ).filter(F.col("data_vencimento").isNotNull())

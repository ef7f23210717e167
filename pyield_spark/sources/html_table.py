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


class _TableCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.tables: list[list[list[str]]] = []
        self._row: list[str] | None = None
        self._cell: list[str] | None = None
        self._depth = 0

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self._depth += 1
            self.tables.append([])
        elif tag == "tr" and self._depth:
            self._row = []
        elif tag in ("td", "th") and self._row is not None:
            self._cell = []

    def handle_endtag(self, tag):
        if tag == "table" and self._depth:
            self._depth -= 1
        elif tag == "tr" and self._row is not None:
            if self.tables:
                self.tables[-1].append(self._row)
            self._row = None
        elif tag in ("td", "th") and self._cell is not None:
            if self._row is not None:
                self._row.append(" ".join(self._cell).strip())
            self._cell = None

    def handle_data(self, data):
        if self._cell is not None:
            self._cell.append(data.strip())


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
    # unique(subset='ISIN'): deterministic keep-first by document order
    first = rows.groupBy("isin").agg(
        F.min_by(
            F.struct(
                "titulo", "codigo_selic_raw", "venc_raw", "qtd_raw",
                "pu_raw", "vm_raw", "var_raw", "status_titulo",
            ),
            F.col("row_idx"),
        ).alias("r")
    )
    return first.select(
        F.lit(data_referencia).cast("date").alias("data_referencia"),
        F.col("r.titulo").alias("titulo"),
        F.to_date("r.venc_raw", "dd/MM/yyyy").alias("data_vencimento"),
        F.col("r.codigo_selic_raw").cast("long").alias("codigo_selic"),
        "isin",
        br_num_expr(F.col("r.pu_raw")).alias("pu"),
        inteiro_m_expr(F.col("r.qtd_raw")).alias("quantidade_mercado"),
        inteiro_m_expr(F.col("r.vm_raw")).alias("valor_mercado"),
        inteiro_m_expr(F.col("r.var_raw")).alias("variacao_quantidade"),
        F.col("r.status_titulo").alias("status_titulo"),
    ).filter(F.col("data_vencimento").isNotNull())

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
            yield pd.DataFrame(out)

    return bin_df.select("path", "content").mapInPandas(
        parse,
        "source_file string, table_idx int, row_idx int, cells array<string>",
    )

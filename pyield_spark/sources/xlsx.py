"""S10: Excel (.xlsx) scan — distributed, stdlib-only.

The reference reads Treasury spreadsheets with ``pl.read_excel(conteudo,
sheet_name=aba, has_header=False)`` — a raw headerless cell grid per
sheet (pyield/tpf/vna/_download.py:50-52, pyield/tpf/rmd/_download.py:38-48,
consumed by rmd/_aba_1_3.py:81-85). No excel library ships in this
environment, but none is needed: an .xlsx is a zip of XML parts, and the
subset these spreadsheets use (shared strings, inline strings, numbers,
booleans, formula caches) parses with stdlib ``zipfile`` + ``xml.etree``.

Spark-first shape mirrors the other binary scans (``xml_report``,
``html_table``): ``binaryFile`` distributes workbooks across executors,
one Arrow-batched ``mapInPandas`` pass parses each into the long grid
``(source_file, sheet_name, row_idx, cells array<string>)``, and
everything downstream (RMD state machines, VNA tab parses) is columnar.
Cells surface as strings — the same all-string bronze discipline as the
CSV readers — and the silver layer's tolerant casts own the typing.

Parsed xlsx parts (ECMA-376 / ISO 29500, the public OOXML spec):
- ``xl/workbook.xml``           sheet name → relationship id
- ``xl/_rels/workbook.xml.rels`` relationship id → worksheet part
- ``xl/sharedStrings.xml``      <si> entries; rich-text runs concatenate
- ``xl/worksheets/sheetN.xml``  <row>/<c> cells; ``r="C7"`` A1 references
  carry the (row, col) position, so sparse rows land dense with nulls in
  the gaps. Cell types: t="s" shared string, t="inlineStr" <is><t>,
  t="str" formula cache, t="b" boolean, default numeric (kept verbatim
  as stored — "123.45"; integers stored as "123").
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")


def localname(tag: str) -> str:
    """Namespace-stripped XML tag/attribute name (shared with
    xml_report.py — keep one definition)."""
    return tag.rsplit("}", 1)[-1]


_localname = localname


def _col_index(ref: str) -> int | None:
    """A1-style column letters → 0-based index ("A"→0, "AB"→27)."""
    m = _CELL_REF.fullmatch(ref)
    if not m:
        return None
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _text_of(elem) -> str:
    """Concatenate every <t> descendant (plain and rich-text runs)."""
    parts = []
    for t in elem.iter():
        if _localname(t.tag) == "t" and t.text is not None:
            parts.append(t.text)
    return "".join(parts)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ElementTree.fromstring(data)
    return [_text_of(si) for si in root if _localname(si.tag) == "si"]


def _sheet_parts(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, zip member path)] in workbook order."""
    wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    rels = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    targets: dict[str, str] = {}
    for rel in rels:
        rid, target = rel.get("Id"), rel.get("Target", "")
        if rid is None:
            continue
        if target.startswith("/"):
            member = target.lstrip("/")
        else:
            member = "xl/" + target
        # normalize ../ segments (some writers emit "worksheets/../worksheets/…")
        segs: list[str] = []
        for s in member.split("/"):
            if s == "..":
                if segs:
                    segs.pop()
            elif s not in (".", ""):
                segs.append(s)
        targets[rid] = "/".join(segs)

    out: list[tuple[str, str]] = []
    for elem in wb.iter():
        if _localname(elem.tag) != "sheet":
            continue
        name = elem.get("name", "")
        rid = next(
            (v for k, v in elem.attrib.items() if _localname(k) == "id"), None
        )
        if rid and rid in targets:
            out.append((name, targets[rid]))
    return out


def _cell_value(cell, shared: list[str]) -> str | None:
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        for child in cell:
            if _localname(child.tag) == "is":
                return _text_of(child)
        return None
    v = None
    for child in cell:
        if _localname(child.tag) == "v":
            v = child.text if child.text is not None else ""
            break
    if v is None:
        return None
    if ctype == "s":
        try:
            idx = int(v)
        except ValueError:
            return None
        # explicit bounds check: a malformed negative index must degrade
        # to null, not resolve a shared string via python negative indexing
        return shared[idx] if 0 <= idx < len(shared) else None
    if ctype == "b":
        return "true" if v.strip() == "1" else "false"
    return v  # "n" numeric / "str" formula cache / "e" error — verbatim


def parse_xlsx_bytes(
    content: bytes, sheet: str | None = None
) -> Iterator[tuple[str, int, list[str | None]]]:
    """Yield (sheet_name, row_idx, dense_cells) for one workbook.

    ``row_idx`` is 0-based and dense: the grid a headerless CSV export
    of the sheet would produce, so empty spreadsheet rows still occupy
    an index (matching ``has_header=False`` reference reads where data
    row offsets like _LINHA_PERIODOS are positional).
    """
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        shared = _shared_strings(zf)
        parts = list(_sheet_parts(zf))
        if sheet is not None and sheet not in {n for n, _ in parts}:
            # loud, like the reference's pl.read_excel(sheet_name=aba)
            # (round-6 review fix: a typo'd/renamed tab silently
            # produced an empty DataFrame and an empty silver panel)
            raise ValueError(
                f"sheet {sheet!r} not found; workbook has "
                f"{sorted(n for n, _ in parts)}"
            )
        for name, member in parts:
            if sheet is not None and name != sheet:
                continue
            root = ElementTree.fromstring(zf.read(member))
            next_row = 0
            for row in root.iter():
                if _localname(row.tag) != "row":
                    continue
                r_attr = row.get("r")
                row_idx = int(r_attr) - 1 if r_attr else next_row
                # emit skipped (entirely empty) rows to keep positions
                while next_row < row_idx:
                    yield name, next_row, []
                    next_row += 1
                cells: dict[int, str | None] = {}
                next_col = 0
                for cell in row:
                    if _localname(cell.tag) != "c":
                        continue
                    ref = cell.get("r")
                    col = _col_index(ref) if ref else None
                    if col is None:
                        col = next_col
                    next_col = col + 1
                    val = _cell_value(cell, shared)
                    if val is not None:
                        cells[col] = val
                width = max(cells) + 1 if cells else 0
                yield name, row_idx, [cells.get(i) for i in range(width)]
                next_row = row_idx + 1


def read_xlsx(
    spark: SparkSession,
    path: str,
    sheet: str | None = None,
    skip_bad_files: bool = False,
) -> DataFrame:
    """Sheet grid(s) from .xlsx workbook(s): (source_file, sheet_name,
    row_idx, cells array<string>). ``sheet`` filters to one tab (the
    reference's ``sheet_name=aba``); None reads every sheet.

    ``skip_bad_files`` drops workbooks that fail to parse (truncated
    zip, malformed XML) instead of failing the job — the
    ``ignoreCorruptFiles`` stance for lake-scale globs where one bad
    object must not kill a 100 TB scan. Default False: corruption is
    loud unless the caller opts into skipping.
    """
    bin_df = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"source_file": [], "sheet_name": [], "row_idx": [], "cells": []}
            for fname, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows = list(parse_xlsx_bytes(bytes(content), sheet))
                except Exception:
                    # BadZipFile / missing workbook part / XML ParseError —
                    # under the opt-in flag a corrupt object is skipped,
                    # mirroring ignoreCorruptFiles; otherwise loud
                    if skip_bad_files:
                        continue
                    raise
                for name, row_idx, cells in rows:
                    out["source_file"].append(fname)
                    out["sheet_name"].append(name)
                    out["row_idx"].append(row_idx)
                    out["cells"].append(cells)
            if next(iter(out.values()), None):
                # all-empty batch: pandas would type the list column
                # float64 and Arrow can't cast that to array<string>;
                # yielding nothing is valid for mapInPandas
                yield pd.DataFrame(out)

    return bin_df.select("path", "content").mapInPandas(
        parse,
        "source_file string, sheet_name string, row_idx int, cells array<string>",
    )


def write_minimal_xlsx(
    path: str, sheets: dict[str, list[list[object]]]
) -> None:
    """Write a minimal valid .xlsx (test fixture helper — the env has no
    excel writer either). Strings become inline strings; ints/floats
    numeric cells; None skips the cell (sparse)."""
    sheet_items = list(sheets.items())

    def esc(s: str) -> str:
        # attribute-safe: sheet names land inside name="..." attributes
        return (
            s.replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
            .replace('"', "&quot;")
        )

    def col_ref(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            out = chr(ord("A") + rem) + out
        return out

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pns = "http://schemas.openxmlformats.org/package/2006/relationships"
    with zipfile.ZipFile(path, "w") as zf:
        types = [
            '<?xml version="1.0"?>',
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">',
            '<Default Extension="xml" ContentType="application/xml"/>',
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>',
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>',
        ]
        for i in range(len(sheet_items)):
            types.append(
                f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
                'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            )
        types.append("</Types>")
        zf.writestr("[Content_Types].xml", "".join(types))
        zf.writestr(
            "_rels/.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{pns}">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        wb = [f'<?xml version="1.0"?><workbook xmlns="{ns}" xmlns:r="{rns}"><sheets>']
        rels = [f'<?xml version="1.0"?><Relationships xmlns="{pns}">']
        for i, (name, _) in enumerate(sheet_items):
            wb.append(
                f'<sheet name="{esc(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            )
            rels.append(
                f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
                "openxmlformats.org/officeDocument/2006/relationships/worksheet\" "
                f'Target="worksheets/sheet{i + 1}.xml"/>'
            )
        wb.append("</sheets></workbook>")
        rels.append("</Relationships>")
        zf.writestr("xl/workbook.xml", "".join(wb))
        zf.writestr("xl/_rels/workbook.xml.rels", "".join(rels))
        for i, (_, rows) in enumerate(sheet_items):
            parts = [f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>']
            for r_i, row in enumerate(rows):
                parts.append(f'<row r="{r_i + 1}">')
                for c_i, val in enumerate(row):
                    if val is None:
                        continue
                    ref = f"{col_ref(c_i)}{r_i + 1}"
                    if isinstance(val, bool):
                        parts.append(
                            f'<c r="{ref}" t="b"><v>{1 if val else 0}</v></c>'
                        )
                    elif isinstance(val, (int, float)):
                        parts.append(f'<c r="{ref}"><v>{val}</v></c>')
                    else:
                        parts.append(
                            f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                            f"{esc(str(val))}</t></is></c>"
                        )
                parts.append("</row>")
            parts.append("</sheetData></worksheet>")
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", "".join(parts))

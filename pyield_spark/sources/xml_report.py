"""S5: B3 Price-Report XML scan — distributed, stdlib-only.

The reference unwraps zip→zip→XML and XPaths ``//ns:PricRpt`` elements
into dicts, then applies an explicit typed schema
(pyield/b3/boletim.py:110-146,188-313). Spark has no XML reader without
the spark-xml jar, so the scan runs as binaryFile → Arrow-batched
``mapInPandas`` with ``xml.etree`` (namespace-agnostic localname
matching) → tolerant cast onto the canonical B3 schema. Archives
distribute across executors; one Python pass per file, columnar after.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from pyield_spark.schemas import B3_PRICE_REPORT
from pyield_spark.sources.xlsx import localname as _localname

_FIELDS = [f.name for f in B3_PRICE_REPORT.fields]


def _walk_price_reports(xml_bytes: bytes):
    root = ElementTree.fromstring(xml_bytes)
    for elem in root.iter():
        if _localname(elem.tag) != "PricRpt":
            continue
        row: dict[str, str] = {}
        for child in elem.iter():
            name = _localname(child.tag)
            if child.text and child.text.strip():
                # first write wins, like the reference's tag→dict walk
                row.setdefault(name, child.text.strip())
                if name == "Dt":  # trade date nests as TradDt/Dt
                    row.setdefault("TradDt", child.text.strip())
        yield row


def _maybe_unzip(content: bytes) -> list[bytes]:
    """Unwrap (possibly nested) zip containers down to XML payloads."""
    if content[:2] != b"PK":
        return [content]
    out: list[bytes] = []
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        for member in zf.namelist():
            out.extend(_maybe_unzip(zf.read(member)))
    return out


def read_price_report_xml(spark: SparkSession, path: str) -> DataFrame:
    """Scan price-report XML (optionally zip-wrapped) into the canonical
    typed schema; unparseable values become null (tolerant casts)."""
    bin_df = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for payload in _maybe_unzip(bytes(content)):
                    for row in _walk_price_reports(payload):
                        rows.append([row.get(f) for f in _FIELDS])
            yield pd.DataFrame(rows, columns=_FIELDS, dtype=object)

    raw = bin_df.select("content").mapInPandas(
        parse, ", ".join(f"{f} STRING" for f in _FIELDS)
    )
    casts = {}
    for f in B3_PRICE_REPORT.fields:
        t = f.dataType.simpleString()
        # try_* variants: ANSI-independent null-on-malformed (matches
        # the reference's lenient casts, pyield/b3/boletim.py:306)
        if t == "date":
            casts[f.name] = F.try_to_date(f.name)
        elif t != "string":
            casts[f.name] = F.col(f.name).try_cast(t)
    return raw.withColumns(casts)

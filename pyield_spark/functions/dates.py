"""Tolerant multi-format date parsing.

Reference: pyield/_internal/converters.py:57-64 — a coalesce of
``str.to_date`` attempts over DD-MM-YYYY, DD/MM/YYYY, YYYY-MM-DD and two
datetime formats; invalid vector elements become null.

Spark: ``F.coalesce`` of ``try_to_date``/``to_date`` attempts (with ANSI
off, ``to_date`` already yields null on mismatch).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_FORMATS = (
    "dd-MM-yyyy",
    "dd/MM/yyyy",
    "yyyy-MM-dd",
    "dd-MM-yyyy HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyyMMdd",  # ANBIMA taxas file dates (pyield/anbima/taxas.py:153)
)


def converter_datas_expr(col: Column | str) -> Column:
    """Multi-format date coalesce; null/unparseable → null.

    ``try_to_date`` (not ``to_date``) so each non-matching attempt in
    the coalesce yields null under ANY session — with ANSI on (Spark 4
    default) a plain ``to_date`` throws on the first format mismatch.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_date(c, fmt) for fmt in _FORMATS])

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


def filtrar_periodo(
    df,
    col: str,
    data=None,
    inicio=None,
    fim=None,
):
    """Temporal-window selection with the reference's fetch-API rules
    (pyield/tpf/leiloes.py `leiloes(data=…, inicio=…, fim=…)`,
    tests/tpf/test_leilao.py::test_leiloes_rejeita_modos_temporais_ambiguos;
    pyield/anbima taxas_historicas' inverted-interval check,
    tests/tpf/test_taxas.py):

    - ``data`` is mutually exclusive with ``inicio``/``fim``;
    - ``fim`` requires ``inicio``;
    - ``inicio`` must be <= ``fim``;
    - all None → passthrough (the reference's "everything" mode).

    The reference validates these in its FETCH functions (out of scope
    here — no network); this is the same contract on the local frame,
    used by the auction/ANBIMA facades. Accepts date objects or any
    string the multi-format parser understands (invalid scalar strings
    raise, like converters.py's scalar path).
    """
    import datetime as dt

    def _as_date(v, name):
        if v is None or isinstance(v, dt.date):
            return v
        for fmt in ("%d-%m-%Y", "%d/%m/%Y", "%Y-%m-%d"):
            try:
                return dt.datetime.strptime(str(v), fmt).date()
            except ValueError:
                continue
        raise ValueError(f"{name} inválido: {v!r}")

    data = _as_date(data, "data")
    inicio = _as_date(inicio, "inicio")
    fim = _as_date(fim, "fim")
    if data is not None and (inicio is not None or fim is not None):
        raise ValueError(
            "data não pode ser combinado com inicio/fim — escolha um modo"
        )
    if fim is not None and inicio is None:
        raise ValueError("fim só pode ser usado junto com inicio")
    if inicio is not None and fim is not None and inicio > fim:
        raise ValueError(f"inicio deve ser menor ou igual a fim ({inicio} > {fim})")

    c = F.to_date(F.col(col))
    if data is not None:
        return df.filter(c == F.lit(data))
    if inicio is not None and fim is not None:
        return df.filter(c.between(F.lit(inicio), F.lit(fim)))
    if inicio is not None:
        return df.filter(c >= F.lit(inicio))
    return df

"""TPF secondary-market INTRADIA CSV → canonical 31-column frame.

Reference: pyield/tpf/secundario/_intradia.py:32-76 — the BCB/SELIC
real-time statistics endpoint returns a ';'-separated UTF-8 CSV (BOM
prefix) whose header repeats column names between the spot ("mercado à
vista") and forward ("mercado a termo") blocks; Polars' reader
disambiguates repeats with a ``_duplicated_N`` suffix and the reference
selects by those suffixed names. '-' cells are nulls; record type is
the FIRST field ('1' = spot/forward statistics rows — the '//2'
auction-result block and '//3' terminator are dropped by the
``//1 == "1"`` filter).

Spark-first: all-string wide scan (no inference), content-based row
dispatch (the record-type field, not line numbers), one tiny driver
action to fetch the header row, positional select with the same
duplicate-suffix naming. The query timestamp is a PARAMETER
(``consulta``) instead of a wall-clock read so replays are
deterministic; the reference's runtime columns
(data_hora_consulta/data_liquidacao) derive from it.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from pyield_spark.functions.numbers import (
    br_num_expr,
    inteiro_br_expr,
    round_pl_expr,
)

# canonical name → (source header after duplicate-suffixing, conversion)
# mirroring _intradia.py:44-76 exactly
_COLS: list[tuple[str, str, str]] = [
    ("titulo", "sigla", "string"),
    ("codigo_selic", "código título", "int_br"),
    ("data_vencimento", "data vencimento", "date"),
    ("pu_minimo", "pu mínimo", "float_br"),
    ("pu_medio", "pu médio", "float_br"),
    ("pu_maximo", "pu máximo", "float_br"),
    ("pu_ultimo", "mercado à vista pu último", "float_br"),
    ("taxa_minima", "tx mínimo", "taxa_br"),
    ("taxa_media", "tx médio", "taxa_br"),
    ("taxa_maxima", "tx máximo", "taxa_br"),
    ("taxa_ultima", "tx último", "taxa_br"),
    ("operacoes", "totais liquidados operações", "int_br"),
    ("quantidade", "títulos", "int_br"),
    ("financeiro", "financeiro", "float_br"),
    ("operacoes_corretagem", "corretagem liquidados operações", "int_br"),
    ("quantidade_corretagem", "corretagem títulos", "int_br"),
    ("termo_pu_minimo", "pu mínimo_duplicated_0", "float_br"),
    ("termo_pu_medio", "pu médio_duplicated_0", "float_br"),
    ("termo_pu_ultimo", "mercado a termo pu último", "float_br"),
    ("termo_pu_maximo", "pu máximo_duplicated_0", "float_br"),
    ("termo_taxa_ultima", "tx último_duplicated_0", "taxa_br"),
    ("termo_taxa_minima", "tx mínimo_duplicated_0", "taxa_br"),
    ("termo_taxa_media", "tx médio_duplicated_0", "taxa_br"),
    ("termo_taxa_maxima", "tx máximo_duplicated_0", "taxa_br"),
    ("termo_operacoes", "totais contratados operações", "int_br"),
    ("termo_quantidade", "títulos_duplicated_0", "int_br"),
    ("termo_financeiro", "financeiro_duplicated_0", "float_br"),
    ("termo_operacoes_corretagem", "corretagem contratados operações", "int_br"),
    ("termo_quantidade_corretagem", "corretagem títulos_duplicated_0", "int_br"),
]

_MAX_COLS = 36


def _dedup_names(raw_names: list[str]) -> list[str]:
    """Polars read_csv duplicate handling: the first occurrence keeps
    the name, repeat k gets ``_duplicated_{k-1}``."""
    seen: dict[str, int] = {}
    out = []
    for n in raw_names:
        k = seen.get(n, 0)
        out.append(n if k == 0 else f"{n}_duplicated_{k - 1}")
        seen[n] = k + 1
    return out


def _typed(raw: Column, conv: str) -> Column:
    # try_to_date + try_cast-backed br parsers: ANSI-independent
    # null-on-malformed (the synthesized header row's cells reach these
    # expressions before the record-type filter is guaranteed to run)
    if conv == "date":
        return F.try_to_date(raw, "dd/MM/yyyy")
    if conv == "float_br":
        return br_num_expr(raw)
    if conv == "taxa_br":
        return round_pl_expr(br_num_expr(raw) / 100.0, 10)
    if conv == "int_br":
        return inteiro_br_expr(raw)
    return raw  # string (sigla arrives space-padded; pick() trims)


def tpf_intradia_silver(
    spark: SparkSession, path: str, consulta: dt.datetime | None = None
) -> DataFrame:
    """One intradia statistics CSV → the canonical 31-column frame."""
    wide = ", ".join(f"_c{i} STRING" for i in range(_MAX_COLS))
    raw = (
        spark.read.option("sep", ";")
        .option("header", False)
        .option("mode", "PERMISSIVE")
        .schema(wide)
        .csv(path)
    )
    return tpf_intradia_from_wide(raw, consulta)


def tpf_intradia_from_wide(
    raw: DataFrame, consulta: dt.datetime | None = None
) -> DataFrame:
    """The parse half of :func:`tpf_intradia_silver`, over an
    already-read all-string wide frame (_c0.._c35) — the unit the
    driver-checkable ``q_tpf_intradia`` query exercises directly."""
    rec_type = F.trim(F.regexp_replace("_c0", "﻿", ""))
    header_row = raw.filter(rec_type == "//1").first()
    if header_row is None:
        raise ValueError("no '//1' header row found in the input frame")
    # Positional integrity (review fix): only TRAILING null header
    # cells may be dropped (header narrower than the 36-wide schema).
    # An INTERIOR empty header field (CSV nullValue='') must keep its
    # slot as a placeholder — filtering it out would shift every
    # subsequent column one left and silently misalign the data.
    cells = [header_row[f"_c{i}"] for i in range(_MAX_COLS)]
    while cells and cells[-1] is None:
        cells.pop()
    names = _dedup_names([(c or "").strip().lstrip("﻿") for c in cells])
    pos = {n: i + 1 for i, n in enumerate(names)}  # 1-based for element_at

    data = raw.filter(rec_type == "1")

    def pick(src: str) -> Column:
        if src not in pos:
            return F.lit(None).cast("string")
        cell = F.trim(F.col(f"_c{pos[src] - 1}"))
        return F.when((cell != "-") & (cell != ""), cell)  # '-' → null

    if consulta is None:
        from pyield_spark.relogio import agora

        consulta = agora()
    cols = [
        F.lit(consulta).cast("timestamp").alias("data_hora_consulta"),
        F.lit(consulta.date()).alias("data_liquidacao"),
    ] + [_typed(pick(src), conv).alias(dst) for dst, src, conv in _COLS]
    # reference column order puts data_vencimento after codigo_selic and
    # the runtime columns first — _COLS is already in that order
    return data.select(*cols)

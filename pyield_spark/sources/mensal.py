"""S14: BCB/SELIC monthly secondary-market TPF zips → silver/gold.

Reference: pyield/tpf/secundario/_mensal.py:140-309 — the zip holds one
latin1 ';'-separated CSV; parse is all-string (infer_schema=False,
'' → null), every string field is stripped, then an explicit typed
select produces the canonical 18-column silver schema. Era tolerance:
the 2003-vintage layout lacks the two corretagem columns — they come
back null (``_processar_df_mensal``'s conditional exprs). The gold
layer (``mensal``) adds ``financeiro = round2(quantidade * pu_medio)``
(half-to-even — the pinned Polars ``round`` default).

Spark-first: archives scan via binaryFile and unzip in Arrow batches
(``read_zip_members`` — parallel per archive, nothing driver-side);
header positions are resolved PER MEMBER with a broadcast join of the
header rows, so one directory scan can mix eras/layouts and each file
is parsed against its own header.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from pyield_spark.functions.numbers import br_num_expr, round_pl_expr
from pyield_spark.sources.readers import read_zip_members

_HEADER_FIRST_FIELD = "DATA MOV"

# (canonical name, source header, conversion) — order defines the
# silver schema (pyield/tpf/secundario/_mensal.py:166-188)
_SILVER_COLS: list[tuple[str, str, str]] = [
    ("data_liquidacao", "DATA MOV", "date"),
    ("titulo", "SIGLA", "string"),
    ("codigo_selic", "CODIGO", "long"),
    ("isin", "CODIGO ISIN", "string"),
    ("data_emissao", "EMISSAO", "date"),
    ("data_vencimento", "VENCIMENTO", "date"),
    ("operacoes", "NUM DE OPER", "long"),
    ("quantidade", "QUANT NEGOCIADA", "long"),
    ("pu_minimo", "PU MIN", "br_num"),
    ("pu_medio", "PU MED", "br_num"),
    ("pu_maximo", "PU MAX", "br_num"),
    ("pu_lastro", "PU LASTRO", "br_num"),
    ("valor_par", "VALOR PAR", "br_num"),
    ("taxa_minima", "TAXA MIN", "br_num"),
    ("taxa_media", "TAXA MED", "br_num"),
    ("taxa_maxima", "TAXA MAX", "br_num"),
    ("operacoes_corretagem", "NUM OPER COM CORRETAGEM", "long"),
    ("quantidade_corretagem", "QUANT NEG COM CORRETAGEM", "long"),
]


def _typed(raw: Column, conv: str) -> Column:
    # try_* variants: malformed cells (stray header fragments, era
    # quirks) → null under ANY session ANSI setting (Spark 4 defaults
    # ANSI on, where plain cast/to_date throw)
    if conv == "date":
        return F.try_to_date(raw, "dd/MM/yyyy")
    if conv == "long":
        return raw.try_cast("long")
    if conv == "br_num":
        return br_num_expr(raw)
    return raw  # string


def mensal_silver(spark: SparkSession, path: str) -> DataFrame:
    """Monthly secondary-market zip(s) → canonical silver frame.

    ``path`` may be a single zip or a directory/glob of them; members
    parse against their OWN header row (broadcast per-member join), so
    mixed-era directories are safe.
    """
    lines = read_zip_members(spark, path, member_suffix=".csv")
    return mensal_silver_from_lines(lines)


def mensal_silver_from_lines(lines: DataFrame) -> DataFrame:
    """The parse half of :func:`mensal_silver`, over an already-read
    (source_file, member_name, line_idx, line) frame — the unit the
    driver-checkable ``q_mensal_gold`` query exercises directly."""
    f = lines.select(
        "source_file",
        "member_name",
        "line_idx",
        F.split("line", ";").alias("fields"),
    ).filter(F.size("fields") >= 2)
    first = F.trim(F.element_at("fields", 1))
    # the member's header is its FIRST 'DATA MOV' line; data rows are
    # strictly AFTER it and are never themselves header lines, so
    # pre-header meta/title lines with ';' and re-emitted headers both
    # stay out of the silver rows (review fixes). Members with no
    # header row drop out of the inner join — the same outcome as the
    # reference, whose CSV parse keys everything on the header names.
    # header-name → position resolution runs ONCE PER MEMBER on the
    # (bounded, one-row-per-member) header aggregate, not per data row:
    # the broadcast join then hands each row 18 precomputed ints instead
    # of 18 O(|header|) array scans (measured ~1.7× on the sf0.1 twin)
    hdr = (
        f.filter(first == _HEADER_FIRST_FIELD)
        .groupBy("source_file", "member_name")
        .agg(
            F.min_by(
                F.transform("fields", lambda x: F.trim(x)), F.col("line_idx")
            ).alias("_hfields"),
            F.min("line_idx").alias("_hdr_idx"),
        )
        .select(
            "source_file",
            "member_name",
            "_hdr_idx",
            F.size("_hfields").alias("_hn"),
            *[
                F.array_position("_hfields", src).cast("int").alias(f"_p{i}")
                for i, (_, src, _c) in enumerate(_SILVER_COLS)
            ],
        )
    )
    data = f.join(F.broadcast(hdr), ["source_file", "member_name"]).filter(
        (F.col("line_idx") > F.col("_hdr_idx"))
        & (first != _HEADER_FIRST_FIELD)  # a re-emitted header line
        # (concatenated monthly blocks) must not parse as data
        # ragged-line guard: the reference's pl.read_csv ERRORS on any
        # line whose field count differs from the header's (so no real
        # file has trailers/footers); distributed, we drop such lines
        # instead — 'TOTAL GERAL;95626' must not become a phantom row
        & (F.size("fields") == F.col("_hn"))
    )

    def pick(i: int) -> Column:
        pos = F.col(f"_p{i}")
        # '' → null (the reference's null_values=""), absent column
        # (old layouts, pos == 0) → null; element_at only evaluates
        # under pos > 0 (index 0 is invalid)
        cell = F.when(pos > 0, F.trim(F.element_at("fields", pos)))
        return F.when(cell != "", cell)

    return data.select(
        *[
            _typed(pick(i), conv).alias(dst)
            for i, (dst, _src, conv) in enumerate(_SILVER_COLS)
        ]
    )


def mensal_gold(silver: DataFrame) -> DataFrame:
    """Gold layer: silver + financeiro = round2(quantidade · pu_medio)
    (pyield/tpf/secundario/_mensal.py:303-309)."""
    return silver.withColumn(
        "financeiro",
        round_pl_expr(F.col("quantidade") * F.col("pu_medio"), 2),
    )

"""K8/S10: RMD "aba 1.3" hierarchical-label parser over a CSV re-export.

The reference parses the STN RMD spreadsheet's tab 1.3 with a Python
state machine over the label column (pyield/tpf/rmd/_aba_1_3.py:27-107):
section headers ("I - EMISSÕES"/"II - RESGATES") open a *grupo*,
IGNORE-prefixed labels close it, subgroup labels ("Vendas", "Trocas",
"Tesouro Direto…", …) set a *subgrupo*, and bond-family labels emit data
rows classified (grupo, subgrupo, titulo); month columns come from the
period header row ("Jan/24" → 2024-01-01, _common.py:24-35), values
scale ×1e6 rounded 2dp, zero/null dropped.

Both parsers run over EITHER a semicolon-separated re-export
(``read_rmd_13_csv``/``read_rmd_21_csv``) or the actual .xlsx workbook
(``read_rmd_13_xlsx``/``read_rmd_21_xlsx`` via the stdlib S10 scan,
``sources/xlsx.py``) — the two sources converge on one cell grid
``(_file, _row, fields)`` and share the grid→long core, keeping ALL the
hierarchical-label logic — re-expressed Spark-first:

- the state machine is two FILL-DOWN windows (last section marker /
  last subgroup marker at or before each row), partitioned by source
  file so a directory of monthly RMDs parses in parallel;
- the month unpivot is a posexplode joined to the (tiny, broadcast)
  parsed period header.

No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

_TITULOS = ("LFT", "LTN", "NTN-B", "NTN-B1", "NTN-F", "NTN-C", "NTN-D", "Demais")
_SECOES = {"I - EMISSÕES": "Emissões", "II - RESGATES": "Resgates"}
_SUBGRUPOS = ("Vendas", "Trocas", "Vencimentos", "Compras")
_SUBGRUPO_TD = "Tesouro Direto"
_SUBGRUPOS_DIRETOS = (
    "Transferência de Carteira",
    "Emissão Direta com Financeiro",
    "Emissão Direta sem Financeiro",
    "Pagamento de Dividendos",
    "Cancelamentos",
)
_PREFIXOS_IGNORAR = ("IMPACTO", "OPERAÇÕES", "III -", "RESGATE")
_MESES_PT = {
    "Jan": 1, "Fev": 2, "Mar": 3, "Abr": 4, "Mai": 5, "Jun": 6,
    "Jul": 7, "Ago": 8, "Set": 9, "Out": 10, "Nov": 11, "Dez": 12,
}

_LINHA_PERIODOS = 2
_LINHA_INICIO_DADOS = _LINHA_PERIODOS + 1


def _starts_with_any(col, prefixes) -> F.Column:
    out = F.lit(False)
    for p in prefixes:
        out = out | col.startswith(p)
    return out


def _csv_grid(spark: SparkSession, path: str, sep: str) -> DataFrame:
    """Text re-export → the shared cell grid (_file, _row, fields)."""
    raw = spark.read.text(path).select(
        F.input_file_name().alias("_file"),
        F.col("value"),
        F.monotonically_increasing_id().alias("_idx"),
    )
    # per-file row number (monotonic ids order within a file's partition)
    wf = Window.partitionBy("_file").orderBy("_idx")
    raw = raw.withColumn("_row", F.row_number().over(wf) - 1)
    return raw.select("_file", "_row", F.split("value", sep).alias("fields"))


def _xlsx_grid(spark: SparkSession, path: str, sheet: str) -> DataFrame:
    """One workbook tab via the S10 stdlib scan → the shared cell grid."""
    from pyield_spark.sources.xlsx import read_xlsx

    g = read_xlsx(spark, path, sheet=sheet)
    return g.select(
        F.col("source_file").alias("_file"),
        F.col("row_idx").alias("_row"),
        F.col("cells").alias("fields"),
    )


def read_rmd_13_csv(spark: SparkSession, path: str, sep: str = ";") -> DataFrame:
    """Parse RMD tab-1.3 re-export(s) into the reference's long frame:
    (source_file, periodo, grupo, subgrupo, titulo, valor)."""
    return _grid_to_long_13(_csv_grid(spark, path, sep))


def read_rmd_13_xlsx(
    spark: SparkSession, path: str, sheet: str = "1.3"
) -> DataFrame:
    """Tab 1.3 straight from the RMD .xlsx workbook (S10 scan), same
    long frame as the CSV path (pyield/tpf/rmd/_aba_1_3.py:81-85 reads
    the same grid via read_excel has_header=False)."""
    return _grid_to_long_13(_xlsx_grid(spark, path, sheet))


def _grid_to_long_13(fields: DataFrame) -> DataFrame:
    wf = Window.partitionBy("_file").orderBy("_row")

    # --- period header: row 2, columns 1.. ; "Mes/yy" → date -------------
    mes_map = F.create_map(
        *[x for k, v in _MESES_PT.items() for x in (F.lit(k), F.lit(v))]
    )
    per = (
        fields.filter(F.col("_row") == _LINHA_PERIODOS)
        .select(
            "_file",
            F.posexplode(F.slice("fields", 2, 10000)).alias("_mcol", "_plabel"),
        )
        .withColumn("_plabel", F.trim("_plabel"))
        .withColumn("_mes", mes_map[F.split("_plabel", "/")[0]])
        .withColumn("_ano", F.split("_plabel", "/")[1].try_cast("int") + 2000)
        .filter(F.col("_mes").isNotNull() & F.col("_ano").isNotNull())
        .select(
            "_file",
            "_mcol",
            F.make_date("_ano", "_mes", F.lit(1)).alias("periodo"),
        )
    )

    # --- hierarchical label classification: fill-down windows ------------
    data = fields.filter(
        (F.col("_row") >= _LINHA_INICIO_DADOS)
        & (F.trim(F.col("fields")[0]) != "")
    )
    c = F.trim(F.col("fields")[0])
    sec_map = F.create_map(
        *[x for k, v in _SECOES.items() for x in (F.lit(k), F.lit(v))]
    )
    data = data.withColumn("_c", c).withColumn(
        "_grupo_marker",
        F.when(sec_map[c].isNotNull(), sec_map[c]).when(
            _starts_with_any(c, _PREFIXOS_IGNORAR), F.lit("")
        ),
    )
    # subgroup markers reset ("") at every section/ignore boundary so the
    # fill-down below never leaks a subgroup across sections
    data = data.withColumn(
        "_sub_marker",
        F.when(F.col("_grupo_marker").isNotNull(), F.lit(""))
        .when(c.isin(*_SUBGRUPOS), c)
        .when(c.startswith(_SUBGRUPO_TD), F.lit(_SUBGRUPO_TD)),
    )
    fill = wf.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    data = data.withColumn(
        "grupo", F.coalesce(F.last("_grupo_marker", ignorenulls=True).over(fill), F.lit(""))
    ).withColumn(
        "subgrupo", F.coalesce(F.last("_sub_marker", ignorenulls=True).over(fill), F.lit(""))
    )

    direto = F.coalesce(
        *[
            F.when(c.startswith(p), F.lit(p))
            for p in _SUBGRUPOS_DIRETOS
        ]
    )
    rows = data.filter(F.col("grupo") != "").withColumn(
        "titulo", F.when(c.isin(*_TITULOS), c)
    ).withColumn("_direto", direto)
    rows = rows.filter(F.col("titulo").isNotNull() | F.col("_direto").isNotNull())
    rows = rows.withColumn(
        "subgrupo", F.coalesce(F.col("_direto"), F.col("subgrupo"))
    )

    # --- month unpivot: posexplode value columns, join the period map ----
    long = rows.select(
        "_file",
        "grupo",
        "subgrupo",
        "titulo",
        F.posexplode(F.slice("fields", 2, 10000)).alias("_mcol", "_vraw"),
    ).join(F.broadcast(per), ["_file", "_mcol"])
    out = long.select(
        F.col("_file").alias("source_file"),
        "periodo",
        "grupo",
        "subgrupo",
        "titulo",
        F.bround(F.trim("_vraw").try_cast("double") * 1_000_000, 2).alias("valor"),
    )
    return out.filter(F.col("valor").isNotNull() & (F.col("valor") != 0))


# --- tab 2.1: debt-stock holders (explicit transition table) --------------

# label (upper) → (detentor, tipo, categoria, pode_emitir); pode_emitir
# False marks an intermediate state whose leaf rows are ignored until the
# next emitting transition (pyield/tpf/rmd/_aba_2_1.py:16-26)
_TRANSICOES_21: dict[str, tuple[str | None, str | None, str | None, bool]] = {
    "DPF EM PODER DO PÚBLICO": (None, None, None, False),
    "DPMFI": ("Público", "DPMFi", None, False),
    "TESOURO NACIONAL": ("Público", "DPMFi", "Tesouro Nacional", True),
    "BANCO CENTRAL": ("Público", "DPMFi", "Banco Central", True),
    "DPFE": ("Público", "DPFe", None, False),
    "DÍVIDA MOBILIÁRIA": ("Público", "DPFe", "Mobiliária", True),
    "DÍVIDA CONTRATUAL": ("Público", "DPFe", "Contratual", True),
    "DPMFI EM PODER DO BANCO CENTRAL": ("Banco Central", "DPMFi", None, True),
}


def _rotulo_limpo(col) -> F.Column:
    """The reference's limpar_rotulo (_common.py:38-41): strip footnote
    marks ¹ ², collapse whitespace, trim."""
    return F.trim(
        F.regexp_replace(
            F.translate(col, "¹²", ""), r"\s+", " "
        )
    )


def read_rmd_21_csv(spark: SparkSession, path: str, sep: str = ";") -> DataFrame:
    """Parse RMD tab-2.1 re-export(s) into the reference's long frame:
    (source_file, periodo, detentor, tipo, categoria, titulo, valor).

    The reference walks the label column updating a 4-tuple state from
    an explicit transition table and emits only leaf rows while the
    state allows it (pyield/tpf/rmd/_aba_2_1.py:40-72). Spark-first:
    every transition packs its whole state into ONE struct marker and a
    single fill-down window (`last ignorenulls`) carries it to the leaf
    rows — transitions are atomic, so per-field fill-downs (which could
    mix fields from different transitions) are wrong by construction;
    the struct keeps the 4-tuple intact. Values scale ×1e9 rounded 2dp;
    nulls drop, zeros KEPT (unlike tab 1.3 — the reference keeps them).
    """
    return _grid_to_long_21(_csv_grid(spark, path, sep))


def read_rmd_21_xlsx(
    spark: SparkSession, path: str, sheet: str = "2.1"
) -> DataFrame:
    """Tab 2.1 straight from the RMD .xlsx workbook (S10 scan)."""
    return _grid_to_long_21(_xlsx_grid(spark, path, sheet))


def _grid_to_long_21(fields: DataFrame) -> DataFrame:
    wf = Window.partitionBy("_file").orderBy("_row")

    mes_map = F.create_map(
        *[x for k, v in _MESES_PT.items() for x in (F.lit(k), F.lit(v))]
    )
    per = (
        fields.filter(F.col("_row") == _LINHA_PERIODOS)
        .select(
            "_file",
            F.posexplode(F.slice("fields", 2, 10000)).alias("_mcol", "_plabel"),
        )
        .withColumn("_plabel", F.trim("_plabel"))
        .withColumn("_mes", mes_map[F.split("_plabel", "/")[0]])
        .withColumn("_ano", F.split("_plabel", "/")[1].try_cast("int") + 2000)
        .filter(F.col("_mes").isNotNull() & F.col("_ano").isNotNull())
        .select(
            "_file",
            "_mcol",
            F.make_date("_ano", "_mes", F.lit(1)).alias("periodo"),
        )
    )

    data = fields.filter(F.col("_row") >= _LINHA_INICIO_DADOS)
    rot = _rotulo_limpo(F.col("fields")[0])
    data = data.withColumn("_rot", rot).filter(F.col("_rot") != "")

    # one CASE ladder over the transition table → atomic state struct
    marker = None
    for label, (det, tipo, cat, pode) in _TRANSICOES_21.items():
        state = F.struct(
            F.lit(det).cast("string").alias("det"),
            F.lit(tipo).cast("string").alias("tipo"),
            F.lit(cat).cast("string").alias("cat"),
            F.lit(pode).alias("pode"),
        )
        cond = F.upper(F.col("_rot")) == label
        marker = F.when(cond, state) if marker is None else marker.when(cond, state)

    fill = wf.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    data = data.withColumn("_trans", marker).withColumn(
        "_state", F.last("_trans", ignorenulls=True).over(fill)
    )

    leaves = data.filter(
        F.col("_trans").isNull() & F.coalesce(F.col("_state.pode"), F.lit(False))
    )

    long = leaves.select(
        "_file",
        F.col("_state.det").alias("detentor"),
        F.col("_state.tipo").alias("tipo"),
        F.col("_state.cat").alias("categoria"),
        F.col("_rot").alias("titulo"),
        F.posexplode(F.slice("fields", 2, 10000)).alias("_mcol", "_vraw"),
    ).join(F.broadcast(per), ["_file", "_mcol"])
    out = long.select(
        F.col("_file").alias("source_file"),
        "periodo",
        "detentor",
        "tipo",
        "categoria",
        "titulo",
        F.bround(F.trim("_vraw").try_cast("double") * 1_000_000_000, 2).alias("valor"),
    )
    return out.filter(F.col("valor").isNotNull())

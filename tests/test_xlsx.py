"""S10 Excel scan: stdlib xlsx parse (zip of OOXML parts) and the RMD
state machines running straight off a workbook, byte-identical to the
CSV re-export paths."""

import zipfile

import pytest

from pyield_spark.sources.xlsx import (
    parse_xlsx_bytes,
    read_xlsx,
    write_minimal_xlsx,
)


def test_xlsx_grid_scan(spark, tmp_path):
    """Inline strings, numerics, booleans, sparse cells (A1-ref gaps),
    skipped rows keeping positional indices, multi-sheet + sheet filter."""
    p = tmp_path / "wb.xlsx"
    write_minimal_xlsx(
        str(p),
        {
            "Dados": [
                ["Título", "Jan/24", "Fev/24"],
                ["LTN", 1.5, 2],
                [],  # empty spreadsheet row still occupies index 2
                [None, 3.25, None, True],  # sparse: A3 missing, D3 bool
            ],
            "Meta": [["versão", "2024-01"]],
        },
    )
    df = read_xlsx(spark, str(p))
    rows = {
        (r.sheet_name, r.row_idx): list(r.cells) for r in df.collect()
    }
    assert rows[("Dados", 0)] == ["Título", "Jan/24", "Fev/24"]
    # numerics come back verbatim as stored (float repr / int repr)
    assert rows[("Dados", 1)] == ["LTN", "1.5", "2"]
    assert rows[("Dados", 2)] == []
    assert rows[("Dados", 3)] == [None, "3.25", None, "true"]
    assert rows[("Meta", 0)] == ["versão", "2024-01"]

    only = read_xlsx(spark, str(p), sheet="Meta")
    assert [r.sheet_name for r in only.collect()] == ["Meta"]


def test_xlsx_shared_strings_and_rich_text():
    """The t="s" shared-string path and rich-text <r> runs — written by
    real producers (write_minimal_xlsx emits inlineStr, so build the
    sharedStrings workbook by hand)."""
    import io

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pns = "http://schemas.openxmlformats.org/package/2006/relationships"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{ns}" xmlns:r="{rns}"><sheets>'
            '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<Relationships xmlns="{pns}"><Relationship Id="rId1" '
            'Type="t" Target="worksheets/sheet1.xml"/></Relationships>',
        )
        zf.writestr(
            "xl/sharedStrings.xml",
            f'<sst xmlns="{ns}" count="2" uniqueCount="2">'
            "<si><t>plain</t></si>"
            "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{ns}"><sheetData><row r="1">'
            '<c r="A1" t="s"><v>0</v></c>'
            '<c r="B1" t="s"><v>1</v></c>'
            '<c r="C1" t="str"><v>=cached</v></c>'
            "</row></sheetData></worksheet>",
        )
    got = list(parse_xlsx_bytes(buf.getvalue()))
    assert got == [("S", 0, ["plain", "rich", "=cached"])]


_RMD13_GRID = [
    ["RELATÓRIO MENSAL DA DÍVIDA"],
    ["Tabela 1.3"],
    ["Categoria", "Jan/24", "Fev/24", "Acumulado"],
    ["I - EMISSÕES"],
    ["Vendas"],
    ["LTN", 1.5, 2.5, 4.0],
    ["NTN-B", 0.25, 0, 0.25],
    ["Trocas"],
    ["LFT", 3.0, None, 3.0],
    ["Transferência de Carteira¹", 0.5, 0.75, 1.25],
    ["IMPACTO TOTAL", 9.9, 9.9, 9.9],
    ["LTN", 7.7, 7.7, 7.7],
    ["II - RESGATES"],
    ["Vencimentos"],
    ["NTN-F", 4.25, 5.5, 9.75],
]

_RMD21_GRID = [
    ["RELATÓRIO MENSAL DA DÍVIDA"],
    ["Tabela 2.1"],
    ["Categoria", "Jan/24", "Fev/24", "Acumulado"],
    ["DPF em poder do público"],
    ["LFT", 9.9, 9.9, 9.9],
    ["DPMFi"],
    ["Tesouro Nacional¹"],
    ["LFT", 1.5, 0, 1.5],
    ["LTN", 2.25, None, 2.25],
    ["Banco  Central"],
    ["NTN-B", 3.5, 4.5, 8.0],
    ["DPFe"],
    ["NTN-F", 8.8, 8.8, 8.8],
    ["Dívida Mobiliária"],
    ["Global 2030", 0.75, 0.5, 1.25],
    ["DPMFi em poder do Banco Central"],
    ["LFT", 6.0, 7.0, 13.0],
]


def _csv_of(grid, sep=";"):
    width = max(len(r) for r in grid)
    lines = []
    for row in grid:
        cells = ["" if c is None else str(c) for c in row]
        cells += [""] * (width - len(cells))
        lines.append(sep.join(cells))
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("tab", ["13", "21"])
def test_rmd_xlsx_matches_csv_reexport(spark, tmp_path, tab):
    """The SAME hierarchical grid through the workbook scan and through
    the CSV re-export produces identical long frames — the K8 state
    machines are source-agnostic (reference reads the workbook:
    pyield/tpf/rmd/_download.py:38-48 → _aba_*_*.py)."""
    from pyield_spark.sources import rmd

    grid = _RMD13_GRID if tab == "13" else _RMD21_GRID
    sheet = "1.3" if tab == "13" else "2.1"
    xp = tmp_path / "rmd.xlsx"
    cp = tmp_path / "rmd.csv"
    # a realistic workbook carries BOTH tabs; the reader picks one
    write_minimal_xlsx(str(xp), {"1.3": _RMD13_GRID, "2.1": _RMD21_GRID})
    cp.write_text(_csv_of(grid), encoding="utf-8")

    read_x = rmd.read_rmd_13_xlsx if tab == "13" else rmd.read_rmd_21_xlsx
    read_c = rmd.read_rmd_13_csv if tab == "13" else rmd.read_rmd_21_csv
    key_cols = (
        ["periodo", "grupo", "subgrupo", "titulo"]
        if tab == "13"
        else ["periodo", "detentor", "tipo", "categoria", "titulo"]
    )

    def canon(df):
        return sorted(
            (tuple(str(r[c]) for c in key_cols), r["valor"])
            for r in df.collect()
        )

    got_x = canon(read_x(spark, str(xp), sheet=sheet))
    got_c = canon(read_c(spark, str(cp)))
    assert got_x == got_c
    assert len(got_x) > 0


def test_vna_sheet_silver(spark, tmp_path):
    """VNA workbook tab → typed series: ISO datetimes AND dd/MM/yyyy
    parse, junk rows drop, duplicate data keeps the LAST sheet row
    (reference unique keep='last', tpf/vna/ntnb.py:18-28)."""
    from pyield_spark.bonds.vna import vna_sheet_silver
    from pyield_spark.sources.xlsx import read_xlsx

    p = tmp_path / "vna.xlsx"
    write_minimal_xlsx(
        str(p),
        {
            "VNA": [
                ["Valor Nominal Atualizado", None],
                ["2024-01-15 00:00:00", 4_300.123456],
                ["15/02/2024", 4_350.5],
                ["2024-02-15 00:00:00", 4_351.75],  # revision: keep last
                ["nota de rodapé", None],
                ["2024-03-15 00:00:00", "not-a-number"],
            ]
        },
    )
    out = vna_sheet_silver(read_xlsx(spark, str(p), sheet="VNA"))
    rows = out.collect()
    assert all(r.source_file.endswith("vna.xlsx") for r in rows)
    got = {r.data.isoformat(): r.vna for r in rows}
    assert got == {"2024-01-15": 4300.123456, "2024-02-15": 4351.75}


def test_xlsx_roundtrip_property():
    """Property: any grid of strings/numbers/bools/None survives
    write→parse with values stringified and trailing-None truncation
    (no Spark needed — the parser core is pure)."""
    import io
    import zipfile as _zf

    from hypothesis import given, settings, strategies as st

    cell = st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF
            ),
            max_size=12,
        ),
        st.integers(min_value=-10**9, max_value=10**9),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.booleans(),
    )
    grid_st = st.lists(st.lists(cell, max_size=6), min_size=1, max_size=8)

    def expect_row(row):
        vals = []
        for v in row:
            if v is None:
                vals.append(None)
            elif isinstance(v, bool):
                vals.append("true" if v else "false")
            elif isinstance(v, (int, float)):
                vals.append(str(v))
            else:
                vals.append(v)
        while vals and vals[-1] is None:
            vals.pop()
        return vals

    @settings(max_examples=60, deadline=None)
    @given(grid_st)
    def check(grid):
        buf = io.BytesIO()
        # write_minimal_xlsx wants a path-like; give it a real temp zip
        import tempfile, os

        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "g.xlsx")
            write_minimal_xlsx(p, {"G": grid})
            content = open(p, "rb").read()
        got = {r: cells for _, r, cells in parse_xlsx_bytes(content)}
        for i, row in enumerate(grid):
            assert got.get(i, []) == expect_row(row)

    check()


def test_ipca_projecao_silver(spark, tmp_path):
    """ANBIMA indicators sheet → one projection record per workbook
    (pyield/ipca/projetado.py goldens: header datetime, '(mar/26)'
    period, percent/100 round4)."""
    from pyield_spark.bonds.vna import ipca_projecao_silver
    from pyield_spark.sources.xlsx import read_xlsx

    p = tmp_path / "indicadores.xlsx"
    write_minimal_xlsx(
        str(p),
        {
            "Ind": [
                ["Data e Hora da Última Atualização: 13/03/2026 - 15:20 h"],
                ["Indicadores de Projeção"],
                ["IGP-M1", "Projeção (fev/26)", 0.4812],
                ["IPCA1", "Projeção (mar/26)", 0.43785],
            ]
        },
    )
    out = ipca_projecao_silver(read_xlsx(spark, str(p))).collect()
    assert len(out) == 1
    r = out[0]
    assert r.periodo_referencia == "mar/26"
    assert r.valor_projetado == 0.0044
    assert r.ultima_atualizacao.isoformat() == "2026-03-13T15:20:00"


def test_skip_bad_files(spark, tmp_path):
    """A corrupt workbook in the glob fails the scan loudly by default
    and is dropped under skip_bad_files=True (the ignoreCorruptFiles
    stance for lake-scale ingestion)."""
    import pytest

    good = tmp_path / "good.xlsx"
    write_minimal_xlsx(str(good), {"S": [["ok", 1]]})
    (tmp_path / "bad.xlsx").write_bytes(b"PK\x03\x04 truncated-not-a-zip")

    glob = str(tmp_path / "*.xlsx")
    with pytest.raises(Exception):
        read_xlsx(spark, glob).collect()
    rows = read_xlsx(spark, glob, skip_bad_files=True).collect()
    assert len(rows) == 1 and rows[0].cells == ["ok", "1"]

"""Connector layer (§2.1): parsing semantics over small fixtures."""

import zipfile

from pyield_spark.sources import readers as rd


def test_holidays_csv(spark, tmp_path):
    p = tmp_path / "holidays.csv"
    p.write_text("# comment line\n01/01/2024\n25/12/2024\n")
    got = sorted(str(r.data) for r in rd.read_holidays_csv(spark, str(p)).collect())
    assert got == ["2024-01-01", "2024-12-25"]


def test_anbima_at_csv(spark, tmp_path):
    p = tmp_path / "tpf.csv"
    content = (
        "meta line 1\n"
        "meta line 2\n"
        "Titulo@Data Referencia@Codigo SELIC@Data Base/Emissao@Data de Vencimento@Tx. Compra@Tx. Venda@Tx. Indicativas@PU\n"
        "LTN@06/02/2026@100000@07/07/2023@01/01/2030@14,9375@--@14,90@997,241543\n"
    )
    p.write_bytes(content.encode("latin1"))
    bronze = rd.read_anbima_csv_bronze(spark, str(p))
    silver = rd.anbima_silver(bronze)
    row = silver.collect()[0]
    assert row.titulo == "LTN"
    assert str(row.data_referencia) == "2026-02-06"
    assert str(row.data_vencimento) == "2030-01-01"
    assert row.taxa_compra == 0.149375
    assert row.taxa_venda is None  # '--' → null
    assert row.pu == 997.241543
    assert row.codigo_selic == 100000


def test_anbima_mixed_layout_directory(spark, tmp_path):
    """Regression (ADVICE r4): the header cutoff must be PER FILE.

    A directory mixing layouts — one file with the usual 2 meta lines,
    one with 3 (the pre/post-2026 difference) — previously applied the
    shallowest file's cutoff globally, leaking the deeper file's third
    meta line and its 'Titulo' header row into the data.
    """
    d = tmp_path / "mix"
    d.mkdir()
    hdr = "Titulo@Data Referencia@Tx. Indicativas@PU\n"
    (d / "shallow.csv").write_bytes(
        ("meta1\nmeta2\n" + hdr + "LTN@06/02/2026@14,90@997,24\n").encode("latin1")
    )
    (d / "deep.csv").write_bytes(
        ("meta1\nmeta2\nmeta3\n" + hdr + "NTN-B@06/02/2026@7,50@4321,00\n").encode(
            "latin1"
        )
    )
    bronze = rd.read_anbima_csv_bronze(spark, str(d))
    titles = sorted(r["Titulo"] for r in bronze.collect())
    assert titles == ["LTN", "NTN-B"]  # no meta3 / repeated header leak


def test_anbima_no_anchor_fallback_per_file(spark, tmp_path):
    """skip_lines fallback also applies per file when no anchor matches."""
    d = tmp_path / "noanchor"
    d.mkdir()
    hdr = "Papel@Data@PU\n"
    (d / "a.csv").write_bytes(("m1\nm2\n" + hdr + "LTN@x@1\n").encode("latin1"))
    (d / "b.csv").write_bytes(("m1\nm2\n" + hdr + "LFT@y@2\n").encode("latin1"))
    bronze = rd.read_anbima_csv_bronze(spark, str(d), header_anchor=None)
    got = sorted(r["Papel"] for r in bronze.collect())
    assert got == ["LFT", "LTN"]


def test_zip_members(spark, tmp_path):
    z = tmp_path / "archive.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("inner.csv", "a;b;c\n1;2;3\n")
        zf.writestr("skip.txt", "nope")
    lines = rd.read_zip_members(spark, str(z), member_suffix=".csv")
    got = [r.line for r in lines.collect()]
    assert got == ["a;b;c", "1;2;3"]
    silver = rd.read_semicolon_lines_silver(lines, min_cols=3)
    assert silver.count() == 2


def test_sgs_json(spark, tmp_path):
    p = tmp_path / "sgs.json"
    p.write_text('[{"data":"30/01/2025","valor":"13.15"},{"data":"31/01/2025","valor":"13.17"}]')
    got = {str(r.data): r.valor for r in rd.read_sgs_json(spark, str(p)).collect()}
    assert got == {"2025-01-30": 13.15, "2025-01-31": 13.17}


def test_fixed_width_rate(spark, tmp_path):
    p = tmp_path / "di.txt"
    p.write_text("00001315\n")
    got = rd.read_fixed_width_rate(spark, str(p)).collect()[0].taxa
    assert got == 0.1315


def test_slice_text_table(spark, tmp_path):
    p = tmp_path / "lft.txt"
    p.write_text("header garbage\nEMISSAO DATA\n01/07/2000  1000.000000\n01/01/2001  1010.123456\n")
    rows = rd.slice_text_table(spark, str(p), "EMISSAO", n_cols=2).collect()
    assert len(rows) == 2
    assert rows[0].fields[1].endswith("000000")


def test_slice_text_table_per_file_marker(spark, tmp_path):
    """Review regression: each file resolves its OWN marker — file 2's
    pre-marker meta lines must not leak (a global min marker would pass
    everything in whichever file sorts after file 1's marker), and a
    file without the marker contributes nothing."""
    d = tmp_path / "reports"
    d.mkdir()
    (d / "a.txt").write_text("meta a\nEMISSAO DATA\n01/07/2000  1.0\n")
    (d / "b.txt").write_text(
        "meta b1\nmeta b2 extra\nEMISSAO DATA\n02/07/2000  2.0\n03/07/2000  3.0\n"
    )
    (d / "c.txt").write_text("no marker here\n01/01/2001  9.9\n")
    rows = rd.slice_text_table(spark, str(d), "EMISSAO", n_cols=2).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.source_file.rsplit("/", 1)[-1], []).append(r.fields[1])
    assert by_file == {"a.txt": ["1.0"], "b.txt": ["2.0", "3.0"]}


def test_ttl_dataset_cache(spark, sf_dir):
    from pyield_spark.sources import cache

    calls = []

    def loader(s):
        calls.append(1)
        return s.read.parquet(f"{sf_dir}/region.parquet")

    cache.clear()
    a = cache.get_dataset(spark, "region", loader, ttl_seconds=60, now=1000.0)
    b = cache.get_dataset(spark, "region", loader, ttl_seconds=60, now=1010.0)
    assert len(calls) == 1  # same bucket → cached
    assert a is b
    c = cache.get_dataset(spark, "region", loader, ttl_seconds=60, now=1070.0)
    assert len(calls) == 2  # bucket rolled → refreshed
    assert c.count() == 5
    cache.clear()


def test_market_hours_filter(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from pyield_spark.streaming.windows import market_hours_filter

    rows = [
        (1, dt.datetime(2024, 3, 4, 10, 0, 0)),   # in session
        (2, dt.datetime(2024, 3, 4, 8, 0, 0)),    # before open
        (3, dt.datetime(2024, 3, 4, 19, 0, 0)),   # after close
        (4, dt.datetime(2024, 12, 24, 10, 0, 0)), # Dec 24 half-holiday
        (5, dt.datetime(2024, 12, 31, 10, 0, 0)), # Dec 31 half-holiday
    ]
    df = spark.createDataFrame(rows, "id INT, ts TIMESTAMP")
    got = sorted(r.id for r in df.filter(market_hours_filter("ts")).collect())
    assert got == [1]


def test_price_report_xml(spark, tmp_path):
    import zipfile as _zf

    from pyield_spark.sources.xml_report import read_price_report_xml

    xml = """<?xml version="1.0"?>
<Doc xmlns="urn:b3:pricereport">
  <Body>
    <PricRpt>
      <TradDt><Dt>2025-02-03</Dt></TradDt>
      <SctyId><TckrSymb>DI1F27</TckrSymb></SctyId>
      <FinInstrmAttrbts>
        <OpnIntrst>64037</OpnIntrst>
        <TradQty>36</TradQty>
        <NtlFinVol>5272867.79</NtlFinVol>
        <BestBidPric>14.10</BestBidPric>
        <BestAskPric>14.13</BestAskPric>
        <AdjstdQt>98321.47</AdjstdQt>
        <AdjstdQtTax>14.127</AdjstdQtTax>
      </FinInstrmAttrbts>
    </PricRpt>
    <PricRpt>
      <TradDt><Dt>2025-02-03</Dt></TradDt>
      <SctyId><TckrSymb>DAPK26</TckrSymb></SctyId>
      <FinInstrmAttrbts>
        <OpnIntrst>bogus</OpnIntrst>
        <AdjstdQt>5123.44</AdjstdQt>
      </FinInstrmAttrbts>
    </PricRpt>
  </Body>
</Doc>"""
    # nested zip→zip→xml, like the reference's containers
    inner = tmp_path / "inner.zip"
    with _zf.ZipFile(inner, "w") as z:
        z.writestr("report.xml", xml)
    outer = tmp_path / "outer.zip"
    with _zf.ZipFile(outer, "w") as z:
        z.write(inner, "inner.zip")

    df = read_price_report_xml(spark, str(outer))
    rows = {r.TckrSymb: r for r in df.collect()}
    assert set(rows) == {"DI1F27", "DAPK26"}
    di = rows["DI1F27"]
    assert str(di.TradDt) == "2025-02-03"
    assert di.OpnIntrst == 64037 and di.AdjstdQt == 98321.47
    assert di.BestBidPric == 14.10 and di.AdjstdQtTax == 14.127
    assert rows["DAPK26"].OpnIntrst is None  # tolerant cast: 'bogus' → null


def test_html_tables(spark, tmp_path):
    from pyield_spark.sources.html_table import read_html_tables

    html = """<html><body>
    <table><tr><th>ISIN</th><th>PU</th></tr>
    <tr><td>BRSTNCLTN7U7</td><td>963,00</td></tr>
    <tr><td>BRSTNCNTB123</td><td>4.123,45</td></tr></table>
    <table><tr><td>other</td></tr></table>
    </body></html>"""
    p = tmp_path / "estoque.html"
    p.write_bytes(html.encode("latin1"))
    df = read_html_tables(spark, str(p))
    rows = df.orderBy("table_idx", "row_idx").collect()
    assert [r.table_idx for r in rows] == [0, 0, 0, 1]
    assert rows[0].cells == ["ISIN", "PU"]
    assert rows[2].cells == ["BRSTNCNTB123", "4.123,45"]


def test_odata_csv(spark, tmp_path):
    p = tmp_path / "olinda.csv"
    p.write_text(
        "cotacaoCompra;cotacaoVenda;dataHoraCotacao\n",
        encoding="utf-8",
    )
    # OData CSV is comma-separated with 'null' literals and empties
    p.write_text(
        "cotacaoCompra,cotacaoVenda,dataHoraCotacao\n"
        "5.1234,null,2024-01-02 13:00:00\n"
        ",5.4321,2024-01-03 13:00:00\n",
        encoding="utf-8",
    )
    from pyield_spark.sources.readers import read_odata_csv

    rows = read_odata_csv(spark, str(p)).orderBy("dataHoraCotacao").collect()
    assert [r.cotacaoCompra for r in rows] == ["5.1234", None]
    assert [r.cotacaoVenda for r in rows] == [None, "5.4321"]
    # bronze discipline: every column is a plain string
    assert all(
        f.dataType.simpleString() == "string"
        for f in read_odata_csv(spark, str(p)).schema.fields
    )


def test_ibge_json(spark, tmp_path):
    p = tmp_path / "ipca.json"
    p.write_text(
        '[{"id":"6691","resultados":[{"classificacoes":[],'
        '"series":[{"localidade":{"id":"1"},'
        '"serie":{"202401":"0.42","202402":"0.83","202403":"-0.12"}}]}]}]',
        encoding="utf-8",
    )
    from pyield_spark.sources.readers import read_ibge_json

    rows = read_ibge_json(spark, str(p)).orderBy("periodo").collect()
    assert [(r.periodo, r.valor) for r in rows] == [
        (202401, 0.42),
        (202402, 0.83),
        (202403, -0.12),
    ]


def test_rmd_13_hierarchical_labels(spark, tmp_path):
    """K8 state machine over the RMD 1.3 grid re-export: section fill-
    down, subgroup reset at section boundaries, direct-subgroup prefix
    rows, IGNORE prefixes closing a section, month unpivot, 1e6 scale,
    zero/null dropped."""
    p = tmp_path / "rmd_13.csv"
    p.write_text(
        "RELATÓRIO MENSAL DA DÍVIDA;;;\n"
        "Tabela 1.3;;;\n"
        "Categoria;Jan/24;Fev/24;Acumulado\n"
        "I - EMISSÕES;;;\n"
        "Vendas;;;\n"
        "LTN;1.5;2.5;4.0\n"
        "NTN-B;0.25;0;0.25\n"
        "Trocas;;;\n"
        "LFT;3.0;;3.0\n"
        "Transferência de Carteira¹;0.5;0.75;1.25\n"
        "IMPACTO TOTAL;9.9;9.9;9.9\n"
        "LTN;7.7;7.7;7.7\n"
        "II - RESGATES;;;\n"
        "Vencimentos;;;\n"
        "NTN-F;4.25;5.5;9.75\n",
        encoding="utf-8",
    )
    from pyield_spark.sources.rmd import read_rmd_13_csv

    got = {
        (r.periodo.isoformat(), r.grupo, r.subgrupo, r.titulo): r.valor
        for r in read_rmd_13_csv(spark, str(p)).collect()
    }
    assert got == {
        # "Acumulado" column is not a parsable period → dropped
        ("2024-01-01", "Emissões", "Vendas", "LTN"): 1500000.0,
        ("2024-02-01", "Emissões", "Vendas", "LTN"): 2500000.0,
        ("2024-01-01", "Emissões", "Vendas", "NTN-B"): 250000.0,
        # Fev NTN-B is 0 → dropped
        ("2024-01-01", "Emissões", "Trocas", "LFT"): 3000000.0,
        # Fev LFT empty → null → dropped
        ("2024-01-01", "Emissões", "Transferência de Carteira", None): 500000.0,
        ("2024-02-01", "Emissões", "Transferência de Carteira", None): 750000.0,
        # LTN after IMPACTO: section closed → dropped
        ("2024-01-01", "Resgates", "Vencimentos", "NTN-F"): 4250000.0,
        ("2024-02-01", "Resgates", "Vencimentos", "NTN-F"): 5500000.0,
    }


def test_imaq_estoque_silver(spark, tmp_path):
    """IMA-Q silver transform (pyield/anbima/imaq.py:103-126): typed
    casts incl. inteiro_m thousands→units, header-repeat drop, ISIN
    dedupe keep-first."""
    import datetime as dt

    from pyield_spark.sources.html_table import imaq_estoque_silver, read_html_tables

    def tr(cells, tag="td"):
        return "<tr>" + "".join(f"<{tag}>{c}</{tag}>" for c in cells) + "</tr>"

    hdr = ["Título", "Codigo Selic", "Código ISIN", "Data de Vencimento",
           "Quantidade em Mercado (1.000 Títulos)", "PU (R$)",
           "Valor de Mercado (R$ Mil)",
           "Variação da Quantidade (1.000 Títulos)", "Status do Titulo"]
    rows = [
        ["LTN", "100000", "BRSTNCLTN863", "01/10/2025", "115.870,772",
         "997,241543", "115.551.147", "0,000", "Participante Definitivo"],
        # repeated in-body header → dropped
        hdr,
        # duplicate ISIN → keep first
        ["LTN", "100000", "BRSTNCLTN863", "01/10/2025", "1,000",
         "1,0", "1", "0,000", "dup"],
        ["NTN-B", "760199", "BRSTNCNTB123", "15/05/2035", "2.500,5",
         "4.271,864805", "10.679.661", "-1,987", "Participante Definitivo"],
    ]
    html = ("<html><body><table>" + tr(["nav"]) + "</table><table>"
            + tr(hdr, "th") + "".join(tr(r) for r in rows)
            + "</table></body></html>")
    p = tmp_path / "imaq.html"
    p.write_bytes(html.encode("latin1"))

    out = imaq_estoque_silver(
        read_html_tables(spark, str(p)), dt.date(2025, 10, 1)
    ).orderBy("titulo")
    got = {r.isin: r for r in out.collect()}
    assert set(got) == {"BRSTNCLTN863", "BRSTNCNTB123"}
    ltn = got["BRSTNCLTN863"]
    assert ltn.quantidade_mercado == 115870772          # thousands → units
    assert ltn.pu == 997.241543
    assert ltn.valor_mercado == 115551147000
    assert ltn.variacao_quantidade == 0
    assert ltn.status_titulo == "Participante Definitivo"  # keep-first
    ntb = got["BRSTNCNTB123"]
    assert ntb.data_vencimento == dt.date(2035, 5, 15)
    assert ntb.variacao_quantidade == -1987
    assert ntb.codigo_selic == 760199


def test_rmd_21_transition_state_machine(spark, tmp_path):
    """RMD 2.1: explicit transition table drives an atomic 4-tuple state
    (detentor, tipo, categoria, pode_emitir); leaf rows emit only under
    an emitting state; footnote marks stripped; 1e9 scale; nulls drop,
    zeros kept."""
    p = tmp_path / "rmd_21.csv"
    p.write_text(
        "RELATÓRIO MENSAL DA DÍVIDA;;;\n"
        "Tabela 2.1;;;\n"
        "Categoria;Jan/24;Fev/24;Acumulado\n"
        "DPF em poder do público;;;\n"
        "LFT;9.9;9.9;9.9\n"          # pode_emitir=False → ignored
        "DPMFi;;;\n"
        "Tesouro Nacional¹;;;\n"
        "LFT;1.5;0;1.5\n"
        "LTN;2.25;;2.25\n"
        "Banco  Central;;;\n"         # double space collapses
        "NTN-B;3.5;4.5;8.0\n"
        "DPFe;;;\n"
        "NTN-F;8.8;8.8;8.8\n"        # DPFe is intermediate → ignored
        "Dívida Mobiliária;;;\n"
        "Global 2030;0.75;0.5;1.25\n"
        "DPMFi em poder do Banco Central;;;\n"
        "LFT;6.0;7.0;13.0\n",
        encoding="utf-8",
    )
    from pyield_spark.sources.rmd import read_rmd_21_csv

    got = {
        (r.periodo.isoformat(), r.detentor, r.tipo, r.categoria, r.titulo): r.valor
        for r in read_rmd_21_csv(spark, str(p)).collect()
    }
    assert got == {
        ("2024-01-01", "Público", "DPMFi", "Tesouro Nacional", "LFT"): 1.5e9,
        ("2024-02-01", "Público", "DPMFi", "Tesouro Nacional", "LFT"): 0.0,  # zero KEPT
        ("2024-01-01", "Público", "DPMFi", "Tesouro Nacional", "LTN"): 2.25e9,
        ("2024-01-01", "Público", "DPMFi", "Banco Central", "NTN-B"): 3.5e9,
        ("2024-02-01", "Público", "DPMFi", "Banco Central", "NTN-B"): 4.5e9,
        ("2024-01-01", "Público", "DPFe", "Mobiliária", "Global 2030"): 0.75e9,
        ("2024-02-01", "Público", "DPFe", "Mobiliária", "Global 2030"): 0.5e9,
        ("2024-01-01", "Banco Central", "DPMFi", None, "LFT"): 6.0e9,
        ("2024-02-01", "Banco Central", "DPMFi", None, "LFT"): 7.0e9,
    }


def test_html_nested_tables_do_not_misfile_rows(spark, tmp_path):
    """Review regression: rows of an OUTER table that follow a nested
    inner </table> must stay with the outer table, and the outer row
    that CONTAINS the nested table must survive."""
    html = (
        "<html><body><table>"
        "<tr><td>A</td></tr>"
        "<tr><td><table><tr><td>x</td></tr></table></td></tr>"
        "<tr><td>B</td></tr>"
        "</table></body></html>"
    )
    p = tmp_path / "nested.html"
    p.write_text(html, encoding="latin1")

    from pyield_spark.sources.html_table import read_html_tables

    rows = read_html_tables(spark, str(p)).collect()
    by_table = {}
    for r in rows:
        by_table.setdefault(r.table_idx, []).append((r.row_idx, list(r.cells)))
    for t in by_table.values():
        t.sort()
    # the outer cell that CONTAINS the nested table is a structural
    # placeholder (''): its text lives in the inner table's own rows
    assert [c for _, c in by_table[0]] == [["A"], [""], ["B"]]
    assert [c for _, c in by_table[1]] == [["x"]]


def test_tpf_intradia_interior_empty_header_keeps_positions(spark):
    """Review regression: an interior empty header cell (CSV null) must
    hold its slot — dropping it would shift every later column one left
    and misalign the data."""
    from pyield_spark.sources.tpf_intradia import tpf_intradia_from_wide

    import datetime as dt

    wide = ", ".join(f"_c{i} STRING" for i in range(36))
    rows = [
        tuple(
            ["//1", "sigla", None, "data vencimento", "código título"]
            + [None] * 31
        ),
        tuple(["1", "LTN", None, "01/01/2030", "100000"] + [None] * 31),
    ]
    raw = spark.createDataFrame(rows, wide)
    out = tpf_intradia_from_wide(raw, dt.datetime(2026, 2, 6, 10, 0, 0)).collect()
    assert len(out) == 1
    assert out[0].titulo == "LTN"
    # with the shift bug these read their left neighbor's cell
    assert out[0].data_vencimento == dt.date(2030, 1, 1)
    assert out[0].codigo_selic == 100000


def test_slice_text_table_end_marker_cut(spark, tmp_path):
    """Round-6 review fix: the reference slices to find('99999999*') —
    post-terminator lines must not leak in as data; a file without the
    terminator keeps its tail (lenient)."""
    from pyield_spark.sources import readers as rd

    p = tmp_path / "lft.txt"
    p.write_text(
        "header junk\nEMISSAO VENC\n"
        "210100 123 456\n210100 789 012\n"
        "99999999* TOTAL\n"
        "trailing summary 1 2 3\n"
    )
    rows = rd.slice_text_table(spark, str(p), "EMISSAO", n_cols=2).collect()
    firsts = sorted(r["fields"][1] for r in rows)
    assert firsts == ["123", "789"]  # terminator and trailing line cut

    p2 = tmp_path / "nomarker.txt"
    p2.write_text("meta only\nno start here\n")
    assert rd.slice_text_table(spark, str(p2), "EMISSAO").count() == 0


def test_read_xlsx_unknown_sheet_raises(spark, tmp_path):
    """Round-6 review fix: a typo'd tab name fails loudly like the
    reference's pl.read_excel(sheet_name=aba), not an empty frame."""
    import pytest as _pytest

    from pyield_spark.sources.xlsx import read_xlsx, write_minimal_xlsx

    path = str(tmp_path / "wb.xlsx")
    write_minimal_xlsx(path, {"Aba 1": [["a", "b"]]})
    with _pytest.raises(Exception, match="not found"):
        read_xlsx(spark, path, sheet="Aba Errada").collect()

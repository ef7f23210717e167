"""The reference-shaped namespace (pyield_spark.api) — the "a reference
user could switch" contract."""

import datetime as dt

import pytest

import pyield_spark.api as yd

# the reference's FULL public __init__ surface
# (/root/reference/pyield/__init__.py:25-50, everything but
# __version__). Round 5: the submodule trees (b3/di1/futuro/ipca/
# selic/tpf) are real namespaces bound to implemented equivalents —
# fetch-only wrappers keep the parse/transform half per MIGRATION.md.
REFERENCE_NAMES = [
    "agora",
    "b3",
    "di1",
    "di_over",
    "du",
    "forward",
    "forwards",
    "forwards_expr",
    "futuro",
    "hoje",
    "Interpolador",
    "interpolar",
    "ipca",
    "lft",
    "ltn",
    "ntnb",
    "ntnb1",
    "ntnbp",
    "ntnc",
    "ntnf",
    "ptax",
    "ptax_serie",
    "selic",
    "tpf",
]


@pytest.mark.parametrize("name", REFERENCE_NAMES)
def test_reference_name_exposed(name):
    assert hasattr(yd, name), f"api facade is missing reference name {name}"


def test_submodule_trees_bind_real_implementations(spark, tmp_path):
    """The round-5 namespaces are live code paths, not stubs: drive one
    member per tree end-to-end on a tiny input."""
    import zipfile

    # yd.tpf.secundario: monthly zip → gold frame
    hdr = (
        "DATA MOV;SIGLA;CODIGO;CODIGO ISIN;EMISSAO;VENCIMENTO;NUM DE OPER;"
        "QUANT NEGOCIADA;VALOR NEGOCIADO;PU MIN;PU MED;PU MAX;PU LASTRO;"
        "VALOR PAR;TAXA MIN;TAXA MED;TAXA MAX"
    )
    row = (
        "02/06/2003;LFT;211120;X;17/05/2000;11/06/2003;1;10;1,0;1,0;2,5;"
        "1,0;1,0;1,0;0,0;0,0;0,0"
    )
    z = tmp_path / "neg.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("NegT.csv", (hdr + "\n" + row + "\n").encode("latin1"))
    out = yd.tpf.secundario.mensal(yd.tpf.secundario.zip_para_silver(spark, str(z)))
    [r] = out.collect()
    assert r.financeiro == 25.0  # 10 * 2.5

    # yd.futuro.historico == the golden-verified enrichment transform
    from pyield_spark.analytics.futuro import enriquecer

    assert yd.futuro.historico is enriquecer

    # yd.di_over: fixed-width rate file
    p = tmp_path / "rate.txt"
    p.write_text("00001315\n")
    assert yd.di_over(spark, str(p)).collect()[0].taxa == 0.1315


def test_family_members():
    # one signature-level probe per family: the scalar twins answer with
    # reference docstring goldens (full goldens in test_bonds.py /
    # test_scalar_parity.py — here we pin the NAMES)
    assert callable(yd.ltn.pu) and callable(yd.ltn.taxa)
    assert callable(yd.ntnf.premio_limpo) and callable(yd.ntnf.datas_pagamento)
    assert callable(yd.ntnb.taxas_zero) and callable(yd.ntnb.vna_projetado)
    assert callable(yd.ntnbp.dv01) and callable(yd.ntnbp.cotacao)
    assert callable(yd.lft.taxa) and callable(yd.lft.cotacao)
    assert callable(yd.ntnc.cotacao_df) and callable(yd.ntnb1.fluxos_caixa)


def test_interpolador_flat_forward_matches_scalar_twin():
    """Constructor order mirrors the reference (dias_uteis, taxas,
    metodo, extrapolar); __call__ is the scalar shortcut."""
    interp = yd.Interpolador([126, 252, 504], [0.11, 0.115, 0.12], "flat_forward")
    from pyield_spark import scalar

    for du_alvo in (50, 126, 200, 252, 400, 504):
        assert interp(du_alvo) == scalar.interpolar_taxa(
            [(126, 0.11), (252, 0.115), (504, 0.12)], du_alvo
        )
    # long-end ladder: NaN without extrapolar (reference returns NaN,
    # not None — interpolador.py:252-257), last rate with it
    import math

    assert math.isnan(interp(600))
    assert yd.Interpolador([126], [0.11], "flat_forward", extrapolar=True)(600) == 0.11


def test_interpolador_reference_edge_cases():
    """Reference class semantics (interpolador.py:62-80, 252-253):
    negative du -> NaN; null vertices dropped at construction;
    duplicate du dedupes keep='last'."""
    import math

    interp = yd.Interpolador([126, 252], [0.11, 0.115])
    assert math.isnan(interp(-10))
    # null vertex dropped, not a crash
    assert yd.Interpolador([126, None], [0.11, 0.12])(126) == 0.11
    # null TAXA also drops its vertex: curve shrinks to [(126, 0.11)],
    # so 300 is beyond the long end -> NaN without extrapolar
    assert math.isnan(yd.Interpolador([126, 252], [0.11, None])(300))
    # keep-last: the later duplicate wins (reference unique keep='last')
    assert yd.Interpolador([10, 10], [0.05, 0.03])(10) == 0.03


def test_interpolador_reference_docstring_goldens():
    """Published decimals from the reference class docstring
    (interpolador.py:29-51): linear 0.0475, flat-forward
    0.04833068080970859, nan beyond the curve, nan for negative du,
    extrapolated long end 0.055."""
    import math

    dus, txs = [30, 60, 90], [0.045, 0.05, 0.055]
    assert yd.Interpolador(dus, txs, "linear")(45) == 0.0475
    ff = yd.Interpolador(dus, txs, "flat_forward")
    assert ff(45) == 0.04833068080970859
    assert math.isnan(ff(100))
    assert math.isnan(ff(-10))
    assert yd.Interpolador(dus, txs, "flat_forward", extrapolar=True)(100) == 0.055


def test_interpolador_rejects_unknown_method():
    with pytest.raises(ValueError):
        yd.Interpolador([126], [0.11], "cubic")


def test_scalar_golden_through_facade():
    # LTN docstring golden via the facade path (ltn.py:160-168)
    pu = yd.ltn.pu(dt.date(2024, 7, 5), dt.date(2030, 1, 1), 0.12145)
    assert pu == pytest.approx(535.279902, abs=1e-6)


def test_interpolar_df_op_reference_docstring_golden(spark):
    """Published decimals from the reference's top-level yd.interpolar
    docstring (interpolador.py:356-400): curve (5,0.10)(20,0.12)
    (50,0.13), targets 10 and 25 -> 0.113293 / 0.123323 (6dp shown)."""
    curve = spark.createDataFrame(
        [(1, 5, 0.10), (1, 20, 0.12), (1, 50, 0.13)],
        "g INT, du LONG, taxa DOUBLE",
    )
    targets = spark.createDataFrame([(1, 10), (1, 25)], "g INT, du_alvo LONG")
    out = yd.interpolar(
        targets, curve, du_col="du_alvo", curve_du="du", curve_rate="taxa", by="g"
    )
    got = {r.du_alvo: round(r.taxa_interpolada, 6) for r in out.collect()}
    assert got == {10: 0.113293, 25: 0.123323}


def test_facade_df_op_matches_scalar_twin(spark):
    """The facade's DataFrame members are the real distributed ops:
    yd.ntnf.price on a 1-bond frame reproduces the scalar twin
    bit-for-bit (same STN chain on both paths)."""
    liq, ven, taxa = dt.date(2024, 8, 23), dt.date(2035, 1, 1), 0.116586
    bonds = spark.createDataFrame(
        [(1, liq, ven, taxa)], "id INT, liq DATE, ven DATE, taxa DOUBLE"
    )
    [row] = yd.ntnf.price(
        bonds, ["id"], settlement="liq", maturity="ven", taxa="taxa"
    ).collect()
    assert row.pu == yd.ntnf.pu(liq, ven, taxa)


def test_llm_facade_names_resolve():
    """Every name in the pyield_spark.llm namespaces is a real callable
    (or Column builder) from the operator modules — the facade can't
    silently drift from the implementations."""
    import pyield_spark.llm as llm

    for ns_name in (
        "dedup", "cluster", "similarity", "text", "vocab", "sample",
        "media", "skew",
    ):
        ns = getattr(llm, ns_name)
        names = [n for n in vars(ns) if not n.startswith("_")]
        assert names, ns_name
        for n in names:
            assert callable(getattr(ns, n)), f"{ns_name}.{n}"

"""Scalar/DataFrame dual-API parity (§1.1) — the reference's
expression-vs-scalar test pattern (tests/tpf/test_expr_titulos.py)."""

import datetime as dt

from pyield_spark import scalar
from pyield_spark import du
from pyield_spark.bonds.pricing import ltn_pu_expr
from pyield_spark.bonds.pricing import ntnb_cotacao as ntnb_cotacao_df


def test_ltn_scalar_goldens():
    assert scalar.ltn_pu(dt.date(2024, 7, 5), dt.date(2030, 1, 1), 0.12145) == 535.279902
    assert scalar.ltn_pu(dt.date(2008, 5, 21), dt.date(2010, 7, 1), 0.143600009) == 753.315323
    assert scalar.ltn_taxa(dt.date(2024, 7, 5), dt.date(2030, 1, 1), 535.279902) == 0.12145


def test_ntnb_scalar_goldens():
    assert scalar.ntnb_cotacao(dt.date(2024, 5, 31), dt.date(2035, 5, 15), 0.061490) == 0.993651
    assert scalar.ntnb_cotacao(dt.date(2008, 5, 21), dt.date(2010, 8, 15), 0.082900009) == 0.970813


def test_scalar_matches_dataframe(spark):
    cases = [
        (dt.date(2024, 7, 5), dt.date(2030, 1, 1), 0.12145),
        (dt.date(2025, 3, 13), dt.date(2027, 1, 1), 0.148307),
    ]
    df = spark.createDataFrame(cases, "liq DATE, ven DATE, taxa DOUBLE")
    df = du.contar(df, "liq", "ven")
    got = {
        (r.liq, r.ven): r.pu
        for r in df.withColumn("pu", ltn_pu_expr("dias_uteis", "taxa")).collect()
    }
    for liq, ven, taxa in cases:
        assert got[(liq, ven)] == scalar.ltn_pu(liq, ven, taxa)


def test_ntnb_scalar_matches_dataframe(spark):
    cases = [
        (1, dt.date(2024, 5, 31), dt.date(2035, 5, 15), 0.061490),
        (2, dt.date(2024, 8, 15), dt.date(2032, 8, 15), 0.05929),
    ]
    df = spark.createDataFrame(
        cases, "id INT, data_liquidacao DATE, data_vencimento DATE, taxa DOUBLE"
    )
    got = {r.id: r.cotacao for r in ntnb_cotacao_df(df, ["id"]).collect()}
    for i, liq, ven, taxa in cases:
        assert got[i] == scalar.ntnb_cotacao(liq, ven, taxa)


def test_pu_from_vna_parity():
    assert scalar.pu_from_vna(4738.922274, 0.886713) == scalar.truncar(
        scalar.truncar(4738.922274, 6) * scalar.truncar(0.886713, 6), 6
    )


def test_ntnbp_scalar_goldens():
    # reference doctest goldens: pyield/tpf/titulos/ntnbp.py:30-33,55-58,140-146
    liq, ven = dt.date(2025, 12, 2), dt.date(2029, 5, 15)
    cot = scalar.ntnbp_cotacao(liq, ven, 0.0777)
    assert cot == 0.77463
    pu = scalar.ntnbp_pu(4567.033825, cot)
    assert pu == 3537.761411
    assert scalar.ntnbp_dv01(liq, ven, 0.0777, pu) == 1.120055806382451


def test_ntnbp_scalar_matches_dataframe(spark):
    from pyield_spark.bonds.pricing import (
        ntnbp_cotacao_expr,
        ntnbp_dv01_expr,
        pu_from_vna_expr,
    )
    from pyspark.sql import functions as F

    cases = [
        (dt.date(2025, 12, 2), dt.date(2029, 5, 15), 0.0777, 4567.033825),
        (dt.date(2024, 3, 8), dt.date(2031, 5, 15), 0.0612, 4321.123456),
    ]
    df = spark.createDataFrame(cases, "liq DATE, ven DATE, taxa DOUBLE, vna DOUBLE")
    df = du.contar(df, "liq", "ven")
    rows = (
        df.withColumn("cotacao", ntnbp_cotacao_expr("dias_uteis", "taxa"))
        .withColumn("pu", pu_from_vna_expr("vna", "cotacao"))
        .withColumn("dv01", ntnbp_dv01_expr("dias_uteis", "taxa", "pu"))
        .collect()
    )
    for r in rows:
        assert r.cotacao == scalar.ntnbp_cotacao(r.liq, r.ven, r.taxa)
        assert r.pu == scalar.ntnbp_pu(r.vna, r.cotacao)
        # raw dv01 involves pow whose last ulp differs JVM vs libm;
        # the query-level bound is pround6 — assert at that grain
        assert scalar._pround(r.dv01, 6) == scalar._pround(
            scalar.ntnbp_dv01(r.liq, r.ven, r.taxa, r.pu), 6
        )


def test_payment_dates_month_end_clamp(spark):
    """Day-31 maturity: scalar schedule must equal the vector
    add_months walk (clamp to month end, each step from maturity)."""
    from pyield_spark.bonds.cashflows import explode_payment_dates
    from pyield_spark.scalar import _payment_dates

    liq, ven = dt.date(2024, 1, 10), dt.date(2026, 8, 31)
    df = spark.createDataFrame([(liq, ven)], "liq DATE, ven DATE")
    vec = sorted(
        r.data_pagamento
        for r in explode_payment_dates(df, "liq", "ven", 6).collect()
    )
    assert _payment_dates(liq, ven, 6) == vec
    assert dt.date(2025, 2, 28) in vec  # the clamped step


def test_vna_projetado_goldens():
    # reference doctests: tpf/vna/ntnb.py:124-131, tpf/vna/ntnc.py:143-150
    assert scalar.vna_projetado(dt.date(2026, 6, 15), 4731.856412, 0.45) == 4731.856412
    assert scalar.vna_projetado(dt.date(2026, 6, 30), 4731.856412, 0.45) == 4742.491138
    assert scalar.vna_projetado(dt.date(2008, 5, 21), 1726.9264599, 0.464) == 1728.461136
    assert (
        scalar.vna_projetado(dt.date(2026, 6, 1), 6693.537239, 0.30, day_start=1)
        == 6693.537239
    )
    assert (
        scalar.vna_projetado(dt.date(2026, 6, 16), 6693.537239, 0.30, day_start=1)
        == 6703.570025
    )
    assert (
        scalar.vna_projetado(dt.date(2008, 5, 21), 2102.8055189, 1.754, day_start=1)
        == 2126.473734
    )


def test_vna_projetado_scalar_matches_dataframe(spark):
    from pyield_spark.bonds.vna import vna_projetado_expr

    cases = [
        (dt.date(2026, 6, 30), 4731.856412, 0.45, 15),
        (dt.date(2026, 6, 10), 4731.856412, 0.45, 15),  # day < 15 branch
        (dt.date(2008, 5, 21), 2102.8055189, 1.754, 1),
    ]
    for data, base, pct, ds in cases:
        df = spark.createDataFrame(
            [(data, base, pct)], "data DATE, base DOUBLE, pct DOUBLE"
        )
        got = df.select(
            vna_projetado_expr("data", "base", "pct", day_start=ds).alias("v")
        ).collect()[0].v
        assert got == scalar.vna_projetado(data, base, pct, day_start=ds)


def test_interpolar_taxa_scalar_vs_distributed(spark):
    """The public scalar interpolar_taxa must agree with BOTH
    distributed routes over a randomized curve (exact hits, below-min,
    above-max, duplicate vertices), to float tolerance (JVM vs libm pow
    differ in the last ulp)."""
    import numpy as np
    import pytest

    from pyield_spark.curves.interpolate import interpolar
    from pyield_spark.scalar import interpolar_taxa

    rng = np.random.default_rng(5)
    verts = [
        (int(rng.integers(0, 1000)), float(np.round(rng.uniform(0.05, 0.15), 6)))
        for _ in range(20)
    ]
    targets = [None] + [int(x) for x in rng.integers(-20, 1100, 60)] + [
        verts[0][0], verts[5][0]  # exact hits
    ]
    for method in ("flat_forward", "linear"):
        for extrapolar in (False, True):
            exp = {
                i: interpolar_taxa(verts, t, method, extrapolar)
                for i, t in enumerate(targets)
            }
            tgt = spark.createDataFrame(
                [(i, t) for i, t in enumerate(targets)], "tid long, du_alvo long"
            )
            cur = spark.createDataFrame(verts, "du long, taxa double")
            for dist in ("shuffle", "broadcast"):
                got = {
                    r.tid: r.taxa_interpolada
                    for r in interpolar(
                        tgt, cur, du_col="du_alvo", curve_du="du",
                        curve_rate="taxa", method=method,
                        extrapolar=extrapolar, distribution=dist,
                    ).collect()
                }
                for i in exp:
                    if exp[i] is None:
                        assert got[i] is None, (method, extrapolar, dist, i)
                    else:
                        assert got[i] == pytest.approx(exp[i], rel=1e-12), (
                            method, extrapolar, dist, i,
                        )


def test_lft_docstring_goldens():
    """All five published LFT decimals (pyield/tpf/titulos/lft.py
    docstrings): cotacao incl. the negative-rate 2008 case, and the
    root-found implied taxa (which is NOT the priced rate — the
    truncated chain is a step function)."""
    import datetime as dt

    from pyield_spark import scalar as sc

    assert sc.lft_cotacao(dt.date(2024, 7, 24), dt.date(2030, 9, 1), 0.001717) == 0.989645
    assert sc.lft_cotacao(dt.date(2008, 5, 21), dt.date(2014, 3, 7), -0.000200009) == 1.001158
    assert sc.lft_taxa(
        dt.date(2024, 7, 24), dt.date(2030, 9, 1), 15785.324502, 15621.867466
    ) == 0.00171691
    assert sc.lft_taxa(
        dt.date(2024, 7, 24), dt.date(2025, 3, 1), 15785.324502, 15774.132706
    ) == 0.00115966
    assert sc.lft_taxa(
        dt.date(2008, 5, 21), dt.date(2014, 3, 7), 3451.215345, 3426.649594
    ) == 0.00123443

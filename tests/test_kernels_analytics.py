"""K4/K5 kernels and analytics pipelines: invariants and goldens."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pyield_spark.analytics.futuro import enrich, month_from_code_expr, with_vencimento
from pyield_spark.analytics.selic import probabilities
from pyield_spark.bonds.bootstrap import bootstrap_zero_curve, implied_rates
from pyield_spark.bonds.pricing import price_coupon_bond


def test_implied_rate_roundtrip(spark):
    """K4: bisection recovers the pricing rate through the PU."""
    bonds = spark.createDataFrame(
        [
            (1, dt.date(2024, 5, 15), dt.date(2027, 1, 1), 0.10),
            (2, dt.date(2024, 5, 15), dt.date(2030, 1, 1), 0.1234),
        ],
        "id INT, liq DATE, ven DATE, taxa DOUBLE",
    )
    priced = price_coupon_bond(bonds, ["id"], settlement="liq", maturity="ven")
    full = bonds.join(priced, "id")
    got = {
        r.id: r.taxa_implicita
        for r in implied_rates(full, ["id"], settlement="liq", maturity="ven").collect()
    }
    assert got[1] == pytest.approx(0.10, abs=1e-7)
    assert got[2] == pytest.approx(0.1234, abs=1e-7)


def test_bootstrap_single_flow_closed_form(spark):
    """K5: vertices with no prior coupons have a closed-form zero."""
    curve = spark.createDataFrame(
        [("g", 60, 0.10), ("g", 126, 0.11)], "grupo STRING, du INT, taxa DOUBLE"
    )
    got = {
        r.du: r.taxa_zero
        for r in bootstrap_zero_curve(curve, "grupo", "du", "taxa").collect()
    }
    for du, par in [(60, 0.10), (126, 0.11)]:
        coupon = 100.0 * ((1 + par) ** 0.5 - 1)
        z_expected = ((100.0 + coupon) / 100.0) ** (252.0 / du) - 1
        assert got[du] == pytest.approx(z_expected, abs=1e-9)


def test_bootstrap_reprices_par(spark):
    """K5 invariant: par bonds discounted at the bootstrapped zeros
    price back to 100."""
    curve = spark.createDataFrame(
        [("g", 126, 0.10), ("g", 252, 0.11), ("g", 378, 0.12)],
        "grupo STRING, du INT, taxa DOUBLE",
    )
    rows = sorted(
        bootstrap_zero_curve(curve, "grupo", "du", "taxa").collect(),
        key=lambda r: r.du,
    )
    dus = [r.du for r in rows]
    zs = [r.taxa_zero for r in rows]

    def z_at(du):
        if du <= dus[0]:
            return zs[0]
        for i in range(1, len(dus)):
            if du <= dus[i]:
                w = (du - dus[i - 1]) / (dus[i] - dus[i - 1])
                return zs[i - 1] + w * (zs[i] - zs[i - 1])
        return zs[-1]

    for r in rows:
        par = r.taxa
        coupon = 100.0 * ((1 + par) ** 0.5 - 1)
        flows = list(range(r.du, 0, -126))[::-1]
        pv = sum(coupon / (1 + z_at(d)) ** (d / 252.0) for d in flows[:-1])
        pv += (100.0 + coupon) / (1 + z_at(r.du)) ** (r.du / 252.0)
        assert pv == pytest.approx(100.0, abs=1e-6)


def test_month_code_roundtrip(spark):
    df = spark.createDataFrame([("F",), ("G",), ("Z",), ("E",)], "c STRING")
    got = [r.m for r in df.select(month_from_code_expr("c").alias("m")).collect()]
    assert got == [1, 2, 12, None]


def test_vencimento_roll(spark):
    # DI1F25 → 2025-01-01 (holiday) rolls to 2025-01-02 (docstring golden:
    # pyield/futuro/contratos.py vencimento_expr examples)
    df = spark.createDataFrame([("DI1F25",), ("di1g25",)], "codigo_negociacao STRING")
    got = sorted(
        r.data_vencimento
        for r in with_vencimento(df, "codigo_negociacao", "DI1").collect()
    )
    assert got == [dt.date(2025, 1, 2), dt.date(2025, 2, 3)]


def test_probabilities_invariants(spark):
    opts = spark.createDataFrame(
        [
            (dt.date(2025, 12, 11), -50, 60.0),
            (dt.date(2025, 12, 11), -25, 35.0),
            (dt.date(2025, 12, 11), 0, 10.0),
            (dt.date(2026, 1, 29), -25, 80.0),
            (dt.date(2026, 1, 29), 0, 30.0),
        ],
        "data_expiracao DATE, variacao_strike_bps INT, preco_ajuste DOUBLE",
    )
    out = probabilities(opts).collect()
    by_meeting = {}
    for r in out:
        by_meeting.setdefault(r.data_expiracao, []).append(r)
    for rows in by_meeting.values():
        assert sum(r.prob for r in rows) == pytest.approx(1.0, abs=1e-5)
        assert max(r.prob_acumulada for r in rows) == pytest.approx(1.0, abs=1e-6)
    ranks = {r.data_expiracao: r.rank_reuniao for r in out}
    assert ranks[dt.date(2025, 12, 11)] == 1 and ranks[dt.date(2026, 1, 29)] == 2


def test_curva_pre_composition(spark, sf_dir):
    """§7 step 6: LTN ∪ bootstrap with anti-join — no duplicate vertices,
    short end sourced from LTN."""
    from pyield_spark.queries import QUERIES, load_all

    load_all()
    out = QUERIES["q_curva_pre"](spark, sf_dir)
    rows = out.collect()
    seen = {}
    for r in rows:
        key = (r.grupo, r.du)
        assert key not in seen, f"duplicate vertex {key}"
        seen[key] = r.fonte
    assert all(f == "LTN" for (g, du), f in seen.items() if du <= 100)
    assert any(f == "NTN-F" for f in seen.values())

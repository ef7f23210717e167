"""NTN-B total-return decomposition golden: the columnar pipeline is
pinned value-by-value against an independent plain-Python replay of the
reference algorithm (docs/articles/ntnb_total_return/utils.py:13-118 —
reverse-sorted calc-date ladder, cupons added for every period except
the final-ending one, deslocar(d, 0) adjustments, backward-as-of VNA)
built on the engine's own SCALAR twins — the same two-implementations
strategy the mask-sheet and COPOM goldens use."""

import bisect
import datetime as dt

import pytest
from pyspark.sql import functions as F

from pyield_spark import du, scalar
from pyield_spark.analytics.total_return import (
    TAXA_REINVESTIMENTO_CUPOM,
    decompor_retorno_ntnb,
)
from pyield_spark.bonds.pricing import NTNB_CUPOM

INICIAL = dt.date(2025, 1, 10)
FINAL = dt.date(2026, 7, 25)
VEN = dt.date(2027, 8, 15)

# series domain: every business day around the position window (novo
# regime — all dates are past the 2023-12-26 transition)
_BDAYS = du.gerar(dt.date(2024, 12, 1), dt.date(2026, 12, 31))


def _vna(d: dt.date) -> float:
    return 4000.0 + (d - dt.date(2025, 1, 1)).days * 0.5


def _taxa(d: dt.date) -> float:
    return 0.06 + ((d - dt.date(2025, 1, 1)).days % 90) / 10000.0


def _vna_asof(d: dt.date) -> float:
    """Backward as-of over the series domain (the reference's
    _obter_vna_pagamento <=-max fallback)."""
    i = bisect.bisect_right(_BDAYS, d) - 1
    return _vna(_BDAYS[i])


def _reference_replay():
    """The reference loop, re-expressed independently of the pipeline:
    one dict per period keyed by the RAW (inicio, fim) pair."""
    # coupon dates: ven - 6k months, strictly after INICIAL, <= FINAL
    cps = []
    k = 1
    while True:
        d = scalar._add_months(VEN, -6 * k)
        if d <= INICIAL:
            break
        if d <= FINAL:
            cps.append(d)
        k += 1
    datas = sorted([INICIAL, FINAL, *cps], reverse=True)
    out = {}
    for idx in range(len(datas) - 1):
        cup = 0.0 if idx == 0 else TAXA_REINVESTIMENTO_CUPOM
        ini_c = du.deslocar_scalar(datas[idx + 1], 0)
        fim_c = du.deslocar_scalar(datas[idx], 0)
        vna_i, vna_f = _vna(ini_c), _vna(fim_c)
        tx_i, tx_f = _taxa(ini_c), _taxa(fim_c)
        c_i = scalar.ntnb_cotacao(ini_c, VEN, tx_i)
        c_f = scalar.ntnb_cotacao(fim_c, VEN, tx_f) + cup
        c_h = scalar.ntnb_cotacao(fim_c, VEN, tx_i) + cup
        out[(datas[idx + 1], datas[idx])] = {
            "cupom": cup,
            "retorno_total": (c_f * vna_f) / (c_i * vna_i) - 1.0,
            "retorno_inflacao": vna_f / vna_i,
            "retorno_mm": c_f / c_h,
            "retorno_real": c_h / c_i,
            "valor_pagamento": (
                _vna_asof(datas[idx]) * NTNB_CUPOM if datas[idx] in cps else None
            ),
        }
    return out


@pytest.fixture(scope="module")
def decomposed(spark):
    positions = spark.createDataFrame(
        [(1, INICIAL, FINAL, VEN)],
        "bond_id long, data_inicial date, data_final date, data_vencimento date",
    )
    vna = spark.createDataFrame(
        [(d, _vna(d)) for d in _BDAYS], "data date, vna double"
    )
    taxas = spark.createDataFrame(
        [(d, VEN, _taxa(d)) for d in _BDAYS],
        "data date, data_vencimento date, taxa double",
    )
    return {
        (r["data_inicio"], r["data_fim"]): r
        for r in decompor_retorno_ntnb(
            positions, vna, taxas, ["bond_id"]
        ).collect()
    }


def test_ladder_shape(decomposed):
    """2025-02-15 / 2025-08-15 / 2026-02-15 coupons inside
    (2025-01-10, 2026-07-25] -> 4 periods; 2026-08-15 is past final."""
    assert len(decomposed) == 4
    fims = sorted(f for _, f in decomposed)
    assert fims == [
        dt.date(2025, 2, 15), dt.date(2025, 8, 15),
        dt.date(2026, 2, 15), FINAL,
    ]


def test_matches_reference_replay(decomposed):
    expected = _reference_replay()
    assert set(decomposed) == set(expected)
    for key, want in expected.items():
        got = decomposed[key]
        for col in (
            "retorno_total", "retorno_inflacao", "retorno_mm", "retorno_real"
        ):
            assert got[col] == pytest.approx(want[col], abs=1e-13), (key, col)
        assert got["cupom"] == want["cupom"], key
        if want["valor_pagamento"] is None:
            assert got["valor_pagamento"] is None, key
        else:
            assert got["valor_pagamento"] == pytest.approx(
                want["valor_pagamento"], abs=1e-9
            ), key
        assert got["checagem_ok"] is True, key


def test_cupom_only_on_coupon_ending_periods(decomposed):
    """The period ending at data_final carries cupom 0 (the reference's
    indice == 0 branch); every coupon-ending period carries the
    reinvestment rate."""
    for (_, fim), r in decomposed.items():
        if fim == FINAL:
            assert r["cupom"] == 0.0 and r["valor_pagamento"] is None
        else:
            assert r["cupom"] == TAXA_REINVESTIMENTO_CUPOM
            assert r["valor_pagamento"] is not None


def test_adjusted_dates_roll_forward(decomposed):
    """2025-02-15 is a Saturday: the period boundary adjusts to Monday
    the 17th, while valor_pagamento uses the BACKWARD as-of VNA at the
    raw date (Friday the 14th) — the reference's two distinct lookups."""
    r = {f: row for (_, f), row in decomposed.items()}[dt.date(2025, 2, 15)]
    assert r["data_fim_util"] == dt.date(2025, 2, 17)
    assert r["valor_pagamento"] == pytest.approx(
        _vna(dt.date(2025, 2, 14)) * NTNB_CUPOM, abs=1e-9
    )

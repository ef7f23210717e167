"""COPOM probability model parity against the reference's REAL CPM
fixture (pyield tests/selic/data/cpm_29012025.parquet: 13 call strikes
over 3 meetings, 8 priced) under the reference tests' own conditions (taxa_di1
monkeypatched to 0 → discount factor 1).

Round-6 review fix: the previous port differenced adjacent strike
prices — a model the reference does not contain anywhere. The faithful
B3 Manual §3.5 computation is prob = discounted settlement price
normalized per meeting (pyield/selic/probabilities.py:193-206); this
file pins it value-by-value against an independent pure-Python
restatement of the reference formula, plus the invariants the
reference's own test suite asserts.
"""

from __future__ import annotations

import math

import duckdb
import pytest

FIXTURE = "/root/reference/tests/selic/data/cpm_29012025.parquet"


@pytest.fixture(scope="module")
def cpm_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT ExpiryDate, StrikeChangeBps, SettlementPrice, BDaysToExp
        FROM '{FIXTURE}'
        WHERE OptionType = 'call' AND SettlementPrice IS NOT NULL
        ORDER BY ExpiryDate, StrikeChangeBps
        """
    ).fetchall()
    con.close()
    assert rows, "reference fixture missing"
    return rows


def _expected(rows):
    """The reference formula, restated independently: prob_bruta =
    price · 1.0 / 100, normalized per meeting, cumsum in strike order."""
    by_meeting: dict = {}
    for exp, bps, price, _du in rows:
        by_meeting.setdefault(exp, []).append((bps, price / 100.0))
    out = {}
    for exp, items in by_meeting.items():  # items already strike-ordered
        total = sum(p for _, p in items)
        acc = 0.0
        for bps, p in items:
            acc += p
            out[(exp, bps)] = (p / total, acc / total)
    return out


def test_reference_fixture_probabilities(spark, cpm_rows):
    from pyield_spark.analytics.selic import probabilities

    df = spark.createDataFrame(
        [(str(e), int(b), float(p), int(d)) for e, b, p, d in cpm_rows],
        "data_expiracao string, variacao_strike_bps int, "
        "preco_ajuste double, dias_uteis int",
    )
    got = {
        (r["data_expiracao"], r["variacao_strike_bps"]): (
            r["prob"], r["prob_acumulada"], r["rank_reuniao"],
            r["prob_bruta"], r["fator_desconto"],
        )
        for r in probabilities(df).collect()
    }
    exp = _expected([(str(e), b, p, d) for e, b, p, d in cpm_rows])
    assert len(got) == len(exp) == 8  # 13 call rows, 5 null prices drop
    for k, (prob, cum) in exp.items():
        g_prob, g_cum, _rk, g_bruta, g_fator = got[k]
        # the engine rounds prob/prob_acumulada to 6dp on output (the
        # documented oracle-portability deviation) — compare within the
        # rounding half-width
        assert abs(g_prob - prob) <= 5.0000001e-7, (k, g_prob, prob)
        assert abs(g_cum - cum) <= 5.0000001e-7, (k, g_cum, cum)
        assert g_fator == 1.0
        assert g_bruta >= 0.0

    # the reference suite's invariants (tests/selic/test_probabilities.py)
    meetings: dict = {}
    for (exp_d, bps), (prob, cum, rk, _b, _f) in got.items():
        meetings.setdefault(exp_d, []).append((bps, prob, cum, rk))
    for exp_d, vals in meetings.items():
        vals.sort()
        # sums of 6dp-ROUNDED probs drift up to n strikes x half-width;
        # the unrounded parity is pinned per value above
        assert abs(sum(p for _, p, _c, _r in vals) - 1.0) < 5e-6
        cums = [c for _, _p, c, _r in vals]
        assert abs(cums[-1] - 1.0) <= 5.0000001e-7
        assert all(b >= a - 1e-12 for a, b in zip(cums, cums[1:]))
    # two meetings survive the null-price filter (the 2025-03-20 strikes
    # are all unpriced — the reference excludes such meetings entirely)
    assert sorted({rk for vals in meetings.values() for *_a, rk in vals}) == [1, 2]


def test_discount_factor_formula(spark):
    """fator_desconto = exp(du/252 · ln(1+taxa)) when a DI1 rate column
    is supplied (B3 pricing factor; probabilities.py:168-176)."""
    from pyield_spark.analytics.selic import probabilities

    df = spark.createDataFrame(
        [("m1", 0, 60.0, 21, 0.12), ("m1", 25, 40.0, 21, 0.12)],
        "data_expiracao string, variacao_strike_bps int, "
        "preco_ajuste double, dias_uteis int, taxa_di1 double",
    )
    rows = probabilities(df, du="dias_uteis", taxa_di1="taxa_di1").collect()
    want = math.exp(21 / 252.0 * math.log(1.12))
    assert all(abs(r["fator_desconto"] - want) < 1e-12 for r in rows)
    # a COMMON factor cancels in the normalization
    probs = {r["variacao_strike_bps"]: r["prob"] for r in rows}
    assert abs(probs[0] - 0.6) < 1e-9 and abs(probs[25] - 0.4) < 1e-9

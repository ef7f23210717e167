"""Business-day engine vs reference docstring goldens
(pyield/du/core.py examples) and scalar/vector parity (§1.4 contract)."""

import datetime as dt

from pyspark.sql import functions as F

from pyield_spark import calendar_br as cal
from pyield_spark import du


def test_holidays_match_reference_rules():
    hs = cal.holidays("novo")
    assert dt.date(2024, 11, 20) in hs  # novo regime adds Nov 20 from 2024
    assert dt.date(2023, 11, 20) not in hs
    assert dt.date(2024, 11, 20) not in cal.holidays("antigo")
    # Easter-derived: Good Friday 2024 = Mar 29
    assert dt.date(2024, 3, 29) in hs
    # ANBIMA data quirks excluded
    assert dt.date(2000, 4, 21) not in hs


def test_contar_docstring_goldens(spark):
    df = spark.createDataFrame(
        [
            (dt.date(2024, 1, 1), dt.date(2024, 1, 5)),
            (dt.date(2024, 2, 9), dt.date(2024, 2, 12)),
        ],
        "inicio DATE, fim DATE",
    )
    got = [r.dias_uteis for r in du.contar(df, "inicio", "fim").orderBy("inicio").collect()]
    assert got == [3, 1]
    got = [
        r.dias_uteis
        for r in du.contar(df, "inicio", F.lit(dt.date(2024, 12, 31))).orderBy("inicio").collect()
    ]
    assert got == [252, 224]


def test_contar_negative_null_and_range(spark):
    df = spark.createDataFrame(
        [
            (dt.date(2024, 1, 5), dt.date(2024, 1, 1)),
            (None, dt.date(2024, 1, 1)),
            (dt.date(1850, 1, 1), dt.date(2024, 1, 1)),
        ],
        "inicio DATE, fim DATE",
    )
    got = {
        (str(r.inicio), str(r.fim)): r.dias_uteis
        for r in du.contar(df, "inicio", "fim").collect()
    }
    assert got[("2024-01-05", "2024-01-01")] == -3
    assert got[("None", "2024-01-01")] is None
    assert got[("1850-01-01", "2024-01-01")] is None  # outside calendar


def test_deslocar_roll_and_offset(spark):
    df = spark.createDataFrame(
        [(dt.date(2023, 12, 22), 1), (dt.date(2023, 12, 29), 5)], "data DATE, n INT"
    )
    got = [r.data_deslocada for r in du.deslocar(df, "data", "n").orderBy("data").collect()]
    assert got == [dt.date(2023, 12, 26), dt.date(2024, 1, 8)]


def test_scalar_vector_parity(spark):
    pairs = [
        (dt.date(2024, 1, 1), dt.date(2024, 6, 30)),
        (dt.date(2023, 12, 20), dt.date(2024, 1, 10)),  # crosses regime switch
        (dt.date(2008, 5, 21), dt.date(2010, 7, 1)),
    ]
    df = spark.createDataFrame(pairs, "inicio DATE, fim DATE")
    vec = {
        (r.inicio, r.fim): r.dias_uteis
        for r in du.contar(df, "inicio", "fim").collect()
    }
    for a, b in pairs:
        assert vec[(a, b)] == du.contar_scalar(a, b)


def test_eh_dia_util(spark):
    df = spark.createDataFrame(
        [(dt.date(2024, 11, 20),), (dt.date(2023, 11, 20),), (dt.date(2024, 1, 6),)],
        "d DATE",
    )
    got = {str(r.d): r.eh_dia_util for r in du.eh_dia_util(df, "d").collect()}
    assert got["2024-11-20"] is False  # novo-regime holiday
    assert got["2023-11-20"] is True  # pre-transition: not a holiday
    assert got["2024-01-06"] is False  # Saturday


def test_gerar_df_and_ultimo_dia_util(spark):
    from pyield_spark.du import gerar, gerar_df, ultimo_dia_util

    lo, hi = dt.date(2024, 1, 1), dt.date(2024, 1, 31)
    df_days = [r.data for r in gerar_df(spark, lo, hi).orderBy("data").collect()]
    assert df_days == gerar(lo, hi)
    assert len(df_days) == 22  # Jan 2024: 23 weekdays - Jan 1 holiday

    d = spark.createDataFrame([(dt.date(2024, 1, 6),), (dt.date(2024, 1, 5),)], "d DATE")
    got = {str(r.d): r.ultimo_dia_util for r in ultimo_dia_util(d, "d").collect()}
    assert got["2024-01-06"] == dt.date(2024, 1, 5)  # Saturday rolls back
    assert got["2024-01-05"] == dt.date(2024, 1, 5)  # already a business day


def test_ntnb_maturity_du_goldens_36y():
    """Published dias_uteis from the reference's taxas_zero docstring
    (pyield/tpf/titulos/ntnb.py:497-509, liquidação 2024-08-16): ten
    business-day counts spanning 2025→2060 — an independent golden for
    the GENERATED holiday calendar (computus + fixed dates) against the
    official list the reference ships, 36 years out."""
    import datetime as dt

    from pyield_spark import du

    want = {
        "2025-05-15": 185, "2026-08-15": 502, "2027-05-15": 687,
        "2028-08-15": 1002, "2029-05-15": 1186, "2040-08-15": 4009,
        "2045-05-15": 5196, "2050-08-15": 6511, "2055-05-15": 7700,
        "2060-08-15": 9017,
    }
    liq = dt.date(2024, 8, 16)
    got = {
        v: du.contar_scalar(liq, dt.date.fromisoformat(v)) for v in want
    }
    assert got == want


def test_scalar_out_of_calendar_returns_none():
    """Review regression: outside the generated 1990-2099 calendar the
    scalar twins must answer None (the DataFrame twins' null), never a
    holiday-blind weekday count."""
    import datetime as dt

    from pyield_spark import du

    assert du.contar_scalar(dt.date(2100, 4, 1), dt.date(2100, 5, 1)) is None
    assert du.contar_scalar(dt.date(1989, 12, 1), dt.date(1990, 2, 1)) is None
    assert du.deslocar_scalar(dt.date(2100, 1, 4), 1) is None
    # walking off the calendar edge mid-count is also None, not a guess
    assert du.deslocar_scalar(dt.date(2099, 12, 28), 10) is None
    # in-range behavior unchanged
    assert du.contar_scalar(dt.date(2024, 1, 1), dt.date(2024, 1, 8)) == 4


def test_gerar_truncates_to_calendar_like_gerar_df(spark):
    """gerar must not report weekdays outside the generated 1990-2099
    calendar as business days (holiday data does not exist there):
    2100-01-01 is a Friday AND a national holiday — an unguarded walk
    called it a business day while gerar_df returned no 2100 rows
    (round-6 review fix: the twins now agree by truncation)."""
    lo, hi = dt.date(2099, 12, 28), dt.date(2100, 1, 10)
    scalar = du.gerar(lo, hi)
    frame = [r["data"] for r in du.gerar_df(spark, lo, hi).collect()]
    assert scalar == sorted(frame)
    assert all(d.year == 2099 for d in scalar)


def test_deslocar_chained_default_alias_no_ambiguity(spark):
    """Chained shifts with the default alias must REPLACE the column
    (withColumn semantics, like contar), not emit two identically-named
    columns that make the next select ambiguous (round-6 review fix)."""
    df = spark.createDataFrame([(dt.date(2026, 8, 14),)], "d date")
    out = du.deslocar(du.deslocar(df, "d", 1), "data_deslocada", 1,
                      alias="data_deslocada")
    assert out.columns.count("data_deslocada") == 1
    # 2026-08-14 is a Friday: +1 bd -> Mon 17th, +1 bd -> Tue 18th
    assert out.collect()[0]["data_deslocada"] == dt.date(2026, 8, 18)


def test_deslocar_scalar_validates_rolagem():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rolagem"):
        du.deslocar_scalar(dt.date(2026, 8, 16), 0, "Forward")

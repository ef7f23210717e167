"""Scalar-function semantics: truncation, BR numbers, date coalesce."""

import datetime as dt
import math

from pyspark.sql import functions as F

from pyield_spark.functions import (
    br_num_expr,
    bround_expr,
    converter_datas_expr,
    pct_para_decimal_expr,
    truncar_expr,
)


def test_truncar_toward_zero(spark):
    df = spark.createDataFrame(
        [(3.14159,), (-2.567,), (float("nan"),), (None,)], "x DOUBLE"
    )
    got = [r.t for r in df.select(truncar_expr("x", 3).alias("t")).collect()]
    assert got[0] == 3.141
    assert got[1] == -2.567  # toward zero, not floor
    import math

    assert math.isnan(got[2])
    assert got[3] is None


def test_truncar_negative_floor_vs_trunc(spark):
    df = spark.createDataFrame([(-2.5678,)], "x DOUBLE")
    got = df.select(truncar_expr("x", 2).alias("t")).collect()[0].t
    assert got == -2.56  # floor would give -2.57


def test_bround_half_even(spark):
    df = spark.createDataFrame([(2.5,), (3.5,)], "x DOUBLE")
    got = [r.b for r in df.select(bround_expr("x", 0).alias("b")).collect()]
    assert got == [2.0, 4.0]


def test_br_numbers(spark):
    df = spark.createDataFrame([("1.234,56",), ("12,5",), ("bogus",)], "s STRING")
    got = [r.v for r in df.select(br_num_expr("s").alias("v")).collect()]
    assert got[0] == 1234.56
    assert got[1] == 12.5
    assert got[2] is None


def test_pct_para_decimal(spark):
    df = spark.createDataFrame([(14.1234567891,)], "p DOUBLE")
    got = df.select(pct_para_decimal_expr("p").alias("d")).collect()[0].d
    assert got == 0.1412345679  # /100 rounded 10dp half-even


def test_multi_format_dates(spark):
    df = spark.createDataFrame(
        [("05-07-2024",), ("05/07/2024",), ("2024-07-05",), ("not a date",)], "s STRING"
    )
    got = [r.d for r in df.select(converter_datas_expr("s").alias("d")).collect()]
    assert got[:3] == [dt.date(2024, 7, 5)] * 3
    assert got[3] is None


def test_relogio_tz(spark):
    """F14: agora/hoje pin to America/Sao_Paulo on both the scalar and
    the Column path, regardless of the session timezone."""
    import datetime as dt

    from pyield_spark import relogio

    now = relogio.agora()
    assert str(now.tzinfo) == "America/Sao_Paulo"
    assert relogio.hoje() == now.date() or abs(
        (relogio.hoje() - now.date()).days
    ) <= 1

    row = spark.range(1).select(
        relogio.agora_expr().alias("agora"), relogio.hoje_expr().alias("hoje")
    ).collect()[0]
    # Spark returns naive wall-clock datetimes in the session tz; the
    # expression converts to the B3 wall clock, so it must be within
    # clock skew of the scalar twin's wall time
    skew = abs(row.agora - now.replace(tzinfo=None))
    assert skew <= dt.timedelta(minutes=2)
    assert row.hoje in (now.date(), now.date() - dt.timedelta(days=1),
                        now.date() + dt.timedelta(days=1))


def test_filtrar_periodo_temporal_modes(spark):
    """Replay of the reference fetch-APIs' temporal-mode contract
    (tests/tpf/test_leilao.py::test_leiloes_rejeita_modos_temporais_
    ambiguos + test_taxas.py inverted-interval): data xor inicio/fim,
    fim needs inicio, inicio <= fim; the surviving modes filter the
    frame."""
    import datetime as dt

    import pytest

    from pyield_spark.functions.dates import filtrar_periodo

    df = spark.createDataFrame(
        [(dt.date(2025, 10, d),) for d in (1, 15, 23, 28)], "d date"
    )
    with pytest.raises(ValueError, match="data não pode ser combinado"):
        filtrar_periodo(df, "d", data="23-10-2025", inicio="01-10-2025")
    with pytest.raises(ValueError, match="fim só pode ser usado"):
        filtrar_periodo(df, "d", fim="23-10-2025")
    with pytest.raises(ValueError, match="inicio deve ser menor"):
        filtrar_periodo(df, "d", inicio="24-10-2025", fim="23-10-2025")
    with pytest.raises(ValueError, match="inválido"):
        filtrar_periodo(df, "d", data="not-a-date")

    assert filtrar_periodo(df, "d").count() == 4
    assert filtrar_periodo(df, "d", data="23-10-2025").count() == 1
    assert filtrar_periodo(df, "d", inicio="15-10-2025").count() == 3
    assert (
        filtrar_periodo(df, "d", inicio="02-10-2025", fim="23-10-2025").count() == 2
    )


def test_vna_projetado_scalar_domain():
    """Reference tests/tpf/vna/test_vna.py: empty inputs → NaN;
    non-positive (post-trunc6) base and ≤-100% (post-bround2)
    projection raise — including the precision-boundary cases the raw
    values would miss."""
    import datetime as dt
    import math

    import pytest

    from pyield_spark.scalar import vna_projetado

    d = dt.date(2025, 3, 20)
    assert math.isnan(vna_projetado(None, 4000.0, 0.5))
    assert math.isnan(vna_projetado(d, None, 0.5))
    assert math.isnan(vna_projetado(d, 4000.0, None))
    with pytest.raises(ValueError, match="VNA-base"):
        vna_projetado(d, 0.0, 0.5)
    with pytest.raises(ValueError, match="VNA-base"):
        vna_projetado(d, 1e-9, 0.5)  # trunc6 -> 0, the reference's order
    with pytest.raises(ValueError, match="inflação"):
        vna_projetado(d, 4000.0, -100.0)
    with pytest.raises(ValueError, match="inflação"):
        vna_projetado(d, 4000.0, -99.996)  # bround2 -> -100.0
    # the valid path is untouched
    assert vna_projetado(d, 4000.0, 0.5) > 4000.0


def test_raw_maturity_sql_twin(spark):
    """The one-round-trip SQL string builds the SAME maturity as the
    Column form on valid, lowercase, malformed and short tickers
    (plan-build lever, futuro.py::raw_maturity_sql)."""
    from pyspark.sql import functions as F

    from pyield_spark.analytics.futuro import raw_maturity_expr, raw_maturity_sql

    df = spark.createDataFrame(
        [("DI1F26",), ("di1x31",), ("DAPK27",), ("DI1A25",), ("DI1F2X",),
         ("DI1",), ("",), (None,), ("DI1Q00",)],
        "t string",
    )
    for contrato in ("DI1", "DAP"):
        both = df.select(
            raw_maturity_expr("t", contrato).alias("col_form"),
            F.expr(raw_maturity_sql("t", contrato)).alias("sql_form"),
        ).collect()
        for r in both:
            assert r["col_form"] == r["sql_form"], (contrato, r)


def test_round_pl_sql_and_pround_sql_spark_twins(spark):
    """SQL-string twins are value-identical to the Column forms on a
    grid-adversarial sample (the exact doubles differ from naive
    decimal division — D-suffixed literals are load-bearing)."""
    from pyspark.sql import functions as F

    from pyield_spark.functions.numbers import (
        pround_expr, pround_sql_spark, round_pl_expr, round_pl_sql,
        truncar_sql_spark,
    )

    vals = [0.141446, -0.141446, 808563725.6850001, 80856372568.49998,
            2.5, -2.5, 0.105, -0.105, 1e-12, 0.0, -0.0,
            float("nan"), float("inf"), 123.456789]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = df.select(
        round_pl_expr(F.col("x") / 100.0, 10).alias("pl_col"),
        F.expr(round_pl_sql("x / 100.0D", 10)).alias("pl_sql"),
        pround_expr(F.col("x"), 6).alias("pa_col"),
        F.expr(pround_sql_spark("x", 6)).alias("pa_sql"),
        truncar_expr(F.col("x"), 8).alias("tr_col"),
        F.expr(truncar_sql_spark("x", 8)).alias("tr_sql"),
        truncar_expr(truncar_expr(F.col("x"), 8), 8).alias("tr2_col"),
        F.expr(truncar_sql_spark(truncar_sql_spark("x", 8), 8)).alias("tr2_sql"),
    ).collect()
    for r in out:
        for a, b in ((r["pl_col"], r["pl_sql"]), (r["pa_col"], r["pa_sql"]),
                     (r["tr_col"], r["tr_sql"]), (r["tr2_col"], r["tr2_sql"])):
            if a is None or (isinstance(a, float) and math.isnan(a)):
                assert b is None or math.isnan(b)
            else:
                assert a == b, r

"""Scalar-function semantics: truncation, BR numbers, date coalesce."""

import datetime as dt

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

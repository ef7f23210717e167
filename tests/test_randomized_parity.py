"""Seeded randomized parity: vector engine vs scalar fast path on a
broad random sample (order-preservation §1.4 + semantics in one shot)."""

import datetime as dt
import random

from pyspark.sql import functions as F

from pyield_spark import du, scalar
from pyield_spark.functions.numbers import truncar_expr


def test_contar_random_parity(spark):
    rng = random.Random(42)
    base = dt.date(1995, 1, 1).toordinal()
    span = (dt.date(2030, 12, 31) - dt.date(1995, 1, 1)).days
    pairs = [
        (
            dt.date.fromordinal(base + rng.randrange(span)),
            dt.date.fromordinal(base + rng.randrange(span)),
        )
        for _ in range(500)
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], "i INT, a DATE, b DATE"
    )
    got = {r.i: r.dias_uteis for r in du.contar(df, "a", "b").collect()}
    for i, (a, b) in enumerate(pairs):
        assert got[i] == du.contar_scalar(a, b), (a, b)


def test_deslocar_random_parity(spark):
    rng = random.Random(7)
    base = dt.date(2000, 1, 1).toordinal()
    cases = [
        (dt.date.fromordinal(base + rng.randrange(9000)), rng.randrange(-30, 30))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, d, n) for i, (d, n) in enumerate(cases)], "i INT, d DATE, n INT"
    )
    got = {r.i: r.data_deslocada for r in du.deslocar(df, "d", "n").collect()}
    for i, (d, n) in enumerate(cases):
        assert got[i] == du.deslocar_scalar(d, n), (d, n)


def test_truncar_random_parity(spark):
    rng = random.Random(99)
    vals = [rng.uniform(-1e6, 1e6) for _ in range(500)] + [0.0, -0.0, 1e-7]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i INT, v DOUBLE")
    for dec in (0, 2, 6, 8):
        got = {r.i: r.t for r in df.select("i", truncar_expr("v", dec).alias("t")).collect()}
        for i, v in enumerate(vals):
            assert got[i] == scalar.truncar(v, dec), (v, dec)

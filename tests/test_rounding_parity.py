"""round_pl_expr — bit-exact Polars ``Expr.round`` semantics.

Polars rounds the SCALED double: round_ties_even(x·10^d)/10^d, with the
scale multiply performed in f64. The pure-Python twin below reproduces
that exactly (Decimal quantize HALF_EVEN on the product's exact value =
Rust's round_ties_even); the Spark expression must match it bit-for-bit
on randomized values, curated grid points, and the NegE202501 golden
case that exposed the semantics (round-5).
"""

import decimal
import random

from pyspark.sql import functions as F

from pyield_spark.functions.numbers import round_pl_expr


def _round_pl_py(x: float, d: int) -> float:
    if x != x:  # NaN
        return x
    s = float(10**d)
    y = x * s  # the f64 multiply IS part of the semantics
    q = decimal.Decimal(y).quantize(
        decimal.Decimal(1), rounding=decimal.ROUND_HALF_EVEN
    )
    return float(q) / s


def _cases() -> list[float]:
    rng = random.Random(20260814)
    vals = [
        808563725.6850001,  # the golden divergence (1233000·655.769445)
        0.125, 0.135, -0.125, 2.675, 1.005, 0.5, -0.5, 1.5, 2.5,
        0.0, -0.0, 1e-12, -1e-12, 123456.78949999999,
    ]
    vals += [rng.uniform(-1e6, 1e6) for _ in range(400)]
    vals += [rng.uniform(-1, 1) for _ in range(200)]
    # values sitting ON decimal grids (the tie-prone population)
    vals += [round(rng.uniform(-1000, 1000), rng.randint(0, 4)) for _ in range(200)]
    return vals


def test_round_pl_matches_python_twin_bitexact(spark):
    vals = _cases()
    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    for d in (0, 2, 6, 10):
        got = [
            r.y for r in df.select(round_pl_expr(F.col("x"), d).alias("y")).collect()
        ]
        want = [_round_pl_py(v, d) for v in vals]
        bad = [
            (v, g, w)
            for v, g, w in zip(vals, got, want)
            if g != w and not (g != g and w != w)
        ]
        assert not bad, (d, bad[:5])


def test_round_pl_divergence_from_exact_decimal_bround(spark):
    """The documented split: the product 808563725.6850001 sits ABOVE
    the .685 grid (exact-decimal bround(2) → .69), but ·100 in f64
    lands below the midpoint — Polars (and the reference golden) say
    .68."""
    df = spark.createDataFrame([(1233000 * 655.769445,)], "x DOUBLE")
    [r] = df.select(
        round_pl_expr(F.col("x"), 2).alias("pl"),
        F.bround(F.col("x"), 2).alias("br"),
    ).collect()
    assert r.pl == 808563725.68
    assert r.br == 808563725.69


def test_rint0_bitwise_twin_of_bround0(spark):
    """rint0_expr must equal F.bround(y, 0) BITWISE (incl. the sign of
    zero and NaN) — it replaces bround's per-row BigDecimal in every
    scaled-round/truncation hot path. Adversarial population: exact
    .5 ties, grid decimals scaled by 10^d, shortest-repr near-halves,
    |y| straddling 2^52 (where doubles are already integers), ±0, NaN,
    ±Inf, nulls."""
    import struct

    from pyield_spark.functions.numbers import rint0_expr

    rng = random.Random(20260815)
    vals: list[float | None] = [
        0.141446e8, 80856372568.49998, 808563725.6850001 * 100,
        0.0, -0.0, -0.49999999999999994, -0.5, 0.5,
        float("nan"), float("inf"), float("-inf"), None,
        2.0**52 + 0.5, 2.0**52, -(2.0**52), 2.0**53, 1e308, -1e308,
    ]
    vals += [float(i) + 0.5 for i in range(-25, 25)]
    vals += [rng.uniform(-1e12, 1e12) for _ in range(3000)]
    vals += [rng.uniform(-1, 1) * 1e10 for _ in range(3000)]
    vals += [rng.uniform(-1e16, 1e16) for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "y DOUBLE")
    rows = df.select(
        F.bround("y", 0).alias("a"), rint0_expr(F.col("y")).alias("b")
    ).collect()
    for v, r in zip(vals, rows):
        a, b = r.a, r.b
        if a is None or b is None:
            assert a is None and b is None, v
        else:
            assert struct.pack("d", a) == struct.pack("d", b), (v, a, b)

"""Property-based invariants of the numeric kernels (hypothesis,
driver-side — the Spark/scalar equivalence is covered by the seeded
parity tests; these pin the mathematical contracts)."""

import math

from hypothesis import given, settings, strategies as st

from pyield_spark import scalar
from pyield_spark.calendar_br import easter_sunday, holidays
import datetime as dt

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9
)


@given(finite, st.integers(min_value=0, max_value=10))
@settings(max_examples=200, deadline=None)
def test_truncar_properties(x, d):
    # the truncation contract is only meaningful while |x|·10^d fits the
    # double mantissa (2^53) — hypothesis found |x|~1e9 at 10dp where
    # the scaled value exceeds it and floor/divide drifts by >1 grid
    # step. Every STN rule operates far inside this bound (prices < 1e6
    # at 6dp, year fractions < 1e2 at 14dp → ≤ 1e16-ish scaled);
    # the guard documents the envelope rather than hiding it.
    if abs(x) * 10.0**d >= 2.0**52:
        return
    t = scalar.truncar(x, d)
    # toward zero never grows magnitude — except the half-ulp overshoot
    # when |x|·10^d rounds UP to the next integer in the scale multiply
    # (hypothesis: x=562949953.7307479, d=6); the relative term bounds
    # that double-rounding, shared by the reference's float kernel
    assert abs(t) <= abs(x) * (1 + 2**-52) + 1e-9
    assert math.copysign(1, t) == math.copysign(1, x) or t == 0
    # within one grid step
    assert abs(x - t) < 10.0 ** (-d) + 1e-9
    # re-truncation moves at most one further grid step (floor(N·s)/s
    # can land one ulp below the grid point, so exact idempotence is
    # unattainable in floats — the reference's kernel shares this). The
    # ulp term absorbs the rescale double-rounding at large magnitudes
    # (hypothesis: x=1048576.701333642, d=8 — the re-scaled t multiplies
    # to one ulp BELOW the grid integer, dropping a full extra step
    # minus that ulp)
    assert abs(scalar.truncar(t, d) - t) <= 10.0 ** (-d) + abs(t) * 2**-50


@given(
    st.dates(min_value=dt.date(1995, 1, 1), max_value=dt.date(2090, 12, 31)),
    st.dates(min_value=dt.date(1995, 1, 1), max_value=dt.date(2090, 12, 31)),
)
@settings(max_examples=200, deadline=None)
def test_contar_antisymmetry_and_bounds(a, b):
    from pyield_spark.du import contar_scalar

    n = contar_scalar(a, b)
    # antisymmetry holds within one holiday regime; across the
    # 2023-12-26 transition the regime follows the START date
    # (reference semantics, pyield/du/core.py:116-119), so a→b and b→a
    # legitimately count the novo-regime Nov 20 holidays differently
    transition = dt.date(2023, 12, 26)
    if (a < transition) == (b < transition):
        assert n == -contar_scalar(b, a)
    else:
        n_nov20 = sum(
            1
            for y in range(min(a, b).year, max(a, b).year + 1)
            if y >= 2024 and min(a, b) <= dt.date(y, 11, 20) < max(a, b)
        )
        assert abs(n + contar_scalar(b, a)) <= n_nov20
    days = abs((b - a).days)
    assert abs(n) <= days
    # business days can't exceed 5/7 of the span (+ boundary slack)
    assert abs(n) <= days * 5 / 7 + 2


@given(st.integers(min_value=1990, max_value=2099))
@settings(max_examples=110, deadline=None)
def test_easter_invariants(year):
    e = easter_sunday(year)
    assert e.weekday() == 6  # always a Sunday
    assert (e.month == 3 and e.day >= 22) or (e.month == 4 and e.day <= 25)


def test_holiday_regimes_nested():
    ant, nov = set(holidays("antigo")), set(holidays("novo"))
    extra = nov - ant
    assert extra and all(h.month == 11 and h.day == 20 and h.year >= 2024 for h in extra)
    assert ant <= nov

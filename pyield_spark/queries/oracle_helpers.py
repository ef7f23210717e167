"""SQL fragments that let DuckDB replicate the business-day engine.

The oracle SQL must be self-contained (the driver runs it on the raw
parquet views), so the holiday calendar is inlined as VALUES literals —
generated from the same :mod:`pyield_spark.calendar_br` rules the Spark
side uses, guaranteeing both engines see one calendar.
"""

from __future__ import annotations

import datetime as dt

from pyield_spark import calendar_br as cal


def _holiday_values(regime: str, start: dt.date, end: dt.date) -> str:
    # weekday holidays only — weekends are already non-business days
    hs = [
        h
        for h in cal.holidays(regime)
        if start <= h <= end and h.weekday() < 5
    ]
    if not hs:
        return "(DATE '1900-01-01')"  # non-empty dummy, outside every range
    return ", ".join(f"(DATE '{h.isoformat()}')" for h in hs)


def calendar_cte(start: dt.date, end: dt.date) -> str:
    """CTE bundle: ``cal`` (per-day regime bookkeeping) + ``bdinv``
    (regime, ordinal → date), mirroring calendar_br.calendar_rows.

    Anchor for the running counts is ``start`` — counts cancel in
    differences, and ordinals are only used through ``bdinv`` which is
    built from the same anchor.
    """
    return f"""
_hol_ant(d) AS (VALUES {_holiday_values("antigo", start, end)}),
_hol_nov(d) AS (VALUES {_holiday_values("novo", start, end)}),
_days AS (
  SELECT CAST(g AS DATE) AS data
  FROM generate_series(DATE '{start.isoformat()}', DATE '{end.isoformat()}', INTERVAL 1 DAY) t(g)
),
_cal0 AS (
  SELECT data,
    (dayofweek(data) BETWEEN 1 AND 5) AND data NOT IN (SELECT d FROM _hol_ant) AS is_bd_ant,
    (dayofweek(data) BETWEEN 1 AND 5) AND data NOT IN (SELECT d FROM _hol_nov) AS is_bd_nov
  FROM _days
),
cal AS (
  SELECT data, is_bd_ant, is_bd_nov,
    COALESCE(SUM(CASE WHEN is_bd_ant THEN 1 ELSE 0 END)
      OVER (ORDER BY data ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_ant,
    COALESCE(SUM(CASE WHEN is_bd_nov THEN 1 ELSE 0 END)
      OVER (ORDER BY data ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_nov
  FROM _cal0
),
bdinv AS (
  SELECT 'antigo' AS regime, cum_ant AS ordinal, data FROM cal WHERE is_bd_ant
  UNION ALL
  SELECT 'novo' AS regime, cum_nov AS ordinal, data FROM cal WHERE is_bd_nov
)""".strip()


def bd_count_sql(start_expr: str, end_expr: str) -> str:
    """Expression template: business days [start, end) with the regime
    chosen by the start date; requires joins aliased cs (cal at start)
    and ce (cal at end)."""
    return f"""CASE WHEN {start_expr} < DATE '2023-12-26'
      THEN ce.cum_ant - cs.cum_ant ELSE ce.cum_nov - cs.cum_nov END"""


def trunc_sql(x: str, decimals: int) -> str:
    """Decimal-repr-aware truncation (twin of truncar_expr): if |x| IS
    the double of a grid decimal k·10^-d, keep k; else plain floor."""
    s = f"{10**decimals}.0"
    return (
        f"sign({x}) * (CASE WHEN round(abs({x}) * {s}) / {s} = abs({x})"
        f" THEN round(abs({x}) * {s}) ELSE floor(abs({x}) * {s}) END) / {s}"
    )


TRUNC6 = trunc_sql("{x}", 6)
TRUNC8 = trunc_sql("{x}", 8)
TRUNC14 = trunc_sql("{x}", 14)


def pround_sql(x: str, decimals: int) -> str:
    """Portable half-away-from-zero round (see pround_expr rationale)."""
    s = f"{10**decimals}.0"
    return f"sign({x}) * floor(abs({x}) * {s} + 0.5) / {s}"


def trunc_decimal_sum_sql(sum_expr: str, decimals: int = 6) -> str:
    """Decimal-domain truncation of a DECIMAL aggregate (positive
    totals) — twin of trunc_decimal_sum_expr."""
    s = 10**decimals
    return (
        f"CAST(floor(CAST({sum_expr} AS DECIMAL(24,12)) * {s}) / {s}.0 AS DOUBLE)"
    )

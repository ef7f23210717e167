"""Columnar bond cash-flow generation — explode, don't loop.

The reference walks back from maturity in a Python while-loop
(pyield/tpf/titulos/_utils.py:141-165 ``gerar_datas_pagamento``: dates at
``maturity - i*interval_months`` for i=0.. while date > settlement,
exclusive start / inclusive end). Here the same set is produced fully
columnar: ``sequence(0, n)`` → ``explode`` → ``add_months(maturity,
-i*interval)`` → filter — one narrow transform, no shuffle, scales with
the fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def explode_payment_dates(
    df: DataFrame,
    settlement: str | Column,
    maturity: str | Column,
    interval_months: int = 6,
    alias: str = "data_pagamento",
) -> DataFrame:
    """One output row per payment date in (settlement, maturity].

    Rows whose settlement >= maturity produce no output (empty flow set,
    matching the reference's empty frame).
    """
    if interval_months <= 0:
        raise ValueError("interval_months must be positive")
    if isinstance(settlement, str) and isinstance(maturity, str):
        # parsed-SQL fast path (r11 build optimization): the identical
        # expression trees in 4 py4j round trips instead of ~180 —
        # every call site in the engine passes column NAMES
        liq_s = f"to_date(`{settlement}`)"
        ven_s = f"to_date(`{maturity}`)"
        iv = f"{float(interval_months)!r}D"
        return (
            df.withColumn(
                "_n_max",
                F.expr(
                    "greatest(CAST(ceil(months_between("
                    f"{ven_s}, {liq_s}) / {iv}) AS INT) + 1, 0)"
                ),
            )
            .withColumn("_i", F.expr("explode(sequence(0, _n_max))"))
            .withColumn(
                alias,
                F.expr(f"add_months({ven_s}, -_i * {interval_months})"),
            )
            .filter(F.expr(f"`{alias}` > {liq_s}"))
            .drop("_n_max", "_i")
        )
    liq = F.to_date(F.col(settlement) if isinstance(settlement, str) else settlement)
    ven = F.to_date(F.col(maturity) if isinstance(maturity, str) else maturity)

    # upper bound on #periods: months difference / interval, +2 slack;
    # the filter below trims exactly.
    n_max = (
        F.ceil(F.months_between(ven, liq) / F.lit(float(interval_months)))
        .cast("int")
        + F.lit(1)
    )
    out = (
        df.withColumn("_n_max", F.greatest(n_max, F.lit(0)))
        .withColumn("_i", F.explode(F.sequence(F.lit(0), F.col("_n_max"))))
        .withColumn(alias, F.add_months(ven, -F.col("_i") * interval_months))
        .filter(F.col(alias) > liq)
        .drop("_n_max", "_i")
    )
    return out


def coupon_flow_expr(
    pay_date: str | Column,
    maturity: str | Column,
    coupon_value: float | Column,
    final_value: float | Column,
) -> Column:
    """Flow amount: coupon everywhere, coupon+principal at maturity
    (reference: pyield/tpf/titulos/ntnf.py:268-276). Column-valued
    coupons support per-row conventions (NTN-C's 2031 12% exception,
    pyield/tpf/titulos/ntnc.py:24-40)."""
    p = F.col(pay_date) if isinstance(pay_date, str) else pay_date
    m = F.to_date(F.col(maturity) if isinstance(maturity, str) else maturity)
    cv = F.lit(coupon_value) if isinstance(coupon_value, (int, float)) else coupon_value
    fv = F.lit(final_value) if isinstance(final_value, (int, float)) else final_value
    return F.when(p == m, fv).otherwise(cv)


def coupon_flow_sql(
    pay_date: str,
    maturity: str,
    coupon_value: float,
    final_value: float,
) -> str:
    """SQL-string twin of :func:`coupon_flow_expr` for float-valued
    coupons over named columns — the identical CaseWhen/Literal tree in
    one parse (r11 build optimization). Exact double literals via repr
    (shortest round-trip decimal)."""
    return (
        f"CASE WHEN `{pay_date}` = to_date(`{maturity}`)"
        f" THEN {float(final_value)!r}D ELSE {float(coupon_value)!r}D END"
    )


def amortization_flows(
    df,
    settlement: str | Column,
    maturity: str | Column,
    n_amort: int,
    alias: str = "data_pagamento",
    value_alias: str = "valor_amortizacao",
):
    """Monthly amortization schedule — NTN-B1 Renda+/Educa+ pattern
    (240 / 60 monthly payments ending at maturity,
    pyield/tpf/titulos/ntnb1.py:28-51,55-118).

    Payment values follow the reference exactly: each amortization is
    ``trunc8(1/n_amort)`` and the FINAL payment absorbs the truncation
    remainder (``1 − trunc8(1/n)·(n−1)``, ntnb1.py:34-51) so the base-1
    fractions sum to exactly 1. Payments before settlement have already
    been received by prior holders and drop out (the schedule itself
    always spans n_amort months back from maturity).
    """
    from pyield_spark.scalar import truncar as _truncar_py

    amort = _truncar_py(1.0 / n_amort, 8)
    final = 1.0 - amort * (n_amort - 1)
    out = explode_payment_dates(df, settlement, maturity, 1, alias)
    ven = F.to_date(F.col(maturity) if isinstance(maturity, str) else maturity)
    first_pay = F.add_months(ven, -(n_amort - 1))
    return out.filter(F.col(alias) >= first_pay).withColumn(
        value_alias,
        F.when(F.col(alias) == ven, F.lit(final)).otherwise(F.lit(amort)),
    )

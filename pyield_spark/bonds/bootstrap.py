"""The two genuinely sequential kernels, as Arrow-batched pandas UDFs.

Reference (SURVEY §2.9):
- K4 root finding: bracket-growth + bisection to tol 1e-12 / 100 iters
  (pyield/tpf/titulos/_utils.py:262-348) — implied rate from price.
  Embarrassingly parallel per bond → ``mapInPandas`` over pre-exploded
  cash-flow arrays (no shuffle beyond the flow aggregation).
- K5 zero-curve bootstrap: each vertex depends on previously solved ones
  (pyield/tpf/titulos/ntnb.py:454-578) → ``applyInPandas`` keyed by the
  curve group (reference date): sequential INSIDE a group (state ≤ ~140
  vertices), parallel ACROSS groups — the 100 TB axis is #dates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from pyield_spark import du as du_mod
from pyield_spark.bonds.cashflows import coupon_flow_expr, explode_payment_dates

TOL = 1e-12
MAX_ITER = 200


def _pv(rate: float, cfs: list[float], aus: list[float]) -> float:
    return sum(cf / (1.0 + rate) ** au for cf, au in zip(cfs, aus))


def _bisect_rate(price: float, cfs: list[float], aus: list[float]) -> float:
    """Solve PV(rate) == price. PV is decreasing in rate; grow the
    bracket until it straddles, then bisect (reference contract:
    tol 1e-12, bounded iterations)."""
    lo, hi = -0.99, 1.0
    f_hi = _pv(hi, cfs, aus) - price
    it = 0
    while f_hi > 0 and hi < 1e6 and it < 60:  # price below PV(1.0) → grow
        hi *= 2
        f_hi = _pv(hi, cfs, aus) - price
        it += 1
    for _ in range(MAX_ITER):
        mid = (lo + hi) / 2.0
        if _pv(mid, cfs, aus) - price > 0:
            lo = mid
        else:
            hi = mid
        if hi - lo < TOL:
            break
    return (lo + hi) / 2.0


def implied_rates(
    df: DataFrame,
    id_cols: list[str],
    settlement: str = "data_liquidacao",
    maturity: str = "data_vencimento",
    price: str = "pu",
    coupon_value: float = 48.80885,
    final_value: float = 1048.80885,
    alias: str = "taxa_implicita",
) -> DataFrame:
    """Implied YTM per coupon bond (K4): explode flows columnar, then a
    vectorized bisection kernel over per-bond arrays."""
    flows = explode_payment_dates(df, settlement, maturity, 6, "data_pagamento")
    flows = du_mod.contar(flows, settlement, "data_pagamento", alias="_du")
    flows = flows.withColumn(
        "_cf", coupon_flow_expr("data_pagamento", maturity, coupon_value, final_value)
    ).withColumn("_au", F.col("_du").cast("double") / 252.0)
    packed = flows.groupBy(*id_cols).agg(
        F.first(price).alias("_price"),
        F.collect_list("_cf").alias("_cfs"),
        F.collect_list("_au").alias("_aus"),
    )

    id_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in packed.schema
        if f.name in id_cols
    )
    out_schema = f"{id_schema}, {alias} double"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates = [
                _bisect_rate(p, list(cfs), list(aus))
                for p, cfs, aus in zip(pdf["_price"], pdf["_cfs"], pdf["_aus"])
            ]
            yield pd.DataFrame({**{c: pdf[c] for c in id_cols}, alias: rates})

    return packed.mapInPandas(kernel, out_schema)


def bootstrap_zero_curve(
    curve: DataFrame,
    by: str,
    du_col: str = "dias_uteis",
    par_rate: str = "taxa",
    coupon_interval_du: int = 126,
    alias: str = "taxa_zero",
) -> DataFrame:
    """Zero curve from par coupon-bond yields (K5), per group.

    Model (a Spark-shaped restatement of the reference's sequential
    bootstrap loop, ntnb.py:557-574): each input row is a par bond with
    semiannual coupons ``par/2 · 100`` paid every ``coupon_interval_du``
    business days and redemption 100 at ``du``. Vertices are solved in
    ascending ``du``; coupon dates discount at the zero curve built so
    far (linear interpolation between solved vertices, flat at the short
    end) and the final vertex's rate is bisected so PV == 100.
    """
    sel = curve.select(
        F.col(by).alias("_g"),
        F.col(du_col).cast("long").alias("_du"),
        F.col(par_rate).cast("double").alias("_par"),
    ).filter(F.col("_du").isNotNull() & F.col("_par").isNotNull())

    out_schema = f"_g {dict(sel.dtypes)['_g']}, _du long, _par double, {alias} double"

    def solve_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_du").drop_duplicates("_du", keep="last")
        dus: list[int] = []
        zeros: list[float] = []

        def z_at(du: float) -> float:
            # linear on solved vertices; flat at the short end
            if not dus:
                return 0.0
            if du <= dus[0]:
                return zeros[0]
            for i in range(1, len(dus)):
                if du <= dus[i]:
                    w = (du - dus[i - 1]) / (dus[i] - dus[i - 1])
                    return zeros[i - 1] + w * (zeros[i] - zeros[i - 1])
            return zeros[-1]

        res = []
        for _, row in pdf.iterrows():
            du_n = int(row["_du"])
            par = float(row["_par"])
            coupon = 100.0 * ((1.0 + par) ** 0.5 - 1.0)  # semiannual, par yield
            flow_dus = list(range(du_n, 0, -coupon_interval_du))[::-1]
            pv_coupons = sum(
                coupon / (1.0 + z_at(d)) ** (d / 252.0) for d in flow_dus[:-1]
            )
            # bisect the last vertex's zero so the par bond prices at 100
            target = 100.0 - pv_coupons
            final_cf = 100.0 + coupon
            au_n = du_n / 252.0
            lo, hi = -0.5, 2.0
            for _ in range(MAX_ITER):
                mid = (lo + hi) / 2.0
                if final_cf / (1.0 + mid) ** au_n > target:
                    lo = mid
                else:
                    hi = mid
                if hi - lo < TOL:
                    break
            z = (lo + hi) / 2.0
            dus.append(du_n)
            zeros.append(z)
            res.append((row["_g"], du_n, par, z))
        return pd.DataFrame(res, columns=["_g", "_du", "_par", alias])

    out = sel.groupBy("_g").applyInPandas(solve_group, out_schema)
    return out.select(
        F.col("_g").alias(by),
        F.col("_du").alias(du_col),
        F.col("_par").alias(par_rate),
        F.col(alias),
    )

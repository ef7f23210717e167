"""COPOM digital-option probability extraction.

Reference pipeline (pyield/selic/probabilities.py:83-205):
- options carry (meeting expiry, strike ladder in bps, settlement price);
- adjacent-strike price differences → raw weights;
- normalize by the per-meeting weight sum (A2: sum().over(meeting));
- cumulative probability in strike order (W5: cum_sum over sorted);
- meetings ranked by expiry, 1 = nearest (W4: dense_rank).

Invariants the reference asserts (probabilities.py:253-261): per-meeting
probabilities sum to 1 and the cumulative ends at 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def probabilities(
    options: DataFrame,
    meeting: str = "data_expiracao",
    strike: str = "variacao_strike_bps",
    price: str = "preco_ajuste",
) -> DataFrame:
    """Per-strike move probabilities from digital-option prices."""
    opt = options.filter(F.col(price).isNotNull())
    w_strike = Window.partitionBy(meeting).orderBy(strike)
    # weight of strike s = price(s) − price(next s); the last strike
    # keeps its own price (tail mass)
    diff = F.col(price) - F.lead(price, 1, 0.0).over(w_strike)
    opt = opt.withColumn("_w", diff)
    total = F.sum("_w").over(Window.partitionBy(meeting))
    opt = opt.withColumn("prob", F.round(F.col("_w") / total, 6))
    wc = w_strike.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    opt = opt.withColumn("prob_acumulada", F.round(F.sum(F.col("_w")).over(wc) / total, 6))
    rank = F.dense_rank().over(Window.orderBy(meeting))
    return opt.withColumn("rank_reuniao", rank).drop("_w")

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
    from pyield_spark.functions.numbers import pround_expr

    opt = options.filter(F.col(price).isNotNull())
    w_strike = Window.partitionBy(meeting).orderBy(strike)
    # weight of strike s = price(s) − price(next s); the last strike
    # keeps its own price (tail mass). Weights accumulate in DECIMAL so
    # the normalization total is order-independent and the probability
    # rounding is portable across engines.
    diff = (F.col(price) - F.lead(price, 1, 0.0).over(w_strike)).cast("decimal(18,6)")
    opt = opt.withColumn("_w", diff)
    total = F.sum("_w").over(Window.partitionBy(meeting)).cast("double")
    wc = w_strike.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum("_w").over(wc).cast("double")
    opt = opt.withColumn("prob", pround_expr(F.col("_w").cast("double") / total, 6))
    opt = opt.withColumn("prob_acumulada", pround_expr(cum / total, 6))
    # meeting rank WITHOUT an ungrouped window (which would pull the
    # whole options panel into one partition): dense-rank only the
    # handful of DISTINCT meeting dates and broadcast the mapping back
    # (review fix — same shape as sampling.global_sort_index's offsets)
    meetings = (
        opt.select(meeting).distinct()
        .withColumn("rank_reuniao", F.dense_rank().over(Window.orderBy(meeting)))
    )
    return opt.join(F.broadcast(meetings), meeting).drop("_w")

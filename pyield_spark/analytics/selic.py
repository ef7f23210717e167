"""COPOM digital-option probability extraction.

Reference pipeline (pyield/selic/probabilities.py:83-206, B3 Manual
§3.5 — round-6 review fix: the previous port differenced adjacent
strike prices, a model the reference does not contain ANYWHERE; the
faithful computation is normalized DISCOUNTED SETTLEMENT PRICES):

- options carry (meeting expiry, strike ladder in bps, settlement
  price, business days to expiry);
- ``fator_desconto = exp(du/252 · ln(1 + taxa_di1))`` — the B3 pricing
  factor, with the reference's documented fallback ``taxa_di1 = 0`` →
  factor 1 when no DI1 curve is supplied (its own tests monkeypatch
  exactly this);
- ``prob_bruta = preco_ajuste · fator_desconto / 100``
  (probabilities.py:193-206);
- ``prob`` = prob_bruta normalized by the per-meeting sum (A2:
  sum().over(meeting));
- ``prob_acumulada`` = cumulative in strike order (W5: cum_sum over
  sorted);
- meetings ranked by expiry, 1 = nearest (W4: dense_rank).

Invariants the reference asserts (tests/selic/test_probabilities.py):
per-meeting probabilities sum to 1, the cumulative ends at 1 and is
monotone, raw probs are non-negative.

Engine deviation (documented): prob/prob_acumulada are portably
rounded to 6 decimals on output and the normalization accumulates in
DECIMAL (order-independent), so the DuckDB oracle replays bit-exactly;
the perturbation is ~1e-12, far inside the reference test tolerance
(1e-9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def probabilities(
    options: DataFrame,
    meeting: str = "data_expiracao",
    strike: str = "variacao_strike_bps",
    price: str = "preco_ajuste",
    du: str | None = None,
    taxa_di1: str | Column | None = None,
) -> DataFrame:
    """Per-strike move probabilities from digital-option prices.

    ``du`` + ``taxa_di1`` enable the DI1 discount factor; omitting them
    is the reference's taxa=0 fallback (factor 1, pure price
    normalization).
    """
    from pyield_spark.functions.numbers import pround_expr

    opt = options.filter(F.col(price).isNotNull())
    if du is not None and taxa_di1 is not None:
        tx = F.col(taxa_di1) if isinstance(taxa_di1, str) else taxa_di1
        fator = F.exp(
            F.col(du).cast("double") / 252.0
            * F.log(F.lit(1.0) + F.coalesce(tx, F.lit(0.0)))
        )
    else:
        fator = F.lit(1.0)
    opt = opt.withColumn("fator_desconto", fator).withColumn(
        "prob_bruta", F.col(price) * F.col("fator_desconto") / 100.0
    )
    # the /100 cancels in the normalization, so the weights accumulate
    # as (price · factor) in DECIMAL — order-independent totals, and for
    # the factor-1 case the decimal image of the price is EXACT (no
    # double→decimal rounding ambiguity between engines)
    w_strike = Window.partitionBy(meeting).orderBy(strike)
    opt = opt.withColumn(
        "_w", (F.col(price) * F.col("fator_desconto")).cast("decimal(28,12)")
    )
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


def copom_calendar(
    meetings: DataFrame,
    start=None,
    end=None,
    end_date_col: str = "data_fim_reuniao",
) -> DataFrame:
    """The reference's ``copom.calendar(start, end)`` window over a
    meeting dimension (pyield/selic/copom.py:118-171,
    tests/copom/test_copom.py::test_calendar_date_range_filter /
    _far_future_returns_empty): meetings whose END date falls inside
    [start, end], either bound optional — a far-future start yields the
    empty frame, not an error."""
    c = F.to_date(F.col(end_date_col))
    out = meetings
    if start is not None:
        out = out.filter(c >= F.lit(start))
    if end is not None:
        out = out.filter(c <= F.lit(end))
    return out


def next_meeting(
    meetings: DataFrame,
    reference,
    end_date_col: str = "data_fim_reuniao",
) -> DataFrame:
    """The first meeting ending at-or-after ``reference``
    (copom.py next_meeting; tests/copom/test_copom.py::
    test_next_meeting_*): one row, or the empty frame when the
    reference date is past the calendar. A bounded sort-limit — the
    meeting dimension is ~8 rows/year."""
    c = F.to_date(F.col(end_date_col))
    return meetings.filter(c >= F.lit(reference)).orderBy(c).limit(1)

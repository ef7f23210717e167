"""Skew-aware join: salting for hot keys.

AQE's skew-join handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in the session factory),
but salting is the deterministic tool when one side's hot keys are known
or AQE can't split (e.g. aggregations after the join). Pattern:
replicate the small side R times, scatter the big side across R salts,
join on (key, salt) — the hot key's rows spread over R tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side scattered across ``num_salts``.

    ``small`` is exploded ``num_salts``× (keep it genuinely small);
    output columns match a plain ``big.join(small, on, how)``.
    """
    if num_salts < 1:
        raise ValueError("num_salts must be >= 1")
    big_s = big.withColumn(
        "_salt", (F.rand(seed=42) * num_salts).cast("int")
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")

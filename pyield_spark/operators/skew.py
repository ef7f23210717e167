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
    output columns match a plain ``big.join(small, on, how)``. Only
    inner/left joins are supported: the replicated small side would
    emit unmatched small rows once per salt under right/full outer.

    The salt is a hash of the big side's full row, not rand(): stable
    under AQE stage re-execution, and it still scatters a hot key's
    rows because the non-key columns vary.
    """
    if num_salts < 1:
        raise ValueError("num_salts must be >= 1")
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the small side is replicated per salt, so right/full outer "
            "would duplicate unmatched small-side rows"
        )
    if "_salt" in big.columns or "_salt" in small.columns:
        # withColumn would silently OVERWRITE it, key the join on the
        # synthetic values, and drop the user's column at the end — a
        # silent data-loss divergence from the documented passthrough
        # contract (review fix)
        raise ValueError("inputs already carry a '_salt' column — rename it")
    big_s = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(num_salts))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")

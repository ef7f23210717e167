"""As-of join — the engine's core custom operator.

Stock Spark has no DataFrame-level as-of join; the reference leans on
Polars ``join_asof`` (pyield/interpolador.py:452-468 grouped
backward+forward; pyield/futuro/di1.py:100-105 and
pyield/bc/leiloes.py:242-246 ungrouped backward).

Implementation: tag-and-union + ordered window:

1. union(right ∪ left); right rows carry their payload packed in ONE
   non-null struct (so genuinely-null payload values still count as a
   match), left rows carry a null struct;
2. one window per group ordered by (key, tag) where the tag places right
   rows before (backward) or after (forward) left rows at equal keys —
   this makes exact matches count (``allow_exact_matches`` flips it);
3. backward: ``last(payload_struct, ignorenulls=True)`` over rows
   unbounded preceding → current; forward: ``first`` over current →
   unbounded following;
4. keep left rows, unpack the matched struct.

Scale notes: the whole operator is ONE shuffle (window partitioning by
the group key) — same cost as any grouped aggregation, AQE-skew-safe.
Left columns ride inside a struct so arbitrary schemas can't collide.
When the right side is a small dimension (a yield curve, a rate series),
prefer partitioning by a group key so work distributes; an ungrouped
as-of over a huge left table degrades to a single-partition window — for
that case pre-bucket the key (e.g. join on coarse time buckets) or use
:mod:`pyield_spark.curves.interpolate` which groups by curve date.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str | None = None,
    by: list[str] | str | None = None,
    strategy: str = "backward",
    values: list[str] | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Match each left row to the nearest right row at-or-before
    (backward) / at-or-after (forward) on the ordering key.

    Args:
        left/right: input DataFrames.
        on: ordering key column in ``left``.
        right_on: ordering key in ``right`` (defaults to ``on``).
        by: optional equality group key(s) present in both sides.
        strategy: "backward" or "forward".
        values: right payload columns to attach (default: all right
            columns except keys). Unmatched rows get nulls.
        allow_exact_matches: whether an equal key counts as a match.
    """
    if strategy not in ("backward", "forward"):
        raise ValueError("strategy must be 'backward' or 'forward'")
    right_on = right_on or on
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if values is None:
        values = [c for c in right.columns if c != right_on and c not in by_cols]
    if not values:
        raise ValueError("right side has no payload columns to attach")

    key_t = dict(left.dtypes)[on]

    right_tagged = right.select(
        F.col(right_on).cast(key_t).alias("_k"),
        *[F.col(c) for c in by_cols],
        F.lit(0).alias("_is_left"),
        F.struct(*[F.col(v) for v in values]).alias("_v"),
    )
    # carry left payload as a struct to avoid any column-name collisions
    left_tagged = left.select(
        F.struct(*left.columns).alias("_l"),
        F.col(on).cast(key_t).alias("_k"),
        *[F.col(c) for c in by_cols],
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(right_tagged.schema["_v"].dataType).alias("_v"),
    )
    right_tagged = right_tagged.withColumn(
        "_l", F.lit(None).cast(left_tagged.schema["_l"].dataType)
    ).select(*left_tagged.columns)

    unioned = right_tagged.unionByName(left_tagged)

    # Both strategies use GROWING frames (unbounded preceding → current):
    # Spark streams those in O(n), while a shrinking
    # current→unbounded-following frame rescans per row (O(n²)). Forward
    # therefore runs over DESCENDING keys. The tag order at equal keys
    # decides whether exact matches are visible.
    if strategy == "backward":
        right_first = allow_exact_matches  # right before left ⇒ equal key matches
        order = [F.col("_k").asc_nulls_last()]
    else:
        right_first = allow_exact_matches  # right before left (desc) ⇒ equal key matches
        order = [F.col("_k").desc_nulls_last()]
    tag_order = F.when(F.col("_is_left") == 0, F.lit(0 if right_first else 2)).otherwise(
        F.lit(1)
    )

    w = Window.partitionBy(*by_cols) if by_cols else Window.partitionBy()
    w = w.orderBy(*order, tag_order)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    matched = F.last("_v", ignorenulls=True).over(wf)

    out = unioned.select("_l", "_is_left", matched.alias("_m")).filter(
        F.col("_is_left") == 1
    )
    left_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    return out.select(*left_cols, *[F.col(f"_m.{v}").alias(v) for v in values])

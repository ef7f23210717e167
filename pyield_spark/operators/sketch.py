"""Count-Min sketch — mergeable frequency estimation / heavy hitters
(round 10 extension; Cormode & Muthukrishnan 2005, "An Improved Data
Stream Summary: The Count-Min Sketch and its Applications").

Why: the HLL/Theta/KLL family (queries/extras.py) answers *distinct*
and *quantile* questions from bounded state; the frequency question —
"which items are the heavy hitters, and roughly how often does each
occur" — is Count-Min's. A d×w counter grid replaces an unbounded
per-item count table: update adds each item's count to one counter per
row (position = double-hash of the item), estimate reads the MIN over
the d counters. Collisions only ever ADD, so the estimate is one-sided
(est ≥ true always; est ≤ true + εN with probability 1−δ at
w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉ — ``countmin_size``). Grids of equal shape
merge by cell-wise addition, the same persist-then-regroup contract as
the HLL rollup.

Portability contract (what makes the registered query oracle-exact,
unlike the bounds-flag HLL/Theta/KLL twins whose sketch internals are
engine-specific): positions are Kirsch–Mitzenmacher double hashing
over the two md5-half hashes — ``pos_i = (h1 + i·(2·h2 + 1)) mod w``
(``h32_expr`` digits 1-8, ``h32b_expr`` digits 9-16; terms stay
< 2^36, exact BIGINT everywhere) — so DuckDB rebuilds the IDENTICAL
grid and replays even the collision noise bit-for-bit. Single-hash
affine families are avoided for the Bloom reason: h(x) ≡ h(y) (mod w)
would collide every row at once, putting an FP floor under the min.

Scale shape (100 TB): the BUILD is one map-side-combinable groupBy
(per-item partial counts) fanned d ways into a grid of AT MOST d·w
rows regardless of corpus size — the classic per-partition/per-day
sketch job whose output persists to parquet. ``countmin_merge`` is a
cell-wise sum union (no rescan of the fact table). The PROBE broadcasts
the ≤ d·w-row grid onto the candidate stream — map-only per candidate
after one explode, no shuffle against the corpus. Estimating a
candidate the sketch never saw reads absent cells as 0 via the left
join's coalesce.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from pyield_spark.operators.text import h32_expr, h32b_expr

WIDTH = 1024
DEPTH = 4


def countmin_size(eps: float, delta: float) -> tuple[int, int]:
    """Grid shape ``(w, d)`` guaranteeing est ≤ true + eps·N with
    probability ≥ 1 − delta: w = ⌈e/eps⌉, d = ⌈ln(1/delta)⌉ — the
    standard Count-Min sizing identities."""
    if not 0.0 < eps < 1.0:
        raise ValueError(f"eps must be in (0, 1): {eps}")
    if not 0.0 < delta < 1.0:
        raise ValueError(f"delta must be in (0, 1): {delta}")
    return math.ceil(math.e / eps), math.ceil(math.log(1.0 / delta))


def _position_rows(item: Column, w: int, d: int) -> Column:
    """Array of (row, pos) structs — the d grid cells an item touches.

    Kirsch–Mitzenmacher: (h1 + i·(2·h2+1)) mod w. The forced-odd step
    guards h2 = 0; bounds: h1, h2 < 2^32, step < 2^33, i < d keeps
    every term < 2^36 — exact BIGINT arithmetic on every engine."""
    h1 = h32_expr(item)
    step = h32b_expr(item) * F.lit(2) + F.lit(1)
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                ((h1 + F.lit(i) * step) % F.lit(w)).cast("int").alias("pos"),
            )
            for i in range(d)
        ]
    )


def _check_grid_shape(grid: DataFrame, w: int, d: int, what: str) -> None:
    """Plan-time build-vs-serve guard (the sq8_encode ``bits`` metadata
    convention): a grid probed or merged with a different (w, d) would
    silently read absent cells as 0 — UNDER-estimating, breaking the
    one-sided contract — so a recorded mismatch raises. Best-effort:
    grids from sources that drop metadata skip the check."""
    try:
        meta = grid.schema["cnt"].metadata or {}
    except Exception:
        return
    got = (meta.get("w"), meta.get("d"))
    if got != (None, None) and got != (w, d):
        raise ValueError(
            f"{what}: grid was built with (w, d)={got}, called with "
            f"({w}, {d}) — estimates would silently under-count"
        )


def countmin_build(
    df: DataFrame,
    item: str,
    w: int = WIDTH,
    d: int = DEPTH,
    count_col: str | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """Build the counter grid ``(row int, pos int, cnt long)`` from one
    occurrence row per item instance — ≤ d·w output rows; the grid's
    (w, d) is stamped in the ``cnt`` column metadata so a mismatched
    probe/merge raises instead of silently under-counting.

    Per-item partial counts first (map-side combinable; distinct items
    ≪ occurrences bounds the d-fold expansion), then the d-way cell
    fan-out and the cell-wise sum. Pass ``count_col`` when ``df``
    ALREADY holds one row per item with its count (e.g. a candidate
    table computed anyway) — the pre-aggregation is skipped and the
    occurrence stream is never rescanned. ``by`` builds one grid per
    group (the fine level of the rollup pattern: per-day/per-source
    grids persist, then :func:`countmin_merge` or a plain cell sum
    regroups them without rescanning the fact table — Count-Min's
    linearity makes the merged grid IDENTICAL to a direct global
    build)."""
    by = list(by) if by else []
    if count_col is None:
        counts = df.groupBy(*by, item).agg(F.count("*").alias("_c"))
    else:
        counts = df.select(*by, item, F.col(count_col).cast("long").alias("_c"))
    cells = counts.select(
        *by, F.explode(_position_rows(F.col(item), w, d)).alias("_rp"), "_c"
    )
    return (
        cells.groupBy(
            *by, F.col("_rp.row").alias("row"), F.col("_rp.pos").alias("pos")
        )
        .agg(F.sum("_c").alias("cnt"))
        .withMetadata("cnt", {"w": w, "d": d})
    )


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of equal-shape grids — the persist-then-regroup
    path: per-partition/per-day sketches union-merge without touching
    the fact table again. ``merge(build(a), build(b)) == build(a ∪ b)``
    bit-exactly (test-pinned). Mixed-shape grids raise via the
    recorded (w, d) metadata."""
    if not sketches:
        raise ValueError("countmin_merge needs at least one sketch")
    shape = None
    for sk in sketches:
        try:
            meta = sk.schema["cnt"].metadata or {}
        except Exception:
            meta = {}
        got = (meta.get("w"), meta.get("d"))
        if got == (None, None):
            continue
        if shape is None:
            shape = got
        elif got != shape:
            raise ValueError(
                f"countmin_merge: grid shapes differ ({shape} vs {got}) — "
                "cell-wise sums across shapes are meaningless"
            )
    out = sketches[0]
    for sk in sketches[1:]:
        out = out.unionByName(sk)
    merged = out.groupBy("row", "pos").agg(F.sum("cnt").alias("cnt"))
    if shape is not None:
        # re-stamp: metadata propagation through union/groupBy is not
        # contractual across Spark versions
        merged = merged.withMetadata("cnt", {"w": shape[0], "d": shape[1]})
    return merged


def countmin_estimate(
    candidates: DataFrame,
    item: str,
    sketch: DataFrame,
    w: int = WIDTH,
    d: int = DEPTH,
) -> DataFrame:
    """Point-query the grid for each candidate row: est_count =
    MIN over the item's d cells. One-sided error: est_count ≥ the true
    inserted count, always; never-inserted candidates whose cells are
    all absent read 0.

    The grid is ≤ d·w rows — broadcast by construction, so the probe
    costs one explode + map-only lookups + a per-candidate min; the
    candidate stream is never shuffled against the corpus. Candidate
    rows must be unique per ``item``; extra payload columns ride
    through as grouping keys (no re-join against the candidate side).
    A (w, d) different from the grid's recorded build shape raises."""
    _check_grid_shape(sketch, w, d, "countmin_estimate")
    payload = list(candidates.columns)
    cells = candidates.select(
        *payload, F.explode(_position_rows(F.col(item), w, d)).alias("_rp")
    ).select(
        *payload, F.col("_rp.row").alias("row"), F.col("_rp.pos").alias("pos")
    )
    looked = cells.join(F.broadcast(sketch), ["row", "pos"], "left")
    return looked.groupBy(*payload).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
    )

"""Randomized as-of parity: the engine's core custom operator against
pandas ``merge_asof`` (the same semantics family as the reference's
Polars ``join_asof``), across strategy × grouped × exact-match, on
seeded random data with duplicate keys, unmatched rows, and null keys.
"""

import numpy as np
import pandas as pd
import pytest

from pyield_spark.operators.asof import asof_join


def _random_frames(seed: int, with_groups: bool):
    rng = np.random.default_rng(seed)
    n_left, n_right = 200, 60
    groups = ["g1", "g2", "g3"]
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 500, n_left).astype("int64"),
            "lid": np.arange(n_left, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "rk": np.sort(rng.integers(0, 500, n_right)).astype("int64"),
            "payload": rng.normal(size=n_right).round(6),
        }
    )
    if with_groups:
        left["g"] = rng.choice(groups, n_left)
        right["g"] = rng.choice(groups, n_right)
    # drop duplicate right keys (merge_asof keeps the LAST of equal keys;
    # the engine's window equivalently matches the latest — but keeping
    # them would test tie order inside pandas, not the operator)
    subset = ["rk", "g"] if with_groups else ["rk"]
    right = right.drop_duplicates(subset=subset, keep="last").reset_index(drop=True)
    return left, right


@pytest.mark.parametrize("seed", [7, 21])
@pytest.mark.parametrize("strategy", ["backward", "forward"])
@pytest.mark.parametrize("with_groups", [False, True])
@pytest.mark.parametrize("exact", [True, False])
@pytest.mark.parametrize("distribution", ["shuffle", "broadcast"])
def test_asof_matches_pandas(spark, seed, strategy, with_groups, exact, distribution):
    left, right = _random_frames(seed, with_groups)

    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    got_df = asof_join(
        sl,
        sr,
        on="k",
        right_on="rk",
        by="g" if with_groups else None,
        strategy=strategy,
        values=["payload"],
        allow_exact_matches=exact,
        distribution=distribution,
    )
    got = {r.lid: r.payload for r in got_df.collect()}

    right_sorted = right.sort_values("rk").reset_index(drop=True)
    exp_df = pd.merge_asof(
        left.sort_values("k").reset_index(drop=True),
        right_sorted,
        left_on="k",
        right_on="rk",
        by="g" if with_groups else None,
        direction=strategy,
        allow_exact_matches=exact,
    )
    exp = {row.lid: row.payload for row in exp_df.itertuples()}

    assert set(got) == set(exp)
    for lid in exp:
        g, e = got[lid], exp[lid]
        if pd.isna(e):
            assert g is None, f"lid={lid}: got {g}, want null"
        else:
            assert g == pytest.approx(e), f"lid={lid}"


@pytest.mark.parametrize("seed", [11, 33])
@pytest.mark.parametrize("with_groups", [False, True])
@pytest.mark.parametrize("exact", [True, False])
@pytest.mark.parametrize("distribution", ["shuffle", "broadcast"])
def test_asof_nearest_matches_pandas(spark, seed, with_groups, exact, distribution):
    left, right = _random_frames(seed, with_groups)
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    got = {
        r.lid: r.payload
        for r in asof_join(
            sl,
            sr,
            on="k",
            right_on="rk",
            by="g" if with_groups else None,
            strategy="nearest",
            values=["payload"],
            allow_exact_matches=exact,
            distribution=distribution,
        ).collect()
    }
    exp_df = pd.merge_asof(
        left.sort_values("k").reset_index(drop=True),
        right.sort_values("rk").reset_index(drop=True),
        left_on="k",
        right_on="rk",
        by="g" if with_groups else None,
        direction="nearest",
        allow_exact_matches=exact,
    )
    exp = {row.lid: row.payload for row in exp_df.itertuples()}
    assert set(got) == set(exp)
    for lid in exp:
        g, e = got[lid], exp[lid]
        if pd.isna(e):
            assert g is None, f"lid={lid}: got {g}, want null"
        else:
            assert g == pytest.approx(e), f"lid={lid}"


def test_asof_nearest_same_named_key(spark):
    """Review regression: right_on=None (same key name both sides) must
    work — the internal probe previously emitted a second column named
    like the left key and crashed with AMBIGUOUS_REFERENCE."""
    from pyield_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10), (2, 25), (3, 40)], "lid int, k int")
    right = spark.createDataFrame(
        [(9, 1.0), (22, 2.0), (41, 3.0)], "k int, payload double"
    )
    got = {
        r.lid: r.payload
        for r in asof_join(left, right, on="k", strategy="nearest").collect()
    }
    assert got == {1: 1.0, 2: 2.0, 3: 3.0}


def test_asof_nearest_date_key_distances(spark):
    """Distances on DATE keys go through the numeric key conversion —
    raw date subtraction would misbehave; backward must win ties."""
    import datetime as dt

    from pyield_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, dt.date(2024, 1, 10))], "lid int, d date"
    )
    right = spark.createDataFrame(
        [(dt.date(2024, 1, 8), "b"), (dt.date(2024, 1, 12), "f")],
        "d date, tag string",
    )
    [row] = asof_join(left, right, on="d", strategy="nearest").collect()
    assert row.tag == "b"  # tie (2 days each) → backward


def test_asof_string_keys_rejected_where_meaningless(spark):
    """Review regression: string ordering keys must raise clearly for
    'nearest' (null distances silently took the forward match) and for
    the ungrouped shuffle route (null buckets silently serialized)."""
    import pytest

    from pyield_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "2024-01-15")], "lid int, k string")
    right = spark.createDataFrame([("2024-01-10", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="nearest"):
        asof_join(left, right, on="k", strategy="nearest").collect()
    with pytest.raises(ValueError, match="ungrouped"):
        asof_join(left, right, on="k", strategy="backward").collect()

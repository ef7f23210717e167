"""Count-Min sketch: sizing identities, one-sided error, merge
algebra, and the broadcast-probe plan shape (operators/sketch.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pyield_spark.operators import sketch as sk
from pyield_spark.operators.dedup import ngrams_expr
from pyield_spark.operators.text import tokens_expr


def _occ(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.explode(
            F.concat(tokens_expr(F.col("text")), ngrams_expr(F.col("text"), 3))
        ).alias("gram")
    )


def test_countmin_size_identities():
    w, d = sk.countmin_size(0.01, 0.01)
    assert w == math.ceil(math.e / 0.01) == 272
    assert d == math.ceil(math.log(100.0)) == 5
    with pytest.raises(ValueError):
        sk.countmin_size(0.0, 0.5)
    with pytest.raises(ValueError):
        sk.countmin_size(0.5, 1.0)


def test_estimate_one_sided_and_bounded(spark, sf_dir):
    """est ≥ exact for EVERY item (the Count-Min contract has no
    exceptions on the over side), and the grid total equals d·N (each
    occurrence lands in exactly one cell per row)."""
    occ = _occ(spark, sf_dir)
    grid = sk.countmin_build(occ, "gram", 256, 3).localCheckpoint()
    n = occ.count()
    totals = grid.groupBy("row").agg(F.sum("cnt").alias("t")).collect()
    assert len(totals) == 3 and all(r.t == n for r in totals)
    assert grid.count() <= 3 * 256

    cand = occ.groupBy("gram").agg(F.count("*").alias("exact"))
    est = sk.countmin_estimate(cand, "gram", grid, 256, 3)
    bad = est.filter(F.col("est_count") < F.col("exact")).count()
    assert bad == 0


def test_merge_equals_single_build(spark, sf_dir):
    """merge(build(even docs), build(odd docs)) == build(all) cell for
    cell — the persist-then-regroup contract."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    gram = F.explode(tokens_expr(F.col("text"))).alias("gram")
    full = sk.countmin_build(docs.select(gram), "gram", 128, 4)
    even = sk.countmin_build(
        docs.filter(F.col("doc_id") % 2 == 0).select(gram), "gram", 128, 4
    )
    odd = sk.countmin_build(
        docs.filter(F.col("doc_id") % 2 == 1).select(gram), "gram", 128, 4
    )
    merged = sk.countmin_merge(even, odd)
    diff = full.join(merged, ["row", "pos"], "full").filter(
        ~(F.coalesce(full["cnt"], F.lit(0)) == F.coalesce(merged["cnt"], F.lit(0)))
    )
    assert diff.count() == 0


def test_never_inserted_candidate_reads_zero_or_noise(spark):
    """Probing an item the sketch never saw: absent cells read 0
    through the left join, so a sparse grid returns 0; any nonzero is
    pure collision mass (still one-sided)."""
    build = spark.createDataFrame([("a",), ("b",), ("c",)], ["gram"])
    grid = sk.countmin_build(build, "gram", 64, 4)
    probe = spark.createDataFrame([("zz-never",)], ["gram"])
    [row] = sk.countmin_estimate(probe, "gram", grid, 64, 4).collect()
    assert row.est_count == 0  # 3 items in 64 cols: joint 4-row collision impossible


def test_probe_plan_broadcasts_grid(spark, sf_dir):
    """The estimate probe must broadcast the ≤ d·w-row grid — never
    shuffle the candidate stream against it, never NLJ."""
    occ = _occ(spark, sf_dir)
    grid = sk.countmin_build(occ, "gram", 256, 3)
    cand = occ.groupBy("gram").agg(F.count("*").alias("exact"))
    plan = (
        sk.countmin_estimate(cand, "gram", grid, 256, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_countmin_merge_rejects_empty():
    with pytest.raises(ValueError):
        sk.countmin_merge()


def test_shape_guard_and_count_col(spark, sf_dir):
    """(w,d) is stamped at build: a mismatched probe or merge raises
    instead of silently under-counting; and building from a
    pre-counted candidate table (count_col=) is cell-identical to
    building from the occurrence stream."""
    occ = _occ(spark, sf_dir)
    grid = sk.countmin_build(occ, "gram", 256, 3)
    cand = occ.groupBy("gram").agg(F.count("*").alias("exact"))
    with pytest.raises(ValueError, match="under-count"):
        sk.countmin_estimate(cand, "gram", grid, 1024, 4)
    other = sk.countmin_build(occ, "gram", 128, 3)
    with pytest.raises(ValueError, match="shapes differ"):
        sk.countmin_merge(grid, other)

    from_counts = sk.countmin_build(cand, "gram", 256, 3, count_col="exact")
    diff = grid.join(from_counts, ["row", "pos"], "full").filter(
        ~(grid["cnt"] == from_counts["cnt"])
    )
    assert diff.count() == 0


def test_grouped_build_merges_to_global(spark, sf_dir):
    """by= grids are the fine rollup level: cell-summing the per-source
    grids reproduces the directly-built global grid exactly (Count-Min
    linearity — the q_countmin_rollup contract)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    occ = docs.select(
        "source", F.explode(tokens_expr(F.col("text"))).alias("gram")
    )
    fine = sk.countmin_build(occ, "gram", 64, 3, by=["source"])
    assert fine.select("source").distinct().count() > 1
    merged = sk.countmin_merge(fine.select("row", "pos", "cnt"))
    direct = sk.countmin_build(occ.select("gram"), "gram", 64, 3)
    diff = merged.join(direct, ["row", "pos"], "full").filter(
        ~(merged["cnt"] == direct["cnt"])
    )
    assert diff.count() == 0

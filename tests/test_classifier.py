"""Trained quality classifier: partitioning-independent training,
artifact reproducibility, serving portability and the map-only serve
plan (operators/classifier.py, queries/clf_artifact.py)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from pyield_spark.operators import classifier as clf
from pyield_spark.queries.clf_artifact import CLF_WEIGHTS


def test_weight_literal_roundtrip():
    """The 17-sig-digit exponent literal is an exact double round-trip
    for every pinned weight."""
    for w in CLF_WEIGHTS:
        assert float(clf._dbl(w)) == w


def test_training_partitioning_independent(spark, sf_dir):
    """DECIMAL-summed gradients: the trained vector is bit-identical
    whether the corpus sits in 1 partition or 7."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w1 = clf.logreg_train(docs.repartition(1), "text", iters=5, lr=2.0)
    w7 = clf.logreg_train(docs.repartition(7), "text", iters=5, lr=2.0)
    assert w1 == w7


def test_artifact_reproduces(spark):
    """Re-running the pinned config on the pinned table reproduces
    queries/clf_artifact.py exactly — the artifact is a build product,
    not a hand-tuned constant."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    w = clf.logreg_train(docs, "text", iters=40, lr=2.0)
    assert w == CLF_WEIGHTS


def test_generalizes_to_unseen_sf(spark):
    """Accuracy on sf0.001 (not the training table) stays ≥ 0.9 — the
    distilled boundary transfers, it didn't memorize row ids."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = clf.logreg_prob(CLF_WEIGHTS, clf.clf_features("text"))
    acc = (
        docs.select(((p >= 0.5) == clf.clf_label("text")).cast("int").alias("c"))
        .agg(F.avg("c"))
        .collect()[0][0]
    )
    assert acc >= 0.9


def test_serve_plan_is_map_only(spark, sf_dir):
    """Scoring adds NO exchange, no UDF: pure expression arithmetic in
    the scan projection."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = clf.logreg_prob(CLF_WEIGHTS, clf.clf_features("text"))
    plan = (
        docs.select("doc_id", p.alias("p_keep"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_duckdb_twin_matches_spark(spark, sf_dir):
    """Direct engine parity on the full scored frame (the oracle gate
    covers the registered query; this pins the builder pair itself)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = clf.logreg_prob(CLF_WEIGHTS, clf.clf_features("text"))
    got = {
        r.doc_id: (r.p, bool(r.y))
        for r in docs.select(
            "doc_id", p.alias("p"), clf.clf_label("text").alias("y")
        ).collect()
    }
    from pyield_spark.queries.llm_data import _SW_EN, _TOKS

    prob = clf.logreg_prob_sql_duck(
        CLF_WEIGHTS, clf.clf_features_sql_duck(_TOKS, _SW_EN)
    )
    label = clf.clf_label_sql_duck(_TOKS, _SW_EN)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        r[0]: (r[1], bool(r[2]))
        for r in con.execute(
            f"SELECT doc_id, {prob}, {label} FROM documents"
        ).fetchall()
    }
    assert got == want

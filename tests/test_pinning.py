"""The env-gated durable pin (r10 verdict item 5) and the bounded
observation wait (r10 advice): cluster-durability escape hatches whose
DEFAULTS must stay byte-identical to localCheckpoint behavior."""

import time

from pyspark.sql import functions as F
import pytest

from pyield_spark.operators import graph as gr
from pyield_spark.operators.pinning import pin


def test_pin_reliable_requires_checkpoint_dir(spark, monkeypatch):
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("a checkpoint dir is already set on this context")
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "reliable")
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    df = spark.range(3)
    with pytest.raises(ValueError, match="SPARK_GRAFT_CHECKPOINT_DIR"):
        pin(df)


def test_pin_rejects_unknown_mode(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "replicated")
    with pytest.raises(ValueError, match="local.*reliable"):
        pin(spark.range(3))


def test_pin_reliable_mode_connected_components(spark, monkeypatch, tmp_path):
    """The reliable route must produce the same labels as the default
    AND actually write RDD checkpoints into the configured directory
    (the recompute path an executor loss needs)."""
    ckdir = str(tmp_path / "ck")
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "reliable")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in gr.connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
    }
    import glob
    import os

    assert glob.glob(os.path.join(ckdir, "**", "rdd-*"), recursive=True), (
        "reliable mode must persist RDD checkpoints under the dir"
    )


def test_observed_chk_times_out_to_agg_fallback(spark):
    """When the Observation never yields (listener coupling broken),
    the bounded wait falls back to the explicit checksum — same value,
    no hang."""

    class _HangingObs:
        @property
        def get(self):
            time.sleep(30)
            return {}

    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "node long, label long"
    )
    expect = labels.agg(
        F.sum(F.xxhash64("label").cast("decimal(38,0)")).alias("chk")
    ).collect()[0]["chk"]
    t0 = time.perf_counter()
    got = gr._observed_chk(_HangingObs(), labels, timeout=0.5)
    assert got == expect
    assert time.perf_counter() - t0 < 20

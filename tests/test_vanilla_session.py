"""Driver-session conformance: every registered query must materialize
against a deliberately VANILLA SparkSession — ANSI on (the Spark 4
default), 200 shuffle partitions, no nanosAsLong, no engine session
factory — because that is exactly what the correctness driver hands us.

Round-5 lesson: the engine's null-on-malformed parse contract silently
depended on ``session.py`` pinning ``spark.sql.ansi.enabled=false``;
three queries (q_tpf_intradia, q_dedup_clusters, q_dedup_keep_best)
crashed in the driver's ANSI-on environment while every local gate was
green. This test permanently decouples correctness from the builder's
session factory:

- the queries' own ``tables()`` defensive confs may flip what they need
  DURING construction (that is part of the contract under test), but
- ANSI is forced back ON immediately before materialization, so every
  expression the plan evaluates must be ANSI-safe (try_cast /
  try_to_date / overflow-free accumulators) on its own.

ANSI-on materialization success implies ANSI-off success for these
plans (lenient mode only ever converts errors into nulls), so this one
lap covers both the driver's actual environment and the stricter
vanilla deployment.
"""

from __future__ import annotations

import pytest

from pyield_spark.queries import QUERIES, load_all

load_all()

_QUERY_NAMES = list(QUERIES)


@pytest.fixture(scope="module")
def vanilla(spark):
    """A session over the same SparkContext with driver-like SQL confs:
    what ``SparkSession.builder.getOrCreate()`` gives a fresh Spark 4
    deployment (newSession() would inherit the builder confs of the
    test factory, so each vanilla default is forced back explicitly)."""
    s = spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", "200")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    s.conf.set("spark.sql.session.timeZone", "America/Sao_Paulo")
    return s


@pytest.mark.parametrize("name", _QUERY_NAMES)
def test_query_materializes_on_vanilla_session(vanilla, sf_dir, name):
    df = QUERIES[name](vanilla, sf_dir)
    # tables() legitimately set lenient confs during construction;
    # re-force ANSI so EXECUTION itself proves the parse layer's
    # try_cast contract, not the session conf.
    vanilla.conf.set("spark.sql.ansi.enabled", "true")
    # collect(), not count(): count() lets column pruning drop the very
    # parse expressions under test — the driver collects full rows too
    assert len(df.collect()) >= 0

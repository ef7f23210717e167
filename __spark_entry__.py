"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in :mod:`pyield_spark.queries`; this module only
adapts the registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from pyield_spark.queries import (  # noqa: E402
    ORACLES,
    QUERIES,
    driver_ordered,
    load_all,
)

load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: multi-curve flat-forward interpolation (the
    reference's core operator, pyield/interpolador.py:306-497) over the
    sf0.001 tables."""
    return QUERIES["q_interp_flat_forward"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's bounded correctness window (first 50)
    covers a curated cross-section of every operator family; the full
    set is oracle-checked locally by ``tools/check_oracle.py``.
    """
    return driver_ordered()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return dict(ORACLES)

"""Query registry — the driver-facing surface of the engine.

Every operator from SURVEY.md §2 (plus the LLM-data-pipeline
extensions) is demonstrated by a named query over the driver's synthetic
tables. Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent DuckDB oracle SQL string.

Cross-engine determinism rules used throughout (so the driver's
value-hash compares bit-identical results):

- double sums/avgs go through DECIMAL casts (exact, order-independent)
  and back to DOUBLE;
- pow/exp-derived values are rounded to ≤8 decimals (libm vs JVM last-ulp
  divergence insurance);
- every aggregate/computed column is aliased identically on both sides;
- top-k windows always carry a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import all query modules (populates the registry)."""
    from pyield_spark.queries import (  # noqa: F401
        analytics,
        bonds_extra,
        core,
        corpus,
        events,
        extras,
        curation,
        fixed_income,
        leiloes,
        llm_data,
        semantic,
        sqlapi,
        training_data,
        warehouse,
    )


def tables(spark: SparkSession, sf_dir: str, *names: str):
    from pyspark.sql import functions as F

    # Defensive session confs (runtime-settable): the driver may hand us
    # a vanilla SparkSession. events.parquet has shipped as both
    # TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across testdata generations —
    # nanosAsLong keeps the NANOS variant readable; UTC keeps
    # timestamp→date casts aligned with the (tz-naive) DuckDB oracle.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    out = []
    for n in names:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        # NANOS-generation events.ts reads as LONG under nanosAsLong —
        # convert to micros exactly as DuckDB truncates; the MICROS
        # generation arrives as a native timestamp and passes through.
        if n == "events":
            ts_type = dict(df.dtypes).get("ts")
            if ts_type == "bigint":
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
                )
            elif ts_type == "timestamp_ntz":
                # value-preserving under the UTC session tz set above;
                # keeps unix_micros()/window() applicable downstream
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        out.append(df)
    return out if len(out) > 1 else out[0]

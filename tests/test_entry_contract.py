"""Driver-contract sanity: entry/queries/oracle_sql shapes, plus a fast
oracle-parity spot check on a few queries at sf0.001."""

import hashlib
import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SPOT = ["q_pricing_summary", "q_bd_count", "q_interp_flat_forward", "q_exact_dedup"]
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_registry_shapes():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # most queries must be oracle-checked (rows-only is the exception)
    assert len(oracles) >= 0.8 * len(qs)


def test_driver_window_invariants(spark, sf_dir):
    """The driver hash-checks only the FIRST 50 queries() entries: the
    window is a curated DRIVER_PRIORITY prefix (round 6: 23 names)
    with the remaining slots filled in registration order by
    driver_ordered() — so a newly registered module CAN shift the
    uncurated tail; pin a query by adding it to DRIVER_PRIORITY if its
    window slot matters. Every window entry must be oracle-backed, and
    none may emit column types the driver's pandas canonicalizer
    cannot sort (array/map/struct cells are unhashable — the r2
    failure mode of q_multimodal_features)."""
    from pyield_spark.queries import DRIVER_PRIORITY

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    window = list(qs)[:50]
    # DRIVER_PRIORITY is the curated head; driver_ordered() fills the
    # remaining slots in registration order (round-6 rotation design)
    assert window[: len(DRIVER_PRIORITY)] == DRIVER_PRIORITY
    assert len(DRIVER_PRIORITY) <= 50
    missing = [n for n in window if n not in oracles]
    assert not missing, f"driver-window queries without oracle: {missing}"
    bad_types = [
        (n, c, t)
        for n in window
        for c, t in qs[n](spark, sf_dir).dtypes
        if t.startswith(("array", "map", "struct"))
    ]
    assert not bad_types, f"unsortable driver-window outputs: {bad_types}"


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        return str(v)

    return sorted("|".join(cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", SPOT)
def test_oracle_spot_parity(spark, sf_dir, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    res = con.execute(oracles[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _canon(sdf.columns, s_rows) == _canon(d_cols, d_rows)

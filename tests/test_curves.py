"""Interpolation + forwards vs reference docstring goldens
(pyield/interpolador.py, pyield/fwd.py) and edge-ladder contract."""

import pytest
from pyspark.sql import functions as F

from pyield_spark.curves.forwards import forwards_expr
from pyield_spark.curves.interpolate import interpolar
from pyield_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def curve(spark):
    return spark.createDataFrame(
        [(30, 0.045), (60, 0.05), (90, 0.055)], "dias_uteis INT, taxa DOUBLE"
    )


def test_flat_forward_golden(spark, curve):
    tgt = spark.createDataFrame([(45,)], "dias_uteis INT")
    got = interpolar(tgt, curve).collect()[0].taxa_interpolada
    assert got == pytest.approx(0.04833068080970859, abs=1e-15)


def test_edge_ladder(spark, curve):
    tgt = spark.createDataFrame([(10,), (30,), (100,)], "dias_uteis INT")
    got = {r.dias_uteis: r.taxa_interpolada for r in interpolar(tgt, curve).collect()}
    assert got[10] == 0.045  # short end → first rate, always
    assert got[30] == 0.045  # exact hit → vertex rate
    assert got[100] is None  # long end without extrapolation
    got = {
        r.dias_uteis: r.taxa_interpolada
        for r in interpolar(tgt, curve, extrapolar=True).collect()
    }
    assert got[100] == 0.055  # long end with extrapolation → last rate


def test_linear_golden(spark, curve):
    tgt = spark.createDataFrame([(45,)], "dias_uteis INT")
    got = interpolar(tgt, curve, method="linear").collect()[0].taxa_interpolada
    assert got == pytest.approx(0.0475, abs=1e-15)


def test_multi_curve_groups(spark):
    curve = spark.createDataFrame(
        [("a", 5, 0.10), ("a", 20, 0.12), ("a", 50, 0.13)],
        "g STRING, dias_uteis INT, taxa DOUBLE",
    )
    tgt = spark.createDataFrame([("a", 10), ("a", 25), ("zz", 10)], "g STRING, dias_uteis INT")
    got = {
        (r.g, r.dias_uteis): r.taxa_interpolada
        for r in interpolar(tgt, curve, by="g").collect()
    }
    assert round(got[("a", 10)], 6) == 0.113293  # reference docstring value
    assert round(got[("a", 25)], 6) == 0.123323
    assert got[("zz", 10)] is None  # group absent from curve


def test_forwards_docstring_and_cascade(spark):
    df = spark.createDataFrame(
        [("a", 10, 0.05), ("a", 20, 0.06), ("a", 30, 0.07)],
        "g STRING, du INT, tx DOUBLE",
    )
    got = {r.du: r.fwd for r in df.withColumn("fwd", forwards_expr("du", "tx", "g")).collect()}
    assert got[10] == 0.05  # first row = spot
    assert round(got[20], 6) == 0.070095
    assert round(got[30], 6) == 0.090284
    # duplicate vertex → nulls on dup rows + one-row cascade
    df2 = spark.createDataFrame(
        [("b", 10, 0.05), ("b", 20, 0.06), ("b", 20, 0.061), ("b", 30, 0.07), ("b", 40, 0.08)],
        "g STRING, du INT, tx DOUBLE",
    )
    rows = (
        df2.withColumn("fwd", forwards_expr("du", "tx", "g")).orderBy("du", "tx").collect()
    )
    assert rows[0].fwd == 0.05
    assert rows[1].fwd is None and rows[2].fwd is None  # dup rows
    assert rows[3].fwd is None  # cascade
    assert rows[4].fwd is not None  # recovery


def test_asof_backward_forward(spark):
    left = spark.createDataFrame([(1, 5), (2, 10), (3, 17)], "id INT, k INT")
    right = spark.createDataFrame([(10, 1.0), (15, 2.0)], "k INT, v DOUBLE")
    b = {r.id: r.v for r in asof_join(left, right, on="k").collect()}
    assert b == {1: None, 2: 1.0, 3: 2.0}
    f = {r.id: r.v for r in asof_join(left, right, on="k", strategy="forward").collect()}
    assert f == {1: 1.0, 2: 1.0, 3: None}
    fx = {
        r.id: r.v
        for r in asof_join(
            left, right, on="k", strategy="forward", allow_exact_matches=False
        ).collect()
    }
    assert fx == {1: 1.0, 2: 2.0, 3: None}


def test_dedupe_keep_last_by_order_col(spark):
    """order_col resolves duplicate vertices to the latest arrival
    (reference keep='last'), not the max rate."""
    from pyield_spark.curves.interpolate import interpolar

    curve = spark.createDataFrame(
        [
            ("c", 10, 0.10, 1),
            ("c", 10, 0.05, 2),  # revised DOWN later — must win
            ("c", 20, 0.20, 1),
        ],
        "g STRING, dias_uteis INT, taxa DOUBLE, ord INT",
    )
    tgt = spark.createDataFrame([("c", 10)], "g STRING, dias_uteis INT")
    got = interpolar(tgt, curve, by="g", order_col="ord").collect()
    assert got[0].taxa_interpolada == 0.05
    # without order_col the deterministic stand-in keeps the max rate
    got2 = interpolar(tgt, curve.drop("ord"), by="g").collect()
    assert got2[0].taxa_interpolada == 0.10


import numpy as np
import pytest as _pt


@_pt.mark.parametrize("seed", [3, 11])
@_pt.mark.parametrize("grouped", [False, True])
@_pt.mark.parametrize("method", ["flat_forward", "linear"])
@_pt.mark.parametrize("extrapolar", [False, True])
def test_interpolar_broadcast_route_parity(spark, seed, grouped, method, extrapolar):
    """The broadcast (interval-join) route must reproduce the window
    route bit-for-bit on random curves/targets — exact hits, below-min,
    above-max, duplicate vertices, null targets, missing groups."""
    from pyield_spark.curves.interpolate import interpolar

    rng = np.random.default_rng(seed)
    n_t, n_v = 300, 25
    groups = ["a", "b", "c"] if grouped else ["x"]

    def _g():
        # include a NULL group on both sides (the window route
        # co-partitions null keys — the broadcast joins must too)
        pick = rng.choice(groups + (["ghost", "__null__"] if grouped else []))
        return None if pick == "__null__" else str(pick)

    tgt_rows = [
        (
            int(i),
            _g(),
            None if i % 17 == 0 else int(rng.integers(-50, 1300)),
        )
        for i in range(n_t)
    ]
    cur_rows = [
        (
            None if grouped and rng.integers(0, 8) == 0 else str(rng.choice(groups)),
            int(rng.integers(0, 1250)),
            float(np.round(rng.uniform(0.05, 0.15), 6)),
        )
        for _ in range(n_v * len(groups))
    ]
    tgt = spark.createDataFrame(tgt_rows, "tid long, g string, du_alvo long")
    cur = spark.createDataFrame(cur_rows, "g string, du long, taxa double")
    by = "g" if grouped else None

    def run(dist):
        out = interpolar(
            tgt, cur, du_col="du_alvo", curve_du="du", curve_rate="taxa",
            by=by, method=method, extrapolar=extrapolar, distribution=dist,
        )
        return {r.tid: r.taxa_interpolada for r in out.collect()}

    a, b = run("shuffle"), run("broadcast")
    assert set(a) == set(b) and len(a) == n_t
    for t in a:
        assert (a[t] is None) == (b[t] is None), (t, a[t], b[t])
        if a[t] is not None:
            assert a[t] == b[t], (t, a[t], b[t])  # bit-exact, same exprs


def test_interpolar_null_order_col_vertex_keeps_rate(spark):
    """A UNIQUE vertex whose order_col is null (timestamp-less backfill
    row) must keep its rate — max_by skips null ordering values, which
    silently nulled the whole vertex before round 6. Null orders still
    lose ties to timestamped revisions."""
    import datetime as dt

    from pyield_spark.curves.interpolate import interpolar

    curve = spark.createDataFrame(
        [
            (10, 0.10, dt.datetime(2026, 1, 1)),
            (20, 0.20, None),              # unique vertex, null order
            (30, 0.30, dt.datetime(2026, 1, 1)),
            (30, 0.35, None),              # null order LOSES the tie
        ],
        "du long, taxa double, ord timestamp",
    )
    targets = spark.createDataFrame([(20,), (30,)], "dias_uteis long")
    got = {
        r["dias_uteis"]: r["taxa_interpolada"]
        for r in interpolar(targets, curve, curve_du="du", order_col="ord").collect()
    }
    assert got[20] == 0.20  # exact hit on the null-order vertex
    assert got[30] == 0.30  # timestamped revision wins the tie

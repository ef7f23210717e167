"""Bucketing: pre-partitioned co-located joins — the 100 TB pattern for
repeated large-table joins (write once bucketed by the join key, every
later join skips its shuffle)."""

import re

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # tables land in ./spark-warehouse (gitignored) — warehouse.dir is a
    # static conf and cannot be pointed at a tmp dir on a live session
    spark.sql("CREATE DATABASE IF NOT EXISTS buckdemo")
    spark.sql("DROP TABLE IF EXISTS buckdemo.li_b")
    spark.sql("DROP TABLE IF EXISTS buckdemo.od_b")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "buckdemo.li_b"
    )
    od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "buckdemo.od_b"
    )

    joined = (
        spark.table("buckdemo.li_b")
        .join(
            spark.table("buckdemo.od_b").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must not shuffle: both sides are bucketed on the
    # key, so the only Exchange allowed is the one for the final groupBy
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan
    assert len(re.findall(r"Exchange hashpartitioning\(l_orderkey", plan)) == 0
    assert len(re.findall(r"Exchange hashpartitioning\(o_orderkey", plan)) == 0

    # correctness unchanged vs the plain-parquet join
    expected = (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert joined.count() == expected.count()

    spark.sql("DROP TABLE IF EXISTS buckdemo.li_b")
    spark.sql("DROP TABLE IF EXISTS buckdemo.od_b")


def test_ungrouped_asof_is_distributed(spark):
    """J5 hardening: the ungrouped as-of must NOT move the big union to a
    single partition — the main window is bucketed on value-derived range
    buckets, and matches across bucket boundaries are stitched by ghost
    carrier rows."""
    import re

    from pyield_spark.operators.asof import asof_join

    left = spark.range(5000).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 7 % 9973).cast("int").alias("k"),
    )
    # sparse right: long stretches of buckets contain no right row, so
    # boundary stitching is exercised hard
    right = spark.range(40).select(
        (F.col("id") * 200).cast("int").alias("k"),
        (F.col("id") * 1.5).alias("v"),
    )
    for strategy in ("backward", "forward"):
        out = asof_join(
            left, right, on="k", strategy=strategy,
            distribution="shuffle",  # pin the route this test asserts
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the big window is partitioned by the range bucket
        assert re.search(r"Window \[last\(_v.*windowspecdefinition\(_bkt", plan), plan

        # brute-force oracle
        rk = sorted((r.k, r.v) for r in right.collect())
        got = {r.id: r.v for r in out.collect()}
        assert len(got) == 5000
        for r in left.collect():
            if strategy == "backward":
                cand = [v for k, v in rk if k <= r.k]
                want = cand[-1] if cand else None
            else:
                cand = [v for k, v in rk if k >= r.k]
                want = cand[0] if cand else None
            assert got[r.id] == want, (strategy, r.id, r.k, got[r.id], want)


def test_ungrouped_interpolar_is_distributed(spark):
    """Single-curve interpolation must bucket, not serialize; results
    must equal the grouped path on a constant group."""
    import re

    import pytest

    from pyield_spark.curves.interpolate import interpolar

    curve = spark.range(30).select(
        (F.col("id") * 50 + 10).cast("long").alias("du"),
        (0.05 + F.col("id") * 0.001).alias("taxa"),
    )
    targets = spark.range(3000).select(
        F.col("id").alias("tid"), (F.col("id") % 1600).cast("long").alias("du")
    )
    out = interpolar(
        targets, curve, du_col="du", curve_du="du", curve_rate="taxa",
        distribution="shuffle",  # pin the route this test asserts
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"windowspecdefinition\(_bkt", plan), plan

    got = {r.tid: r.taxa_interpolada for r in out.collect()}
    gcurve = curve.withColumn("g", F.lit(1))
    gtargets = targets.withColumn("g", F.lit(1))
    want = {
        r.tid: r.taxa_interpolada
        for r in interpolar(
            gtargets, gcurve, du_col="du", curve_du="du", curve_rate="taxa", by="g"
        ).collect()
    }
    assert len(got) == 3000
    for tid, v in want.items():
        if v is None:
            assert got[tid] is None
        else:
            assert got[tid] == pytest.approx(v, abs=1e-15), tid


def test_ungrouped_asof_date_keys_bucket_distributed(spark):
    """Regression: DATE ordering keys must go through the datediff
    numeric mapping. A type-check bug once let them cast-to-double
    (NULL), sending every row to the null bucket — a silent
    single-partition degradation the int-key test can't see."""
    import datetime as dt

    from pyield_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(i, dt.date(2020, 1, 1) + dt.timedelta(days=i % 1500)) for i in range(4000)],
        "id long, d date",
    )
    right = spark.createDataFrame(
        [(dt.date(2020, 1, 1) + dt.timedelta(days=30 * i), float(i)) for i in range(50)],
        "rd date, v double",
    )
    out = asof_join(left, right, on="d", right_on="rd", strategy="backward")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the numeric bucket mapping is datediff-based, not a null-producing cast
    assert "datediff" in plan, plan[:1500]
    # and results are still the brute-force as-of
    rk = sorted((r.rd, r.v) for r in right.collect())
    got = {r.id: r.v for r in out.collect()}
    for r in left.collect():
        cand = [v for k, v in rk if k <= r.d]
        assert got[r.id] == (cand[-1] if cand else None)


def test_broadcast_asof_no_fact_shuffle(spark):
    """J5 broadcast route: against a dimension-sized right side the
    as-of must be a pure broadcast hash join — the fact side never
    exchanges. The only shuffles allowed in the whole plan are on the
    dimension lineage: its dedup (1 hash exchange over the tiny series)
    and its interval window + stats agg (single-partition over
    dimension-sized input, the same class as any dimension build)."""
    import re

    from pyield_spark.operators.asof import asof_join

    left = spark.range(5000).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 7 % 9973).cast("int").alias("k"),
    )
    right = spark.range(40).select(
        (F.col("id") * 200).cast("int").alias("k"),
        (F.col("id") * 1.5).alias("v"),
    )
    for strategy in ("backward", "forward"):
        out = asof_join(
            left, right, on="k", strategy=strategy, distribution="broadcast"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        # every hash exchange partitions on the DIMENSION key (_kn, from
        # the tiny series' dedup) — none on the fact lineage
        for m in re.findall(r"Exchange hashpartitioning\((\w+)", plan):
            assert m.startswith("_kn"), (m, plan[:2000])
        # no window ever touches the fact side
        assert not re.search(r"windowspecdefinition\(_bkt", plan), plan

        # brute-force oracle (same as the shuffle-route test)
        rk = sorted((r.k, r.v) for r in right.collect())
        got = {r.id: r.v for r in out.collect()}
        assert len(got) == 5000
        for r in left.collect():
            if strategy == "backward":
                cand = [v for k, v in rk if k <= r.k]
                want = cand[-1] if cand else None
            else:
                cand = [v for k, v in rk if k >= r.k]
                want = cand[0] if cand else None
            assert got[r.id] == want, (strategy, r.id, r.k, got[r.id], want)


def test_broadcast_asof_rejects_unsupported_key(spark):
    """String keys have no faithful numeric image for the bucket grid:
    the broadcast route must refuse (the shuffle route handles them) —
    a silent all-null degradation is the failure class this guards."""
    import pytest

    from pyield_spark.operators.asof import asof_join

    left = spark.createDataFrame([("2024-01-02", 1)], "d string, i int")
    right = spark.createDataFrame([("2024-01-01", 1.0)], "d string, v double")
    with pytest.raises(ValueError, match="broadcast"):
        asof_join(left, right, on="d", distribution="broadcast")


def test_auto_distribution_picks_routes(spark, sf_dir):
    """distribution='auto' (the new default): a dimension-sized right
    side resolves to the broadcast route BY DEFAULT (zero fact-side
    data shuffles), an over-threshold / unknown-size right side falls
    back to shuffle, and both routes return identical rows."""
    from pyield_spark.operators.asof import asof_join, auto_distribution

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", F.col("l_shipdate").alias("k")
    )
    dim = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderdate").alias("k"), "o_totalprice"
    ).groupBy("k").agg(F.max("o_totalprice").alias("px")).limit(200)

    # the tiny aggregated series estimates under the threshold
    # (limit caps the estimate) -> broadcast
    assert auto_distribution(dim) == "broadcast"
    auto = asof_join(li, dim, on="k", strategy="backward", values=["px"])
    plan = auto._jdf.queryExecution().executedPlan().toString()
    # fact side never shuffles on the broadcast route: no hash/range
    # exchange feeds the parquet scan side
    assert "BroadcastExchange" in plan

    explicit = asof_join(
        li, dim, on="k", strategy="backward", values=["px"],
        distribution="shuffle",
    )
    a = sorted(map(tuple, auto.collect()))
    b = sorted(map(tuple, explicit.collect()))
    assert a == b and a  # parity, non-empty

    # threshold off -> auto falls back to shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert auto_distribution(dim) == "shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_auto_distribution_interpolar_default(spark):
    """interpolar's default now broadcasts a dimension-sized curve —
    and stays value-identical to the explicit shuffle route."""
    from pyield_spark.curves.interpolate import interpolar

    # range-derived frames carry KNOWN Catalyst size estimates (a
    # createDataFrame/ExistingRDD scan estimates Long.Max and auto
    # would conservatively pick shuffle — also pinned below)
    curve = spark.range(4).select(
        F.lit("2024-01-02").alias("ref"),
        ((F.col("id") + 1) * 63).alias("dias_uteis"),
        (F.lit(0.10) + (F.col("id") + 1) * 63 / 10000.0).alias("taxa"),
    )
    targets = spark.range(5).select(
        F.lit("2024-01-02").alias("ref"),
        (F.col("id") * 60 + 21).alias("dias_uteis"),
    )
    auto = interpolar(targets, curve, by="ref")
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    shuffle = interpolar(targets, curve, by="ref", distribution="shuffle")
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, shuffle.collect())
    )


def test_auto_exact_rescues_unbounded_estimate(spark):
    """distribution='auto-exact' (r8 VERDICT #3): a tiny curve whose
    Catalyst estimate is UNBOUNDED (createDataFrame scan -> Long.Max,
    so plain auto pins shuffle) gets one bounded count and lands on
    the broadcast-interval route — values identical on all routes."""
    from pyield_spark.curves.interpolate import interpolar
    from pyield_spark.operators.asof import (
        auto_distribution, auto_distribution_exact,
    )

    curve = spark.createDataFrame(
        [("r", (i + 1) * 63, 0.10 + (i + 1) * 63 / 10000.0) for i in range(4)],
        "ref string, dias_uteis long, taxa double",
    )
    targets = spark.createDataFrame(
        [("r", i * 60 + 21) for i in range(5)],
        "ref string, dias_uteis long",
    )
    assert auto_distribution(curve) == "shuffle"  # unbounded estimate
    assert auto_distribution_exact(curve) == "broadcast"  # counted: 4 rows
    exact = interpolar(targets, curve, by="ref", distribution="auto-exact")
    plan = exact._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    got = sorted(map(tuple, exact.collect()))
    for route in ("shuffle", "broadcast", "auto"):
        assert got == sorted(map(tuple, interpolar(
            targets, curve, by="ref", distribution=route).collect())), route


def test_auto_exact_row_cap_falls_back_to_shuffle(spark):
    """Above the row cap the bounded count picks shuffle — the probe
    scan stops at max_rows + 1, never a full pass."""
    from pyield_spark.operators.asof import asof_join, auto_distribution_exact

    big = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "k long, px double"
    )
    assert auto_distribution_exact(big, max_rows=10) == "shuffle"
    assert auto_distribution_exact(big, max_rows=64) == "broadcast"
    # asof_join accepts the mode end to end and matches shuffle values
    left = spark.createDataFrame([(i * 3 + 1,) for i in range(20)], "k long")
    got = sorted(map(tuple, asof_join(
        left, big, on="k", strategy="backward", values=["px"],
        distribution="auto-exact",
    ).collect()))
    want = sorted(map(tuple, asof_join(
        left, big, on="k", strategy="backward", values=["px"],
        distribution="shuffle",
    ).collect()))
    assert got == want


def test_auto_exact_honors_disabled_and_byte_cap(spark):
    """auto-exact never out-broadcasts auto's byte envelope: a disabled
    threshold (-1) resolves to shuffle with no job, and a wide schema
    lowers the effective row cap (rows x defaultSize <= threshold/32)."""
    from pyield_spark.operators.asof import auto_distribution_exact

    tiny = spark.createDataFrame(
        [(i, float(i)) for i in range(5)], "k long, px double"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert auto_distribution_exact(tiny) == "shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # wide rows: 5 rows of ~16KB strings; defaultSize(string)=20 makes
    # the schema-width cap tiny only under a tiny threshold
    wide = spark.createDataFrame(
        [(i,) + ("x" * 16384,) * 8 for i in range(5)],
        "k long, " + ", ".join(f"s{j} string" for j in range(8)),
    )
    try:
        # threshold/32 = 32 bytes < one row's defaultSize*rows -> cap 0
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        assert auto_distribution_exact(wide) == "shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert auto_distribution_exact(tiny) == "broadcast"


def test_auto_exact_measured_bytes_beat_default_size(spark):
    """r9 ADVICE: defaultSize counts any string as ~20 bytes, so a
    side with huge variable-length payloads could pass the schema-width
    row cap yet broadcast far more actual bytes than the threshold/32
    envelope. The probe now measures avg row bytes in the same bounded
    job: 5 rows x 160 KB strings (~800 KB actual, defaultSize says
    ~900 B total) must resolve to shuffle under a 1 MB threshold
    (envelope = 32 KB)."""
    from pyield_spark.operators.asof import auto_distribution_exact

    fat = spark.createDataFrame(
        [(i, "x" * 163840) for i in range(5)], "k long, payload string"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(1 << 20))
        # schema cap admits them (5 rows * 28 B << 32 KB) — measured
        # bytes (5 * ~160 KB) must veto the broadcast
        assert auto_distribution_exact(fat) == "shuffle"
        slim = spark.createDataFrame(
            [(i, "x" * 64) for i in range(5)], "k long, payload string"
        )
        assert auto_distribution_exact(slim) == "broadcast"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

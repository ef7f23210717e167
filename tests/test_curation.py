"""Curation quotas + deterministic moment statistics."""

import math
import statistics

from pyield_spark.queries import QUERIES, load_all

load_all()


def test_domain_cap_bounds(spark, sf_dir):
    out = QUERIES["q_domain_cap"](spark, sf_dir).collect()
    per_src = {}
    for r in out:
        per_src.setdefault(r.source, []).append(r.src_rank)
    for src, ranks in per_src.items():
        assert len(ranks) <= 20
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_domain_cap_single_exchange(spark, sf_dir):
    plan = QUERIES["q_domain_cap"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # one window shuffle (hashpartitioning on source) + the output sort —
    # no extra full-data exchange sneaks in
    assert plan.count("hashpartitioning(source") == 1


def test_moment_stats_vs_python(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = li.select("l_returnflag", "l_quantity", "l_extendedprice").collect()
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(
            (r.l_quantity, r.l_extendedprice)
        )
    got = {
        r.l_returnflag: r
        for r in QUERIES["q_moment_stats"](spark, sf_dir).collect()
    }
    assert set(got) == set(by_flag)
    for flag, pairs in by_flag.items():
        xs = [p[0] for p in pairs]
        ys = [p[1] for p in pairs]
        g = got[flag]
        assert g.n == len(xs)
        assert math.isclose(g.qty_mean, statistics.fmean(xs), rel_tol=1e-6)
        assert math.isclose(
            g.qty_stddev, statistics.stdev(xs), rel_tol=1e-6
        )
        # query rounds to 8 decimals → absolute tolerance floor
        assert math.isclose(
            g.qty_price_corr,
            statistics.correlation(xs, ys),
            rel_tol=1e-5,
            abs_tol=1e-7,
        )


def test_histogram_covers_all_events(spark, sf_dir):
    out = QUERIES["q_value_histogram"](spark, sf_dir).collect()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n_events for r in out) == n_events
    assert all(0 <= r.bin <= 19 for r in out)


def test_returned_revenue_broadcasts_nation(spark, sf_dir):
    plan = (
        QUERIES["q_returned_revenue"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_shipping_priority_filter_pushdown(spark, sf_dir):
    plan = (
        QUERIES["q_shipping_priority"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # segment + both date filters reach the parquet scans
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan


def test_quality_percentile_no_factwide_rank(spark, sf_dir):
    """The per-lang quantile filter must not rank the fact table: the
    only row_number window may partition by (lang, quality_score) —
    cutoff ties — never by lang alone."""
    import re

    plan = (
        QUERIES["q_quality_percentile"](spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    for m in re.finditer(r"row_number\(\).*?windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert "quality_score" in spec, f"fact-wide rank window: {spec}"


def test_quality_percentile_halves_each_lang(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    kept = QUERIES["q_quality_percentile"](spark, sf_dir).collect()
    per_lang = {}
    for r in kept:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
    assert set(per_lang) == set(totals)
    for lang, n in totals.items():
        assert per_lang[lang] == -(-n // 2)  # ceil(n/2)


def test_range_join_is_equi_not_nested_loop(spark, sf_dir):
    """The bucketed interval join must plan as an equi join on
    (user_id, bin) — never a nested-loop over non-equi predicates."""
    plan = (
        QUERIES["q_error_purchase_window"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan
    assert any(j in plan for j in ("BroadcastHashJoin", "ShuffledHashJoin", "SortMergeJoin"))

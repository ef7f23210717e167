"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced end-to-end with the noop sink (count() would let
Catalyst prune the computed columns).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyield_spark.queries import QUERIES, load_all  # noqa: E402
from pyield_spark.session import get_session  # noqa: E402

HEADLINE = [
    "q_pricing_summary",
    "q_region_volume",
    "q_top_customers_per_nation",
    "q_first_last_ship",
    "q_bd_count",
    "q_bd_offset",
    "q_asof_last_order",
    "q_interp_flat_forward",
    "q_forwards_curve",
    "q_ltn_pricing",
    "q_ntnf_pricing",
    "q_exact_dedup",
    "q_minhash_lsh",
    "q_simhash",
    "q_cosine_topk",
    "q_events_sessionize",
    "q_events_tumbling",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    load_all()
    spark = get_session("bench")
    # scaling-contract observability (r10 verdict item 2): echo the
    # requested core count and what the context actually runs with, so
    # an external harness can verify $SPARK_GRAFT_CPUS is honored even
    # when sf0.1 wall times are overhead-bound and don't track cores.
    cpus_env = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    default_par = spark.sparkContext.defaultParallelism

    # warmup: JVM/codegen, table-file listing, calendar-dimension cache
    for warm in ("q_pricing_summary", "q_bd_offset"):
        QUERIES[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # warm the Python worker pool (spark.python.worker.reuse): the first
    # pandas-UDF stage otherwise pays ~32 worker spawns inside whichever
    # query happens to run it first, mis-attributing ~3-5s to that query
    def _noop_kernel(batches):
        for b in batches:
            yield b

    (
        spark.range(0, 256, 1, 32)
        .mapInPandas(_noop_kernel, "id long")
        .write.format("noop").mode("overwrite").save()
    )

    # full suite: headline first (r1-comparable ordering), then the rest.
    # SPARK_GRAFT_BENCH_REPS > 1 takes the per-query MIN over reps —
    # run-to-run variance on a shared box is ±15%, and min-of-N is the
    # standard stable estimator for comparing rounds (default 1 keeps
    # the driver's wall-clock unchanged).
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1")))
    names = HEADLINE + sorted(n for n in QUERIES if n not in HEADLINE)
    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    for name in names:
        best = None
        for i in range(reps):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt_q = time.perf_counter() - t0
            if i == 0:
                # the single-cold-run wall (plan build paid in full) —
                # what the driver's n=1 bench actually experiences
                first_run[name] = round(dt_q, 3)
            best = dt_q if best is None else min(best, dt_q)
        timings[name] = round(best, 3)

    headline_total = round(sum(timings[n] for n in HEADLINE), 3)
    full_total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Full per-query timings go to a FILE: the driver parses bench stdout
    # from a bounded tail buffer (~3 KB of merged out/err), and r2's
    # 123-query JSON line blew past it (BENCH_r02.json: parsed=null).
    # The printed line stays r1-shaped (headline dict only, ~1 KB).
    # The dump lands in the UNTRACKED BENCH_FULL.local.json (r10 verdict
    # item 2: every bench run used to overwrite the committed
    # BENCH_FULL.json, clobbering the builder's min-of-3 evidence in the
    # working tree); the committed BENCH_FULL.json is now a deliberate
    # copy of a representative lap.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_FULL.local.json"), "w") as fh:
            json.dump(
                {
                    "metric": "full_suite_seconds",
                    "value": full_total,
                    "unit": "sec",
                    "n_queries": len(timings),
                    "queries": timings,
                    # first iteration per query (cold plan build) —
                    # identical to "queries" when reps == 1
                    "first_run": first_run,
                    "sf": sf_val,
                    "cpus": cpus_env,
                    "default_parallelism": default_par,
                },
                fh,
                indent=1,
            )
    except OSError as e:  # read-only/full fs must not kill the stdout line
        print(f"BENCH_FULL.local.json write failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": headline_total,
                "unit": "sec",
                "full_suite_seconds": full_total,
                "n_queries": len(timings),
                "queries": {n: timings[n] for n in HEADLINE},
                "sf": sf_val,
                # additions only — the driver's parser reads the keys
                # above; these two let it check the core-count contract
                "cpus": cpus_env,
                "default_parallelism": default_par,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Per-query profile: construction wall (driver hops / eager work),
execution wall (noop sink), and Spark job/stage counts.

Usage: PYTHONPATH=/root/repo python tools/profile_queries.py [q ...]

With no args profiles every registered batch query once (cold), in
bench.py order (headline first), after the same warmup bench.py does.
Prints one line per query:

  name  build_s  exec_s  total_s  jobs  stages

Job/stage counts come from the status tracker (delta of known job ids
around each query) — the empirical "how many passes does this query
actually run" number the optimization guide §1 asks for.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyield_spark.queries import QUERIES, load_all  # noqa: E402
from pyield_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    load_all()
    spark = get_session("profile")
    sc = spark.sparkContext
    from bench import HEADLINE  # noqa: E402

    if not names:
        names = HEADLINE + sorted(n for n in QUERIES if n not in HEADLINE)

    # bench.py warmup equivalent
    for warm in ("q_pricing_summary", "q_bd_offset"):
        QUERIES[warm](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    def _noop_kernel(batches):
        for b in batches:
            yield b

    (
        spark.range(0, 256, 1, 32)
        .mapInPandas(_noop_kernel, "id long")
        .write.format("noop").mode("overwrite").save()
    )

    tracker = sc.statusTracker()

    def job_ids():
        return set(tracker.getJobIdsForGroup(None) or [])

    print(f"{'query':34s} {'build':>7s} {'exec':>7s} {'total':>7s} {'jobs':>5s} {'stages':>6s}")
    rows = []
    for name in names:
        if name.startswith("q_stream_"):
            continue
        before = job_ids()
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        after = job_ids()
        new = sorted(after - before)
        nstages = 0
        for j in new:
            info = tracker.getJobInfo(j)
            if info is not None:
                nstages += len(info.stageIds)
        rows.append((name, t1 - t0, t2 - t1, t2 - t0, len(new), nstages))
        print(
            f"{name:34s} {t1 - t0:7.3f} {t2 - t1:7.3f} {t2 - t0:7.3f}"
            f" {len(new):5d} {nstages:6d}",
            flush=True,
        )
    tot = sum(r[3] for r in rows)
    print(f"TOTAL {tot:.2f}s over {len(rows)} queries")


if __name__ == "__main__":
    main()

"""Min-of-3 A/B lap for a handful of queries: build+exec (noop sink)
per rep, prints min per query. Run once per code variant, back to
back, with a control query to normalize box noise.

Usage: PYTHONPATH=/root/repo python tools/ab_min3.py q_a q_b ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyield_spark.queries import QUERIES, load_all  # noqa: E402
from pyield_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))


def main() -> None:
    names = sys.argv[1:]
    load_all()
    spark = get_session("ab_min3")
    for warm in ("q_pricing_summary", "q_bd_offset"):
        QUERIES[warm](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    def _noop_kernel(batches):
        yield from batches

    (
        spark.range(0, 256, 1, 32)
        .mapInPandas(_noop_kernel, "id long")
        .write.format("noop").mode("overwrite").save()
    )
    for name in names:
        best = best_b = best_e = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            if best is None or t2 - t0 < best:
                best, best_b, best_e = t2 - t0, t1 - t0, t2 - t1
        print(f"{name:32s} build={best_b:6.3f} exec={best_e:6.3f} total={best:6.3f}", flush=True)


if __name__ == "__main__":
    main()

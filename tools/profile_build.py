"""cProfile the CONSTRUCTION of selected queries (the driver-side
plan-build wall: py4j round-trips, eager probe jobs, checkpoint
planning). Guide §1: find where the build seconds actually go before
rewriting anything.

Usage: PYTHONPATH=/root/repo python tools/profile_build.py q_a q_b ...

Per query: wall seconds for QUERIES[name](spark, sf_dir) (NO action),
then the top cumulative-time entries of a cProfile lap of a SECOND
construction (so the tables()/calendar memos are warm, as in the real
suite where a query never runs first).
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

from pyield_spark.queries import QUERIES, load_all  # noqa: E402
from pyield_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    load_all()
    spark = get_session("profile_build")
    for warm in ("q_pricing_summary", "q_bd_offset"):
        QUERIES[warm](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    for name in names:
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR)
        cold = time.perf_counter() - t0

        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        QUERIES[name](spark, SF_DIR)
        pr.disable()
        warm_s = time.perf_counter() - t0

        buf = io.StringIO()
        st = pstats.Stats(pr, stream=buf)
        st.sort_stats("cumulative").print_stats(30)
        print(f"===== {name}: cold_build={cold:.3f}s warm_build={warm_s:.3f}s")
        print(buf.getvalue())


if __name__ == "__main__":
    main()

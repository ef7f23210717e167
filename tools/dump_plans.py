"""Dump .explain("formatted") for every registered batch query.

Usage: PYTHONPATH=/root/repo python tools/dump_plans.py OUTDIR [suffix] [q ...]

Writes OUTDIR/<query><suffix>.txt (suffix e.g. "_before"/"_after" for
the optimization-round evidence files). Streaming queries are skipped
(they execute eagerly on build); queries with construction-time driver
hops run those jobs but nothing is timed here.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyield_spark.queries import QUERIES, load_all  # noqa: E402
from pyield_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else ""
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    load_all()
    spark = get_session("dump_plans")
    todo = names or sorted(QUERIES)
    for name in todo:
        if name.startswith("q_stream_"):
            continue
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record, keep dumping
            plan = f"PLAN DUMP FAILED: {e!r}\n"
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, flush=True)


if __name__ == "__main__":
    main()

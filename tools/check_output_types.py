"""Scan every registered query's output schema for column types the
driver's pandas canonicalizer cannot sort (array/map/struct -> unhashable
python objects). Run at sf0.001; prints offending query/column/type."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyield_spark.queries import QUERIES, load_all  # noqa: E402
from pyield_spark.session import get_session  # noqa: E402

BAD = ("array", "map", "struct")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    load_all()
    spark = get_session("typecheck")
    bad = 0
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"BUILD-ERR {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        for col, dt in df.dtypes:
            if any(dt.startswith(b) for b in BAD):
                print(f"UNSORTABLE {name}.{col}: {dt}")
                bad += 1
    print(f"done: {bad} offending columns/queries out of {len(QUERIES)}")


if __name__ == "__main__":
    main()

"""Physical-plan census over every registered batch query.

For each query: count shuffle exchanges (hash/range/single-partition),
broadcast exchanges, Arrow-batched Python nodes, and scan-level pushdown
evidence — the table PLANS.md cites as suite-wide proof that no query
hides a scale-killer (single-partition window over the fact table,
nested-loop join, row-wise Python).

Usage: PYTHONPATH=/root/repo python tools/plan_census.py [> table.md]
Plans are analyzed, not executed (streaming queries — which execute
eagerly on build — are skipped; their batch twins carry the evidence).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from pyield_spark.queries import QUERIES, load_all  # noqa: E402
from pyield_spark.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def census(plan: str) -> dict[str, int]:
    return {
        "ex_hash": len(re.findall(r"Exchange hashpartitioning", plan)),
        "ex_range": len(re.findall(r"Exchange rangepartitioning", plan)),
        "ex_single": len(re.findall(r"Exchange SinglePartition", plan)),
        "bcast": len(re.findall(r"BroadcastExchange", plan)),
        "py": len(
            re.findall(
                r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan
            )
        ),
        "nlj": len(
            re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", plan)
        ),
    }


def main() -> None:
    load_all()
    spark = get_session("plan_census")
    rows = []
    for name in sorted(QUERIES):
        if name.startswith("q_stream_"):
            continue
        plan = (
            QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        rows.append((name, census(plan)))

    print("| query | hash ex | range ex | single ex | bcast | py | nlj |")
    print("|---|---|---|---|---|---|---|")
    for name, c in rows:
        print(
            f"| {name} | {c['ex_hash']} | {c['ex_range']} | {c['ex_single']}"
            f" | {c['bcast']} | {c['py']} | {c['nlj']} |"
        )
    tot = {k: sum(c[k] for _, c in rows) for k in rows[0][1]}
    print(
        f"\nqueries: {len(rows)}  totals: hash={tot['ex_hash']}"
        f" range={tot['ex_range']} single={tot['ex_single']}"
        f" bcast={tot['bcast']} py={tot['py']} nlj={tot['nlj']}"
    )


if __name__ == "__main__":
    main()

"""Compare two bench JSON records per query (regression attribution).

Usage: python tools/bench_diff.py BENCH_r01.json BENCH_r02.json [threshold]

Accepts either the raw one-line bench.py output or the driver's wrapped
record ({"parsed": {...}} / {"tail": "...{json}..."}). Prints queries
whose time changed by more than ``threshold``× (default 1.5) in either
direction, plus suite totals. Run-to-run variance on a busy box is
±15% — confirm a flagged regression with a second clean run before
chasing it.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d and "tail" in d:
        for line in d["tail"].splitlines():
            line = line.strip()
            if line.startswith('{"metric"'):
                d = json.loads(line)
                break
    return d


def main() -> None:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    qa, qb = a.get("queries", {}), b.get("queries", {})
    print(f"headline: {a.get('value')} -> {b.get('value')}")
    print(
        f"full:     {a.get('full_suite_seconds')} -> "
        f"{b.get('full_suite_seconds')}  "
        f"({len(qa)} -> {len(qb)} queries)"
    )
    flagged = []
    for name in sorted(set(qa) & set(qb)):
        t0, t1 = qa[name], qb[name]
        if t0 > 0 and t1 > 0 and (t1 / t0 > thr or t0 / t1 > thr):
            flagged.append((t1 / t0, name, t0, t1))
    for ratio, name, t0, t1 in sorted(flagged, reverse=True):
        tag = "SLOWER" if ratio > 1 else "faster"
        print(f"  {tag} {ratio:5.2f}x  {name}: {t0:.2f}s -> {t1:.2f}s")
    new = sorted(set(qb) - set(qa))
    gone = sorted(set(qa) - set(qb))
    if new:
        print("new:", ", ".join(new))
    if gone:
        print("gone:", ", ".join(gone))
    if not flagged:
        print(f"no per-query change beyond {thr}x")


if __name__ == "__main__":
    main()

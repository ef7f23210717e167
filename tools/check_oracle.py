"""Local replica of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle SQL at
sf0.01, then compares: row count, column names, and an order-insensitive
value hash over columns sorted by name (floats compared bit-exact, with
a near-miss report when they differ only by tiny epsilons).

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from pyield_spark.queries import QUERIES, ORACLES, load_all  # noqa: E402
from pyield_spark.session import get_session  # noqa: E402

import os

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(canon_cell(r[i]) for i in order) for r in rows)
    return out


def value_hash(lines):
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    load_all()
    wanted = sys.argv[1:] or list(QUERIES)
    spark = get_session("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_pass = n_fail = n_noracle = 0
    for name in wanted:
        fn = QUERIES[name]
        try:
            sdf = fn(spark, SF_DIR)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"NOOR  {name}: rows={len(s_rows)} (rows-only check)")
            n_noracle += 1
            continue
        try:
            res = con.execute(ORACLES[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue

        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            sc = canon_rows(s_cols, s_rows)
            dc = canon_rows(d_cols, d_rows)
            if value_hash(sc) != value_hash(dc):
                diff = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                problems.append(f"valuehash mismatch; first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(s_rows)}")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

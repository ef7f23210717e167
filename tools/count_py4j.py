"""Count py4j commands + wall per helper call — targets the parsed-SQL
rewrite at the functions that actually dominate the build chatter.

Usage: python tools/count_py4j.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import py4j.clientserver as cs  # noqa: E402

_orig = cs.ClientServerConnection.send_command
COUNT = [0]


def _patched(self, command):
    COUNT[0] += 1
    return _orig(self, command)


cs.ClientServerConnection.send_command = _patched

from pyspark.sql import functions as F  # noqa: E402

from pyield_spark.queries import QUERIES, load_all  # noqa: E402
from pyield_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def lap(label, fn):
    c0, t0 = COUNT[0], time.perf_counter()
    out = fn()
    dt, dc = time.perf_counter() - t0, COUNT[0] - c0
    print(f"{label:44s} {dc:6d} cmds {dt*1000:8.1f} ms")
    return out


def main():
    load_all()
    spark = get_session("count_py4j")
    QUERIES["q_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    from pyield_spark import du as du_mod
    from pyield_spark.bonds.cashflows import explode_payment_dates
    from pyield_spark.bonds.pricing import ntnb_cotacao, price_coupon_bond
    from pyield_spark.queries.analytics import _ntnb_panel
    from pyield_spark.queries import tables

    od = tables(spark, SF_DIR, "orders")
    bonds = lap("_ntnb_panel", lambda: _ntnb_panel(spark, SF_DIR))
    flows = lap(
        "explode_payment_dates",
        lambda: explode_payment_dates(bonds, "liq", "ven", 6, "pay"),
    )
    flows2 = lap("du.contar", lambda: du_mod.contar(flows, "liq", "pay", alias="_du"))
    lap("du.contar (2nd)", lambda: du_mod.contar(flows, "liq", "pay", alias="_du"))
    lap(
        "du.deslocar",
        lambda: du_mod.deslocar(flows, "pay", 0, alias="_adj"),
    )
    lap(
        "ntnb_cotacao",
        lambda: ntnb_cotacao(bonds, ["grupo", "ven"], "liq", "ven", "taxa"),
    )
    lap(
        "price_coupon_bond",
        lambda: price_coupon_bond(bonds, ["grupo", "ven"], "liq", "ven", "taxa"),
    )
    from pyield_spark.curves.interpolate import interpolar
    from pyield_spark.queries.fixed_income import _curve_df

    curve = lap("_curve_df", lambda: _curve_df(spark, SF_DIR))
    tgt = od.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("grupo"),
        (F.dayofmonth(F.to_date("o_orderdate")) * 10).cast("long").alias("du_alvo"),
    )
    lap(
        "interpolar shuffle",
        lambda: interpolar(
            tgt, curve, du_col="du_alvo", curve_du="du", curve_rate="taxa",
            by="grupo", distribution="shuffle",
        ),
    )
    lap(
        "interpolar broadcast",
        lambda: interpolar(
            tgt, curve, du_col="du_alvo", curve_du="du", curve_rate="taxa",
            by="grupo", distribution="broadcast",
        ),
    )
    # micro: the primitive costs
    lap("100x F.col op-chain (a+b)*2", lambda: [
        (F.col("a") + F.col("b")) * 2 for _ in range(100)
    ])
    df = od
    lap("10x withColumn", lambda: [
        df.withColumn(f"_c{i}", F.lit(i)) for i in range(10)
    ])
    lap("10x select(*cols)", lambda: [
        df.select("o_orderkey", "o_orderdate") for _ in range(10)
    ])
    lap("1x df.schema access", lambda: tgt.select("grupo").schema)
    lap("1x df.columns", lambda: df.columns)


if __name__ == "__main__":
    main()

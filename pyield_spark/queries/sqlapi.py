"""The engine's SQL face: queries phrased in ANSI SQL via ``spark.sql``
over registered temp views — the same Catalyst plans as the DataFrame
combinators, so everything the engine guarantees (pushdown, broadcast,
decimal determinism) holds verbatim. One dialect nearly serves both
engines; the oracle strings differ only where function names do.
"""

from __future__ import annotations

from pyield_spark.queries import query, tables


def _register(spark, sf_dir, *names):
    for n, df in zip(
        names, [tables(spark, sf_dir, n) for n in names]
    ):
        df.createOrReplaceTempView(n)


_SQL_REVENUE = """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
"""


@query("q_sql_revenue_by_nation", oracle=_SQL_REVENUE)
def q_sql_revenue_by_nation(spark, sf_dir):
    """Four-way join + aggregate written in SQL and executed via
    ``spark.sql`` — the string is byte-identical to the DuckDB oracle
    (the decimal-sum discipline is plain ANSI). Catalyst plans it like
    any DataFrame query: nation/customer broadcast, one groupBy
    exchange."""
    _register(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    return spark.sql(_SQL_REVENUE)


_SQL_TOPN = """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey)
                  AS BIGINT) AS rn
      FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
"""


@query("q_sql_top_orders", oracle=_SQL_TOPN)
def q_sql_top_orders(spark, sf_dir):
    """Per-customer top-3 orders as a SQL window query (deterministic
    o_orderkey tie-break); identical text runs on both engines."""
    _register(spark, sf_dir, "orders")
    return spark.sql(_SQL_TOPN)

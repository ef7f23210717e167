"""Round-4 reference-parity queries:

- ``q_benchmarks`` — the Tesouro benchmark-vigency pipeline
  (pyield/tpf/benchmark.py:56-123): parse API-shaped records (strip,
  tolerant date casts, drop-nulls), keep benchmarks whose vigency
  window contains the reference date, canonical sort.
- ``q_intradia_enrich`` — the B3 intradia snapshot flow
  (pyield/b3/derivativos_intradia.py:51-77 connector shape +
  pyield/futuro/intradia.py:143-172 enrichment): FUT slice, price→rate
  rename, day counts, percent→decimal, DI1 price-from-rate, forward
  curve, DV01.

Both synthesize their reference-shaped input deterministically from the
driver's ``orders`` table (the established pattern of
``q_futures_enrich``) so the DuckDB oracle can restate the full chain.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pyield_spark.queries import query, tables
from pyield_spark.queries.fixed_income import _CAL
from pyield_spark.queries.oracle_helpers import bd_count_sql, pround_sql

_HOJE = dt.date(1995, 6, 15)  # fixed reference "today" inside TPC-H range

_TITULO_CASE_SQL = (
    "CASE t4 WHEN 0 THEN 'LTN' WHEN 1 THEN 'LFT' "
    "WHEN 2 THEN 'NTN-B' ELSE 'NTN-F' END"
)


@query(
    "q_benchmarks",
    oracle=f"""
    WITH b0 AS (
      SELECT DISTINCT
        CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS ini,
        o_orderkey % 4 AS t4, o_orderkey % 10 AS t10
      FROM orders
    ),
    raw AS (
      SELECT
        concat(' ', {_TITULO_CASE_SQL}, ' ') AS titulo_raw,
        CASE WHEN t4 = 3 AND t10 = 9 THEN 'n/d'
             ELSE CAST(ini + TO_MONTHS(CAST(6 + t10 * 6 AS INT)) AS VARCHAR)
        END AS venc_raw,
        concat({_TITULO_CASE_SQL}, ' ', CAST(6 + t10 * 6 AS VARCHAR), ' meses')
          AS bench_raw,
        CAST(ini AS VARCHAR) AS ini_raw,
        CAST(CAST(ini + TO_MONTHS(3) AS DATE) - 1 AS VARCHAR) AS fim_raw
      FROM b0
    ),
    parsed AS (
      SELECT trim(titulo_raw) AS titulo,
             TRY_CAST(venc_raw AS DATE) AS data_vencimento,
             trim(bench_raw) AS benchmark,
             TRY_CAST(ini_raw AS DATE) AS data_inicio,
             TRY_CAST(fim_raw AS DATE) AS data_fim
      FROM raw
    )
    SELECT titulo, data_vencimento, benchmark, data_inicio, data_fim
    FROM parsed
    WHERE titulo IS NOT NULL AND data_vencimento IS NOT NULL
      AND benchmark IS NOT NULL AND data_inicio IS NOT NULL
      AND data_fim IS NOT NULL
      AND DATE '{_HOJE.isoformat()}' BETWEEN data_inicio AND data_fim
    """,
)
def q_benchmarks(spark, sf_dir):
    """Benchmark registry synthesized from order quarters (4 titles ×
    10 tenors per quarter, one malformed maturity to exercise the
    tolerant parse), pushed through the REAL pipeline:
    ``parse_benchmarks`` → ``benchmarks_vigentes`` (vigency BETWEEN on
    the fixed reference date + canonical sort). The vigency filter is a
    pure pushed-down predicate — at 100 TB the registry is a broadcast
    dimension, and ``benchmarks_vigentes`` stays a scan-level filter."""
    from pyield_spark.bonds.benchmark import benchmarks_vigentes, parse_benchmarks

    od = tables(spark, sf_dir, "orders")
    b0 = od.select(
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("ini"),
        (F.col("o_orderkey") % 4).alias("t4"),
        (F.col("o_orderkey") % 10).alias("t10"),
    ).distinct()
    titulo = (
        F.when(F.col("t4") == 0, "LTN")
        .when(F.col("t4") == 1, "LFT")
        .when(F.col("t4") == 2, "NTN-B")
        .otherwise("NTN-F")
    )
    months_fwd = (F.lit(6) + F.col("t10").cast("int") * 6).cast("int")
    raw = b0.select(
        F.concat(F.lit(" "), titulo, F.lit(" ")).alias("TÍTULO"),
        F.when(
            (F.col("t4") == 3) & (F.col("t10") == 9), F.lit("n/d")
        ).otherwise(
            F.add_months("ini", months_fwd).cast("string")
        ).alias("VENCIMENTO"),
        F.concat(
            titulo, F.lit(" "), months_fwd.cast("string"), F.lit(" meses")
        ).alias("BENCHMARK"),
        F.col("ini").cast("string").alias("INÍCIO"),
        F.date_sub(F.add_months("ini", 3), 1).cast("string").alias("TERMINO"),
    )
    return benchmarks_vigentes(parse_benchmarks(raw), hoje=_HOJE)


_SNAP_SQL = f"""
    snap AS (
      SELECT o_orderkey % 40 AS bucket,
             COUNT(*) AS numero_negocios,
             CAST(COUNT(*) * 10 AS BIGINT) AS contratos_abertos,
             round(SUM(o_totalprice), 2) AS volume_financeiro
      FROM orders GROUP BY o_orderkey % 40
    ),
    quotes AS (
      SELECT
        concat('DI1X', lpad(CAST(bucket AS VARCHAR), 2, '0')) AS codigo_negociacao,
        CASE WHEN bucket % 8 = 7 THEN 'OPT' ELSE 'FUT' END AS codigo_mercado,
        CASE WHEN bucket = 5 THEN DATE '1995-06-01'
             ELSE CAST(DATE '1995-07-01' + TO_MONTHS(CAST(bucket * 3 AS INT)) AS DATE)
        END AS data_vencimento,
        round(8.0 + (bucket % 17) * 0.25, 4) AS preco_ultimo,
        round(8.05 + (bucket % 17) * 0.25, 4) AS preco_ajuste_anterior,
        numero_negocios, contratos_abertos, volume_financeiro
      FROM snap
    )"""


@query(
    "q_intradia_enrich",
    oracle=f"""
    WITH {_CAL},
    {_SNAP_SQL.lstrip()},
    fut AS (
      SELECT *, DATE '{_HOJE.isoformat()}' AS data_referencia,
        round(preco_ultimo / 100.0, 10) AS taxa_ultima,
        round(preco_ajuste_anterior / 100.0, 10) AS taxa_ajuste_anterior,
        datediff('day', DATE '{_HOJE.isoformat()}', data_vencimento) AS dias_corridos
      FROM quotes
      WHERE codigo_mercado = 'FUT' AND data_vencimento IS NOT NULL
    ),
    counted AS (
      SELECT f.*,
        CAST({bd_count_sql("f.data_referencia", "f.data_vencimento")} AS BIGINT)
          AS dias_uteis
      FROM fut f
      JOIN cal cs ON cs.data = f.data_referencia
      JOIN cal ce ON ce.data = f.data_vencimento
      WHERE f.dias_corridos > 0
    ),
    priced AS (
      SELECT *,
        dias_uteis / 252.0 AS au,
        round(100000.0 / power(1.0 + taxa_ultima, dias_uteis / 252.0), 2)
          AS preco_ultimo_n
      FROM counted
    ),
    lagged AS (
      SELECT *,
        LAG(taxa_ultima) OVER (ORDER BY dias_uteis) AS tx_j,
        LAG(au) OVER (ORDER BY dias_uteis) AS au_j,
        MIN(dias_uteis) OVER () AS du_min
      FROM priced
    )
    SELECT data_referencia, codigo_negociacao, data_vencimento, dias_uteis,
      CAST(dias_corridos AS BIGINT) AS dias_corridos,
      contratos_abertos, numero_negocios, volume_financeiro,
      {pround_sql("0.0001 * (dias_uteis / 252.0) / (1 + taxa_ultima) * preco_ultimo_n", 6)}
        AS dv01,
      preco_ultimo_n AS preco_ultimo,
      {pround_sql("CASE WHEN dias_uteis = du_min THEN taxa_ultima ELSE power(power(1 + taxa_ultima, au) / power(1 + tx_j, au_j), 1.0 / (au - au_j)) - 1 END", 6)}
        AS taxa_forward,
      taxa_ajuste_anterior, taxa_ultima
    FROM lagged
    """,
)
def q_intradia_enrich(spark, sf_dir):
    """One DI1 snapshot (40 quotes, one per synthetic maturity bucket;
    a few OPT-market rows and one expired contract exercise the
    filters) through the REAL intradia flow: the ``processar_intradia``
    enrichment over the connector's canonical shape. Day counts come
    from the broadcast calendar dimension; the forward curve is one
    window over the (snapshot-sized) quote set — on a directory of
    10-second snapshots the window partitions by snapshot time and the
    whole pipeline stays shuffle-light."""
    from pyield_spark.sources.intradia_json import processar_intradia

    od = tables(spark, sf_dir, "orders")
    snap = od.groupBy((F.col("o_orderkey") % 40).alias("bucket")).agg(
        F.count("*").alias("numero_negocios"),
        (F.count("*") * 10).cast("bigint").alias("contratos_abertos"),
        F.round(F.sum("o_totalprice"), 2).alias("volume_financeiro"),
    )
    quotes = snap.select(
        F.concat(
            F.lit("DI1X"), F.lpad(F.col("bucket").cast("string"), 2, "0")
        ).alias("codigo_negociacao"),
        F.when(F.col("bucket") % 8 == 7, "OPT").otherwise("FUT").alias(
            "codigo_mercado"
        ),
        F.when(
            F.col("bucket") == 5, F.lit(dt.date(1995, 6, 1))
        ).otherwise(
            F.add_months(F.lit(dt.date(1995, 7, 1)), (F.col("bucket") * 3).cast("int"))
        ).alias("data_vencimento"),
        F.round(F.lit(8.0) + (F.col("bucket") % 17) * 0.25, 4).alias("preco_ultimo"),
        F.round(F.lit(8.05) + (F.col("bucket") % 17) * 0.25, 4).alias(
            "preco_ajuste_anterior"
        ),
        "numero_negocios",
        "contratos_abertos",
        "volume_financeiro",
    )
    out = processar_intradia(quotes, "DI1", _HOJE)
    from pyield_spark.functions.numbers import pround_expr

    return out.select(
        "data_referencia",
        "codigo_negociacao",
        "data_vencimento",
        "dias_uteis",
        "dias_corridos",
        "contratos_abertos",
        "numero_negocios",
        "volume_financeiro",
        pround_expr(F.col("dv01"), 6).alias("dv01"),
        "preco_ultimo",
        pround_expr(F.col("taxa_forward"), 6).alias("taxa_forward"),
        "taxa_ajuste_anterior",
        "taxa_ultima",
    )

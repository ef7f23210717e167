"""Corpus-curation quotas and distributed-deterministic statistics.

Two groups of operators a 100 TB training-data pipeline needs beyond
per-document scoring:

- **quota capping** (``q_domain_cap``): bound the contribution of any
  one source/domain to the corpus — the standard defense against a
  single crawl domain dominating the mixture. One rank window per
  source; AQE handles hot-domain skew (a pathological domain can also
  be pre-salted with ``operators.skew.salted_join`` discipline).
- **moment statistics** (``q_moment_stats``, ``q_value_histogram``,
  Q3/Q10-shaped revenue joins): grouped mean/stddev/correlation and
  fixed-bin histograms computed from DECIMAL moment sums, so results
  are independent of partitioning/association order — the built-in
  ``stddev``/``corr`` aggregates accumulate in doubles and drift
  between runs and engines; these don't.

Reference surface: statistical summaries in the reference are driver
-side pandas/Polars ``describe``-style calls (e.g.
/root/reference/pyield/tpf/premios_pre.py post-processing); here they
are first-class distributed aggregates under the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from pyield_spark.queries import query, tables

DEC = "decimal(18,6)"


def _dsum(c):
    """Order-independent double sum: per-row cast to DECIMAL, exact
    decimal accumulation, one cast back to double."""
    return F.sum(c.cast(DEC)).cast("double")


# === per-source quota capping (domain balancing) ==========================

_CAP = 20


@query(
    "q_domain_cap",
    oracle=f"""
    SELECT doc_id, source, CAST(rn AS BIGINT) AS src_rank
    FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    ) WHERE rn <= {_CAP}
    ORDER BY source, src_rank
    """,
)
def q_domain_cap(spark, sf_dir):
    """Keep at most {_CAP} documents per source, preferring longer
    documents (deterministic doc_id tie-break).

    Plan: ONE shuffle (window partitioned by ``source``), then a
    map-side filter — no second pass. At 100 TB the per-domain rank is
    the canonical quota operator; domains are high-cardinality so the
    shuffle spreads, and AQE splits the few hot ones.
    """
    docs = tables(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        docs.select(
            "doc_id",
            "source",
            F.row_number().over(w).cast("long").alias("src_rank"),
        )
        .filter(F.col("src_rank") <= _CAP)
        .orderBy("source", "src_rank")
    )


# === grouped moment statistics (deterministic stddev / corr) ==============


@query(
    "q_moment_stats",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND(sx / n, 8) AS qty_mean,
           ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 8) AS qty_stddev,
           ROUND((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 8)
             AS qty_price_corr
    FROM m ORDER BY l_returnflag
    """,
)
def q_moment_stats(spark, sf_dir):
    """Grouped mean / sample stddev / Pearson correlation from decimal
    moment sums (n, Σx, Σx², Σy, Σy², Σxy).

    The built-in ``stddev_samp``/``corr`` accumulate running doubles —
    partition-order dependent, so two runs (or Spark vs DuckDB) can
    differ in the last ulps. Moment sums in DECIMAL are exact and
    order-free; the final combination is one fixed IEEE expression per
    engine. Map-side partial aggregation still applies — this is a
    single groupBy scan, same shuffle profile as any sum.
    """
    li = tables(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        _dsum(x).alias("sx"),
        _dsum(x * x).alias("sxx"),
        _dsum(y).alias("sy"),
        _dsum(y * y).alias("syy"),
        _dsum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sxx = F.col("sx"), F.col("sxx")
    sy, syy = F.col("sy"), F.col("syy")
    sxy = F.col("sxy")
    return m.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 8).alias("qty_mean"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - F.lit(1.0))), 8).alias(
            "qty_stddev"
        ),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            8,
        ).alias("qty_price_corr"),
    ).orderBy("l_returnflag")


# === fixed-bin histogram ==================================================

_BIN_W = 25.0
_N_BINS = 20


@query(
    "q_value_histogram",
    oracle=f"""
    SELECT CAST(LEAST(FLOOR(value / {_BIN_W}), {_N_BINS - 1}) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY bin ORDER BY bin
    """,
)
def q_value_histogram(spark, sf_dir):
    """Fixed-width histogram of ``events.value`` ({_N_BINS} bins of
    {_BIN_W}, last bin open-ended).

    Bucket assignment is a map-side integer expression (no sort, no
    sampling pass — unlike quantile-based binning); the aggregate is
    one {_N_BINS}-group groupBy. The cheapest possible distribution
    profile at any scale.
    """
    ev = tables(spark, sf_dir, "events")
    bin_ = (
        F.least(F.floor(F.col("value") / _BIN_W), F.lit(_N_BINS - 1))
        .cast("long")
        .alias("bin")
    )
    return (
        ev.groupBy(bin_)
        .agg(
            F.count("*").alias("n_events"),
            _dsum(F.col("value")).alias("sum_value"),
        )
        .orderBy("bin")
    )


# === Q3-shaped shipping priority (3-way join + top-k) =====================

_Q3_DATE = "1998-06-01"


@query(
    "q_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{_Q3_DATE}'
      AND l_shipdate  > TIMESTAMP '{_Q3_DATE}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: segment-filtered customers × open orders ×
    not-yet-shipped lines, revenue top-10.

    Both filters are pushed to the parquet scans (PushedFilters on
    ``c_mktsegment``/``o_orderdate``/``l_shipdate``); the filtered
    customer side shrinks ~5× so AQE converts that join to broadcast at
    moderate SF, and the orderkey join stays a shuffle join co-
    partitioned with the final groupBy (one exchange serves both).
    Top-10 is a TakeOrdered, not a full sort.
    """
    cu, od, li = tables(spark, sf_dir, "customer", "orders", "lineitem")
    cut = F.lit(_Q3_DATE).cast("timestamp")
    return (
        cu.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .join(
            od.filter(F.col("o_orderdate") < cut).select(
                "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            li.filter(F.col("l_shipdate") > cut).select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# === Q10-shaped returned-item revenue (4-way join + top-k) ================


@query(
    "q_returned_revenue",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue
    FROM customer
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    nation attached, top-20.

    Join order declared small-to-large: nation is an explicit
    broadcast (25 rows — never a shuffle); the returnflag filter
    reaches the lineitem scan; the orders⋈lineitem shuffle join feeds
    a groupBy on the customer key that reuses the customer join's
    partitioning.
    """
    cu, na, od, li = tables(
        spark, sf_dir, "customer", "nation", "orders", "lineitem"
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(
            od.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cu.select("c_custkey", "c_name", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# === exact per-language quality-percentile filter =========================


def _qscore_sql() -> str:
    from pyield_spark.queries.llm_data import _SW_EN, _TOKS
    from pyield_spark.queries.oracle_helpers import pround_sql

    return pround_sql(
        "0.4 * least(len(" + _TOKS + ") / 100.0, 1.0)"
        " + 0.4 * (len(list_filter(" + _TOKS + ", t -> list_contains(" + _SW_EN + ", t)))"
        "          / CAST(len(" + _TOKS + ") AS DOUBLE))"
        " + 0.2 * (1 - length(regexp_replace(text, '[^.,;:!?]', '', 'g'))"
        "              / CAST(length(text) AS DOUBLE))",
        6,
    )


@query(
    "q_quality_percentile",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, {_qscore_sql()} AS quality_score
      FROM documents
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY quality_score DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n_lang
      FROM scored
    )
    SELECT doc_id, lang, quality_score
    FROM ranked WHERE rn <= CAST(ceil(n_lang / 2.0) AS BIGINT)
    ORDER BY doc_id
    """,
)
def q_quality_percentile(spark, sf_dir):
    """Keep the top half of each language by quality score (exact, with
    doc_id tie-break) — the per-group quantile filter of a curation
    pipeline, WITHOUT ranking the fact table.

    A per-lang ``row_number`` would funnel each language through one
    reducer (lang is low-cardinality — the classic skewed-window trap).
    Instead: scores are 6dp-rounded, so the (lang, score) histogram is
    small and bounded — aggregate it, run the cumulative window over
    THAT (thousands of rows, not documents), derive each language's
    cutoff score + quota at the cutoff, broadcast the cutoffs back, and
    rank only the cutoff-score ties (a vanishing fraction). The fact
    table is never globally sorted; the only full shuffle is the
    (lang, score) groupBy — map-side combinable.

    The oracle states the same selection as the naive per-lang ranking —
    the two formulations are equivalent because within a kept score every
    doc is kept, and at the cutoff score the lowest doc_ids fill the
    remaining quota.
    """
    from pyield_spark.operators import text as tx

    docs = tables(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", tx.quality_score_expr("text").alias("quality_score")
    )

    hist = scored.groupBy("lang", "quality_score").agg(
        F.count("*").alias("_cnt")
    )
    w_lang = Window.partitionBy("lang")
    w_cum = (
        w_lang.orderBy(F.col("quality_score").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cuts = (
        hist.withColumn("_before", F.coalesce(F.sum("_cnt").over(w_cum), F.lit(0)))
        .withColumn("_k", F.ceil(F.sum("_cnt").over(w_lang) / 2.0))
        .filter(F.col("_before") < F.col("_k"))
        .select(
            "lang",
            "quality_score",
            # quota at this score: full bucket, or the remainder at the cutoff
            F.least(F.col("_cnt"), F.col("_k") - F.col("_before")).alias("_quota"),
            (F.col("_before") + F.col("_cnt") <= F.col("_k")).alias("_full"),
        )
    )
    joined = scored.join(F.broadcast(cuts), ["lang", "quality_score"])
    full = joined.filter(F.col("_full")).select("doc_id", "lang", "quality_score")
    # ties at the cutoff score only: rank by doc_id inside (lang, score)
    w_tie = Window.partitionBy("lang", "quality_score").orderBy("doc_id")
    partial = (
        joined.filter(~F.col("_full"))
        .withColumn("_rn", F.row_number().over(w_tie))
        .filter(F.col("_rn") <= F.col("_quota"))
        .select("doc_id", "lang", "quality_score")
    )
    return full.unionByName(partial).orderBy("doc_id")


# === Q9-shaped product profit (5-way join, year rollup) ===================


@query(
    "q_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - p_retailprice * 0.6 * l_quantity
                    AS DECIMAL(18,6))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%a%'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit (revenue − 60%-of-retail supply cost) per
    supplier nation per order year, parts filtered by name.

    Five-way join declared smallest-dims-first: nation broadcasts
    (25 rows), supplier and the name-filtered part side are broadcast
    at bench scale and hash joins co-partitioned on the lineitem keys
    beyond the AQE threshold; the orderkey join is the only big-×-big
    shuffle and it feeds the (nation, year) aggregate directly. The
    LIKE filter is pushed into the part scan (StringContains)."""
    li, od, pa, su, na = tables(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "nation"
    )
    return (
        li.join(
            od.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == od.o_orderkey,
        )
        .join(
            pa.filter(F.col("p_name").contains("a")).select(
                "p_partkey", "p_retailprice"
            ),
            li.l_partkey == pa.p_partkey,
        )
        .join(su.select("s_suppkey", "s_nationkey"), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - F.col("p_retailprice") * 0.6 * F.col("l_quantity")
                ).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("profit")
        )
        .orderBy("nation", "o_year")
    )


# === URL canonicalization + dedup ========================================
# The first dedup pass of every web-corpus pipeline (CommonCrawl/C4/
# RefinedWeb): normalize crawl URLs (case-fold scheme+host, strip www,
# fragments, and utm_* tracking params) and keep one document per
# canonical URL. Pure column expressions end-to-end — one projection +
# one min-over-canonical-key window (hash-partitioned by URL, no skew
# beyond genuine hot URLs, which AQE splits).

_URL_SYNTH_SQL = """
    u0 AS (
      SELECT doc_id,
        'HTTPS://WWW.' || upper(source) || '.Example.COM/Docs/'
          || CAST(doc_id % 37 AS VARCHAR)
          || '/?utm_source=feed&ref=' || CAST(doc_id % 5 AS VARCHAR)
          || CASE WHEN doc_id % 3 = 0 THEN '&utm_campaign=x' ELSE '' END
          || CASE WHEN doc_id % 4 = 0
                  THEN '#sec' || CAST(doc_id % 6 AS VARCHAR) ELSE '' END
          AS url
      FROM documents
    )"""


@query(
    "q_url_dedup",
    oracle=f"""
    WITH {_URL_SYNTH_SQL.lstrip()},
    c1 AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS u FROM u0),
    c2 AS (SELECT doc_id,
                  regexp_replace(
                    u, '([?&])utm_[a-z]+=[^&]*(&utm_[a-z]+=[^&]*)*&?',
                    '\\1', 'g') AS u
           FROM c1),
    c3 AS (SELECT doc_id, regexp_replace(u, '[?&]+$', '') AS u FROM c2),
    canon AS (
      SELECT doc_id,
        regexp_replace(lower(regexp_extract(u, '^[A-Za-z]+://[^/?#]*')),
                       '://www\\.', '://')
          || regexp_replace(u, '^[A-Za-z]+://[^/?#]*', '') AS canonical_url
      FROM c3
    )
    SELECT doc_id, canonical_url,
           doc_id = MIN(doc_id) OVER (PARTITION BY canonical_url) AS keep
    FROM canon
    """,
)
def q_url_dedup(spark, sf_dir):
    """Canonicalize synthetic crawl URLs and keep the lowest doc_id per
    canonical URL. Canonicalization: drop the fragment, strip utm_*
    tracking params (and any dangling ?/&), lower-case scheme+host,
    drop the www. prefix — path case is preserved (paths are
    case-sensitive on real origins)."""
    from pyield_spark.operators.text import canonical_url_expr

    docs = tables(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper("source"),
        F.lit(".Example.COM/Docs/"),
        (F.col("doc_id") % 37).cast("string"),
        F.lit("/?utm_source=feed&ref="),
        (F.col("doc_id") % 5).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("&utm_campaign=x")).otherwise(""),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("#sec"), (F.col("doc_id") % 6).cast("string")),
        ).otherwise(""),
    )
    canon = docs.select(
        "doc_id", canonical_url_expr(url).alias("canonical_url")
    )
    w = Window.partitionBy("canonical_url")
    return canon.select(
        "doc_id",
        "canonical_url",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
    )


# === model-based quality filtering (round 10): trained LR classifier =====


def _clf_oracle() -> str:
    from pyield_spark.operators import classifier as clf
    from pyield_spark.queries.clf_artifact import CLF_WEIGHTS
    from pyield_spark.queries.llm_data import _SW_EN, _TOKS

    prob = clf.logreg_prob_sql_duck(
        CLF_WEIGHTS, clf.clf_features_sql_duck(_TOKS, _SW_EN)
    )
    label = clf.clf_label_sql_duck(_TOKS, _SW_EN)
    return f"""
    WITH scored AS (
      SELECT doc_id, {prob} AS p_keep, {label} AS label_keep
      FROM documents
    )
    SELECT doc_id, p_keep,
           p_keep >= 0.5e0 AS pred_keep,
           label_keep,
           (p_keep >= 0.5e0) = label_keep AS correct
    FROM scored
    """


@query("q_quality_classifier", oracle=_clf_oracle())
def q_quality_classifier(spark, sf_dir):
    """Model-based quality filtering — the CCNet/LLaMA-style trained
    classifier stage: every document scored by a logistic regression
    DISTILLED (inside the engine: iterative full-batch gradient
    aggregation, `operators/classifier.py::logreg_train`) from the
    active-Gopher weak label, served with weights pinned in
    `queries/clf_artifact.py` (train accuracy 0.950 at sf0.01).

    Serving is map-only expression arithmetic in the scan projection —
    integer counts, single IEEE divisions, a left-associative logit
    fold and one pround(σ, 6) for the sigmoid's exp — no shuffle, no
    UDF, no broadcast; the DuckDB oracle replays the identical model
    from the same pinned constants. label_keep/correct columns keep the
    weak label and the disagreement surface inside the hash gate (the
    audit a production filter ships with)."""
    from pyield_spark.operators import classifier as clf
    from pyield_spark.queries.clf_artifact import CLF_WEIGHTS

    docs = tables(spark, sf_dir, "documents")
    p = clf.logreg_prob(CLF_WEIGHTS, clf.clf_features("text"))
    scored = docs.select(
        "doc_id", p.alias("p_keep"), clf.clf_label("text").alias("label_keep")
    )
    return scored.select(
        "doc_id",
        "p_keep",
        (F.col("p_keep") >= 0.5).alias("pred_keep"),
        "label_keep",
        ((F.col("p_keep") >= 0.5) == F.col("label_keep")).alias("correct"),
    )

"""Semantic-clustering and span/chunk training-data queries.

Four operators a 100 TB pre-training pipeline runs between scoring and
assembly: aligned-span exact substring dedup (Lee et al. 2021,
simplified to fixed token windows), fixed-size chunking with stride
(training-sample prep), deterministic k-means clustering, and
SemDeDup-style semantic dedup (Abbas et al. 2023) with clusters as the
blocking key.

Oracle strategy: spans/chunks are pure string slicing (bit-portable);
k-means distances are sequential double folds, centroid means are
decimal-accumulated, and every argmin/ranking carries an id tie-break —
DuckDB replays all four bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyield_spark.operators import semantic as sm
from pyield_spark.operators import text as tx
from pyield_spark.functions.numbers import pround_expr
from pyield_spark.queries import query, tables
from pyield_spark.queries.llm_data import _TOKS
from pyield_spark.queries.oracle_helpers import pround_sql

_SPAN = 10  # tokens per aligned span
_CHUNK, _STRIDE = 200, 150  # chars

_SPANS_SQL = f"""
  list_transform(
    range(1, CAST(len({_TOKS}) // {_SPAN} AS BIGINT) + 1),
    i -> array_to_string(
           list_slice({_TOKS}, (i - 1) * {_SPAN} + 1, (i - 1) * {_SPAN} + {_SPAN}),
           ' '))
""".strip()

_SQDIST = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),"
    " i -> ({a}.v[i] - {c}.c[i]) * ({a}.v[i] - {c}.c[i]))), (acc, x) -> acc + x)"
)
_DOT_AB = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),"
    " i -> a.v[i] * b.v[i])), (acc, x) -> acc + x)"
)

# shared k-means CTE chain (seed = lowest ids, 2 Lloyd iterations):
# assignment tie-breaks on (dist, cid); centroid means sum in DECIMAL
# then divide once in DOUBLE — both replayed exactly by DuckDB.
# k follows the SemDeDup sizing rule k ≈ N / target_cluster_size: the
# intra-cluster pair space is Σ n_c² ≈ N²/k, so k must GROW with N for
# the blocked self-join to stay linear — 32 clusters ≈ 60 vectors each
# at this SF (k=8 left ~250-vector clusters: 4× the pairs for the same
# dedup quality).
_KM_K = 32
_KMEANS_CTES = f"""
    base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c0 AS (SELECT vec_id AS cid, v AS c FROM base ORDER BY vec_id LIMIT {_KM_K}),
    d1 AS (
      SELECT b.vec_id, c.cid, {_SQDIST.format(a="b", c="c")} AS dist
      FROM base b, c0 c
    ),
    a1 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d1) WHERE rn = 1
    ),
    s1 AS (
      SELECT a1.cid, t.i,
             CAST(SUM(CAST(b.v[t.i] AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS m
      FROM a1 JOIN base b USING (vec_id), generate_series(1, 64) t(i)
      GROUP BY a1.cid, t.i
    ),
    c1 AS (SELECT cid, list(m ORDER BY i) AS c FROM s1 GROUP BY cid),
    d2 AS (
      SELECT b.vec_id, c.cid, {_SQDIST.format(a="b", c="c")} AS dist
      FROM base b, c1 c
    ),
    a2 AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d2) WHERE rn = 1
    )
"""


@query(
    "q_span_dedup",
    oracle=f"""
    WITH sp0 AS (SELECT doc_id, {_SPANS_SQL} AS spans FROM documents),
    sp AS (SELECT doc_id, md5(unnest(spans)) AS h FROM sp0),
    cnt AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM sp GROUP BY h)
    SELECT sp.doc_id,
      CAST(COUNT(*) AS INT) AS n_spans,
      CAST(SUM(CASE WHEN cnt.df >= 2 THEN 1 ELSE 0 END) AS INT) AS n_dup_spans,
      {pround_sql(
          "CAST(SUM(CASE WHEN cnt.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)",
          6)} AS dup_frac
    FROM sp JOIN cnt USING (h)
    GROUP BY sp.doc_id
    """,
)
def q_span_dedup(spark, sf_dir):
    """Aligned-span exact substring dedup: per document, how many of its
    10-token spans appear (verbatim) in at least one other document.

    Scale shape: explode → md5 span key (128-bit: join stays narrow and
    collision-free at 100 TB, no raw-text shuffle) → one groupBy(h) with
    a map-side-combinable distinct-doc count → hash join back → one
    groupBy(doc_id). All shuffles are on uniform hash keys.
    """
    docs = tables(spark, sf_dir, "documents")
    sp = docs.select(
        "doc_id", F.explode(tx.spans_expr("text", _SPAN)).alias("_span")
    ).select("doc_id", F.md5("_span").alias("h"))
    cnt = sp.groupBy("h").agg(F.countDistinct("doc_id").alias("df"))
    dup = F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
    return (
        sp.join(cnt, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_spans"),
            dup.cast("int").alias("n_dup_spans"),
            pround_expr(dup.cast("double") / F.count("*"), 6).alias("dup_frac"),
        )
    )


@query(
    "q_chunk_documents",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, text,
        CAST(CASE WHEN length(text) > {_CHUNK}
                  THEN (length(text) - {_CHUNK} + {_STRIDE} - 1) // {_STRIDE}
                  ELSE 0 END + 1 AS INT) AS n_chunks
      FROM documents
    ),
    e AS (SELECT doc_id, text, unnest(range(0, CAST(n_chunks AS BIGINT))) AS i FROM n)
    SELECT doc_id, CAST(i AS INT) AS chunk_id,
      substr(text, CAST(i * {_STRIDE} + 1 AS INT), {_CHUNK}) AS chunk_text,
      CAST(length(substr(text, CAST(i * {_STRIDE} + 1 AS INT), {_CHUNK})) AS INT)
        AS chunk_len
    FROM e
    """,
)
def q_chunk_documents(spark, sf_dir):
    """Fixed-size chunking with stride (200-char windows every 150):
    the standard training-sample prep cut. One narrow explode (≤ a
    small constant per doc), no shuffle at all — chunking is map-only,
    which is exactly why it belongs in the scan stage at 100 TB."""
    docs = tables(spark, sf_dir, "documents")
    n = docs.select(
        "doc_id",
        "text",
        tx.chunk_count_expr(F.length("text"), _CHUNK, _STRIDE).alias("n_chunks"),
    )
    e = n.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
    )
    chunk = F.col("text").substr(
        F.col("chunk_id") * _STRIDE + 1, F.lit(_CHUNK)
    )
    return e.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("int").alias("chunk_len"),
    )


@query(
    "q_kmeans_clusters",
    oracle=f"""
    WITH {_KMEANS_CTES}
    SELECT vec_id, cid AS cluster, {pround_sql("dist", 6)} AS dist
    FROM a2
    """,
)
def q_kmeans_clusters(spark, sf_dir):
    """Deterministic 2-iteration Lloyd over the embeddings (k=_KM_K,
    seeds = lowest ids). Assignment is a map-only Arrow-batched numpy
    argmin kernel over driver-hopped centroids (round 6; fold-order-
    preserving, bit-exact vs the oracle) — the N·k candidates never
    shuffle; the only aggregations are k·dim mean cells. See
    operators/semantic.py for the 100 TB notes."""
    emb = tables(spark, sf_dir, "embeddings")
    out = sm.kmeans_assign(emb, "vec_id", "embedding", k=_KM_K, iters=2)
    return out.select(
        F.col("_vid").alias("vec_id"),
        F.col("_cid").alias("cluster"),
        pround_expr(F.col("_dist"), 6).alias("dist"),
    )


@query(
    "q_semantic_dedup",
    oracle=f"""
    WITH {_KMEANS_CTES},
    n2 AS (
      SELECT vec_id,
        list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(v, x -> x * x)),
                    (acc, x) -> acc + x) AS norm2
      FROM base
    ),
    j AS (
      SELECT a2.vec_id, a2.cid, base.v, n2.norm2
      FROM a2 JOIN base USING (vec_id) JOIN n2 USING (vec_id)
    ),
    drops AS (
      SELECT DISTINCT b.vec_id
      FROM j a JOIN j b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE {pround_sql(_DOT_AB + " / (sqrt(a.norm2) * sqrt(b.norm2))", 6)} >= 0.2
    )
    SELECT j.vec_id, j.cid AS cluster,
           j.vec_id NOT IN (SELECT vec_id FROM drops) AS keep
    FROM j
    """,
)
def q_semantic_dedup(spark, sf_dir):
    """SemDeDup: k-means clusters as the blocking key, cosine ≥ 0.2
    within a cluster drops the higher id. Pair space is bounded by the
    cluster size (k = _KM_K follows k ∝ N — see the CTE note), so the
    self-join stays linear — the same reasoning as the LSH-bucketed
    near-dup path."""
    emb = tables(spark, sf_dir, "embeddings")
    return sm.semantic_dedup(emb, "vec_id", "embedding", k=_KM_K, iters=2, tau=0.2)


@query(
    "q_boilerplate_strip",
    oracle=f"""
    WITH bsp0 AS (SELECT doc_id, source, {_SPANS_SQL} AS spans FROM documents),
    bsp AS (SELECT doc_id, source, u.i AS i, spans[u.i] AS span
            FROM bsp0, LATERAL unnest(range(1, len(spans) + 1)) u(i)),
    bdf AS (SELECT source, span, COUNT(DISTINCT doc_id) AS df
            FROM bsp GROUP BY 1, 2),
    kept AS (
      SELECT s.doc_id, s.i, s.span, d.df >= 2 AS is_bp
      FROM bsp s JOIN bdf d ON d.source = s.source AND d.span = s.span
    ),
    agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(SUM(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
             COALESCE(string_agg(CASE WHEN NOT is_bp THEN span END, ' '
                                 ORDER BY i), '') AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(a.n_spans, 0) AS n_spans,
           COALESCE(a.n_dropped, 0) AS n_dropped,
           COALESCE(a.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
    """,
)
def q_boilerplate_strip(spark, sf_dir):
    """Boilerplate removal as a TRANSFORM, not a flag: spans repeated
    across >= 2 documents of the same source (header/footer/nav
    boilerplate at web scale) are dropped and the document text is
    REBUILT from the surviving spans in order. The ordered reassembly
    is the distributed-engine-specific part: collect_list carries the
    span index, array_sort restores document order deterministically
    (no ordering guarantee from the shuffle itself). Aligned-span
    granularity — the ragged tail under one span never participates.

    Scale shape: one explode + one (source, span) count + one groupBy
    per doc; the span-frequency side joins back per (source, span) —
    corpus-sized, co-partitioned, never broadcast-blind at 100 TB."""
    docs = tables(spark, sf_dir, "documents")
    sp = docs.select(
        "doc_id",
        "source",
        F.posexplode(tx.spans_expr("text", 10)).alias("i", "span"),
    )
    dfc = sp.groupBy("source", "span").agg(
        F.count_distinct("doc_id").alias("_df")
    )
    kept = sp.join(dfc, ["source", "span"]).withColumn(
        "_is_bp", F.col("_df") >= 2
    )
    agg = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum(F.col("_is_bp").cast("int")).cast("long").alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("_is_bp"),
                            F.struct(F.col("i").alias("i"), F.col("span").alias("s")),
                        )
                    )
                ),
                lambda s: s["s"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


# === within-document repetition removal: keep the FIRST occurrence of
# each repeated aligned span inside the same document ======================


@query(
    "q_intradoc_dedup",
    oracle=f"""
    WITH sp0 AS (SELECT doc_id, {_SPANS_SQL} AS spans FROM documents),
    sp AS (SELECT doc_id, u.i AS i, spans[u.i] AS span
           FROM sp0, LATERAL unnest(range(1, len(spans) + 1)) u(i)),
    firsts AS (
      SELECT doc_id, span, MIN(i) AS i, COUNT(*) AS cnt
      FROM sp GROUP BY doc_id, span
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_spans,
             CAST(SUM(cnt - 1) AS BIGINT) AS n_dropped,
             string_agg(span, ' ' ORDER BY i) AS clean_text
      FROM firsts GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(a.n_spans, 0) AS n_spans,
           COALESCE(a.n_dropped, 0) AS n_dropped,
           COALESCE(a.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
    """,
)
def q_intradoc_dedup(spark, sf_dir):
    """Within-document repetition REMOVAL (the transform behind Gopher's
    repetition flags, q_repetition_stats): every repeated aligned span
    inside one document keeps only its first occurrence and the text is
    rebuilt in order. Complements q_boilerplate_strip (cross-doc spans)
    and q_span_dedup (cross-doc flags). See
    ``operators/semantic.py::intradoc_span_dedup`` for the scale notes.
    """
    docs = tables(spark, sf_dir, "documents")
    return sm.intradoc_span_dedup(docs, "text", "doc_id", span_tokens=_SPAN)

"""Corpus-statistics queries: vocabulary building, integer-TF-IDF
distinctive terms, and Gopher-style repetition metrics over the
``documents`` table — the counting/filter stages between per-document
scoring (``llm_data.py``) and assembly (``training_data.py``).

Oracle strategy: one exploded-token CTE drives all three; every ranking
is an integer total order and every ratio a single IEEE division, so
DuckDB replays the results bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyield_spark.operators import vocab as vb
from pyield_spark.queries import query, tables
from pyield_spark.queries.llm_data import _GRAMS3, _TOKS
from pyield_spark.queries.oracle_helpers import pround_sql

_TOK_CTES = f"""
    tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    pd AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf_doc
           FROM tok GROUP BY doc_id, token)
"""

_BIGRAMS = f"""
  list_transform(
    range(1, greatest(len({_TOKS}) - 1, 0) + 1),
    i -> concat_ws(' ', {_TOKS}[i], {_TOKS}[i+1]))
""".strip()


@query(
    "q_vocab_topk",
    oracle=f"""
    WITH {_TOK_CTES}
    SELECT token,
           CAST(sum(tf_doc) AS BIGINT) AS tf,
           CAST(count(*) AS BIGINT) AS df
    FROM pd GROUP BY token
    ORDER BY tf DESC, token LIMIT 50
    """,
)
def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary, top-50 by total term frequency. Two-level
    word count ((doc,token) then token — both map-side combinable) and
    a global top-k that Spark executes as TakeOrderedAndProject, never
    a full sort. (tf DESC, token ASC) is a total order: tokens are
    unique after the groupBy, so LIMIT is deterministic."""
    docs = tables(spark, sf_dir, "documents")
    per_doc = vb.doc_term_counts(docs, "text", "doc_id")
    return (
        vb.vocabulary(per_doc)
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(50)
    )


@query(
    "q_distinctive_terms",
    oracle=f"""
    WITH {_TOK_CTES},
    v AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM pd GROUP BY token),
    r AS (
      SELECT pd.doc_id, pd.token, pd.tf_doc AS tf, v.df,
             ROW_NUMBER() OVER (PARTITION BY pd.doc_id
                                ORDER BY v.df ASC, pd.tf_doc DESC, pd.token ASC)
               AS rank
      FROM pd JOIN v USING (token))
    SELECT doc_id, token, tf, df, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 3
    """,
)
def q_distinctive_terms(spark, sf_dir):
    """Top-3 distinctive terms per document — TF-IDF restated as the
    integer total order (corpus-df ASC, doc-tf DESC, token ASC): no
    float logs, same induced ranking, bit-portable across engines."""
    docs = tables(spark, sf_dir, "documents")
    out = vb.distinctive_terms(docs, "text", "doc_id", k=3)
    return out.select("doc_id", "token", "tf", "df", F.col("rank").cast("int").alias("rank"))


@query(
    "q_repetition_stats",
    oracle=f"""
    WITH {_TOK_CTES},
    base AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_distinct
      FROM documents),
    tt AS (SELECT doc_id, CAST(max(tf_doc) AS BIGINT) AS top_tf FROM pd GROUP BY doc_id),
    bg AS (SELECT doc_id, unnest({_BIGRAMS}) AS bg FROM documents),
    tb AS (
      SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_tf FROM (
        SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg)
      GROUP BY doc_id)
    SELECT base.doc_id, n_tokens, n_distinct, top_tf,
           COALESCE(top_bigram_tf, 0) AS top_bigram_tf,
           CAST(n_tokens - n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             AS dup_word_ratio,
           CAST(top_tf AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_share,
           CASE WHEN n_tokens > 1
                THEN CAST(COALESCE(top_bigram_tf, 0) AS DOUBLE)
                     / CAST(n_tokens - 1 AS DOUBLE)
           END AS top_bigram_share
    FROM base
    JOIN tt USING (doc_id)
    LEFT JOIN tb USING (doc_id)
    """,
)
def q_repetition_stats(spark, sf_dir):
    """Gopher repetition-removal metrics per document: duplicate-word
    ratio, most-repeated-word count/share, most-repeated-bigram count.
    Array metrics ride the scan; the two mode-counts group by
    (doc, gram) — map-side combinable, no cross-document keys."""
    docs = tables(spark, sf_dir, "documents")
    return vb.repetition_stats(docs, "text", "doc_id")


# === cross-source contamination: shared shingles between sources ==========


@query(
    "q_source_overlap",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT source, unnest({_GRAMS3}) AS shingle
      FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM d a JOIN d b ON a.shingle = b.shingle AND a.source < b.source
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_source_overlap(spark, sf_dir):
    """Cross-source contamination matrix: for every source pair, how
    many distinct 3-token shingles they share — the provenance-audit
    companion to per-document dedup (is source A a scrape of source B?).

    Plan: distinct (source, shingle) is one shuffle; the self-join is
    equi on the shingle (bucketed by construction, never all-pairs);
    the pair aggregate is tiny (|sources|²). A corpus-wide hub shingle
    skews the join key — AQE skew-join splits it; at 100 TB also cap
    hub shingles by document frequency first (they carry no
    provenance signal)."""
    docs = tables(spark, sf_dir, "documents")
    from pyield_spark.operators.dedup import shingles_expr

    d = docs.select(
        "source", F.explode(shingles_expr("text", 3)).alias("shingle")
    ).distinct()
    a = d.select(F.col("source").alias("source_a"), "shingle")
    b = d.select(F.col("source").alias("source_b"), "shingle")
    return (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
        .orderBy("source_a", "source_b")
    )


# === winnowing fingerprints (MOSS-style local-min sampling) ===============

_WINNOW_W = 4  # hashes per winnowing window (guarantee threshold w+k-1 tokens)


@query(
    "q_winnow_fingerprint",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
        list_transform(
          range(1, greatest(len({_TOKS}) - 2, 0) + 1),
          i -> md5(concat_ws(' ', {_TOKS}[i], {_TOKS}[i+1], {_TOKS}[i+2]))
        ) AS h
      FROM documents
    )
    SELECT doc_id,
      CAST(greatest(len(h) - {_WINNOW_W - 1}, 0) AS BIGINT) AS n_windows,
      CAST(len(list_distinct(list_transform(
        range(1, greatest(len(h) - {_WINNOW_W - 1}, 0) + 1),
        i -> least(h[i], h[i+1], h[i+2], h[i+3])
      ))) AS BIGINT) AS n_fp
    FROM g ORDER BY doc_id
    """,
)
def q_winnow_fingerprint(spark, sf_dir):
    """Winnowing (Schleimer et al. 2003, MOSS): hash every ordered
    3-token k-gram, slide a {_WINNOW_W}-hash window, keep each window's
    minimum — the classic position-robust document fingerprint (any
    shared run of w+k-1 tokens is guaranteed a shared fingerprint).

    Entirely in the array domain — no explode, no shuffle: the k-gram
    chain is aligned ``zip_with`` slices (NOT lambda indexing, which
    re-evaluates the captured token array per element), the window min
    is a balanced ``least`` tree over four shifted slices, and the
    output is one row per document from a map-only plan. The md5 hex
    ordering is bytewise on both engines."""
    docs = tables(spark, sf_dir, "documents", widen=True)
    from pyield_spark.operators.text import tokens_expr

    toks = tokens_expr("text")
    grams = toks
    for j in range(1, 3):
        shifted = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda g, z: F.concat(g, F.lit(" "), z))
    h = F.transform(
        F.filter(grams, lambda g: g.isNotNull()), lambda g: F.md5(g)
    )

    def shift(arr, j):
        return F.slice(arr, j + 1, F.greatest(F.size(arr) - j, F.lit(0)))

    d = docs.select("doc_id", h.alias("_h"))
    a = F.zip_with(F.col("_h"), shift(F.col("_h"), 1), lambda x, y: F.least(x, y))
    b = F.zip_with(
        shift(F.col("_h"), 2), shift(F.col("_h"), 3), lambda x, y: F.least(x, y)
    )
    n_win = F.greatest(F.size(F.col("_h")) - (_WINNOW_W - 1), F.lit(0))
    wins = F.slice(F.zip_with(a, b, lambda x, y: F.least(x, y)), 1, n_win)
    return (
        d.select(
            "doc_id",
            n_win.cast("long").alias("n_windows"),
            F.size(F.array_distinct(wins)).cast("long").alias("n_fp"),
        )
        .orderBy("doc_id")
    )


# === inverted index (relational postings) =================================


@query(
    "q_inverted_index",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, len({_TOKS}) + 1),
               i -> struct_pack(p := i, tok := {_TOKS}[i]))) AS u
      FROM documents
    )
    SELECT u.tok AS token, doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(min(u.p) AS BIGINT) AS first_pos
    FROM pos GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_inverted_index(spark, sf_dir):
    """Inverted index in relational form: one posting row per
    (token, document) with occurrence count and first position.

    posexplode + one (token, doc_id) groupBy — map-side combinable, a
    single shuffle keyed by the posting pair (high cardinality, spreads
    evenly; hub tokens split by AQE). The array-of-postings form is one
    ``collect_list`` away but stays out of the oracle-checked surface
    (array ordering is engine-specific)."""
    docs = tables(spark, sf_dir, "documents")
    from pyield_spark.operators.text import tokens_expr

    pos = docs.select(
        "doc_id", F.posexplode(tokens_expr("text")).alias("_p", "token")
    )
    return (
        pos.groupBy("token", "doc_id")
        .agg(
            F.count("*").alias("n_occurrences"),
            (F.min("_p") + 1).cast("long").alias("first_pos"),  # 1-based
        )
        .orderBy("token", "doc_id")
    )


# === bigram lift (log-free PMI ranking) ===================================


@query(
    "q_bigram_lift",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    uni AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY token),
    n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tok),
    bg AS (
      SELECT unnest({_BIGRAMS}) AS bigram FROM documents
    ),
    bgc AS (
      SELECT split_part(bigram, ' ', 1) AS w1, split_part(bigram, ' ', 2) AS w2,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM bg GROUP BY 1, 2
    )
    SELECT w1, w2, c_ab,
           {pround_sql("CAST(n.total AS DOUBLE) * c_ab / (CAST(u1.c AS DOUBLE) * u2.c)", 6)} AS lift
    FROM bgc JOIN uni u1 ON bgc.w1 = u1.token
             JOIN uni u2 ON bgc.w2 = u2.token
             CROSS JOIN n
    ORDER BY lift DESC, w1, w2 LIMIT 50
    """,
)
def q_bigram_lift(spark, sf_dir):
    """Collocation strength without logarithms: lift = N·c(a,b) /
    (c(a)·c(b)) — the monotone core of PMI, computed as one rounded
    IEEE division chain (libm-free, engine-exact), ranked with a full
    (w1, w2) tie-break.

    Plan: adjacent-pair bigrams from aligned zip_with slices (no lambda
    indexing), two counting aggregates, two equi-joins against the
    unigram vocabulary (broadcastable — vocab ≪ corpus), the corpus
    total as a 1-row broadcast. Top-50 is a TakeOrdered."""
    docs = tables(spark, sf_dir, "documents")
    from pyield_spark.functions.numbers import pround_expr
    from pyield_spark.operators.text import tokens_expr

    toks = tokens_expr("text")
    tok = docs.select(F.explode(toks).alias("token"))
    uni = tok.groupBy("token").agg(F.count("*").alias("c"))
    total = tok.agg(F.count("*").alias("total"))

    pairs = docs.select(
        F.explode(
            F.zip_with(
                toks,
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_bg")
    ).filter(F.col("_bg.w2").isNotNull())
    bgc = pairs.groupBy(
        F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2")
    ).agg(F.count("*").alias("c_ab"))

    u1 = uni.select(F.col("token").alias("w1"), F.col("c").alias("_c1"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("c").alias("_c2"))
    return (
        bgc.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "c_ab",
            pround_expr(
                F.col("total").cast("double")
                * F.col("c_ab")
                / (F.col("_c1").cast("double") * F.col("_c2")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(50)
    )


@query(
    "q_lm_typicality",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
    uni AS (SELECT token, CAST(count(*) AS BIGINT) AS c1 FROM tok GROUP BY token),
    vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
    bgo AS (SELECT doc_id, unnest({_BIGRAMS}) AS bg FROM documents),
    bgm AS (SELECT bg, CAST(count(*) AS BIGINT) AS cab FROM bgo GROUP BY bg),
    sc AS (
      SELECT o.doc_id,
             {pround_sql("ln((m.cab + 0.5) / (u.c1 + 0.5 * vv.v))", 9)} AS lp
      FROM bgo o
      JOIN bgm m USING (bg)
      JOIN uni u ON u.token = split_part(o.bg, ' ', 1)
      CROSS JOIN vv
    ),
    agg AS (
      SELECT doc_id, SUM(CAST(lp AS DECIMAL(28,12))) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM sc GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(a.n, 0) AS n_bigrams,
           {pround_sql("CAST(a.s AS DOUBLE) / a.n", 6)} AS avg_logprob
    FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
    """,
)
def q_lm_typicality(spark, sf_dir):
    """Bigram-LM typicality (CCNet-style corpus self-scoring): mean
    smoothed bigram log-prob per document; the quality filter ranks by
    this and drops the atypical tail. See
    ``operators/vocab.py::lm_typicality`` for the portability and
    100 TB shuffle-shape notes."""
    docs = tables(spark, sf_dir, "documents")
    return vb.lm_typicality(docs, "text", "doc_id")


@query(
    "q_token_entropy",
    oracle=f"""
    WITH {_TOK_CTES},
    agg AS (
      SELECT doc_id, CAST(SUM(tf_doc) AS BIGINT) AS n,
             CAST(SUM(tf_doc * CAST(floor(
                 ln(CAST(tf_doc AS DOUBLE)) * 1000000000.0 + 0.5
             ) AS BIGINT)) AS BIGINT) AS s
      FROM pd GROUP BY doc_id
    )
    SELECT doc_id, n AS n_tokens,
           {pround_sql(
               pround_sql("ln(CAST(n AS DOUBLE))", 9)
               + " - (CAST(s AS DOUBLE) / 1000000000.0) / n", 6)} AS token_entropy
    FROM agg
    """,
)
def q_token_entropy(spark, sf_dir):
    """Per-document token-distribution entropy (spam/stuffing filter) —
    see ``operators/vocab.py::token_entropy``."""
    docs = tables(spark, sf_dir, "documents")
    return vb.token_entropy(docs, "text", "doc_id")


_BM25_TERMS = ["spark", "window", "merge", "vector"]
_BM25_W = (
    # identical double literals and op order as the Spark expression
    # (k1=1.2, b=0.75; k1+1 and 1-b pre-folded): see bm25_topk
    "ln(1.0 + (n - df + 0.5) / (df + 0.5))"
    " * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))"
)


@query(
    "q_bm25_topk",
    oracle=f"""
    WITH toked AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(len(toks)) AS BIGINT) AS sumdl
      FROM toked
    ),
    tok AS (
      SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM toked
    ),
    tf AS (
      SELECT doc_id, dl, token, CAST(count(*) AS BIGINT) AS tf
      FROM tok
      WHERE token IN ('spark', 'window', 'merge', 'vector')
      GROUP BY doc_id, dl, token
    ),
    dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
    w AS (
      SELECT tf.doc_id,
             {pround_sql(_BM25_W.replace("avgdl", "(CAST(sumdl AS DOUBLE) / n)"), 8)} AS w8
      FROM tf JOIN dfq USING (token) CROSS JOIN stats
    )
    SELECT doc_id,
           CAST(SUM(CAST(w8 AS DECIMAL(28,14))) AS DOUBLE) AS bm25,
           CAST(COUNT(*) AS BIGINT) AS terms_hit
    FROM w GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC LIMIT 20
    """,
)
def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-20 for a 4-term query over ``documents`` — the
    lexical-retrieval stage of a training-data pipeline (in-domain
    mining, retrieval eval sets, BM25 hard negatives for dense
    retrievers). Tokens prune to the query terms BEFORE the tf shuffle;
    corpus stats and per-term df are broadcast; the top-k is a
    TakeOrderedAndProject. See ``operators/vocab.py::bm25_topk``."""
    docs = tables(spark, sf_dir, "documents")
    return vb.bm25_topk(docs, "text", "doc_id", _BM25_TERMS, k=20)


# --- hybrid retrieval (r9): BM25 leg + pseudo-relevance-feedback dense
# leg fused by reciprocal-rank fusion — the lexical+vector stack every
# production retrieval deployment runs.

_RRF_DOT_VC = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),"
    " i -> b.v[i] * c.c[i])), (x, y) -> x + y)"
)


@query(
    "q_hybrid_rrf",
    oracle=f"""
    WITH toked AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(len(toks)) AS BIGINT) AS sumdl
      FROM toked
    ),
    tok AS (
      SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM toked
    ),
    tf AS (
      SELECT doc_id, dl, token, CAST(count(*) AS BIGINT) AS tf
      FROM tok
      WHERE token IN ('spark', 'window', 'merge', 'vector')
      GROUP BY doc_id, dl, token
    ),
    dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
    w AS (
      SELECT tf.doc_id,
             {pround_sql(_BM25_W.replace("avgdl", "(CAST(sumdl AS DOUBLE) / n)"), 8)} AS w8
      FROM tf JOIN dfq USING (token) CROSS JOIN stats
    ),
    bmagg AS (
      SELECT doc_id, CAST(SUM(CAST(w8 AS DECIMAL(28,14))) AS DOUBLE) AS bm25
      FROM w GROUP BY doc_id
    ),
    bmrank AS (
      SELECT doc_id AS id, r_bm25 FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r_bm25
        FROM bmagg
      ) WHERE r_bm25 <= 20
    ),
    base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64
    ),
    seeds AS (
      SELECT b.v FROM bmrank r JOIN base b ON b.vec_id = r.id
      WHERE r.r_bm25 <= 3
    ),
    centd AS (
      SELECT d,
        CAST(SUM(CAST({pround_sql("x", 8)} AS DECIMAL(28,14))) AS DOUBLE) AS sx,
        CAST(count(*) AS BIGINT) AS ns
      FROM (SELECT unnest(v) AS x, unnest(range(1, 65)) AS d FROM seeds)
      GROUP BY d
    ),
    cent AS (
      SELECT list(sx / CAST(ns AS DOUBLE) ORDER BY d) AS c FROM centd
    ),
    centn AS (
      SELECT c,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(c, x -> x * x)), (x, y) -> x + y) AS cn2
      FROM cent
    ),
    dense AS (
      SELECT vec_id, dcos FROM (
        SELECT b.vec_id,
          {pround_sql(
              _RRF_DOT_VC
              + " / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),"
              "   list_transform(b.v, x -> x * x)), (x, y) -> x + y))"
              " * sqrt(c.cn2))", 6)} AS dcos
        FROM base b CROSS JOIN centn c
      ) WHERE NOT isnan(dcos)
      ORDER BY dcos DESC, vec_id LIMIT 20
    ),
    drank AS (
      SELECT vec_id AS id,
             ROW_NUMBER() OVER (ORDER BY dcos DESC, vec_id) AS r_dense
      FROM dense
    ),
    fused AS (
      SELECT COALESCE(b.id, d.id) AS doc_id,
             CAST(b.r_bm25 AS INT) AS r_bm25,
             CAST(d.r_dense AS INT) AS r_dense,
             COALESCE(1.0::DOUBLE / (60.0::DOUBLE + b.r_bm25), 0.0::DOUBLE)
               + COALESCE(1.0::DOUBLE / (60.0::DOUBLE + d.r_dense), 0.0::DOUBLE)
               AS rrf
      FROM bmrank b FULL OUTER JOIN drank d ON d.id = b.id
    )
    SELECT doc_id, r_bm25, r_dense, rrf, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rnk
      FROM fused
    ) WHERE rnk <= 10
    """,
)
def q_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 top-20 + a dense top-20 leg whose query
    vector is the Rocchio pseudo-relevance-feedback centroid of the
    BM25 top-3 documents' embeddings, fused by reciprocal-rank fusion
    ``Σ 1/(60 + rank)`` to a final top-10. No query-text encoder
    needed; docs missing from one leg contribute 0 from it. See
    ``operators/vocab.py::hybrid_rrf`` for the fusion-join scale shape
    (≤ 2·k rows regardless of corpus size)."""
    docs = tables(spark, sf_dir, "documents")
    emb = tables(spark, sf_dir, "embeddings")
    return vb.hybrid_rrf(docs, emb, _BM25_TERMS, "text", "doc_id")


def _dot64(a: str, b: str) -> str:
    """DuckDB 64-dim double dot product with the fold order dot_dec uses."""
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform("
        f"range(1, 65), i -> {a}[i] * {b}[i])), (x, y) -> x + y)"
    )


_NORM64 = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform({v}, x -> x * x)), (x, y) -> x + y)"
)


def _bpe_oracle() -> str:
    from pyield_spark.operators.bpe import bpe_apply_duckdb
    from pyield_spark.queries.bpe_artifact import BPE_MERGES

    return f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
    vocab AS (
      SELECT w, CASE WHEN length(w) = 0 THEN 0
                     ELSE len({bpe_apply_duckdb(BPE_MERGES)}) END AS n_bpe
      FROM (SELECT DISTINCT w FROM tok)
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(t.w)) AS BIGINT) AS n_chars,
           CAST(sum(v.n_bpe) AS BIGINT) AS n_bpe_tokens
    FROM tok t JOIN vocab v ON v.w = t.w
    GROUP BY t.doc_id
    """


@query("q_bpe_tokens", oracle=_bpe_oracle())
def q_bpe_tokens(spark, sf_dir):
    """REAL tokenizer token counts per document (r9 VERDICT #7): the
    pinned 24-merge BPE vocabulary (queries/bpe_artifact.py, trained by
    tools/train_bpe.py with the deterministic pair argmax) encodes
    every DISTINCT word once via the rank-order merge fold; the
    corpus-sized token stream joins the per-word count back and
    aggregates (doc_id, n_words, n_chars, n_bpe_tokens) — the counts
    packing budgets and per-doc token costs should be denominated in,
    vs the whitespace approximation token_count_expr gives. Train and
    encode are parity-pinned against a pure-Python BPE reference in
    tests/test_bpe.py; the oracle replays the encode fold exactly."""
    from pyield_spark.operators.bpe import bpe_token_count
    from pyield_spark.queries.bpe_artifact import BPE_MERGES

    docs = tables(spark, sf_dir, "documents")
    return bpe_token_count(docs, "text", "doc_id", BPE_MERGES)



@query(
    "q_hybrid_rrf_pruned",
    oracle=f"""
    WITH toked AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(len(toks)) AS BIGINT) AS sumdl
      FROM toked
    ),
    tok AS (
      SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM toked
    ),
    tf AS (
      SELECT doc_id, dl, token, CAST(count(*) AS BIGINT) AS tf
      FROM tok
      WHERE token IN ('spark', 'window', 'merge', 'vector')
      GROUP BY doc_id, dl, token
    ),
    dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
    w AS (
      SELECT tf.doc_id,
             {pround_sql(_BM25_W.replace("avgdl", "(CAST(sumdl AS DOUBLE) / n)"), 8)} AS w8
      FROM tf JOIN dfq USING (token) CROSS JOIN stats
    ),
    bmagg AS (
      SELECT doc_id, CAST(SUM(CAST(w8 AS DECIMAL(28,14))) AS DOUBLE) AS bm25
      FROM w GROUP BY doc_id
    ),
    bmrank AS (
      SELECT doc_id AS id, r_bm25 FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r_bm25
        FROM bmagg
      ) WHERE r_bm25 <= 20
    ),
    base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64
    ),
    seeds AS (
      SELECT b.v FROM bmrank r JOIN base b ON b.vec_id = r.id
      WHERE r.r_bm25 <= 3
    ),
    centd AS (
      SELECT d,
        CAST(SUM(CAST({pround_sql("x", 8)} AS DECIMAL(28,14))) AS DOUBLE) AS sx,
        CAST(count(*) AS BIGINT) AS ns
      FROM (SELECT unnest(v) AS x, unnest(range(1, 65)) AS d FROM seeds)
      GROUP BY d
    ),
    cent AS (
      SELECT list(sx / CAST(ns AS DOUBLE) ORDER BY d) AS c FROM centd
    ),
    centn AS (
      SELECT c, {_NORM64.format(v="c")} AS cn2 FROM cent
    ),
    ibase AS (
      SELECT vec_id, v, {_NORM64.format(v="v")} AS norm2 FROM base
      WHERE len(list_filter(v, x -> x IS NULL OR isnan(x))) = 0
    ),
    sq8stats AS (
      SELECT d, MIN(x) AS mn, MAX(x) AS mx FROM (
        SELECT unnest(v) AS x, unnest(range(1, 65)) AS d FROM ibase
      ) GROUP BY d
    ),
    mnmx AS (
      SELECT list(mn ORDER BY d) AS mn, list(mx ORDER BY d) AS mx FROM sq8stats
    ),
    enc AS (
      SELECT b.vec_id, b.v, b.norm2,
        list_transform(range(1, 65), i -> CASE WHEN m.mx[i] = m.mn[i] THEN 0
          ELSE CAST(floor((b.v[i] - m.mn[i]) / (m.mx[i] - m.mn[i]) * 255.0
                          + 0.5) AS INT) END) AS codes,
        m.mn AS mn, m.mx AS mx
      FROM ibase b CROSS JOIN mnmx m
    ),
    corpus AS (
      SELECT vec_id, v, norm2, dq, {_NORM64.format(v="dq")} AS dqn2
      FROM (
        SELECT *, list_transform(range(1, 65),
          i -> mn[i] + (CAST(codes[i] AS DOUBLE) * (mx[i] - mn[i])) / 255.0)
          AS dq
        FROM enc
      )
    ),
    cents AS (
      SELECT vec_id AS cid, v, norm2 FROM (
        SELECT vec_id, v, norm2,
               ROW_NUMBER() OVER (ORDER BY vec_id) AS crn FROM enc
      ) WHERE crn <= 16
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT n.vec_id, c.cid,
          ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
            {pround_sql(_dot64("n.v", "c.v") + " / (sqrt(n.norm2) * sqrt(c.norm2))", 6)} DESC,
            c.cid) AS arn
        FROM enc n CROSS JOIN cents c
      ) WHERE arn = 1
    ),
    probes AS (
      SELECT cid FROM (
        SELECT c.cid,
          ROW_NUMBER() OVER (ORDER BY
            {pround_sql(_dot64("q.c", "c.v") + " / (sqrt(q.cn2) * sqrt(c.norm2))", 6)} DESC,
            c.cid) AS prn
        FROM centn q CROSS JOIN cents c
      ) WHERE prn <= 4
    ),
    sqscored AS (
      SELECT co.vec_id, co.v, co.norm2,
        {pround_sql(_dot64("q.c", "co.dq") + " / (sqrt(q.cn2) * sqrt(co.dqn2))", 6)}
          AS sqcos
      FROM probes p
      JOIN assign a ON a.cid = p.cid
      JOIN corpus co ON co.vec_id = a.vec_id
      CROSS JOIN centn q
    ),
    shortlist AS (
      SELECT * FROM sqscored WHERE NOT isnan(sqcos)
      ORDER BY sqcos DESC, vec_id LIMIT 40
    ),
    dense AS (
      SELECT vec_id, dcos FROM (
        SELECT s.vec_id,
          {pround_sql(_dot64("q.c", "s.v") + " / (sqrt(q.cn2) * sqrt(s.norm2))", 6)}
            AS dcos
        FROM shortlist s CROSS JOIN centn q
      ) WHERE NOT isnan(dcos)
      ORDER BY dcos DESC, vec_id LIMIT 20
    ),
    drank AS (
      SELECT vec_id AS id,
             ROW_NUMBER() OVER (ORDER BY dcos DESC, vec_id) AS r_dense
      FROM dense
    ),
    fused AS (
      SELECT COALESCE(b.id, d.id) AS doc_id,
             CAST(b.r_bm25 AS INT) AS r_bm25,
             CAST(d.r_dense AS INT) AS r_dense,
             COALESCE(1.0::DOUBLE / (60.0::DOUBLE + b.r_bm25), 0.0::DOUBLE)
               + COALESCE(1.0::DOUBLE / (60.0::DOUBLE + d.r_dense), 0.0::DOUBLE)
               AS rrf
      FROM bmrank b FULL OUTER JOIN drank d ON d.id = b.id
    )
    SELECT doc_id, r_bm25, r_dense, rrf, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rnk
      FROM fused
    ) WHERE rnk <= 10
    """,
)
def q_hybrid_rrf_pruned(spark, sf_dir):
    """q_hybrid_rrf with the dense leg served through the IVF-SQ8
    ladder (r9 VERDICT #1): ``route="ivf_sq8"`` coarse-assigns the
    SQ8-encoded corpus to 16 inverted lists, the PRF centroid probes
    its 4 nearest lists, candidates score against dequantized byte
    codes, and the best 40 rescore exactly — the dense scan drops from
    the whole corpus to ~n_probe/C of it at 8× less payload, the same
    FAISS ``IVF16,SQ8`` shape as q_ivf_sq8. Exhaustive config is
    bit-identical to q_hybrid_rrf (test-pinned in
    tests/test_llm_ops.py)."""
    docs = tables(spark, sf_dir, "documents")
    emb = tables(spark, sf_dir, "embeddings")
    return vb.hybrid_rrf(
        docs, emb, _BM25_TERMS, "text", "doc_id",
        route="ivf_sq8", n_centroids=16, n_probe=4, refine=40,
    )

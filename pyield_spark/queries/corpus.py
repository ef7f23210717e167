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
from pyield_spark.queries.llm_data import _TOKS

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
        vb.vocabulary(per_doc, "doc_id")
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
           CAST(top_tf AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_share
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

"""Training-data assembly queries: fuzzy-dedup clustering (connected
components over LSH candidate pairs), deterministic stratified
sampling, mixture resampling, and sequence packing — the stages a
100 TB pretraining pipeline runs AFTER the per-document scoring in
``llm_data.py``.

Oracle strategy: every operator is built from portable hash arithmetic
(md5-derived buckets) and window cumsums, so DuckDB replays it exactly;
the one iterative operator (connected components) is restated as a
recursive transitive closure (``WITH RECURSIVE reach``) + ``MIN`` —
DuckDB's recursive-CTE fixpoint IS the label-propagation fixpoint.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from pyield_spark.operators import dedup as dd
from pyield_spark.operators import graph as gr
from pyield_spark.operators import sampling as sp
from pyield_spark.operators import text as tx
from pyield_spark.queries import query, tables
from pyield_spark.queries.llm_data import _GRAMS3, _MWL, _NORM, _PR, _SW_OWN, _TOKS
from pyield_spark.queries.oracle_helpers import pround_sql


def _h32(s: str) -> str:
    return f"CAST(concat('0x', substr(md5({s}), 1, 8)) AS BIGINT)"


def _bucket(key: str, salt: str) -> str:
    salted = "concat('" + salt + "', CAST(" + key + " AS VARCHAR))"
    return f"({_h32(salted)} % 1000000)"


# the q_minhash_lsh candidate-pair CTEs (same constants as
# operators/dedup.py MINHASH_COEFFS), shared by the clustering oracle
_LSH_PAIR_CTES = f"""
    sh AS (
      SELECT DISTINCT doc_id, unnest({_GRAMS3}) AS shingle FROM documents
    ),
    sid AS (
      SELECT doc_id, {_h32("shingle")} AS sid FROM sh
    ),
    sig AS (
      SELECT doc_id,
        MIN((sid * 1299721 + 104729) % 2147483647) AS mh0,
        MIN((sid * 15485863 + 32452843) % 2147483647) AS mh1,
        MIN((sid * 49979687 + 67867967) % 2147483647) AS mh2,
        MIN((sid * 86028121 + 93827561) % 2147483647) AS mh3
      FROM sid GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id AS _id, 0 AS band,
             concat_ws('_', CAST(mh0 AS VARCHAR), CAST(mh1 AS VARCHAR)) AS bkey FROM sig
      UNION ALL
      SELECT doc_id, 1, concat_ws('_', CAST(mh2 AS VARCHAR), CAST(mh3 AS VARCHAR)) FROM sig
    ),
    pairs AS (
      SELECT DISTINCT a._id AS id_a, b._id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
      WHERE a._id < b._id
    )"""


# === fuzzy-dedup clustering: LSH pairs -> connected components ->
# keep one canonical doc per cluster =======================================


@query(
    "q_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_LSH_PAIR_CTES.lstrip()},
    und AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT u, u FROM und
      UNION
      SELECT e.v, r.label FROM reach r JOIN und e ON e.u = r.node
    ),
    comp AS (
      SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node
    )
    SELECT d.doc_id,
           COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
           (c.cluster_id IS NULL OR d.doc_id = c.cluster_id) AS keep
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """,
)
def q_dedup_clusters(spark, sf_dir):
    """The full fuzzy-dedup decision: MinHash/LSH candidate pairs ->
    transitive closure into clusters (``operators/graph.py`` min-label
    propagation) -> every document verdicted (singletons keep=true,
    cluster members keep only the canonical min id).

    This is the stage the reference lacks and production LLM pipelines
    require: near-duplication is transitive in effect (A~B, B~C =>
    drop two of three) but LSH only emits pairs.
    """
    docs = tables(spark, sf_dir, "documents")
    pairs = dd.lsh_candidate_pairs(docs, "text", "doc_id", n=3, band_size=2)
    return gr.dedup_decisions(docs, pairs, id_col="doc_id")


# === quality-aware canonical selection: within a dup cluster keep the
# BEST-scoring copy, not the min id ========================================


from pyield_spark.queries.curation import _qscore_sql


@query(
    "q_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_LSH_PAIR_CTES.lstrip()},
    und AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT u, u FROM und
      UNION
      SELECT e.v, r.label FROM reach r JOIN und e ON e.u = r.node
    ),
    comp AS (
      SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node
    ),
    scored AS (
      SELECT d.doc_id, c.cluster_id, {{q}} AS quality_score
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ),
    best AS (
      SELECT cluster_id, doc_id AS best_id FROM (
        SELECT cluster_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY quality_score DESC, doc_id) AS rn
        FROM scored WHERE cluster_id IS NOT NULL) WHERE rn = 1
    )
    SELECT s.doc_id,
           COALESCE(s.cluster_id, s.doc_id) AS cluster_id,
           s.quality_score,
           (s.cluster_id IS NULL OR s.doc_id = b.best_id) AS keep
    FROM scored s LEFT JOIN best b ON b.cluster_id = s.cluster_id
    """.replace("{q}", _qscore_sql()),
)
def q_dedup_keep_best(spark, sf_dir):
    """Quality-aware fuzzy dedup: same LSH pairs + transitive closure as
    q_dedup_clusters, but the surviving copy per cluster is the
    HIGHEST-quality one (min id breaks ties) — what curated pipelines
    (SlimPajama/Dolma source-priority rules) actually do, since near-dup
    clusters mix a clean original with truncated or wrapper-padded
    mirrors."""
    docs = tables(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", tx.quality_score_expr("text").alias("quality_score")
    )
    pairs = dd.lsh_candidate_pairs(docs, "text", "doc_id", n=3, band_size=2)
    return gr.dedup_keep_best(
        scored, pairs, quality_col="quality_score", id_col="doc_id"
    )


# === deterministic stratified sampling ====================================

_SAMPLE_RATES = {"en": 0.8, "zh": 0.5, "de": 0.25}


@query(
    "q_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_bucket("doc_id", "v1")} <
      CASE lang WHEN 'en' THEN 800000 WHEN 'zh' THEN 500000
                WHEN 'de' THEN 250000 ELSE 100000 END
    """,
)
def q_stratified_sample(spark, sf_dir):
    """Per-language hash sampling (keep 80% en / 50% zh / 25% de / 10%
    rest) — a pure scan-stage filter (no shuffle, no rand()): the same
    rows survive on every run, engine, and task retry."""
    docs = tables(spark, sf_dir, "documents")
    return sp.stratified_sample(
        docs, "lang", _SAMPLE_RATES, key="doc_id", default_rate=0.1, salt="v1"
    ).select("doc_id", "lang", "source")


# === mixture resampling (fractional epoch weights) ========================

_MIX_WEIGHTS = {"en": 1.5, "es": 2.0, "fr": 1.0, "zh": 0.4, "de": 0.0}


@query(
    "q_mixture_resample",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang,
        CASE lang WHEN 'en' THEN 1 WHEN 'es' THEN 2 WHEN 'fr' THEN 1 ELSE 0 END
        + CASE WHEN {_bucket("doc_id", "mix")} <
                 CASE lang WHEN 'en' THEN 500000 WHEN 'zh' THEN 400000 ELSE 0 END
               THEN 1 ELSE 0 END AS n
      FROM documents
    )
    SELECT doc_id, lang, unnest(range(n)) AS copy_idx FROM base
    """,
)
def q_mixture_resample(spark, sf_dir):
    """Domain-weighted replication: en x1.5, es x2, fr x1, zh x0.4,
    de dropped. Fractional weights are hash slices (weight 1.5 = every
    row once, a deterministic half twice) — the output corpus hits the
    mixture spec exactly, with zero shuffles (narrow explode)."""
    docs = tables(spark, sf_dir, "documents")
    out = sp.mixture_resample(docs, "lang", _MIX_WEIGHTS, key="doc_id")
    return out.select("doc_id", "lang", F.col("copy_idx").cast("long").alias("copy_idx"))


# === sequence packing into fixed token budgets ============================


# === eval-set decontamination =============================================


@query(
    "q_decontaminate",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, unnest({_GRAMS3}) AS shingle FROM documents
    ),
    eval_sh AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
    ),
    hits AS (
      SELECT s.doc_id, COUNT(*) AS n_hits
      FROM sh s JOIN eval_sh e ON e.shingle = s.shingle
      WHERE s.doc_id % 97 <> 0
      GROUP BY s.doc_id
    )
    SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(h.n_hits, 0) >= 2 AS contaminated
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id % 97 <> 0
    """,
)
def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training documents sharing >= 2
    distinct word 3-grams with the eval split (docs with id % 97 == 0
    stand in for a benchmark suite).

    Scale shape: the eval side is tiny and broadcast (a real benchmark
    suite is a few million shingles — megabytes), so the contamination
    check is a broadcast semi-aggregate over the corpus scan: NO shuffle
    of the 100 TB side, one partial-aggregated groupBy on doc_id."""
    docs = tables(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    sh = dd.exploded_shingles(docs, "text", "doc_id", n=3)
    eval_sh = sh.filter(is_eval).select("shingle").distinct()
    hits = (
        sh.filter(~is_eval)
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.filter(~is_eval)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= 2).alias("contaminated"),
        )
    )


# === Bloom-filter decontamination (round 8) ===============================

# the k=4 bit positions of one shingle, as SQL fragments — the
# identical Kirsch–Mitzenmacher (h1 + i·(2·h2+1)) mod 4096 arithmetic
# bloom.py builds Column-side (two independent md5-derived 32-bit
# hashes — an affine family over ONE hash has an n/m FP floor, see the
# bloom.py module docstring)
_BLOOM_H1 = "CAST(concat('0x', substr(md5(shingle), 1, 8)) AS BIGINT)"
_BLOOM_H2 = "CAST(concat('0x', substr(md5(shingle), 9, 8)) AS BIGINT)"
_BLOOM_POS = ", ".join(
    f"(({_BLOOM_H1} + {i} * (2 * {_BLOOM_H2} + 1)) % 4096)" for i in range(4)
)


@query(
    "q_bloom_decontaminate",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, unnest({_GRAMS3}) AS shingle FROM documents
    ),
    eval_probe AS (
      SELECT DISTINCT unnest([{_BLOOM_POS}]) AS pos
      FROM (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
    ),
    bloom AS (
      SELECT CAST(floor(pos / 32) AS BIGINT) AS word,
             bit_or(CAST(power(2.0, pos % 32) AS BIGINT)) AS bits
      FROM eval_probe GROUP BY 1
    ),
    corpus_probe AS (
      SELECT doc_id, shingle, p.i, p.pos FROM (
        SELECT doc_id, shingle,
               unnest([{_BLOOM_POS}]) AS pos,
               unnest([0, 1, 2, 3]) AS i
        FROM sh WHERE doc_id % 97 <> 0
      ) p
    ),
    shingle_hit AS (
      SELECT doc_id, shingle,
             bool_and(COALESCE(
               (b.bits & CAST(power(2.0, pos % 32) AS BIGINT))
                 = CAST(power(2.0, pos % 32) AS BIGINT), FALSE)) AS hit
      FROM corpus_probe c
      LEFT JOIN bloom b ON b.word = CAST(floor(c.pos / 32) AS BIGINT)
      GROUP BY doc_id, shingle
    ),
    hits AS (
      SELECT doc_id, COUNT(*) FILTER (hit) AS n_hits
      FROM shingle_hit GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(h.n_hits, 0) >= 2 AS contaminated
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id % 97 <> 0
    """,
)
def q_bloom_decontaminate(spark, sf_dir):
    """q_decontaminate's membership check through a 4096-bit Bloom
    filter (operators/bloom.py): the blocklist compresses to a 1 KB
    word table inlined as a literal, so the corpus probe is MAP-ONLY
    (zero shuffles, no broadcast exchange) — the shape that holds when
    the blocklist is a whole prior corpus, not a benchmark suite. The
    oracle replays the identical md5/position/bit arithmetic, so even
    Bloom FALSE POSITIVES match bit-for-bit (one-sided: n_hits here
    >= the exact operator's n_hits, never under)."""
    from pyield_spark.operators import bloom as bl

    docs = tables(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    return bl.bloom_decontaminate(
        docs.filter(~is_eval), docs.filter(is_eval), "text", "doc_id"
    )


# === PII redaction ========================================================

# both engines build the SAME synthetic contact string from customer
# keys (the slim TPC-H testdata has no phone/comment columns), then the
# redaction itself is the operator under test
_PHONE_SQL = (
    "concat('55-', CAST(c_custkey % 90 + 10 AS VARCHAR), '-', "
    "CAST((c_custkey * 7) % 9000 + 1000 AS VARCHAR), '-', "
    "CAST((c_custkey * 13) % 9000 + 1000 AS VARCHAR))"
)
_IP_SQL = (
    "concat(CAST(c_custkey % 223 + 10 AS VARCHAR), '.', "
    "CAST((c_custkey * 3) % 256 AS VARCHAR), '.', "
    "CAST((c_custkey * 5) % 256 AS VARCHAR), '.', "
    "CAST((c_custkey * 11) % 254 + 1 AS VARCHAR))"
)
_CONTACT_SQL = f"""concat(
      'segment ', c_mktsegment, ' reach ',
      lower(replace(c_name, '#', '.')), '@corp.example or call ', {_PHONE_SQL},
      CASE WHEN c_custkey % 3 = 0 THEN concat(' host ', {_IP_SQL}) ELSE '' END)"""


@query(
    "q_pii_redact",
    oracle=f"""
    WITH t AS (SELECT c_custkey, {_CONTACT_SQL} AS contact FROM customer)
    SELECT c_custkey,
      regexp_replace(regexp_replace(regexp_replace(contact,
        '{tx.PII_EMAIL_RE}', '<EMAIL>', 'g'),
        '{tx.PII_PHONE_RE}', '<PHONE>', 'g'),
        '{tx.PII_IPV4_RE}', '<IP>', 'g') AS redacted,
      CAST(len(regexp_extract_all(contact, '{tx.PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
      CAST(len(regexp_extract_all(contact, '{tx.PII_PHONE_RE}')) AS BIGINT) AS n_phones,
      CAST(len(regexp_extract_all(contact, '{tx.PII_IPV4_RE}')) AS BIGINT) AS n_ips
    FROM t
    """,
)
def q_pii_redact(spark, sf_dir):
    """PII scrubbing: emails / phones / IPv4s replaced by typed tags,
    with per-row match counts kept as audit columns (pipelines track
    redaction rates per source feed). Pure regexp_replace chain —
    JVM-side codegen over the scan, no shuffle at all; the patterns
    stay in the Java∩RE2 regex subset so the oracle replays them."""
    cust = tables(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    s = lambda c: c.cast("string")  # noqa: E731
    phone = F.concat(
        F.lit("55-"), s(k % 90 + 10), F.lit("-"),
        s((k * 7) % 9000 + 1000), F.lit("-"), s((k * 13) % 9000 + 1000),
    )
    ip = F.concat(
        s(k % 223 + 10), F.lit("."), s((k * 3) % 256), F.lit("."),
        s((k * 5) % 256), F.lit("."), s((k * 11) % 254 + 1),
    )
    contact = F.concat(
        F.lit("segment "), F.col("c_mktsegment"), F.lit(" reach "),
        F.lower(F.regexp_replace("c_name", "#", ".")),
        F.lit("@corp.example or call "), phone,
        F.when(k % 3 == 0, F.concat(F.lit(" host "), ip)).otherwise(F.lit("")),
    )
    return cust.select(
        "c_custkey",
        tx.redact_pii_expr(contact).alias("redacted"),
        tx.pii_count_expr(contact, tx.PII_EMAIL_RE).alias("n_emails"),
        tx.pii_count_expr(contact, tx.PII_PHONE_RE).alias("n_phones"),
        tx.pii_count_expr(contact, tx.PII_IPV4_RE).alias("n_ips"),
    )


# === deterministic corpus shuffle (global training order) =================


@query(
    "q_corpus_shuffle",
    oracle=f"""
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (ORDER BY {_bucket("doc_id", "shuffle")}, doc_id) - 1
             AS pos
    FROM documents
    """,
)
def q_corpus_shuffle(spark, sf_dir):
    """Epoch shuffle: a dense deterministic global position in hash
    order. The oracle is the naive single-window ROW_NUMBER; the Spark
    side is the distributed restatement (hash-range buckets + per-bucket
    ranks + tiny offset prefix-sum) — same result, no single-partition
    window over the corpus."""
    docs = tables(spark, sf_dir, "documents")
    out = sp.global_sort_index(docs, "doc_id", salt="shuffle")
    return out.select("doc_id", "lang", F.col("pos").cast("long").alias("pos"))


@query(
    "q_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT)
               AS n_tokens,
             {_h32("CAST(doc_id AS VARCHAR)")} % 8 AS shard
      FROM documents
    ),
    c AS (
      SELECT *, COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _before
      FROM t
    )
    SELECT doc_id, n_tokens, shard,
           CAST(_before // 512 AS BIGINT) AS bin,
           CAST(_before % 512 AS BIGINT) AS offset_in_bin
    FROM c
    """,
)
def q_pack_sequences(spark, sf_dir):
    """Streaming sequence packing: hash-shard the corpus (the packing
    parallelism axis), one growing-frame cumsum per shard, bin =
    floor(tokens_before / 512). ONE window shuffle total; each bin is a
    contiguous doc run a trainer can concatenate into a 512-token
    context."""
    docs = tables(spark, sf_dir, "documents").withColumn(
        "n_tokens", tx.token_count_expr("text").cast("long")
    )
    out = sp.pack_sequences(docs, "n_tokens", key="doc_id", budget=512, n_shards=8)
    return out.select("doc_id", "n_tokens", "shard", "bin", "offset_in_bin")


def _pack_bpe_oracle() -> str:
    from pyield_spark.operators.bpe import bpe_apply_duckdb
    from pyield_spark.queries.bpe_artifact import BPE_MERGES

    return f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
    vocab AS (
      SELECT w, CASE WHEN length(w) = 0 THEN 0
                     ELSE len({bpe_apply_duckdb(BPE_MERGES)}) END AS n_bpe
      FROM (SELECT DISTINCT w FROM tok)
    ),
    bt AS (
      SELECT t.doc_id, CAST(sum(v.n_bpe) AS BIGINT) AS n_tokens
      FROM tok t JOIN vocab v ON v.w = t.w GROUP BY t.doc_id
    ),
    t AS (
      SELECT doc_id, n_tokens,
             {_h32("CAST(doc_id AS VARCHAR)")} % 8 AS shard
      FROM bt
    ),
    c AS (
      SELECT *, COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _before
      FROM t
    )
    SELECT doc_id, n_tokens, shard,
           CAST(_before // 512 AS BIGINT) AS bin,
           CAST(_before % 512 AS BIGINT) AS offset_in_bin
    FROM c
    """


@query("q_pack_bpe", oracle=_pack_bpe_oracle())
def q_pack_bpe(spark, sf_dir):
    """q_pack_sequences denominated in REAL tokenizer tokens (closes
    the r9 VERDICT #7 coda): context budgets are BPE-token budgets, so
    packing on whitespace counts misallocates bins wherever words
    split into multiple subwords. Same distributed shape — the pinned
    24-merge encode runs per DISTINCT word, counts join back, then the
    hash-shard + growing-frame cumsum packing (one window shuffle)."""
    from pyield_spark.operators.bpe import bpe_token_count
    from pyield_spark.queries.bpe_artifact import BPE_MERGES

    docs = tables(spark, sf_dir, "documents")
    counts = bpe_token_count(docs, "text", "doc_id", BPE_MERGES).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_tokens")
    )
    out = sp.pack_sequences(
        counts, "n_tokens", key="doc_id", budget=512, n_shards=8
    )
    return out.select("doc_id", "n_tokens", "shard", "bin", "offset_in_bin")


# === incremental ingestion: dedup a new batch against the corpus ==========

_NORM_NB = _NORM.replace("text", "nb.text")


@query(
    "q_incremental_dedup",
    oracle=f"""
    WITH newb AS (SELECT * FROM documents WHERE source = 'src0'),
    corp AS (SELECT * FROM documents WHERE source <> 'src0'),
    ch AS (SELECT DISTINCT md5({_NORM}) AS h FROM corp),
    nsh AS (
      SELECT doc_id, unnest(list_distinct({_GRAMS3})) AS shingle FROM newb
    ),
    csh AS (
      SELECT doc_id, unnest(list_distinct({_GRAMS3})) AS shingle FROM corp
    ),
    ov AS (
      SELECT n.doc_id, c.doc_id AS corpus_doc, count(*) AS o
      FROM nsh n JOIN csh c USING (shingle)
      GROUP BY 1, 2
    ),
    best AS (SELECT doc_id, CAST(max(o) AS BIGINT) AS max_overlap FROM ov GROUP BY 1)
    SELECT nb.doc_id,
           (md5({_NORM_NB}) IN (SELECT h FROM ch)) AS exact_dup,
           COALESCE(b.max_overlap, 0) AS max_overlap,
           NOT ((md5({_NORM_NB}) IN (SELECT h FROM ch))
                OR COALESCE(b.max_overlap, 0) >= 5) AS keep
    FROM newb nb LEFT JOIN best b USING (doc_id)
    ORDER BY nb.doc_id
    """,
)
def q_incremental_dedup(spark, sf_dir):
    """Delta-ingestion dedup: a new batch (source 'src0') is admitted
    against the existing corpus — dropped on an exact content-hash match
    or when it shares ≥5 distinct 3-gram shingles with any single corpus
    document.

    Scale shape (the decontaminate pattern applied to dedup): the NEW
    side is the small one, so its content hashes and shingles broadcast;
    the 100 TB corpus is scanned map-only — no corpus shuffle, no
    corpus re-indexing per ingestion batch. The per-(new, corpus-doc)
    overlap count only materializes pairs that actually share a
    shingle. At larger deltas swap the broadcast for the LSH bucket
    join (q_minhash_lsh) — the admission rule is unchanged.
    """
    from pyield_spark.operators.dedup import content_hash_expr, shingles_expr

    docs = tables(spark, sf_dir, "documents")
    newb = docs.filter(F.col("source") == "src0")
    corp = docs.filter(F.col("source") != "src0")

    # exact leg: corpus hashes never leave their partitions — the new
    # batch's hash set broadcasts into a left-semi probe
    new_hash = newb.select(
        "doc_id", content_hash_expr("text").alias("_h")
    )
    corp_hash = corp.select(content_hash_expr("text").alias("_h")).distinct()
    exact = (
        corp_hash.join(F.broadcast(new_hash), "_h")
        .select("doc_id")
        .distinct()
        .withColumn("_exact", F.lit(True))
    )

    # near leg: broadcast the new batch's exploded shingles; corpus
    # shingles stream map-side into the join
    nsh = newb.select(
        F.col("doc_id").alias("_nid"),
        F.explode(shingles_expr("text", 3)).alias("shingle"),
    )
    csh = corp.select(
        F.col("doc_id").alias("_cid"),
        F.explode(shingles_expr("text", 3)).alias("shingle"),
    )
    best = (
        csh.join(F.broadcast(nsh), "shingle")
        .groupBy("_nid", "_cid")
        .agg(F.count("*").alias("_o"))
        .groupBy("_nid")
        .agg(F.max("_o").alias("max_overlap"))
    )

    out = (
        newb.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(best.withColumnRenamed("_nid", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_exact"), F.lit(False)).alias("exact_dup"),
            F.coalesce(F.col("max_overlap"), F.lit(0)).alias("max_overlap"),
        )
    )
    return out.withColumn(
        "keep", ~(F.col("exact_dup") | (F.col("max_overlap") >= 5))
    ).orderBy("doc_id")


# === end-to-end corpus assembly (one composed plan) =======================

_ASM_CAP = 50
_ASM_SHARDS = 8


@query(
    "q_corpus_assembly",
    oracle=f"""
    WITH quality AS (
      SELECT doc_id, lang, n_chars, text FROM documents
      WHERE (len({_TOKS}) BETWEEN 30 AND 100000)
        AND ({_MWL} >= 3.0 AND {_MWL} <= 10.0)
        AND ({_PR} <= 0.1)
        AND ({_SW_OWN} >= 2)
    ),
    deduped AS (
      SELECT doc_id, lang, n_chars FROM (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY md5({_NORM})
                                  ORDER BY doc_id) AS dup_rn
        FROM quality
      ) WHERE dup_rn = 1
    ),
    capped AS (
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM deduped
      ) WHERE rn <= {_ASM_CAP}
    )
    SELECT doc_id, lang,
           CAST({{H32}} % {_ASM_SHARDS} AS BIGINT) AS shard
    FROM capped ORDER BY doc_id
    """.replace(
        "{H32}", _h32("concat('asm', CAST(doc_id AS VARCHAR))")
    ),
)
def q_corpus_assembly(spark, sf_dir):
    """The full assembly DAG as ONE composed Spark plan: Gopher quality
    gate → exact dedup (content-hash keep-min) → per-language quota cap
    → deterministic md5 shard assignment.

    Composition is the point: the quality gate is a scan-stage filter
    (pushes below everything), the dedup and cap are one window shuffle
    each over the already-filtered minority, and the shard key is pure
    hash arithmetic — so the whole pipeline is THREE stages end-to-end
    regardless of corpus size, and every stage's semantics is exactly
    the standalone operator already verified above (q_quality_filter,
    q_exact_dedup, q_domain_cap, q_stratified_sample's hash
    discipline)."""
    from pyield_spark.operators.dedup import content_hash_expr

    docs = tables(spark, sf_dir, "documents")
    rules = tx.gopher_rules("text", "lang")
    quality = docs.filter(rules["keep"])

    w_dup = Window.partitionBy(content_hash_expr("text")).orderBy("doc_id")
    deduped = (
        quality.withColumn("_dup_rn", F.row_number().over(w_dup))
        .filter(F.col("_dup_rn") == 1)
    )

    w_cap = Window.partitionBy("lang").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    capped = (
        deduped.withColumn("_rn", F.row_number().over(w_cap))
        .filter(F.col("_rn") <= _ASM_CAP)
    )

    from pyield_spark.operators.text import h32_expr

    h32 = h32_expr(F.concat(F.lit("asm"), F.col("doc_id").cast("string")))
    return capped.select(
        "doc_id", "lang", (h32 % _ASM_SHARDS).cast("long").alias("shard")
    ).orderBy("doc_id")


# === weighted sampling without replacement (A-ES) =========================


@query(
    "q_weighted_sample",
    oracle=f"""
    WITH wk AS (
      SELECT doc_id, lang, n_chars,
        {pround_sql(
            "ln((" + _bucket("doc_id", "wsamp") + " + 1) / 1000000.0)"
            " / CAST(n_chars AS DOUBLE)", 9)} AS es_key
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, lang, n_chars, es_key
    FROM wk ORDER BY es_key DESC, doc_id LIMIT 200
    """,
)
def q_weighted_sample(spark, sf_dir):
    """Length-proportional corpus subset via deterministic A-ES keys —
    see ``operators/sampling.py::weighted_sample`` (TakeOrdered, no
    corpus shuffle)."""
    docs = tables(spark, sf_dir, "documents")
    return sp.weighted_sample(
        docs.select("doc_id", "lang", "n_chars"),
        key="doc_id", weight="n_chars", n=200, salt="wsamp",
    )

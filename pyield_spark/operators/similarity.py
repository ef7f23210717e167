"""Similarity search over embedding columns.

- ``cosine_topk``: brute-force top-k neighbors for a query subset —
  the exactness baseline. Dot products accumulate through DECIMAL so
  results are order-independent and bit-identical across engines.
- ``lsh_bucket_expr``: random-hyperplane (sign-LSH) bucketing with a
  deterministic portable pseudo-hyperplane family — the 100 TB path:
  bucket-join candidates first, score only candidates.

At scale the brute-force variant is O(Q·N); keep Q bounded (it's meant
for re-ranking LSH/IVF candidates, not full scans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


# Array folds evaluate LEFT-TO-RIGHT in both Spark (aggregate) and
# SQL engines (list_reduce) — a fixed association order — so plain
# double accumulation is already bit-deterministic across engines here,
# unlike groupBy sums (whose partial-aggregation order is arbitrary and
# does need decimal). Double folds are ~5× cheaper than decimal in the
# interpreted higher-order-function path.
_DEC = "decimal(30,12)"


def norm_sq_dec(vec: Column) -> Column:
    """Σx² — sequential double fold (deterministic order)."""
    return F.aggregate(
        _as_double(vec),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )


def dot_dec(a: Column, b: Column) -> Column:
    """Σaᵢbᵢ — sequential double fold over zipped arrays."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column | None = None,
    k: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors for each query vector (brute force).

    Returns (query_id, neighbor_id, cosine, rnk); ties broken by
    neighbor id for determinism.
    """
    from pyspark.sql import Window

    base = emb.select(
        F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vec")
    ).withColumn("_norm2", norm_sq_dec(F.col("_vec")))
    queries = base.filter(
        query_pred if query_pred is not None else (F.col("_vid") % 100 == 0)
    ).select(
        F.col("_vid").alias("query_id"),
        F.col("_vec").alias("_qvec"),
        F.col("_norm2").alias("_qnorm2"),
    )
    pairs = queries.crossJoin(base).filter(F.col("_vid") != F.col("query_id"))
    from pyield_spark.functions.numbers import pround_expr

    scored = pairs.withColumn(
        "cosine",
        pround_expr(
            dot_dec(F.col("_qvec"), F.col("_vec"))
            / (F.sqrt(F.col("_qnorm2")) * F.sqrt(F.col("_norm2"))),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("_vid").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            F.col("_vid").alias("neighbor_id"),
            "cosine",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def lsh_bucket_expr(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Sign-LSH bucket id from deterministic pseudo-hyperplanes.

    Plane p weights component i by w(p,i) = ((1299721·p + 104729·i)
    mod 97) − 48 (a fixed, portable integer family ≈ centered uniform).
    Bucket = Σ_p 2^p·[⟨w_p, v⟩ > 0]. Same formula is expressible in the
    SQL oracle; at scale, equi-join on the bucket id prunes candidates.
    """
    v = _as_double(vec)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x * (((F.lit(1299721 * p) + F.lit(104729) * i) % 97) - 48).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def ivf_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column | None = None,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: coarse codebook → inverted lists → probe → rescore.

    The codebook is the ``n_centroids`` lowest-id vectors (deterministic
    on any engine — real deployments would k-means offline and broadcast
    the result; the plumbing is identical). Every vector is assigned to
    its nearest centroid in ONE broadcast pass (cost N·C, the standard
    IVF coarse quantization — C stays small). A query probes its
    ``n_probe`` nearest lists and rescores exactly ONLY inside them: the
    candidate join is an equi-join on the list id, so the pair space is
    ~N·n_probe/C per query instead of N — linear and shuffle-pruned at
    100 TB, with `cosine_topk` as the bounded exact rescorer.

    Scores are portably rounded (6dp) before ranking with id tie-breaks,
    so assignment, probing and the final top-k are bit-stable across
    engines.
    """
    from pyspark.sql import Window

    from pyield_spark.functions.numbers import pround_expr

    base = emb.select(
        F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vec")
    ).withColumn("_norm2", norm_sq_dec(F.col("_vec")))

    cents = (
        base.orderBy("_vid")
        .limit(n_centroids)
        .select(
            F.col("_vid").alias("_cid"),
            F.col("_vec").alias("_cvec"),
            F.col("_norm2").alias("_cnorm2"),
        )
    )

    def _score(vec, norm2):
        return pround_expr(
            dot_dec(vec, F.col("_cvec"))
            / (F.sqrt(norm2) * F.sqrt(F.col("_cnorm2"))),
            6,
        )

    wassign = Window.partitionBy("_vid").orderBy(
        F.col("_cscore").desc(), F.col("_cid").asc()
    )
    assigned = (
        base.crossJoin(F.broadcast(cents))
        .withColumn("_cscore", _score(F.col("_vec"), F.col("_norm2")))
        .withColumn("_crn", F.row_number().over(wassign))
        .filter(F.col("_crn") == 1)
        .select("_vid", "_vec", "_norm2", "_cid")
    )

    queries = base.filter(
        query_pred if query_pred is not None else (F.col("_vid") % 100 == 0)
    ).select(
        F.col("_vid").alias("query_id"),
        F.col("_vec").alias("_qvec"),
        F.col("_norm2").alias("_qnorm2"),
    )
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn("_cscore", _score(F.col("_qvec"), F.col("_qnorm2")))
        .withColumn(
            "_crn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("_cscore").desc(), F.col("_cid").asc()
                )
            ),
        )
        .filter(F.col("_crn") <= n_probe)
        .select("query_id", "_qvec", "_qnorm2", "_cid")
    )

    cand = probes.join(assigned, "_cid").filter(F.col("_vid") != F.col("query_id"))
    scored = cand.withColumn(
        "cosine",
        pround_expr(
            dot_dec(F.col("_qvec"), F.col("_vec"))
            / (F.sqrt(F.col("_qnorm2")) * F.sqrt(F.col("_norm2"))),
            6,
        ),
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("_vid").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            F.col("_vid").alias("neighbor_id"),
            F.col("_cid").alias("list_id"),
            "cosine",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def hard_negatives(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_pred: Column | None = None,
    k: int = 3,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each probe,
    the top-k most-cosine-similar vectors with a DIFFERENT label —
    near-misses the loss learns the most from (the standard dense-
    retrieval / embedding-training curation step).

    Same exactness-baseline stance as ``cosine_topk``: brute force —
    every vector is a probe unless ``query_pred`` bounds the set (do
    bound it for large corpora); at scale, prune candidates through LSH
    buckets or IVF probe lists first (``lsh_bucket_expr`` / ``ivf_topk``
    keep the pair space linear) and rescore exactly here. Ties break on
    neighbor id for determinism.

    Returns (query_id, query_label, neighbor_id, neighbor_label,
    cosine, rnk).
    """
    from pyspark.sql import Window

    from pyield_spark.functions.numbers import pround_expr

    base = emb.select(
        F.col(id_col).alias("_vid"),
        F.col(label_col).cast("int").alias("_lbl"),
        F.col(vec_col).alias("_vec"),
    ).withColumn("_norm2", norm_sq_dec(F.col("_vec")))
    # default: EVERY vector is a probe (the library contract); callers
    # bound the probe set themselves (q_hard_negatives samples ids)
    probes = (base.filter(query_pred) if query_pred is not None else base).select(
        F.col("_vid").alias("query_id"),
        F.col("_lbl").alias("query_label"),
        F.col("_vec").alias("_qvec"),
        F.col("_norm2").alias("_qnorm2"),
    )
    pairs = probes.crossJoin(base).filter(F.col("_lbl") != F.col("query_label"))
    scored = pairs.withColumn(
        "cosine",
        pround_expr(
            dot_dec(F.col("_qvec"), F.col("_vec"))
            / (F.sqrt(F.col("_qnorm2")) * F.sqrt(F.col("_norm2"))),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("_vid").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "query_label",
            F.col("_vid").alias("neighbor_id"),
            F.col("_lbl").alias("neighbor_label"),
            "cosine",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )

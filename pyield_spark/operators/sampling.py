"""Training-data assembly operators: deterministic sampling, sequence
packing, and mixture resampling.

These are the post-dedup stages of an LLM data pipeline (sample a
stratified subset -> weight domains -> pack documents into fixed token
budgets). No reference equivalent (PYield is a market-data library);
they complete the training-data extension set alongside
``operators/dedup.py`` / ``operators/graph.py``.

All randomness is HASH randomness (md5-derived 32-bit buckets via
``h32_expr``), never ``rand()``:

- reproducible across runs, engines (the DuckDB oracle replays the
  exact bucket arithmetic), AQE re-execution, and task retries —
  ``rand()`` gives a different sample when a lost task re-runs;
- embarrassingly parallel: a pure column filter, zero shuffles, fully
  pushed into the scan stage (whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pyield_spark.operators.text import h32_expr

_BUCKETS = 1_000_000


def _thr(rate: float) -> int:
    # round, don't truncate: int(0.3 * 1e6) == 299999 under binary
    # floats — an off-by-one threshold the SQL oracle wouldn't share
    return int(round(rate * _BUCKETS))


def sample_bucket_expr(key: str | Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) from a hash of ``salt || key``.

    Distinct salts give independent samples over the same keys (e.g.
    train/validation splits that must not correlate).
    """
    c = F.col(key) if isinstance(key, str) else key
    # null keys coalesce to a sentinel: concat() null-propagates, and a
    # NULL bucket silently DROPPED every null-key row from all the
    # hash-sampling operators (even at fraction=1.0) and from
    # global_sort_index (review fix). All null-key rows share one
    # deterministic bucket — kept or dropped together per the rate.
    key_s = F.coalesce(c.cast("string"), F.lit("\u0000<null-key>"))
    return F.pmod(h32_expr(F.concat(F.lit(salt), key_s)), F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, keyed on ``key``."""
    return df.filter(sample_bucket_expr(key, salt) < _thr(fraction))


def stratified_sample(
    df: DataFrame,
    stratum: str,
    rates: dict[str, float],
    key: str,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash sampling (e.g. keep 80% of 'en', 30% of 'pt').

    The rate ladder compiles to a single ``when`` chain — still a pure
    scan-stage filter, no shuffle, no per-stratum pass over the data.
    """
    thr = F.lit(_thr(default_rate))
    for val, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum) == val, _thr(rate)).otherwise(thr)
    return df.filter(sample_bucket_expr(key, salt) < thr)


def mixture_resample(
    df: DataFrame,
    domain: str,
    weights: dict[str, float],
    key: str,
    salt: str = "mix",
) -> DataFrame:
    """Replicate rows per-domain by (possibly fractional) epoch weights.

    Weight 1.7 -> every row appears once and a deterministic 70% hash
    slice appears twice (``copy_idx`` 0..n-1 distinguishes copies).
    This is the standard mixture-weighting trick (upsample high-value
    domains, downsample the rest) expressed as ``sequence`` + ``explode``
    — a narrow row multiplier, no shuffle, output size = sum of weights
    x input size exactly as the mixture spec dictates.
    """
    whole = F.lit(0)
    frac = F.lit(0)
    for val, w in sorted(weights.items()):
        whole = F.when(F.col(domain) == val, int(w)).otherwise(whole)
        frac = F.when(F.col(domain) == val, _thr(w - int(w))).otherwise(frac)
    n_copies = whole + (sample_bucket_expr(key, salt) < frac).cast("int")
    return (
        df.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )


def global_sort_index(
    df: DataFrame,
    key: str,
    salt: str = "shuffle",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic corpus shuffle: a dense global position 0..n-1 in
    hash order of ``key`` — the training-order shuffle every epoch needs,
    reproducible across runs/engines/retries (no ``rand()``).

    A naive ``row_number() OVER (ORDER BY hash)`` is a single-partition
    window — the classic global-rank scale bug. This is the distributed
    form:

    - bucket by hash RANGE (bucket = hash div width, so bucket order ==
      hash order across buckets),
    - ONE shuffle: window ``partitionBy(bucket) orderBy(hash, key)``
      ranks inside each bucket in parallel,
    - bucket offsets are a prefix sum over the ≤ ``n_buckets`` per-bucket
      counts (a driver-scale aggregate, broadcast back).

    ``pos = offset[bucket] + rank_in_bucket`` is exactly the global rank.
    At 100 TB raise ``n_buckets`` to O(cluster cores); the offset table
    stays tiny.
    """
    from pyspark.sql import Window

    width = _BUCKETS // n_buckets
    h = sample_bucket_expr(key, salt)
    df2 = df.withColumn("_h", h).withColumn(
        "_bkt", F.floor(F.col("_h") / width).cast("int")
    )
    counts = df2.groupBy("_bkt").agg(F.count("*").alias("_n"))
    # ≤ n_buckets rows: the no-partition window here is the documented
    # ghost-stitch idiom (tiny spine), not a scale hazard
    woff = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bkt", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
    )
    wrank = Window.partitionBy("_bkt").orderBy("_h", key)
    return (
        df2.join(F.broadcast(offsets), "_bkt")
        .withColumn("pos", F.col("_off") + F.row_number().over(wrank) - 1)
        .drop("_h", "_bkt", "_off")
    )


def pack_sequences(
    df: DataFrame,
    tokens: str | Column,
    key: str,
    budget: int,
    n_shards: int = 32,
) -> DataFrame:
    """Assign each document to a (shard, bin) so every bin holds a
    contiguous run of documents whose token budget starts below
    ``budget`` — streaming sequence packing for fixed-context training.

    Documents are hash-sharded (so the packing parallelizes across the
    cluster: ONE window shuffle keyed on shard, each shard's cumsum is
    an O(n) growing frame) and packed greedily in key order inside the
    shard: ``bin = floor(cumsum_before / budget)``. A document that
    straddles a boundary stays in the bin where it started (standard
    streaming packing; the trainer truncates or pads the tail).

    Output adds ``shard``, ``bin``, ``offset_in_bin`` (token offset at
    which the document starts inside its bin).
    """
    tok = F.col(tokens) if isinstance(tokens, str) else tokens
    shard = F.pmod(h32_expr(F.col(key).cast("string")), F.lit(n_shards))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumn("shard", shard).withColumn(
        "_before", F.coalesce(F.sum(tok).over(w), F.lit(0))
    )
    return (
        out.withColumn("bin", F.floor(F.col("_before") / budget))
        .withColumn("offset_in_bin", F.col("_before") % budget)
        .drop("_before")
    )


def weighted_sample(
    df: DataFrame,
    key: str,
    weight: str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): keep the top-``n`` rows by ``u^(1/w)`` where ``u``
    is a hash-derived uniform in (0, 1] — inclusion probability is
    proportional to ``weight`` (length- or quality-proportional corpus
    subsetting), and the same rows survive on every run/engine/retry.

    Ordering uses the monotone transform ``ln(u)/w`` (no pow), portably
    rounded; ties (only possible through the rounding) break on the key.
    Rows with null/non-positive weight are excluded, as in the A-ES
    contract. Scale shape: a pure scan-stage key computation + global
    top-n — Spark runs TakeOrderedAndProject (per-partition heaps, no
    full sort, no shuffle of the corpus).
    """
    from pyield_spark.functions.numbers import pround_expr

    u = (sample_bucket_expr(key, salt) + 1).cast("double") / F.lit(1e6)
    w = F.col(weight).cast("double")
    es = pround_expr(F.log(u) / w, 9)
    # ~isnan: Spark's total order puts NaN ABOVE every double, so a NaN
    # weight would pass `> 0` AND sort first under desc — one NaN row
    # (quality scores from pow/log chains produce them) would silently
    # preempt the whole top-n (review-confirmed)
    return (
        df.filter((w > 0) & ~F.isnan(w))
        .withColumn("es_key", es)
        .orderBy(F.col("es_key").desc(), F.col(key).asc())
        .limit(n)
    )

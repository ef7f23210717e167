"""Bloom-filter membership for corpus-scale decontamination /
incremental dedup (round 8 extension).

Why: `q_decontaminate` broadcasts the eval split's DISTINCT SHINGLE
SET — fine for megabyte benchmark suites, but the same pattern against
a large blocklist (a prior training corpus, a leaked-document registry)
broadcasts gigabytes. A Bloom filter compresses ANY membership set to a
fixed bitset (default 4096 bits = sixteen 32-bit words packed in
BIGINTs ≈ 1 KB — size the bits to the set at deployment) with
one-sided error: set members ALWAYS hit; non-members false-positive at
≈ (1 − e^(−kn/m))^k. For decontamination the FP direction is the safe
one — you over-drop slightly, never leak eval data through.

Portability contract (what makes the registered query oracle-exact):
two independent 32-bit element hashes — the first and second 8 md5
hex digits — combine Kirsch–Mitzenmacher style into the k bit
positions ``(h1 + i·(2·h2 + 1)) mod m_bits`` (i < k; the forced-odd
step also guards the h2=0 degenerate; terms stay < 2^37 — exact
BIGINT on every engine). Double hashing matters, not just costs: an
affine family over ONE hash has an FP floor of n/m — whenever
h(x) ≡ h(y) (mod m) every position collides at once (measured 13%
vs the 2% bound in the sizing property test); with two hashes that
joint collision needs both to agree and the measured rate tracks the
(1 − e^(−kn/m))^k theory. Bit values are
``2^(pos mod 32)`` via double pow + cast (exact < 2^31, the same trick
the SimHash oracle uses), words OR together with ``bit_or``. Every
step replays identically in DuckDB, so even the FALSE POSITIVES are
bit-identical across engines.

Scale shape: the build side is one groupBy over the blocklist's
shingles (run once, persist the ≤ m_bits/32-row word table); the PROBE
side inlines the words as a literal array (bounded driver hop, same
class as the ANN codebooks) so the corpus scan is MAP-ONLY — zero
probe-side shuffles, no join, no broadcast exchange; contamination is
an ``exists``/``filter`` over each doc's shingle array in the scan
projection. This mirrors Spark's own injected
``BloomFilterMightContain`` runtime filters, but as a first-class,
oracle-replayable operator.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from pyield_spark.operators.dedup import shingles_expr
from pyield_spark.operators.text import h32_expr

M_BITS = 4096
WORD_BITS = 32  # 32 bits per BIGINT word keeps 2^bit < 2^31 (sign-safe)
K = 4

# above this many words (default 2048 words = 64 Kbit = 16 KB) the
# probe stops inlining the table as a per-expression literal array —
# giant literal trees bloat every task binary and the codegen source —
# and ships it ONCE as a one-row broadcast instead
INLINE_MAX_WORDS = 2048


MAX_K = 16  # k beyond 16 buys < 1e-5 absolute FP at optimal m


def bloom_size(n: int, p: float, max_k: int = MAX_K) -> tuple[int, int]:
    """Optimal ``(m_bits, k)`` for ``n`` elements at target FP rate
    ``p``: m = ⌈−n·ln p / ln²2⌉ (rounded up to whole words),
    k = round(m/n · ln 2) — the classic Bloom sizing identities.

    ``k`` is clamped to ``max_k`` (double hashing synthesizes any k
    from the two base hashes; a smaller-than-optimal k only RAISES the
    FP rate predictably, never breaks the one-sided-error contract).
    When the clamp actually bites — very small target ``p`` whose
    optimal k exceeds ``max_k`` — the achieved rate silently exceeding
    the request is easy to miss at call sites, so a ``UserWarning``
    reports the achieved ``bloom_fp_rate``; callers sizing for a
    strict ``p`` should raise ``max_k`` or treat the warned rate as
    the contract. Feed the result straight into ``bloom_build``/
    ``bloom_decontaminate``.
    """
    if n <= 0:
        raise ValueError(f"n must be positive: {n}")
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1): {p}")
    m = math.ceil(-n * math.log(p) / (math.log(2.0) ** 2))
    m = ((m + WORD_BITS - 1) // WORD_BITS) * WORD_BITS
    k_opt = max(1, round(m / n * math.log(2.0)))
    k = min(max_k, k_opt)
    if k < k_opt:
        achieved = bloom_fp_rate(n, m, k)
        if achieved > p:
            import warnings

            warnings.warn(
                f"bloom_size: k clamped {k_opt}->{k} (max_k={max_k}); "
                f"achieved FP rate {achieved:.3g} exceeds target {p:.3g}",
                UserWarning,
                stacklevel=2,
            )
    return m, k


def bloom_fp_rate(n: int, m_bits: int, k: int) -> float:
    """Theoretical false-positive rate (1 − e^(−kn/m))^k for ``n``
    inserted elements — the bound the property tests measure against."""
    return (1.0 - math.exp(-k * n / m_bits)) ** k


def _positions(h1: Column, h2: Column, m_bits: int, k: int) -> list[Column]:
    """Kirsch–Mitzenmacher: pos_i = (h1 + i·(2·h2+1)) mod m — k
    near-independent positions from two 32-bit hashes (KM 2006 shows
    this family preserves the Bloom FP asymptotics)."""
    step = h2 * F.lit(2) + F.lit(1)
    return [(h1 + F.lit(i) * step) % F.lit(m_bits) for i in range(k)]


def _h2_expr(s: Column) -> Column:
    """Second independent 32-bit hash — shared with Count-Min via
    :func:`pyield_spark.operators.text.h32b_expr`."""
    from pyield_spark.operators.text import h32b_expr

    return h32b_expr(s)


def _bitval(pos: Column) -> Column:
    return F.pow(F.lit(2.0), pos % WORD_BITS).cast("long")


def bloom_build(
    df: DataFrame,
    text: str = "text",
    n: int = 3,
    m_bits: int = M_BITS,
    k: int = K,
) -> DataFrame:
    """Build the word table (word, bits) from the blocklist's distinct
    word n-gram shingles — ONE explode + ONE groupBy(bit_or), at most
    ``m_bits / 32`` output rows regardless of input size."""
    if m_bits % WORD_BITS:
        raise ValueError(f"m_bits must be a multiple of {WORD_BITS}")
    sh = (
        df.select(F.explode(shingles_expr(F.col(text), n)).alias("shingle"))
        .distinct()
        .withColumn("_h1", h32_expr("shingle"))
        .withColumn("_h2", _h2_expr(F.col("shingle")))
    )
    probes = sh.select(
        F.explode(
            F.array(*_positions(F.col("_h1"), F.col("_h2"), m_bits, k))
        ).alias("_pos")
    )
    return probes.groupBy(
        F.floor(F.col("_pos") / WORD_BITS).cast("long").alias("word")
    ).agg(F.bit_or(_bitval(F.col("_pos"))).alias("bits"))


def bloom_words(bloom: DataFrame, m_bits: int = M_BITS) -> list[int]:
    """Materialize the word table as a dense python list (missing
    words → 0) — the bounded driver hop (≤ m_bits/32 longs ≈ 1 KB at
    the default) the probe side inlines as a literal."""
    dense = [0] * (m_bits // WORD_BITS)
    for r in bloom.collect():
        dense[int(r["word"])] = int(r["bits"])
    return dense


def bloom_hits_expr(
    text: Column | str,
    words: list[int] | Column,
    n: int = 3,
    m_bits: int = M_BITS,
    k: int = K,
) -> Column:
    """Count of the document's DISTINCT shingles the Bloom filter
    claims (an upper bound on true overlap — FPs are one-sided and
    deterministic). Pure map-side expression over the word table —
    either an inlined literal list (the zero-exchange default) or an
    ``array<long>`` Column (the broadcast spill route for big
    bitsets): the corpus scan stays data-shuffle-free either way.

    The shingle array is hashed FIRST (one md5 per shingle) and the
    membership filter runs over the hash array — higher-order-function
    lambdas re-evaluate captured subtrees per reference, so testing
    membership directly on the string shingle would recompute the md5
    once per position term (~8× — the same blowup class the
    shingles_expr docstring documents)."""
    if isinstance(words, Column):
        lit = words
    else:
        lit = F.array(*[F.lit(int(w)).cast("long") for w in words])

    def _in_bloom(hp: Column) -> Column:
        cond = F.lit(True)
        for pos in _positions(hp["h1"], hp["h2"], m_bits, k):
            cond = cond & (
                F.get(lit, F.floor(pos / WORD_BITS).cast("int")).bitwiseAND(_bitval(pos))
                == _bitval(pos)
            )
        return cond

    c = F.col(text) if isinstance(text, str) else text
    # hash once per shingle into a (h1, h2) struct, THEN filter — the
    # md5 never re-evaluates inside the k position terms
    digests = F.transform(shingles_expr(c, n), lambda s: F.md5(s))
    pairs = F.transform(
        digests,
        lambda d: F.struct(
            F.conv(F.substring(d, 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(d, 9, 8), 16, 10).cast("long").alias("h2"),
        ),
    )
    return F.size(F.filter(pairs, _in_bloom)).cast("long")


def bloom_decontaminate(
    corpus: DataFrame,
    blocklist: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    m_bits: int = M_BITS,
    k: int = K,
    min_hits: int = 2,
    inline_max_words: int = INLINE_MAX_WORDS,
) -> DataFrame:
    """Flag corpus docs sharing ≥ ``min_hits`` distinct shingles with
    the blocklist, by Bloom membership. Returns
    (id, n_hits, contaminated).

    Route pick by bitset size (``inline_max_words``, r8 VERDICT #5):

    - **literal-inline** (≤ threshold): EAGER build (the word-table
      driver hop), words baked into the probe expression — the corpus
      scan is map-only with ZERO exchanges (plan-guarded). This is the
      registered ``q_bloom_decontaminate`` path, unchanged.
    - **broadcast spill** (> threshold): the dense word array is
      assembled ENGINE-SIDE (map_from_arrays over the ≤ m/32-row
      build output — never collected to the driver) and shipped once
      as a ONE-ROW broadcast the corpus cross-joins against. Still
      zero data shuffles on the corpus; the only exchange is the
      one-row BroadcastExchange. Same hits expression, same values.
    """
    bloom = bloom_build(blocklist, text, n, m_bits, k)
    n_words = m_bits // WORD_BITS
    if n_words <= inline_max_words:
        words: list[int] | Column = bloom_words(bloom, m_bits)
        probed = corpus
    else:
        table = bloom.agg(
            F.map_from_arrays(
                F.collect_list("word"), F.collect_list("bits")
            ).alias("_wm")
        ).select(
            F.transform(
                F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long")),
                lambda i: F.coalesce(
                    F.element_at(F.col("_wm"), i), F.lit(0).cast("long")
                ),
            ).alias("_bloom_words")
        )
        probed = corpus.crossJoin(F.broadcast(table))
        words = F.col("_bloom_words")
    hits = bloom_hits_expr(F.col(text), words, n, m_bits, k)
    return probed.select(
        F.col(id_col),
        hits.alias("n_hits"),
        (hits >= min_hits).alias("contaminated"),
    )

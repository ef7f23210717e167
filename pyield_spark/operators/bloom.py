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
element hash = first 8 md5 hex digits (``h32_expr``), the k bit
positions are ``(h·Aᵢ + Bᵢ) mod m_bits`` over fixed odd constants
(products stay < 2^59 — exact BIGINT on every engine), bit values are
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

from pyspark.sql import Column, DataFrame, functions as F

from pyield_spark.operators.dedup import shingles_expr
from pyield_spark.operators.text import h32_expr

# fixed odd multipliers/offsets (the MinHash family constants — already
# pinned portable in q_minhash_lsh's oracle)
_A = (1299721, 15485863, 49979687, 86028121)
_B = (104729, 32452843, 67867967, 93827561)

M_BITS = 4096
WORD_BITS = 32  # 32 bits per BIGINT word keeps 2^bit < 2^31 (sign-safe)
K = 4


def _positions(h: Column, m_bits: int, k: int) -> list[Column]:
    if k > len(_A):
        raise ValueError(f"k must be <= {len(_A)}")
    return [(h * F.lit(_A[i]) + F.lit(_B[i])) % F.lit(m_bits) for i in range(k)]


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
        .withColumn("_h", h32_expr("shingle"))
    )
    probes = sh.select(
        F.explode(F.array(*_positions(F.col("_h"), m_bits, k))).alias("_pos")
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
    words: list[int],
    n: int = 3,
    m_bits: int = M_BITS,
    k: int = K,
) -> Column:
    """Count of the document's DISTINCT shingles the Bloom filter
    claims (an upper bound on true overlap — FPs are one-sided and
    deterministic). Pure map-side expression over the inlined word
    literal: the corpus scan stays exchange-free.

    The shingle array is hashed FIRST (one md5 per shingle) and the
    membership filter runs over the hash array — higher-order-function
    lambdas re-evaluate captured subtrees per reference, so testing
    membership directly on the string shingle would recompute the md5
    once per position term (~8× — the same blowup class the
    shingles_expr docstring documents)."""
    lit = F.array(*[F.lit(int(w)).cast("long") for w in words])

    def _in_bloom(h: Column) -> Column:
        cond = F.lit(True)
        for pos in _positions(h, m_bits, k):
            cond = cond & (
                F.get(lit, F.floor(pos / WORD_BITS).cast("int")).bitwiseAND(_bitval(pos))
                == _bitval(pos)
            )
        return cond

    c = F.col(text) if isinstance(text, str) else text
    hashes = F.transform(shingles_expr(c, n), lambda s: h32_expr(s))
    return F.size(F.filter(hashes, _in_bloom)).cast("long")


def bloom_decontaminate(
    corpus: DataFrame,
    blocklist: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    m_bits: int = M_BITS,
    k: int = K,
    min_hits: int = 2,
) -> DataFrame:
    """Flag corpus docs sharing ≥ ``min_hits`` distinct shingles with
    the blocklist, by Bloom membership. NOTE the build is EAGER (the
    word-table driver hop); the returned probe frame is lazy and
    map-only. Returns (id, n_hits, contaminated)."""
    words = bloom_words(bloom_build(blocklist, text, n, m_bits, k), m_bits)
    hits = bloom_hits_expr(F.col(text), words, n, m_bits, k)
    return corpus.select(
        F.col(id_col),
        hits.alias("n_hits"),
        (hits >= min_hits).alias("contaminated"),
    )

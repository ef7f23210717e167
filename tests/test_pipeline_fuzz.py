"""Differential OPERATOR-COMPOSITION fuzz (round 8, VERDICT r7 ask #7
— the parse-cell fuzz extended to whole pipelines): hypothesis draws a
small filter ∘ as-of-join ∘ aggregate pipeline over the synthetic
lineitem table, runs it through the engine's operators on Spark AND as
plain SQL on DuckDB (whose native ASOF JOIN is an independent
implementation of the same semantics), and asserts row-for-row
equality.

Exactness discipline: the compared aggregates are count (integer),
min/max (selection, no arithmetic) and a decimal-cast sum — every
value is bit-comparable across engines, no float tolerance anywhere.
One Spark job per example; examples bounded so the lap stays in test
budget.
"""

from __future__ import annotations

from decimal import Decimal

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from pyield_spark.operators.asof import asof_join

# --- pipeline-spec strategy ------------------------------------------------

_FILTERS = [
    # (spark predicate string, duckdb predicate string) — identical SQL
    "l_quantity <= {t}",
    "l_quantity > {t}",
    "l_partkey % 7 <= {m}",
    "l_suppkey % 5 >= {m}",
]

_spec = st.fixed_dictionaries(
    {
        "filt": st.sampled_from(_FILTERS),
        "t": st.integers(1, 50),
        "m": st.integers(0, 4),
        "strategy": st.sampled_from(["backward", "forward"]),
        "grouped": st.booleans(),
        "agg_key": st.sampled_from(["l_returnflag", "l_linestatus"]),
        "exact": st.booleans(),  # allow_exact_matches
        "shift": st.integers(0, 5),  # dim key offset (days)
    }
)


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    yield con
    con.close()


def _canon(rows):
    out = []
    for r in rows:
        key, cnt, mn, mx, sm = r
        sm = Decimal(sm) if sm is not None else None
        out.append((key, int(cnt), mn, mx, sm))
    return sorted(out, key=lambda t: (t[0] is None, t[0]))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=_spec)
def test_filter_asof_agg_pipeline_matches_duckdb(spark, sf_dir, ddb, spec):
    pred = spec["filt"].format(t=spec["t"], m=spec["m"])
    op = ">=" if spec["strategy"] == "backward" else "<="
    if not spec["exact"]:
        op = op[0]  # strict: '>' / '<'
    g = spec["agg_key"]

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    shift = spec["shift"]
    # l_shipdate is a TIMESTAMP; the dim key is a DATE (both engines
    # then compare timestamp >= date via the same midnight widening)
    kx = F.date_add(F.col("l_shipdate").cast("date"), shift).alias("k")
    if spec["grouped"]:
        dim = li.groupBy(F.col(g), kx).agg(F.max("l_discount").alias("px"))
        by = g
        ddb_dim = (
            f"SELECT {g}, CAST(l_shipdate AS DATE) + {shift} AS k, max(l_discount) AS px"
            f" FROM lineitem GROUP BY 1, 2"
        )
        ddb_on = f"f.{g} = d.{g} AND f.l_shipdate {op} d.k"
    else:
        dim = li.groupBy(kx).agg(F.max("l_discount").alias("px"))
        by = None
        ddb_dim = (
            f"SELECT CAST(l_shipdate AS DATE) + {shift} AS k, max(l_discount) AS px"
            f" FROM lineitem GROUP BY 1"
        )
        ddb_on = f"f.l_shipdate {op} d.k"

    joined = asof_join(
        li.filter(pred),
        dim,
        on="l_shipdate",
        right_on="k",
        by=by,
        strategy=spec["strategy"],
        values=["px"],
        allow_exact_matches=spec["exact"],
    )
    got = _canon(
        joined.groupBy(g)
        .agg(
            F.count("*").alias("n"),
            F.min("px").alias("mn"),
            F.max("px").alias("mx"),
            F.sum(F.col("px").cast("decimal(27,6)")).alias("sm"),
        )
        .collect()
    )

    want = _canon(
        ddb.execute(
            f"""
            WITH dim AS ({ddb_dim}),
            f AS (SELECT * FROM lineitem WHERE {pred}),
            j AS (
              SELECT f.{g} AS gk, d.px AS px
              FROM f ASOF LEFT JOIN dim d ON {ddb_on}
            )
            SELECT gk, count(*), min(px), max(px),
                   sum(CAST(px AS DECIMAL(27,6)))
            FROM j GROUP BY 1
            """
        ).fetchall()
    )
    assert got == want, (spec, got[:3], want[:3])


# --- round-9 fuzz: simhash banding and Bloom bitsets (VERDICT r8 #8) -----

_sim_spec = st.fixed_dictionaries(
    {
        "bits": st.integers(8, 32),
        "k": st.integers(1, 6),
        "seed": st.integers(0, 2**16),
        "n_docs": st.integers(10, 36),
    }
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=_sim_spec)
def test_simhash_banded_equals_brute_force(spark, spec):
    """The pigeonhole-banded candidate join finds EXACTLY the pairs a
    brute-force all-pairs popcount finds, for drawn (bits, k) — the
    banding theorem's exact-recall claim, fuzzed. Corpus: token sets
    drawn from a small pool so near-dup fingerprints actually occur."""
    import random

    from pyield_spark.operators import dedup as dd

    bits = spec["bits"]
    k = min(spec["k"], bits - 1)
    rnd = random.Random(spec["seed"])
    pool = [f"w{j}" for j in range(12)]
    docs = spark.createDataFrame(
        [
            (i, " ".join(rnd.choice(pool) for _ in range(rnd.randint(3, 9))))
            for i in range(spec["n_docs"])
        ],
        "doc_id long, text string",
    )
    banded = sorted(
        map(tuple, dd.simhash_hamming_pairs(
            docs, "text", "doc_id", bits=bits, k=k).collect())
    )
    sig = {r["doc_id"]: r["simhash"]
           for r in dd.simhash_expr_input(docs, "text", "doc_id", bits).collect()}
    ids = sorted(sig)
    brute = sorted(
        (a, b, bin(sig[a] ^ sig[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sig[a] ^ sig[b]).count("1") <= k
    )
    assert banded == brute


_bloom_spec = st.fixed_dictionaries(
    {
        "m_words": st.sampled_from([4, 16, 64, 256]),
        "k": st.integers(1, 8),
        "n_block": st.integers(5, 60),
        "n_probe": st.integers(5, 40),
        "seed": st.integers(0, 2**16),
    }
)


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.lower().strip().split()
    return {" ".join(toks[i:i + n]) for i in range(max(len(toks) - n + 1, 0))}


def _py_bloom(shingles, m_bits: int, k: int):
    """Independent pure-Python twin of the engine's KM double-hashed
    bitset (hashlib md5, int arithmetic — no Spark expressions)."""
    import hashlib

    bits = 0
    for s in shingles:
        d = hashlib.md5(s.encode()).hexdigest()
        h1, h2 = int(d[:8], 16), int(d[8:16], 16)
        for i in range(k):
            bits |= 1 << ((h1 + i * (2 * h2 + 1)) % m_bits)
    return bits


def _py_hits(text: str, bits: int, m_bits: int, k: int) -> int:
    import hashlib

    n = 0
    for s in _py_shingles(text):
        d = hashlib.md5(s.encode()).hexdigest()
        h1, h2 = int(d[:8], 16), int(d[8:16], 16)
        if all(bits >> ((h1 + i * (2 * h2 + 1)) % m_bits) & 1 for i in range(k)):
            n += 1
    return n


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=_bloom_spec)
def test_bloom_bitset_matches_exact_python_twin(spark, spec):
    """Drawn (m, k, n) Bloom configs: the engine's expression-built
    bitset and per-document hit counts equal an independent pure-Python
    md5/bit-arithmetic implementation EXACTLY (including false
    positives), and every true member hits (one-sided error)."""
    import random

    from pyield_spark.operators import bloom as bl

    rnd = random.Random(spec["seed"])
    m_bits, k = spec["m_words"] * bl.WORD_BITS, spec["k"]
    block_rows = [
        (i, f"b{rnd.randint(0, 99)} c{rnd.randint(0, 99)} "
            f"d{rnd.randint(0, 99)} e{rnd.randint(0, 99)}")
        for i in range(spec["n_block"])
    ]
    probe_rows = [
        (i, f"p{rnd.randint(0, 999)} q{rnd.randint(0, 999)} r{rnd.randint(0, 999)}")
        for i in range(spec["n_probe"])
    ]
    block = spark.createDataFrame(block_rows, "doc_id long, text string")
    probe = spark.createDataFrame(probe_rows, "doc_id long, text string")

    # bitset parity: engine word table == python twin
    words = bl.bloom_words(bl.bloom_build(block, m_bits=m_bits, k=k), m_bits)
    blk_shingles = set().union(*[_py_shingles(t) for _, t in block_rows])
    py_bits = _py_bloom(blk_shingles, m_bits, k)
    got_bits = 0
    for w, v in enumerate(words):
        got_bits |= v << (w * bl.WORD_BITS)
    assert got_bits == py_bits

    # hit-count parity on probes (includes any false positives)
    got = {r["doc_id"]: r["n_hits"] for r in bl.bloom_decontaminate(
        probe, block, m_bits=m_bits, k=k, min_hits=1).collect()}
    for i, t in probe_rows:
        assert got[i] == _py_hits(t, py_bits, m_bits, k), (i, t)

    # one-sided: members always fully hit
    mem = {r["doc_id"]: r["n_hits"] for r in bl.bloom_decontaminate(
        block, block, m_bits=m_bits, k=k, min_hits=1).collect()}
    for i, t in block_rows:
        assert mem[i] == len(_py_shingles(t)), (i, t)

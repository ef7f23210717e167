"""Property tests for the round-2 curation operators: mathematical
invariants that hold for ANY corpus, checked on randomized documents."""

import pytest
from hypothesis import given, settings, strategies as st

words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
doc = st.lists(words, min_size=0, max_size=25).map(" ".join)


@pytest.fixture(scope="module")
def corpus_df(spark):
    def make(docs):
        return spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )

    return make


@settings(max_examples=5, deadline=None)
@given(st.lists(doc, min_size=2, max_size=5))
def test_containment_dominates_jaccard(spark, docs):
    """|A∩B|/min(|A|,|B|) >= |A∩B|/|A∪B| for every pair — containment
    is the weaker (more inclusive) dedup signal by construction, so a
    threshold-t containment sweep always returns a superset of the
    threshold-t set-Jaccard sweep."""
    from pyield_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    rows = containment_pairs(df, "text", "doc_id", n=2, threshold=0.0).collect()
    for r in rows:
        union = r.n_a + r.n_b - r.n_inter
        jac = r.n_inter / union if union else 0.0
        assert r.containment >= jac - 1e-9
        assert 0.0 <= r.containment <= 1.0 + 1e-9


@settings(max_examples=5, deadline=None)
@given(st.lists(doc.filter(lambda d: d.strip()), min_size=1, max_size=6))
def test_token_entropy_bounds(spark, docs):
    """0 <= H <= ln(n_tokens) with equality at the uniform/degenerate
    extremes (up to the portable 6dp rounding)."""
    import math

    from pyield_spark.operators.vocab import token_entropy

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    for r in token_entropy(df, "text", "doc_id").collect():
        assert r.token_entropy is not None
        assert -1e-6 <= r.token_entropy <= math.log(r.n_tokens) + 1e-6


@settings(max_examples=5, deadline=None)
@given(st.lists(doc.filter(lambda d: len(d.split()) >= 2), min_size=1, max_size=5))
def test_lm_typicality_nonpositive(spark, docs):
    """Smoothed bigram log-probs are log of a value in (0, 1] when the
    model contains at least 2 distinct unigrams (c_ab + k <= c_w1 + kV),
    so the per-doc mean is <= 0; n_bigrams matches len(tokens) - 1."""
    from pyield_spark.operators.vocab import lm_typicality

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    rows = {r.doc_id: r for r in lm_typicality(df, "text", "doc_id").collect()}
    vocab = {w for d in docs for w in d.split()}
    for i, d in enumerate(docs):
        r = rows[i]
        assert r.n_bigrams == max(len(d.split()) - 1, 0)
        if r.n_bigrams and len(vocab) >= 2:
            assert r.avg_logprob <= 1e-6

"""Corpus vocabulary / distinctive-terms / repetition operators."""

from collections import Counter

from pyspark.sql import functions as F

from pyield_spark.operators import vocab as vb


def test_bigrams_expr_edges(spark):
    df = spark.createDataFrame(
        [("a b c",), ("solo",), ("x y",)], "t string"
    )
    rows = df.select(
        vb.bigrams_expr(F.split(F.col("t"), r"\s+")).alias("bg")
    ).collect()
    assert rows[0]["bg"] == ["a b", "b c"]
    assert rows[1]["bg"] == []
    assert rows[2]["bg"] == ["x y"]


def test_vocabulary_matches_local_count(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_doc = vb.doc_term_counts(docs, "text", "doc_id")
    got = {
        r["token"]: (r["tf"], r["df"])
        for r in vb.vocabulary(per_doc).collect()
    }
    tf = Counter()
    dfc = Counter()
    for r in docs.select("doc_id", "text").collect():
        toks = r["text"].strip().lower().split()
        tf.update(toks)
        dfc.update(set(toks))
    assert got == {t: (tf[t], dfc[t]) for t in tf}


def test_distinctive_terms_rank_order(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = vb.distinctive_terms(docs, "text", "doc_id", k=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        # rank order == (df asc, tf desc, token asc)
        keys = [(r["df"], -r["tf"], r["token"]) for r in rows]
        assert keys == sorted(keys)


def test_repetition_stats_hand_check(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z"), (3, "solo")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in vb.repetition_stats(df, "text", "doc_id").collect()}
    r1 = got[1]
    assert (r1["n_tokens"], r1["n_distinct"], r1["top_tf"]) == (4, 2, 3)
    assert r1["top_bigram_tf"] == 2  # "a a" twice
    assert r1["dup_word_ratio"] == 0.5 and r1["top_token_share"] == 0.75
    r2 = got[2]
    assert (r2["top_tf"], r2["top_bigram_tf"], r2["dup_word_ratio"]) == (1, 1, 0.0)
    r3 = got[3]
    assert (r3["n_tokens"], r3["top_bigram_tf"]) == (1, 0)


# --- winnowing: scalar twin + the Schleimer guarantee ---------------------


def _winnow_fps(text: str, k: int = 3, w: int = 4) -> set[str]:
    """Scalar twin of q_winnow_fingerprint's per-doc pipeline."""
    import hashlib

    toks = text.lower().strip().split()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def test_winnow_matches_scalar_twin(spark, sf_dir):
    from pyield_spark.queries import QUERIES, load_all

    load_all()

    docs = {r.doc_id: r.text for r in spark.read.parquet(
        f"{sf_dir}/documents.parquet").collect()}
    got = {r.doc_id: (r.n_windows, r.n_fp) for r in
           QUERIES["q_winnow_fingerprint"](spark, sf_dir).collect()}
    for doc_id, text in docs.items():
        fps = _winnow_fps(text)
        n_grams = max(len(text.lower().strip().split()) - 2, 0)
        n_windows = max(n_grams - 3, 0)
        assert got[doc_id] == (n_windows, len(fps)), doc_id


def test_winnow_guarantee_shared_run_shares_fingerprint():
    """Schleimer guarantee: two documents sharing a token run of at
    least w+k-1 (=6) tokens share at least one fingerprint."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    a = "one two three " + shared + " four five six seven"
    b = "nine ten " + shared + " eleven twelve thirteen fourteen"
    assert _winnow_fps(a) & _winnow_fps(b)


def test_winnow_short_docs_zero_windows():
    # fewer than k tokens → no grams; k..w+k-2 tokens → grams but no window
    assert _winnow_fps("one two") == set()
    assert _winnow_fps("one two three four five") == set()  # 3 grams < w
    assert len(_winnow_fps("a b c d e f")) == 1  # exactly one window


def test_lm_typicality_hand_computed(spark):
    """Toy corpus vs a literal Python replica of the smoothed bigram
    model: 'a b' occurs twice ('a b a b' + 'a b'), vocabulary {a,b,c}."""
    import math

    from pyield_spark.operators.vocab import lm_typicality

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c"), (4, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_bigrams, r.avg_logprob) for r in
           lm_typicality(docs, "text", "doc_id").collect()}

    # corpus-wide: c(a)=3, c(b)=3, c(c)=1, V=3 (empty-string token from
    # doc 4's split counts like any token? '' splits to [''] -> token ''
    # exists; recompute: tokens of "" -> [''] so c('')=1 and V=4)
    c1 = {"a": 3, "b": 3, "c": 1, "": 1}
    V = 4
    cab = {("a", "b"): 3, ("b", "a"): 1}

    def lp(w1, w2):
        x = math.log((cab[(w1, w2)] + 0.5) / (c1[w1] + 0.5 * V))
        return round(math.copysign(math.floor(abs(x) * 1e9 + 0.5), x) / 1e9, 12)

    def avg(pairs):
        s = sum(lp(*p) for p in pairs)  # 9dp terms: exact in binary? use same scheme
        m = s / len(pairs)
        return math.copysign(math.floor(abs(m) * 1e6 + 0.5), m) / 1e6

    exp1 = avg([("a", "b"), ("b", "a"), ("a", "b")])
    exp2 = avg([("a", "b")])
    assert out[1][0] == 3 and abs(out[1][1] - exp1) < 1e-9
    assert out[2][0] == 1 and abs(out[2][1] - exp2) < 1e-9
    assert out[3] == (0, None)
    assert out[4] == (0, None)


def test_token_entropy_hand_computed(spark):
    """Entropy vs literal Shannon formula on a toy corpus; uniform doc
    hits ln(k), single-repeated-token doc hits 0."""
    import math

    from pyield_spark.operators.vocab import token_entropy

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x x x x x"), (3, "a a b")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_tokens, r.token_entropy) for r in
           token_entropy(docs, "text", "doc_id").collect()}
    assert out[1] == (4, round(math.log(4), 6))
    assert out[2] == (5, 0.0)
    h3 = math.log(3) - (2 * math.log(2)) / 3
    assert out[3][0] == 3 and abs(out[3][1] - h3) < 2e-6


def test_bm25_topk_hand_computed(spark):
    """BM25 against a literal Python twin (same +0.5-smoothed idf, same
    8dp per-term rounding, exact sum) on a 3-doc corpus."""
    import math

    from pyield_spark.operators.vocab import bm25_topk

    corpus = {
        1: "spark spark window",
        2: "merge the table",
        3: "spark fast",
    }
    terms = ["spark", "merge"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string"
    )
    out = bm25_topk(docs, "text", "doc_id", terms, k=10).collect()

    n = len(corpus)
    toks = {i: t.split() for i, t in corpus.items()}
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(t in v for v in toks.values()) for t in terms}

    def w(i, t):
        tf = toks[i].count(t)
        idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
        x = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(toks[i]) / avgdl))
        return math.copysign(math.floor(abs(x) * 1e8 + 0.5) / 1e8, x)

    want = {
        i: sum(w(i, t) for t in terms if t in toks[i]) for i in corpus
        if any(t in toks[i] for t in terms)
    }
    got = {r.doc_id: (r.bm25, r.terms_hit) for r in out}
    assert set(got) == set(want)
    for i, score in want.items():
        assert abs(got[i][0] - score) < 1e-12, (i, got[i][0], score)
    # d1 (tf=2 on the rarer-weighted pair) outranks d3; ordering is by
    # score desc then id
    ids = [r.doc_id for r in out]
    assert ids == sorted(want, key=lambda i: (-want[i], i))
    assert got[2][1] == 1 and got[1][1] == 1 and got[3][1] == 1

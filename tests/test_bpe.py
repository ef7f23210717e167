"""BPE train/encode parity against a pure-Python reference
implementation (Sennrich 2016 semantics: leftmost-first single pass
per merge, rank order), plus the DuckDB encode twin and the pinned
artifact's reproducibility contract."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from pyield_spark.operators.bpe import (
    bpe_apply_duckdb,
    bpe_apply_sql,
    bpe_token_count,
    bpe_train,
)

TEXTS = [
    "the lowest lower low low low",
    "newer newest new news the the the",
    "widest wide wider the lowest low",
    "it's a low-key test don't panic",
    "",
]


def _py_apply(toks, a, b):
    out = []
    for t in toks:
        if out and out[-1] == a and t == b:
            out[-1] = a + b
        else:
            out.append(t)
    return out


def py_train(texts, num_merges, min_freq=2):
    words = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                words[w] += 1
    cur = {w: list(w) for w in words}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, toks in cur.items():
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] += words[w]
        if not pc:
            break
        (a, b), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if cnt < min_freq:
            break
        merges.append((a, b))
        cur = {w: _py_apply(toks, a, b) for w, toks in cur.items()}
    return merges


def py_encode(w, merges):
    toks = list(w)
    for a, b in merges:
        toks = _py_apply(toks, a, b)
    return toks


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_bpe_train_matches_reference(docs):
    """The Spark aggregation loop learns the SAME ranked merges as the
    reference implementation — including the (count DESC, pair ASC)
    argmax tie-break and the min_freq early stop."""
    assert bpe_train(docs, "text", num_merges=12) == py_train(TEXTS, 12)
    # min_freq stop: a huge budget ends when the best pair goes hapax
    assert bpe_train(docs, "text", num_merges=500) == py_train(TEXTS, 500)


def test_bpe_token_count_matches_reference(docs):
    """Per-doc (n_words, n_chars, n_bpe_tokens) under the learned
    merges == the reference encoder applied word by word; the empty
    document counts its one empty-string token ('' quirk, see
    tokens_expr) as 0 BPE tokens."""
    merges = py_train(TEXTS, 12)
    got = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_bpe_tokens"])
        for r in bpe_token_count(docs, "text", "doc_id", merges).collect()
    }
    want = {}
    for i, t in enumerate(TEXTS):
        ws = t.strip().lower().split() or [""]
        want[i] = (
            len(ws),
            sum(len(w) for w in ws),
            sum(len(py_encode(w, merges)) for w in ws),
        )
    assert got == want
    # no merges at all -> every token is a char
    got0 = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_count(docs, "text", "doc_id", []).collect()
    }
    assert got0 == {i: want[i][1] for i in got0}


def test_bpe_duckdb_twin_matches_spark(spark, docs):
    """bpe_apply_duckdb replays bpe_apply_sql word-for-word — the fold
    both the registered oracle and any external consumer rely on —
    including quote-bearing words and repeated-pair chains."""
    merges = py_train(TEXTS, 12) + [("'", "s")]
    words = sorted(
        {w for t in TEXTS for w in t.strip().lower().split()} | {"aaa", "a'sa's"}
    )
    wdf = spark.createDataFrame([(w,) for w in words], "w string")
    got_spark = {
        r["w"]: list(r["bt"])
        for r in wdf.selectExpr("w", f"{bpe_apply_sql(merges)} AS bt").collect()
    }
    rel = duckdb.sql(
        "SELECT w, "
        + bpe_apply_duckdb(merges)
        + " AS bt FROM (SELECT unnest(?) AS w)",
        params=[words],
    )
    got_duck = {w: list(bt) for w, bt in rel.fetchall()}
    assert got_spark == got_duck
    assert got_spark == {w: py_encode(w, merges) for w in words}


def test_bpe_artifact_pinned_and_consumed():
    """The pinned artifact parses, is non-trivial, and every merge's
    parts are prior symbols (chars or earlier merge outputs) — the
    structural invariant of a valid BPE merge list."""
    from pyield_spark.queries.bpe_artifact import BPE_MERGES

    assert len(BPE_MERGES) >= 8
    symbols = set()
    for a, b in BPE_MERGES:
        assert (len(a) == 1 or a in symbols) and (len(b) == 1 or b in symbols)
        symbols.add(a + b)

"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (whole-stage codegen, no UDFs): token
counting, quality scoring (length/punctuation/stopword ratios),
n-gram-heuristic language ID, and polynomial rolling-hash document
fingerprinting. Designed so an exact SQL twin exists for the DuckDB
oracle (portable arithmetic only: md5-derived hashes, small-modulus
rolling hash that can't overflow, decimal-free integer math).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# small inline stopword lists per language (public common words)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es", "por", "los"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "est", "pour", "les"],
    "de": ["der", "die", "das", "und", "zu", "in", "ein", "ist", "mit", "von"],
    "pt": ["o", "a", "de", "e", "que", "em", "um", "para", "com", "os"],
}

ROLLING_BASE = 131
ROLLING_MOD = 1048573  # < 2^20: acc*131 + 255 < 2^28, never overflows


def tokens_expr(text: str | Column) -> Column:
    """Whitespace tokenization of lower-cased trimmed text.

    KNOWN QUIRK, shared with every DuckDB oracle twin (so the two
    engines agree): split('') yields [''] — an empty/whitespace-only
    document counts ONE empty-string token (n_tokens=1, and '' can
    enter a vocabulary when a corpus carries many empty docs). Changing
    this means changing every token-counting SQL twin in lockstep;
    filter empty docs upstream when the distinction matters."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count_expr(text: str | Column) -> Column:
    return F.size(tokens_expr(text))


def stopword_hits_expr(text: str | Column, words: list[str]) -> Column:
    """How many tokens are in the given stopword list."""
    toks = tokens_expr(text)
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def punct_ratio_expr(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(F.regexp_replace(c, r"[^.,;:!?]", "")) / F.length(c)


def quality_score_expr(text: str | Column, lang_words: list[str] | None = None) -> Column:
    """Heuristic quality in [0, 1]: rewards stopword presence and
    moderate token length, penalizes punctuation soup. Rounded 6dp for
    cross-engine determinism."""
    words = lang_words or STOPWORDS["en"]
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count_expr(c).cast("double")
    sw_ratio = stopword_hits_expr(c, words).cast("double") / n_tok
    p_ratio = punct_ratio_expr(c)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    score = F.lit(0.4) * len_score + F.lit(0.4) * sw_ratio + F.lit(0.2) * (1 - p_ratio)
    from pyield_spark.functions.numbers import pround_expr

    return pround_expr(score, 6)


def lang_scores_expr(text: str | Column) -> dict[str, Column]:
    """Stopword-hit count per language."""
    return {lang: stopword_hits_expr(text, ws) for lang, ws in STOPWORDS.items()}


def lang_id_expr(text: str | Column) -> Column:
    """Argmax language by stopword hits, deterministic tie-break by
    language-code order; 'und' when nothing matches."""
    scores = lang_scores_expr(text)
    langs = sorted(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    out = F.lit("und")
    # first language (in sorted order) achieving the max wins
    for lang in reversed(langs):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("und"))


def char_codes_expr(text: str | Column) -> Column:
    """Array of character codes (portable: no empty-string artifacts).

    Guarded: Spark's ``sequence(1, 0)`` would yield a DESCENDING [1, 0]
    for empty strings — empty text maps to an empty array instead.
    """
    c = F.col(text) if isinstance(text, str) else text
    codes = F.transform(
        F.sequence(F.lit(1), F.length(c)), lambda i: F.ascii(F.substring(c, i, 1))
    )
    return F.when(F.length(c) >= 1, codes).otherwise(
        F.array().cast("array<int>")
    )


def fingerprint_expr(text: str | Column) -> Column:
    """Polynomial rolling hash over characters mod a small prime —
    a portable document fingerprint (same arithmetic is expressible in
    any SQL engine without overflow)."""
    codes = char_codes_expr(text)
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLLING_BASE + x) % ROLLING_MOD,
    )


def h32_expr(s: str | Column) -> Column:
    """Portable 32-bit hash: first 8 hex digits of md5 as integer."""
    c = F.col(s) if isinstance(s, str) else s
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def h32b_expr(s: str | Column) -> Column:
    """Second independent portable 32-bit hash: md5 hex digits 9-16
    (``h32_expr`` takes 1-8) — the Kirsch–Mitzenmacher pair used by the
    Bloom filter and Count-Min double-hash position families."""
    c = F.col(s) if isinstance(s, str) else s
    return F.conv(F.substring(F.md5(c), 9, 8), 16, 10).cast("long")


def mean_word_len_expr(text: str | Column) -> Column:
    """Mean token length: non-whitespace chars / token count."""
    c = F.col(text) if isinstance(text, str) else text
    chars = F.length(F.regexp_replace(F.trim(c), r"\s+", ""))
    return chars.cast("double") / token_count_expr(c)


def own_lang_stopword_hits_expr(text: str | Column, lang: str | Column) -> Column:
    """Stopword hits against the document's OWN language list (0 for
    languages without a list — e.g. zh — which a stopword rule then
    drops, the Gopher behavior for unsupported scripts)."""
    lg = F.col(lang) if isinstance(lang, str) else lang
    out = F.lit(0)
    for code, words in STOPWORDS.items():
        out = F.when(lg == code, stopword_hits_expr(text, words)).otherwise(out)
    return out


# PII patterns kept to the regex subset Java (Spark) and RE2 (DuckDB)
# treat identically: literal classes, bounded repeats, no lookaround —
# explicit [a-zA-Z] classes instead of (?i) for the same reason. The
# oracle twins interpolate these SAME constants, so the two engines
# cannot drift. Round-6 review fixes: the email rule is case-blind
# (JOHN@EXAMPLE.COM leaked straight through the old lowercase-only
# pattern) and matches IP-host addresses (user@10.0.0.1 — otherwise
# the IP rule fired first and left the identifying local part behind).
PII_EMAIL_RE = (
    "[a-zA-Z0-9._%+-]+@([a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
    "|[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3})"
)
PII_PHONE_RE = "[0-9]{2}-[0-9]{2}-[0-9]{4}-[0-9]{4}"
PII_IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def redact_pii_expr(text: str | Column) -> Column:
    """Scrub emails, phone numbers, and IPv4 addresses to typed tags.

    Pure ``regexp_replace`` chain (JVM-side, codegen, replaces ALL
    occurrences) — the standard pre-training scrub stage. Order matters:
    email first, so a ``user@10.0.0.1`` address is consumed whole by
    the email rule (which matches IP hosts too) instead of being
    half-eaten by the IP rule.
    """
    c = F.col(text) if isinstance(text, str) else text
    out = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, PII_IPV4_RE, "<IP>")


def pii_count_expr(text: str | Column, pattern: str) -> Column:
    """How many matches of ``pattern`` occur in ``text`` (audit column —
    pipelines track redaction counts per source to spot PII-heavy
    feeds)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).cast("long")


def spans_expr(text: str | Column, span_tokens: int = 10) -> Column:
    """Fixed-width non-overlapping token spans (exact-substring-dedup
    granularity, Lee et al. 2021 simplified to aligned windows).

    Only complete ``span_tokens``-token spans are emitted (a ragged tail
    would never hash-match another doc's aligned span anyway). Empty /
    short docs map to an empty array — the ``sequence(1, 0)`` descending
    trap is guarded exactly like ``char_codes_expr``.
    """
    toks = tokens_expr(text)
    n = F.floor(F.size(toks) / span_tokens).cast("int")
    spans = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(
            " ", F.slice(toks, (i - 1) * span_tokens + 1, span_tokens)
        ),
    )
    return F.when(n >= 1, spans).otherwise(F.array().cast("array<string>"))


def chunk_count_expr(n_chars: Column, size: int, stride: int) -> Column:
    """How many chunks a ``size``-char window with ``stride`` step cuts
    from a doc: 1 + ceil(max(len - size, 0) / stride), in pure integer
    arithmetic (both engines floor integer division identically)."""
    extra = F.when(
        n_chars > size,
        F.floor((n_chars - size + stride - 1) / stride),
    ).otherwise(F.lit(0))
    return (extra + 1).cast("int")


def gopher_rules(
    text: str | Column,
    lang: str | Column,
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    max_punct_ratio: float = 0.1,
    min_stopword_hits: int = 2,
) -> dict[str, Column]:
    """Gopher-style quality-filter rule set (Rae et al. 2021 §A1.1
    heuristics, re-expressed as pure column predicates). Returns the
    individual rule booleans plus the conjunction ``keep`` — emit the
    booleans, not just the filter, so downstream can audit WHY a
    document dropped (the standard data-pipeline practice)."""
    n_tok = token_count_expr(text)
    mwl = mean_word_len_expr(text)
    pr = punct_ratio_expr(text)
    sw = own_lang_stopword_hits_expr(text, lang)
    rules = {
        "rule_n_tokens": n_tok.between(min_tokens, max_tokens),
        "rule_word_len": (mwl >= min_word_len) & (mwl <= max_word_len),
        "rule_punct": pr <= max_punct_ratio,
        "rule_stopwords": sw >= min_stopword_hits,
    }
    keep = F.lit(True)
    for r in rules.values():
        keep = keep & r
    rules["keep"] = keep
    return rules


def canonical_url_expr(url: str | Column) -> Column:
    """Crawl-URL canonicalization (the first dedup key of a web-corpus
    pipeline): drop the fragment, strip utm_* tracking params (and any
    dangling ?/&), lower-case scheme+host, drop the www. prefix — path
    case is preserved (paths are case-sensitive on real origins).

    Idempotent: canonicalizing an already-canonical URL is a no-op
    (pinned by tests/test_intradia.py::test_url_canonicalization_idempotent),
    so re-ingesting a cleaned corpus keeps dedup keys stable.
    """
    u = F.col(url) if isinstance(url, str) else url
    no_frag = F.regexp_replace(u, "#.*", "")
    # utm_* must sit at a parameter boundary (after ? or &): otherwise a
    # legitimate 'my_utm_source=x' param would be partially stripped,
    # leaving a dangling 'my_' prefix (ADVICE r4). A run of consecutive
    # utm params collapses in ONE match (regexp_replace scans the
    # original string left-to-right, so the second of '?utm_a=1&utm_b=2'
    # would otherwise lack its consumed '&' delimiter).
    no_utm = F.regexp_replace(
        no_frag, "([?&])utm_[a-z]+=[^&]*(&utm_[a-z]+=[^&]*)*&?", "$1"
    )
    clean = F.regexp_replace(no_utm, "[?&]+$", "")
    # host stops at '/', '?' OR '#': '[^/]*' alone swallowed the whole
    # query string on pathless URLs ('http://Example.com?Foo=Bar') and
    # lower-cased case-sensitive query values (review fix)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(clean, "^[A-Za-z]+://[^/?#]*", 0)),
        "://www\\.",
        "://",
    )
    rest = F.regexp_replace(clean, "^[A-Za-z]+://[^/?#]*", "")
    return F.concat(host, rest)

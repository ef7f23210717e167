"""Single import surface for the LLM-training-data extension set.

``import pyield_spark.llm as llm`` groups the engine's beyond-reference
operators — the large-scale training-data pipeline stages (dedup,
similarity search, text analysis, sampling/assembly, multimodal
plumbing) — into task-named namespaces, mirroring how
``pyield_spark.api`` groups the reference-twin surface. Everything here
re-exports the operator modules unchanged; the registry queries
(``q_minhash_lsh`` … ``q_ivfpq_topk``) remain the executable examples
and the oracle-verified contracts for each.

Namespaces:

- ``dedup``     exact / MinHash-LSH / SimHash / Jaccard / containment
                candidates, winnowing spans, URL canonicalization
- ``cluster``   connected components over candidate pairs + keep-one /
                keep-best verdicts; SemDeDup k-means clustering
- ``similarity`` brute cosine top-k, sign-LSH buckets, IVF (with
                metadata-filtered search via ``candidate_pred``),
                IVF-PQ (``pq_encode`` ingest / ``ivfpq_topk`` serve),
                SQ8 scalar quantization, hard-negative mining
- ``text``      tokenization, quality scores, language id, Gopher
                rules, PII redaction, fingerprints, chunking
- ``vocab``     vocabulary/TF-IDF, distinctive terms, repetition
                stats, bigram-LM typicality, token entropy, BM25,
                hybrid BM25+dense RRF retrieval
- ``sample``    deterministic hash/stratified/weighted sampling,
                mixture resampling, corpus shuffle (global sort
                index), sequence packing
- ``media``     binary-column multimodal plumbing (metadata, feature
                extraction, frame sampling, resize) with REAL
                stdlib PNG/BMP decode (round 8) and sniff-routed
                fallbacks
- ``skew``      salted joins for hot keys
"""

from __future__ import annotations

from types import SimpleNamespace

from pyield_spark.operators import (
    bloom as _bloom,
    dedup as _dedup,
    graph as _graph,
    multimodal as _mm,
    sampling as _sampling,
    semantic as _semantic,
    similarity as _sim,
    skew as _skew,
    text as _text,
    vocab as _vocab,
)

dedup = SimpleNamespace(
    normalize_text=_dedup.normalize_text_expr,
    content_hash=_dedup.content_hash_expr,
    shingles=_dedup.shingles_expr,
    exact_dup_groups=_dedup.exact_dup_groups,
    jaccard_pairs=_dedup.jaccard_pairs,
    minhash_signatures=_dedup.minhash_signatures,
    lsh_candidate_pairs=_dedup.lsh_candidate_pairs,
    simhash=_dedup.simhash_expr_input,
    simhash_hamming_pairs=_dedup.simhash_hamming_pairs,
    simhash_clusters=_dedup.simhash_clusters,
    lsh_size=_dedup.lsh_size,
    lsh_capture_prob=_dedup.lsh_capture_prob,
    minhash_coeffs=_dedup.minhash_coeffs,
    bloom_build=_bloom.bloom_build,
    bloom_decontaminate=_bloom.bloom_decontaminate,
    bloom_size=_bloom.bloom_size,
    bloom_fp_rate=_bloom.bloom_fp_rate,
    containment_pairs=_dedup.containment_pairs,
    winnow_spans=_text.spans_expr,
    canonical_url=_text.canonical_url_expr,
    intradoc_span_dedup=_semantic.intradoc_span_dedup,
)

cluster = SimpleNamespace(
    connected_components=_graph.connected_components,
    dedup_decisions=_graph.dedup_decisions,
    dedup_keep_best=_graph.dedup_keep_best,
    kmeans_assign=_semantic.kmeans_assign,
    semantic_dedup=_semantic.semantic_dedup,
)

similarity = SimpleNamespace(
    cosine_topk=_sim.cosine_topk,
    train_codebooks=_sim.train_codebooks,
    lsh_bucket=_sim.lsh_bucket_expr,
    ivf_topk=_sim.ivf_topk,
    pq_encode=_sim.pq_encode,
    ivfpq_topk=_sim.ivfpq_topk,
    sq8_encode=_sim.sq8_encode,
    sq8_topk=_sim.sq8_topk,  # n_centroids= composes IVF-SQ8
    hard_negatives=_sim.hard_negatives,
    mmr_rerank=_sim.mmr_rerank,
    rp_project=_sim.rp_project_expr,
    rp_topk=_sim.rp_topk,
)

text = SimpleNamespace(
    tokens=_text.tokens_expr,
    token_count=_text.token_count_expr,
    quality_score=_text.quality_score_expr,
    lang_id=_text.lang_id_expr,
    mean_word_len=_text.mean_word_len_expr,
    gopher_rules=_text.gopher_rules,
    redact_pii=_text.redact_pii_expr,
    pii_count=_text.pii_count_expr,
    fingerprint=_text.fingerprint_expr,
    chunk_count=_text.chunk_count_expr,
)

vocab = SimpleNamespace(
    doc_term_counts=_vocab.doc_term_counts,
    vocabulary=_vocab.vocabulary,
    distinctive_terms=_vocab.distinctive_terms,
    repetition_stats=_vocab.repetition_stats,
    lm_typicality=_vocab.lm_typicality,
    token_entropy=_vocab.token_entropy,
    bm25_topk=_vocab.bm25_topk,
    hybrid_rrf=_vocab.hybrid_rrf,
)

sample = SimpleNamespace(
    hash_sample=_sampling.hash_sample,
    stratified_sample=_sampling.stratified_sample,
    mixture_resample=_sampling.mixture_resample,
    global_sort_index=_sampling.global_sort_index,
    pack_sequences=_sampling.pack_sequences,
    weighted_sample=_sampling.weighted_sample,
)

media = SimpleNamespace(
    metadata=_mm.media_metadata_exprs,
    decode_image=_mm.decode_image,
    sniff_format=_mm.sniff_format,
    extract_features=_mm.extract_features,
    sample_frames=_mm.sample_frames,
    resize_payload=_mm.resize_payload,
)

skew = SimpleNamespace(salted_join=_skew.salted_join)

from pyield_spark.operators import classifier as _clf  # noqa: E402
from pyield_spark.operators import sketch as _sketch  # noqa: E402

classifier = SimpleNamespace(
    features=_clf.clf_features,
    weak_label=_clf.clf_label,
    logreg_train=_clf.logreg_train,
    logreg_prob=_clf.logreg_prob,
)

sketch = SimpleNamespace(
    countmin_build=_sketch.countmin_build,
    countmin_merge=_sketch.countmin_merge,
    countmin_estimate=_sketch.countmin_estimate,
    countmin_size=_sketch.countmin_size,
)

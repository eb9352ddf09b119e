"""Large-scale data-pipeline operators beyond the reference's surface:
deduplication, similarity search, text analysis, multimodal plumbing.

These are Spark-first designs for the 100 TB training-data-pipeline case:
inverted-index joins instead of all-pairs, minhash banding instead of full
Jaccard matrices, JVM-side expressions wherever the semantics allow.
"""

from .dedup import (
    exact_dedup,
    dedup_keep_first,
    repeated_spans,
    repeated_span_stats,
    remove_repeated_spans,
    minhash_signatures,
    estimate_stop_shingles,
    lsh_candidate_pairs,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_signatures,
    embedding_near_duplicates,
    semantic_dedup,
    connected_components,
    dedup_clusters,
    resolve_duplicates,
)
from .curation import (
    corpus_mix,
    decontaminate,
    mix_fractions,
    shuffle_corpus,
    split_contaminated,
    stratified_sample,
    stratified_sample_exact,
    temperature_weights,
    weighted_sample,
)
from .joins import asof_join, interval_join, interval_overlap_join
from .similarity import train_spherical_kmeans
from .langmodel import BigramLM, perplexity_score, train_bigram_lm
from .classifier import NBClassifier, nb_score, train_nb_classifier
from .dsir import dsir_logweights, dsir_select
from .retrieval import bm25_topk, rrf_fuse
from .quantization import pq_cosine_topk, pq_encode, train_pq_codebooks
from .lightcurve_sim import lightcurve_embeddings, similar_lightcurves
from .similarity import cosine_topk, ivf_cosine_topk, knn_classify, lsh_cosine_topk
from .text import (
    boilerplate_lines,
    remove_boilerplate,
    chunk_documents,
    pack_sequences,
    detect_pii,
    redact_pii,
    corpus_filter,
    document_fingerprint,
    language_id,
    repetition_ratio,
    stopword_ratio,
    text_quality,
    text_signals,
    token_count,
    tokenize_chunks,
    vocab_topk,
)

__all__ = [
    "bm25_topk",
    "rrf_fuse",
    "pq_cosine_topk",
    "pq_encode",
    "train_pq_codebooks",
    "dsir_logweights",
    "dsir_select",
    "knn_classify",
    "exact_dedup",
    "dedup_keep_first",
    "repeated_spans",
    "repeated_span_stats",
    "remove_repeated_spans",
    "stopword_ratio",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_near_duplicates",
    "estimate_stop_shingles",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "embedding_near_duplicates",
    "semantic_dedup",
    "train_spherical_kmeans",
    "connected_components",
    "dedup_clusters",
    "resolve_duplicates",
    "cosine_topk",
    "lsh_cosine_topk",
    "ivf_cosine_topk",
    "lightcurve_embeddings",
    "similar_lightcurves",
    "language_id",
    "repetition_ratio",
    "text_quality",
    "token_count",
    "document_fingerprint",
    "corpus_filter",
    "chunk_documents",
    "text_signals",
    "tokenize_chunks",
    "pack_sequences",
    "detect_pii",
    "redact_pii",
    "vocab_topk",
    "asof_join",
    "interval_join",
    "interval_overlap_join",
    "BigramLM",
    "NBClassifier",
    "nb_score",
    "train_nb_classifier",
    "perplexity_score",
    "train_bigram_lm",
    "boilerplate_lines",
    "remove_boilerplate",
    "decontaminate",
    "split_contaminated",
    "stratified_sample",
    "temperature_weights",
    "stratified_sample_exact",
    "weighted_sample",
    "shuffle_corpus",
    "mix_fractions",
    "corpus_mix",
]

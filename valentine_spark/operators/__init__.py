"""Large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing, windowed event ops)."""

from .asof import asof_join
from .components import connected_components, duplicate_groups
from .interval import interval_join
from .kmeans import ivf_kmeans_topk, kmeans_assign, kmeans_assign_multi, kmeans_fit
from .dedup import (
    exact_duplicates,
    exact_duplicates_normalized,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
    normalize_text_expr,
    simhash_fingerprints,
    simhash_pairs,
)
from .pq import ivfpq_topk, pq_encode, pq_topk, pq_train
from .sampling import corpus_shuffle, corpus_split, hash_uniform, mixture_resample
from .similarity import cosine_topk, embedding_neardup_pairs, ivf_topk, sign_bucket
from .text import (
    chunk_documents,
    curation_funnel,
    decontaminate,
    doc_fingerprints,
    language_id,
    pack_sequences,
    pii_redact,
    quality_scores,
    repetition_stats,
    token_counts,
    word_shingles,
)
from .window_ops import latest_event_per_user, sessionize, topk_by

__all__ = [
    "asof_join",
    "connected_components",
    "duplicate_groups",
    "interval_join",
    "kmeans_fit",
    "kmeans_assign",
    "kmeans_assign_multi",
    "ivf_kmeans_topk",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "ivfpq_topk",
    "exact_duplicates",
    "exact_duplicates_normalized",
    "normalize_text_expr",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_prefix",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "simhash_pairs",
    "cosine_topk",
    "ivf_topk",
    "sign_bucket",
    "embedding_neardup_pairs",
    "token_counts",
    "repetition_stats",
    "chunk_documents",
    "pack_sequences",
    "corpus_split",
    "corpus_shuffle",
    "mixture_resample",
    "hash_uniform",
    "curation_funnel",
    "pii_redact",
    "decontaminate",
    "word_shingles",
    "quality_scores",
    "language_id",
    "doc_fingerprints",
    "latest_event_per_user",
    "sessionize",
    "topk_by",
]

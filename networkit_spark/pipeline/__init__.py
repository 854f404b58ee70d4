from networkit_spark.pipeline.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from networkit_spark.pipeline.text import (
    doc_fingerprint,
    language_id,
    quality_scores,
    token_counts,
)
from networkit_spark.pipeline.similarity import cosine_topk, ivf_topk

__all__ = [
    "exact_duplicates",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "doc_fingerprint",
    "language_id",
    "quality_scores",
    "token_counts",
    "cosine_topk",
    "ivf_topk",
]

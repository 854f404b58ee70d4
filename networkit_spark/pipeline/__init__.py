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
from networkit_spark.pipeline.similarity import (
    cosine_near_dupes,
    cosine_topk,
    hyperplane_lsh_buckets,
    ivf_topk,
    ivf_topk_kmeans,
    ivf_topk_stride,
)

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
    "cosine_near_dupes",
    "hyperplane_lsh_buckets",
    "ivf_topk",
    "ivf_topk_kmeans",
    "ivf_topk_stride",
]

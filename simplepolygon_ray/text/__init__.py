from .dedup import (
    embedding_near_dup_pairs,
    ngram_jaccard_pairs,
    exact_dedup,
    jaccard_ngrams,
    minhash_dedup_pairs,
    minhash_signature,
    simhash64,
    simhash_batch,
)
from .ops import fingerprint_batch, langid_batch, quality_batch, token_count_batch

__all__ = [
    "langid_batch",
    "quality_batch",
    "token_count_batch",
    "fingerprint_batch",
    "minhash_signature",
    "minhash_dedup_pairs",
    "jaccard_ngrams",
    "simhash64",
    "simhash_batch",
    "ngram_jaccard_pairs",
    "exact_dedup",
    "embedding_near_dup_pairs",
]

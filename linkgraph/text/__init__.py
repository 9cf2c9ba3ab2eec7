from .ops import (  # noqa: F401
    TokenStats,
    exact_dedup,
    fingerprint_batch,
    langid_batch,
    minhash_signatures,
    minhash_dup_pairs,
    simhash_batch,
    quality_batch,
    quality_score_batch,
    token_jaccard_pairs,
)

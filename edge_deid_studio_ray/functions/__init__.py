from .textstats import (
    token_count,
    bpe_token_count,
    lang_id,
    quality_counts,
    quality_score,
    fingerprint64,
    simhash64,
    hamming64,
    text_stats_batch,
)
from .dedup import (
    md5_hex,
    exact_dedup,
    minhash_candidates,
    jaccard,
    word_ngram_jaccard,
    MinHasher,
    add_simhash_column,
)
from .simsearch import knn_bruteforce, knn_lsh

__all__ = [
    "token_count", "bpe_token_count", "lang_id", "quality_counts",
    "quality_score", "fingerprint64", "simhash64", "hamming64",
    "text_stats_batch", "md5_hex", "exact_dedup", "minhash_candidates",
    "jaccard", "word_ngram_jaccard", "MinHasher", "add_simhash_column",
    "knn_bruteforce", "knn_lsh",
]

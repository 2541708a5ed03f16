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
from .simsearch import knn_bruteforce, knn_lsh, knn_ivf, embedding_near_dups, embedding_near_dups_lsh
from .sketches import approx_distinct, heavy_hitters, reservoir_sample
from .dedup import simhash_near_dups, connected_components, pair_text_metric
from .corpusops import (
    collect_ngram_set,
    decontaminate,
    duplicate_ngram_spans,
    passage_dedup,
    repetition_stats,
    token_stream_pack,
)

__all__ = [
    "token_count", "bpe_token_count", "lang_id", "quality_counts",
    "quality_score", "fingerprint64", "simhash64", "hamming64",
    "text_stats_batch", "md5_hex", "exact_dedup", "minhash_candidates",
    "jaccard", "word_ngram_jaccard", "MinHasher", "add_simhash_column",
    "knn_bruteforce", "knn_lsh", "knn_ivf", "embedding_near_dups",
    "approx_distinct", "heavy_hitters", "reservoir_sample",
    "simhash_near_dups", "connected_components", "pair_text_metric",
    "embedding_near_dups_lsh",
    "collect_ngram_set", "decontaminate", "duplicate_ngram_spans",
    "passage_dedup", "repetition_stats", "token_stream_pack",
]

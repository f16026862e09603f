"""Text / training-data operators: the LLM-pipeline surface the
engine adds beyond the reference (BASELINE.json north star).

Design rule: per-document computations (tokenizing, shingling,
MinHash, SimHash, quality metrics, fingerprints) are pure array
expressions — zero shuffle, embarrassingly parallel, safe at 100 TB.
Shuffles appear only where semantics demand them: candidate-pair
generation (band-bucket join) and exact-duplicate grouping.
"""

from .analysis import (
    tokenize,
    with_text_stats,
    with_quality_score,
    with_language_id,
    with_fingerprint,
    with_repetition,
    chunk_plan,
    vocab_topk,
    unigram_logprob,
)
from .dedup import (
    shingles,
    exact_duplicate_groups,
    exact_dedup,
    contamination_check,
    ngrams_exact,
    ngram_contamination,
    ngram_jaccard_pairs,
    minhash_signature,
    minhash_lsh_pairs,
    simhash_votes,
    with_simhash,
    simhash_neardup_pairs,
    neardup_components,
    md5_hash60,
)
from .bpe import (
    bpe_train,
    bpe_encode_word,
)
from .filters import (
    redact_pii,
    line_dedup,
    EMAIL_RE,
    PHONE_RE,
    IPV4_RE,
)
from .sampling import (
    hash_bucket,
    hash_sample,
    stratified_take,
    with_split,
    source_mix,
)
from .similarity import (
    cosine_expr,
    brute_force_topk,
    lsh_topk,
    ivf_topk,
    kmeans_lloyd_distributed,
    ivf_topk_fixed,
    ivf_topk_oracle_sql,
    fixed_ivf_centroids,
    ivf_assign_exact,
    lsh_neardup_pairs,
    lsh_neardup_oracle_sql,
    lsh_topk_oracle_sql,
    semantic_dedup_pairs,
    semantic_dedup_oracle_sql,
)

__all__ = [
    "tokenize",
    "with_text_stats",
    "with_quality_score",
    "with_language_id",
    "with_fingerprint",
    "with_repetition",
    "chunk_plan",
    "vocab_topk",
    "unigram_logprob",
    "shingles",
    "exact_duplicate_groups",
    "exact_dedup",
    "contamination_check",
    "ngrams_exact",
    "ngram_contamination",
    "ngram_jaccard_pairs",
    "minhash_signature",
    "minhash_lsh_pairs",
    "simhash_votes",
    "with_simhash",
    "simhash_neardup_pairs",
    "neardup_components",
    "md5_hash60",
    "cosine_expr",
    "brute_force_topk",
    "lsh_topk",
    "ivf_topk",
    "kmeans_lloyd_distributed",
    "ivf_topk_fixed",
    "ivf_topk_oracle_sql",
    "fixed_ivf_centroids",
    "ivf_assign_exact",
    "lsh_neardup_pairs",
    "lsh_neardup_oracle_sql",
    "lsh_topk_oracle_sql",
    "semantic_dedup_pairs",
    "semantic_dedup_oracle_sql",
    "bpe_train",
    "bpe_encode_word",
    "redact_pii",
    "line_dedup",
    "EMAIL_RE",
    "PHONE_RE",
    "IPV4_RE",
    "hash_bucket",
    "hash_sample",
    "stratified_take",
    "with_split",
    "source_mix",
]

"""Large-scale training-data pipeline operators (beyond-parity surface).

The reference engine stops at relational CDC; a 100 TB training-data
pipeline also needs dedup, similarity search, text analysis, and
multimodal plumbing. Everything here is expressed as native DataFrame
ops (JVM-side, shuffle-aware) unless a vectorized pandas UDF is
genuinely required; each operator documents its scale path.
"""

from dozer_spark.ops.text import (
    bigram_logprob,
    winnow_fingerprint_score,
    tokens,
    token_count,
    quality_score,
    lang_id,
    fingerprint,
    eval_ngram_overlap,
    pii_counts,
    redact_pii,
    gopher_quality,
    top_ngrams,
    remove_duplicated_spans,
    unigram_logprob,
    window_duplication_score,
)
from dozer_spark.ops.packing import token_shard_assignment
from dozer_spark.ops.sampling import (
    dsir_gumbel_topk,
    dsir_log_weights,
    hash_sample,
    stratified_hash_sample,
    quota_sample,
    train_test_split,
    temperature_sample,
)
from dozer_spark.ops.media_codecs import probe_bytes
from dozer_spark.ops.multimodal import (
    extract_features,
    frame_sample,
    probe_metadata,
    extract_audio_features,
)
from dozer_spark.ops.dedup import (
    exact_dedup,
    dedup_clusters,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    simhash_pairs,
    ngram_jaccard_pairs,
    embedding_neardup_pairs,
    embedding_neardup_pairs_lsh,
    drop_duplicated_segments,
)
from dozer_spark.ops.similarity import cosine_sim, brute_force_topk, lsh_ann_topk, ivf_ann_topk
from dozer_spark.ops.bloom import BloomFilter
from dozer_spark.ops.search import StreamingBm25Index, bm25_topn
from dozer_spark.ops.semdedup import cluster_balanced_sample, semantic_dedup
from dozer_spark.ops.semdedup_frozen import (
    cluster_balanced_sample_frozen,
    semantic_dedup_frozen,
)
from dozer_spark.ops.similarity import (
    ivf_ann_topk_frozen,
    ivf_pq_ann_topk,
    ivf_pq_ann_topk_frozen,
    unit_vector,
)
from dozer_spark.ops.packing import length_bucketed_batches
from dozer_spark.ops.sampling import (
    domain_mixture_weights,
    hash_split,
    leakage_safe_split,
)

__all__ = [
    "tokens",
    "token_count",
    "quality_score",
    "lang_id",
    "fingerprint",
    "exact_dedup",
    "dedup_clusters",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    "embedding_neardup_pairs_lsh",
    "cosine_sim",
    "brute_force_topk",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "eval_ngram_overlap",
    "hash_sample",
    "stratified_hash_sample",
    "quota_sample",
    "train_test_split",
    "pii_counts",
    "redact_pii",
    "probe_bytes",
    "probe_metadata",
    "extract_features",
    "frame_sample",
    "token_shard_assignment",
    "temperature_sample",
    "gopher_quality",
    "top_ngrams",
    "drop_duplicated_segments",
    "extract_audio_features",
    "remove_duplicated_spans",
    "unigram_logprob",
    "bigram_logprob",
    "winnow_fingerprint_score",
    "window_duplication_score",
    "BloomFilter",
    "dsir_log_weights",
    "ivf_pq_ann_topk",
    "bm25_topn",
    "StreamingBm25Index",
    "dsir_gumbel_topk",
    "cluster_balanced_sample",
    "semantic_dedup",
    "semantic_dedup_frozen",
    "cluster_balanced_sample_frozen",
    "ivf_ann_topk_frozen",
    "ivf_pq_ann_topk_frozen",
    "unit_vector",
    "length_bucketed_batches",
    "domain_mixture_weights",
    "hash_split",
    "leakage_safe_split",
]

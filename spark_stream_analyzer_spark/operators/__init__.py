"""Public operator API — batch/streaming-agnostic DataFrame transforms.

Reference-core (SURVEY §2): event normalization + keyed player stats.
EXT (north star): as-of join, text analysis, dedup family, similarity
search, multimodal plumbing.
"""

from spark_stream_analyzer_spark.operators.asof import asof_join_backward
from spark_stream_analyzer_spark.operators.dedup import (
    contamination_check,
    duplicate_clusters,
    embedding_near_dup_pairs,
    exact_dedup,
    lsh_duplicate_pairs,
    lsh_hot_band_stats,
    lsh_pairs_against_index,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_pairs,
    write_signature_index,
)
from spark_stream_analyzer_spark.operators.events import union_streams
from spark_stream_analyzer_spark.operators.fuzzy import fuzzy_pairs
from spark_stream_analyzer_spark.operators.multimodal import (
    fake_decode_stats,
    fake_features,
    fake_frame_sample,
    fake_resize,
    with_payload,
)
from spark_stream_analyzer_spark.operators.player_stats import player_stats
from spark_stream_analyzer_spark.operators.rank import global_rank
from spark_stream_analyzer_spark.operators.similarity import (
    ann_topk_against_index,
    cosine_topk,
    ivf_topk,
    kmeans_assign,
    label_centroids,
    lsh_multiprobe_topk,
    lsh_topk,
    quantize_int8,
    write_ann_index,
)
from spark_stream_analyzer_spark.operators.split import (
    chunk_windows_udtf,
    hash_rank_sample_k,
    hash_split,
    mixture_sample,
    packed_sequences,
    stratified_hash_sample,
    token_pack_shards,
)
from spark_stream_analyzer_spark.operators.text import (
    fingerprints,
    language_id,
    redact,
    term_stats,
    tfidf_top_terms,
    token_stats,
    with_words,
)

__all__ = [
    "ann_topk_against_index",
    "asof_join_backward",
    "contamination_check",
    "cosine_topk",
    "duplicate_clusters",
    "embedding_near_dup_pairs",
    "chunk_windows_udtf",
    "exact_dedup",
    "fake_decode_stats",
    "fake_features",
    "fake_frame_sample",
    "fake_resize",
    "fingerprints",
    "fuzzy_pairs",
    "global_rank",
    "hash_rank_sample_k",
    "hash_split",
    "ivf_topk",
    "kmeans_assign",
    "label_centroids",
    "language_id",
    "lsh_duplicate_pairs",
    "lsh_hot_band_stats",
    "lsh_pairs_against_index",
    "lsh_multiprobe_topk",
    "lsh_topk",
    "minhash_signatures",
    "mixture_sample",
    "ngram_jaccard_pairs",
    "packed_sequences",
    "player_stats",
    "quantize_int8",
    "redact",
    "simhash_fingerprints",
    "simhash_pairs",
    "stratified_hash_sample",
    "term_stats",
    "tfidf_top_terms",
    "token_pack_shards",
    "token_stats",
    "union_streams",
    "with_payload",
    "with_words",
    "write_ann_index",
    "write_signature_index",
]

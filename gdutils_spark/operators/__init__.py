"""Operator library: calendar pivots, summaries, joins, dedup, similarity,
text analysis, multimodal plumbing."""

from gdutils_spark.operators.calendar import (
    calendar,
    calendar_dense,
    calendar_long,
    month_spine,
)
from gdutils_spark.operators.summaries import (
    daily_stats,
    deployment_days,
    entity_summaries,
)
from gdutils_spark.operators.joins import (
    asof_join,
    interval_join,
    orphans,
    semi_by_ids,
    with_orphan_flag,
)
from gdutils_spark.operators.dedup import (
    benchmark_contamination,
    connected_components,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from gdutils_spark.operators.similarity import (
    embedding_near_dup_pairs,
    ivf_assign,
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
    lsh_buckets,
    lsh_near_dup_pairs,
)
from gdutils_spark.operators.sessions import session_stats, sessionize
from gdutils_spark.operators.sampling import (
    pack_sequences,
    pack_stats,
    stratified_sample,
)
from gdutils_spark.operators.multimodal import (
    decode_audio_features,
    decode_image_features,
    parse_image_dims,
    parse_wav_meta,
    sample_frames,
)

__all__ = [
    "calendar",
    "calendar_dense",
    "calendar_long",
    "month_spine",
    "daily_stats",
    "deployment_days",
    "entity_summaries",
    "asof_join",
    "interval_join",
    "orphans",
    "semi_by_ids",
    "with_orphan_flag",
    "benchmark_contamination",
    "connected_components",
    "exact_duplicates",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_pairs",
    "embedding_near_dup_pairs",
    "ivf_assign",
    "knn_bruteforce",
    "knn_ivf",
    "knn_lsh",
    "lsh_buckets",
    "lsh_near_dup_pairs",
    "session_stats",
    "sessionize",
    "pack_sequences",
    "pack_stats",
    "stratified_sample",
    "decode_audio_features",
    "decode_image_features",
    "parse_image_dims",
    "parse_wav_meta",
    "sample_frames",
]

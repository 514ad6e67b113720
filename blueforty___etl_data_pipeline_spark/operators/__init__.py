"""Relational + pipeline operators (SURVEY.md §2.2-§2.9 and the
north-star extensions).

Each operator is a function ``DataFrame -> DataFrame`` (or a small builder)
so pipelines are plain compositions — the engine's answer to the
reference's linear script of SQL statements.
"""

from .aggregate import grouped_sum_round, preagg_join
from .analytics import (
    cohort_retention,
    funnel_counts,
    ranked,
    running_sum,
    sessionize,
    with_lag_lead,
)
from .constraints import constraint_violations
from .dedup import (
    dedup_exact,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    minhash_signatures_arrow,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_dup_pairs,
)
from .graph import (
    connected_components,
    dedup_near_duplicates,
    pagerank_fixed_point,
)
from .joins import (
    broadcast_cross_join,
    composite_key_join,
    null_safe_join,
    using_join,
)
from .multimodal import binarize, extract_features, frame_sample_stub
from .presentation import ordered, top_n
from .sampling import hash_sample, hash_split, quota_cap, stratified_sample
from .corpus import (
    build_vocab,
    chunk_documents,
    contamination_hits,
    decontaminate,
    repetition_signals,
    tfidf_top_terms,
    top_ngrams,
)
from .profile import (
    grouped_median_exact,
    grouped_quantiles_disc,
    histogram_fixed_width,
    iqr_outliers,
    profile_table,
    zscore_normalize,
)
from .similarity import (
    ann_brute_force,
    ann_ivf,
    ann_lsh_bucketed,
    embedding_near_dup_pairs,
    kmeans_lloyd,
    score_batch_numpy,
)
from .skew import key_histogram, salted_join
from .temporal import asof_join, range_join, resample_ffill, scd2_history
from .text_ops import (
    assign_packs,
    fingerprints,
    language_id,
    quality_filter,
    text_quality,
    token_counts,
    word_stats,
)
from .topk import argmin_agg, top1_per_group, topk_per_group

__all__ = [
    "grouped_sum_round",
    "preagg_join",
    "with_lag_lead",
    "running_sum",
    "ranked",
    "sessionize",
    "funnel_counts",
    "cohort_retention",
    "constraint_violations",
    "hash_sample",
    "hash_split",
    "quota_cap",
    "stratified_sample",
    "using_join",
    "composite_key_join",
    "broadcast_cross_join",
    "null_safe_join",
    "connected_components",
    "dedup_near_duplicates",
    "pagerank_fixed_point",
    "asof_join",
    "range_join",
    "resample_ffill",
    "scd2_history",
    "salted_join",
    "key_histogram",
    "top1_per_group",
    "topk_per_group",
    "argmin_agg",
    "ordered",
    "top_n",
    "dedup_exact",
    "exact_dup_groups",
    "minhash_signatures",
    "minhash_signatures_arrow",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash64",
    "simhash_near_dup_pairs",
    "ann_brute_force",
    "ann_lsh_bucketed",
    "ann_ivf",
    "embedding_near_dup_pairs",
    "kmeans_lloyd",
    "score_batch_numpy",
    "binarize",
    "extract_features",
    "frame_sample_stub",
    "text_quality",
    "token_counts",
    "language_id",
    "fingerprints",
    "quality_filter",
    "assign_packs",
    "word_stats",
    "histogram_fixed_width",
    "grouped_median_exact",
    "grouped_quantiles_disc",
    "iqr_outliers",
    "profile_table",
    "zscore_normalize",
    "build_vocab",
    "chunk_documents",
    "contamination_hits",
    "decontaminate",
    "repetition_signals",
    "top_ngrams",
    "tfidf_top_terms",
]

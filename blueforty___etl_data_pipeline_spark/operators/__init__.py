"""Relational + pipeline operators (SURVEY.md §2.2-§2.9 and the
north-star extensions).

Each operator is a function ``DataFrame -> DataFrame`` (or a small builder)
so pipelines are plain compositions — the engine's answer to the
reference's linear script of SQL statements.
"""

from .aggregate import grouped_sum_round, preagg_join
from .dedup import (
    dedup_exact,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from .joins import broadcast_cross_join, composite_key_join, using_join
from .similarity import ann_brute_force, ann_lsh_bucketed
from .topk import top1_per_group, topk_per_group

__all__ = [
    "grouped_sum_round",
    "preagg_join",
    "using_join",
    "composite_key_join",
    "broadcast_cross_join",
    "top1_per_group",
    "topk_per_group",
    "dedup_exact",
    "exact_dup_groups",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash64",
    "ann_brute_force",
    "ann_lsh_bucketed",
]

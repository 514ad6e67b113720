"""Ranking operators (SURVEY.md §2.5, W1).

The reference's one window construct: ``ROW_NUMBER() OVER (PARTITION BY
zip_code ORDER BY dist_km)`` + ``WHERE rn = 1`` (BlueForty.py:444-447) —
per-group argmin.  Generalized here to top-k.

Scale note: a window over PARTITION BY key is one shuffle on the key and a
per-group sort.  For top-1 on massive groups a ``groupBy(key).agg(min_by)``
is cheaper (partial aggregation, no full sort); both shapes provided.
Always pass deterministic tie-breakers in ``order_by`` — row_number over a
non-total order is nondeterministic under parallel execution.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int = 1,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """row_number-based top-k per group (W1 generalized)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)


def top1_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Exact reference shape: rank-1 row per group (BlueForty.py:444-447)."""
    return topk_per_group(df, partition_by, order_by, k=1)


def argmin_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: Column,
    payload: Column,
    alias: str,
) -> DataFrame:
    """Shuffle-light top-1: ``min_by(payload, order_col)`` per key.

    Equivalent to top1_per_group when ``order_col`` is duplicate-free
    (make it a struct with tie-breaker fields otherwise); preferred at
    scale because partial aggregation collapses each map partition to one
    candidate per key before the shuffle.
    """
    return df.groupBy(*keys).agg(F.min_by(payload, order_col).alias(alias))

"""Aggregation operators (SURVEY.md §2.4).

Spark's hash aggregate does the partial/final (map-side combine) split
automatically — every groupBy here ships only one partially-aggregated
row per (partition, key) into the shuffle, which is what makes these
viable at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_sum_round(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    alias: str,
    scale: int = 2,
) -> DataFrame:
    """PURCHASE_ORDER_TOTALS shape (BlueForty.py:119-126):
    ``ROUND(SUM(value), scale)`` grouped by ``keys``.

    ``value`` should already encode the reference's
    ``COALESCE(x,0)*COALESCE(y,0)`` input expression where needed.
    Note: Snowflake ROUND is half-away-from-zero, Spark's is HALF_UP —
    identical for the non-negative money here (SURVEY.md F9).
    """
    return df.groupBy(*keys).agg(F.round(F.sum(value), scale).alias(alias))


def preagg_join(
    fact: DataFrame,
    agg_keys: Sequence[str],
    agg_exprs: Sequence[Column],
    other: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """CTE-style pre-aggregate-then-join (BlueForty.py:207-215, :222-231).

    Aggregating the fact side BEFORE the join is load-bearing for scale:
    the shuffle carries one row per key instead of every fact row, and
    Catalyst will not push an aggregate through a join on its own
    (SURVEY.md §4).  ``on`` uses Spark's named-column join, which gives
    SQL USING semantics — the key appears once in the output.
    """
    aggregated = fact.groupBy(*agg_keys).agg(*agg_exprs)
    return aggregated.join(other, on=on, how=how)

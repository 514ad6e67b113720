"""Presentation-layer operators (SURVEY.md §2.6, O1).

The reference puts ``ORDER BY`` inside views and final SELECTs
(BlueForty.py:125, :216, :232, :462) purely for human consumption — a
global sort is never load-bearing (Snowflake doesn't even guarantee view
ORDER BY survives).  We expose it as an explicit, last-step operator: a
global ``orderBy`` is a full range-shuffle (sample → range-partition →
sort), so at 100 TB it belongs ONLY at the presentation edge, never
mid-pipeline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def ordered(df: DataFrame, *order_by: Column | str) -> DataFrame:
    """Global ORDER BY (O1).  Range-partitioned total sort; results are
    compared order-insensitively by the oracle, so this is semantics-free
    presentation — provided for API parity with the reference."""
    return df.orderBy(*order_by)


def top_n(df: DataFrame, n: int, order_by: Sequence[Column | str]) -> DataFrame:
    """ORDER BY … LIMIT n.  Spark plans this as TakeOrderedAndProject —
    each partition keeps its local top-n, the driver merges — so it is
    scale-safe unlike a full sort."""
    return df.orderBy(*order_by).limit(n)

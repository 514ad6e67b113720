"""Analytic window functions beyond the reference's single ROW_NUMBER
(SURVEY.md §2.5 — the reference needs only W1; a general engine needs
lag/lead, ranks, and running aggregates).

Scale note: every window here is one shuffle on its partition keys plus
a per-group sort.  Running frames are declared ROWS-based explicitly —
Spark's default frame with an ORDER BY is RANGE, which groups peer rows
and differs from ROWS when the sort key has ties.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _w(partition_by: Sequence[str], order_by: Sequence[Column | str]):
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def with_lag_lead(
    df: DataFrame,
    col: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    lag_alias: str = "prev",
    lead_alias: str = "next",
) -> DataFrame:
    """Previous/next value of ``col`` per key in event order (null at the
    partition edges).  Pass a total order — lag over ties is
    nondeterministic under parallel execution."""
    w = _w(partition_by, order_by)
    return df.select(
        "*",
        F.lag(col).over(w).alias(lag_alias),
        F.lead(col).over(w).alias(lead_alias),
    )


def running_sum(
    df: DataFrame,
    value: Column,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    alias: str = "running_sum",
) -> DataFrame:
    """Cumulative sum per key in event order, ROWS-framed (each row sees
    exactly the rows before it, regardless of sort-key ties)."""
    w = _w(partition_by, order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.select("*", F.sum(value).over(w).alias(alias))


def ranked(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    alias: str = "rank",
    dense: bool = False,
) -> DataFrame:
    """RANK / DENSE_RANK per key (gaps vs no gaps after ties)."""
    w = _w(partition_by, order_by)
    fn = F.dense_rank() if dense else F.rank()
    return df.select("*", fn.over(w).cast("int").alias(alias))

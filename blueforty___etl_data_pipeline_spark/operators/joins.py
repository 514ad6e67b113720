"""Join operators (SURVEY.md §2.3).

Physical strategy notes (the part that matters at 100 TB):

- ``using_join`` / ``composite_key_join``: plain shuffle-hash/sort-merge
  equi-joins; AQE picks broadcast automatically when a side is small.  For
  repeated joins on the same key, bucket both tables on the key at write
  time to eliminate the shuffle entirely.
- ``broadcast_cross_join``: the reference's nearest-station cartesian
  product (BlueForty.py:442) MUST broadcast the small side so the product
  runs as a map-side BroadcastNestedLoopJoin; a shuffle cartesian at scale
  is a job-killer.  For large "small" sides, upgrade to the grid-bucketed
  join in geo_knn (plans/pipelines.py) — same results, equi-join shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def using_join(
    left: DataFrame,
    right: DataFrame,
    using: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """SQL ``USING(col)`` join (BlueForty.py:214-215, :230-231): join key
    named once in the output, coalesced across sides — exactly Spark's
    ``on=<names>`` semantics."""
    on = [using] if isinstance(using, str) else list(using)
    return left.join(right, on=on, how=how)


def composite_key_join(
    left: DataFrame,
    right: DataFrame,
    conditions: Sequence[tuple[str, str]],
    how: str = "inner",
) -> DataFrame:
    """Multi-condition equi-join, e.g. the final weather enrichment
    ``C.ZIP_CODE = B.postal AND C.DATE = A.ORDERDATE``
    (BlueForty.py:473-474).  All conjuncts are equalities, so Catalyst
    still plans a hash join on the composite key."""
    cond: Column | None = None
    for lcol, rcol in conditions:
        c = left[lcol] == right[rcol]
        cond = c if cond is None else (cond & c)
    return left.join(right, on=cond, how=how)


def broadcast_cross_join(big: DataFrame, small: DataFrame) -> DataFrame:
    """Cartesian product with the small side broadcast
    (BlueForty.py:442's predicate-less JOIN).  ``F.broadcast`` forces
    BroadcastNestedLoopJoin — each executor scans its slice of ``big``
    against an in-memory copy of ``small``; no shuffle of ``big``."""
    return big.crossJoin(F.broadcast(small))


def null_safe_join(
    left: DataFrame,
    right: DataFrame,
    pairs: Sequence[tuple[str, str]],
    how: str = "inner",
) -> DataFrame:
    """Null-safe equi-join (``<=>`` / ``IS NOT DISTINCT FROM``): NULL
    keys match NULL keys instead of vanishing — the semantics dirty-key
    reconciliation needs when "unknown" is itself a join bucket.

    Physical note: Spark plans ``eqNullSafe`` as a normal hash
    equi-join (NULL hashes to a bucket like any value), so the join
    stays a SortMergeJoin/BroadcastHashJoin — no nested-loop downgrade.
    All NULLs land in ONE bucket, so a null-heavy side is a skew key by
    construction: pre-filter or salt the null bucket if it dominates.
    """
    cond = None
    for lc, rc in pairs:
        clause = left[lc].eqNullSafe(right[rc])
        cond = clause if cond is None else (cond & clause)
    return left.join(right, on=cond, how=how)

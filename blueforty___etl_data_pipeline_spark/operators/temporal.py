"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are implemented as compositions of existing DataFrame ops (no UDFs,
no custom Catalyst rules), in the shapes that survive 100 TB:

- ``asof_join``: union-and-window.  Tag both sides, union, sort per key
  by event time, and carry the last-seen right-side row forward with
  ``last(ignorenulls)``.  ONE shuffle on the key (the window), zero
  per-row lookups — the classic distributed as-of shape.  A naive
  implementation (per-left-row max-ts subquery) is a quadratic
  correlated join.
- ``range_join``: time-bucket blocking.  With a window of width W, a
  right row can only match left rows in its own or the next W-bucket,
  so exploding the left side to its two candidate buckets turns the
  interval predicate into an EQUI-join plus a residual filter — the
  same blocking idea as the geo grid join (plans/pipelines.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts_col: str = "ts",
    right_cols: Sequence[str] = (),
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the most recent
    right row with ``right.ts <= left.ts`` per ``by`` key (ties at equal
    timestamps match).  Output: every left column, plus
    ``asof_ts_us`` (matched right timestamp as unix micros, null when
    none) and each requested ``right_cols`` value as ``asof_<name>``.

    ``tolerance_us`` nulls matches older than the tolerance (the pandas
    ``merge_asof`` contract).
    """
    keys = list(by)
    lcols = [c for c in left.columns]
    rtypes = dict(right.dtypes)
    rrow_type = (
        "struct<_rts: bigint"
        + "".join(f", {c}: {rtypes[c]}" for c in right_cols)
        + ">"
    )
    l_part = left.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
        F.lit(None).cast(rrow_type).alias("_rrow"),
    )
    r_part = right.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_part.schema["_lrow"].dataType.simpleString()).alias(
            "_lrow"
        ),
        F.struct(
            F.unix_micros(F.col(ts_col)).alias("_rts"),
            *[F.col(c) for c in right_cols],
        ).alias("_rrow"),
    )
    combined = l_part.unionByName(r_part)
    # Right rows sort BEFORE left rows at equal ts (_is_left ascending),
    # so an equal-timestamp right row is visible to the left row.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = combined.select(
        "*", F.last("_rrow", ignorenulls=True).over(w).alias("_match")
    ).filter(F.col("_is_left") == 1)
    match_col: Column = F.col("_match")
    if tolerance_us is not None:
        in_tol = F.col("_match._rts") >= (
            F.unix_micros(F.col("_ts")) - F.lit(tolerance_us)
        )
        match_col = F.when(in_tol, match_col)
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in lcols]
    out_cols.append(match_col["_rts"].alias("asof_ts_us"))
    out_cols.extend(match_col[c].alias(f"asof_{c}") for c in right_cols)
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts_col: str = "ts",
    lower_us: int = -600_000_000,
    upper_us: int = 0,
) -> DataFrame:
    """Interval join (inner): pair each left row with every right row
    whose timestamp lies in ``[left.ts + lower_us, left.ts + upper_us]``
    per ``by`` key.  Right non-key columns come back prefixed ``r_``,
    plus the matched timestamp as ``r_ts_us``.  For left semantics
    (zeros for unmatched rows), aggregate the pairs and left-join the
    result back onto ``left`` — cheaper than dragging null rows through
    the blocking join.

    Blocking: bucket width W = upper-lower; a matching right row can
    only sit in the left row's base bucket or the next one, so exploding
    the left side to those two buckets turns the interval predicate into
    an EQUI-join on (key, bucket) plus a residual BETWEEN filter — never
    a per-key cross product.  Same idea as the geo grid join.
    """
    keys = list(by)
    width = upper_us - lower_us
    if width <= 0:
        raise ValueError("upper_us must exceed lower_us")
    l_us = F.unix_micros(F.col(ts_col))
    base_bucket = F.floor((l_us + F.lit(lower_us)) / F.lit(width))
    l_exp = left.select(
        "*",
        l_us.alias("_lus"),
        F.explode(F.array(base_bucket, base_bucket + 1)).alias("_lbucket"),
    )
    r_us = F.unix_micros(F.col(ts_col))
    r_pref = right.select(
        *[F.col(k).alias(f"_rk_{k}") for k in keys],
        F.floor(r_us / F.lit(width)).alias("_bucket"),
        r_us.alias("r_ts_us"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in keys and c != ts_col
        ],
    )
    cond = F.col("_lbucket") == F.col("_bucket")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_rk_{k}"))
    cond = cond & F.col("r_ts_us").between(
        F.col("_lus") + F.lit(lower_us), F.col("_lus") + F.lit(upper_us)
    )
    joined = l_exp.join(r_pref, on=cond, how="inner")
    return joined.drop("_lus", "_lbucket", "_bucket", *[f"_rk_{k}" for k in keys])

"""Stream–stream and stream–static joins with bounded state.

The reference's joins are all batch equi-joins (SURVEY.md §2.3); on an
unbounded stream the same logical join needs explicit state bounds or
it accumulates both inputs forever.  Two Spark-native shapes:

- :func:`stream_stream_join` — inner equi-join of two streams with
  watermarks on BOTH sides plus an event-time range predicate.  Spark
  keeps each side's rows in the state store only until the watermark
  passes the end of the time range, so state is O(rate × window), not
  O(stream).  This is the canonical "match click to impression within
  N minutes" pipeline.
- :func:`stream_static_join` — enrichment join of a stream against a
  batch dimension table; the static side is re-read per micro-batch
  (broadcast when small) and needs no state at all.

Both return plain DataFrames usable under ``readStream`` (tests drive
them with ``trigger(availableNow=True)``) AND under batch ``read`` —
the transformation is source-agnostic, the streaming semantics come
from the inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
    max_lag: str = "INTERVAL 30 MINUTES",
    suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` where the right event arrives within
    ``(left_ts, left_ts + max_lag]`` — watermarked on both sides so the
    state store can evict rows once they can no longer match.

    Right-side columns are suffixed to avoid collisions.  The time
    bound is REQUIRED for streaming state cleanup: without it Spark
    must keep every row forever (it cannot know a future match is
    impossible).

    ``how="leftOuter"`` emits each unmatched left row (right columns
    null) once the watermark passes ``left_ts + max_lag`` — i.e. once
    a future match is provably impossible.  Left rows whose
    no-match-possible point the final watermark never crosses stay in
    state unemitted; on a bounded availableNow drain the emitted
    outer set is therefore exactly ``{unmatched left | left_ts +
    max_lag < min(max left_ts, max right_ts) - delay}`` — the batch
    twin every outer fixture pins against its oracle.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    rw = rw.select(
        F.col(key).alias(f"{key}{suffix}"),
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in rw.columns
            if c != key
        ],
    )
    cond = (
        (F.col(key) == F.col(f"{key}{suffix}"))
        & (F.col(f"{right_ts}{suffix}") > F.col(left_ts))
        & (
            F.col(f"{right_ts}{suffix}")
            <= F.col(left_ts) + F.expr(max_lag)
        )
    )
    return lw.join(rw, on=cond, how=how)


def stream_static_join(
    stream: DataFrame,
    static: DataFrame,
    on: str,
    broadcast_static: bool = True,
) -> DataFrame:
    """Enrich a stream with a batch dimension table (stateless: the
    static side is (re)read per micro-batch; broadcast keeps the join
    map-side for dimension-sized tables)."""
    s = F.broadcast(static) if broadcast_static else static
    return stream.join(s, on=on, how="left")

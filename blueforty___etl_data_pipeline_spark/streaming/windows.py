"""Event-time window aggregations over the ``events`` table.

The reference has no streaming surface (SURVEY.md §2.10) — these are the
capability extension for the events fixture, written batch-first so the
SAME transformation function runs under both ``spark.read`` and
``spark.readStream`` (the DataFrame API is identical; only source/sink
differ).  ``stream_from_parquet`` + watermark demonstrates the streaming
entry; tests drive it with ``trigger(availableNow=True)`` into a memory
sink.

Scale notes: windowed aggregation shuffles on (window, keys); watermarks
bound state so a 100 TB/day stream holds only the open windows.  Session
windows use Spark's native ``session_window`` (state-store-backed when
streaming).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Fixed, non-overlapping event-time windows."""
    aggs = list(aggs) if aggs else [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    ]
    w = F.window(F.col(ts_col), window_duration)
    return (
        df.groupBy(w.alias("win"), *keys)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "*",
        )
        .drop("win")
    )


def sliding_window_agg(
    df: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("n_events")]
    w = F.window(F.col(ts_col), window_duration, slide)
    return (
        df.groupBy(w.alias("win"), *keys)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "*",
        )
        .drop("win")
    )


def session_window_agg(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    keys: Sequence[str] = ("user_id",),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Gap-based sessions per key: a session extends while consecutive
    events arrive within ``gap``."""
    aggs = list(aggs) if aggs else [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    ]
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(w.alias("sess"), *keys)
        .agg(*aggs)
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "*",
        )
        .drop("sess")
    )


def stream_from_parquet(
    spark: SparkSession,
    path: str,
    schema,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Structured Streaming source over a parquet directory with an
    event-time watermark — late rows beyond ``watermark`` are dropped and
    window state is garbage-collected past it."""
    return (
        spark.readStream.schema(schema)
        .parquet(path)
        .withWatermark(ts_col, watermark)
    )

"""Event-time windowing, batch-first with Structured-Streaming-ready
shapes (SURVEY.md §2.10 extension)."""

from .stateful import (
    running_user_stats,
    streaming_dedup,
    streaming_windowed_counts,
)
from .windows import (
    session_window_agg,
    sliding_window_agg,
    stream_from_parquet,
    tumbling_window_agg,
)

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "stream_from_parquet",
    "streaming_dedup",
    "running_user_stats",
    "streaming_windowed_counts",
]

from .ops import (
    run_stream_to_df,
    sessionize_stream,
    stream_sessionize,
    stream_windowed_counts,
)

__all__ = [
    "stream_windowed_counts",
    "stream_sessionize",
    "sessionize_stream",
    "run_stream_to_df",
]

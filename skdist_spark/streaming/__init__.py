from .ops import run_stream_to_df, stream_sessionize, stream_windowed_counts

__all__ = ["stream_windowed_counts", "stream_sessionize", "run_stream_to_df"]

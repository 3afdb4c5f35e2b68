"""Structured Streaming extensions (SURVEY §7 P6)."""

from vector_search_test_spark.streaming.ingest import (
    stream_assign_cells,
    stream_event_window_counts,
)

__all__ = ["stream_assign_cells", "stream_event_window_counts"]

"""Structured Streaming extensions (SURVEY §7 P6)."""

from vector_search_test_spark.streaming.ingest import (
    stream_assign_cells,
    stream_event_window_counts,
)
from vector_search_test_spark.streaming.stateful import (
    sessionize_stateful,
    stream_sessionize,
)

__all__ = [
    "sessionize_stateful",
    "stream_assign_cells",
    "stream_event_window_counts",
    "stream_sessionize",
]

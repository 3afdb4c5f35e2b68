"""Sources & sinks (SURVEY §2.1)."""

from vector_search_test_spark.sources.text import (
    read_sentences_csv,
    read_text_lines,
    write_clusters_csv,
)

__all__ = ["read_sentences_csv", "read_text_lines", "write_clusters_csv"]

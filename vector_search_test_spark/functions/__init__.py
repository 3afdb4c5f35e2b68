from vector_search_test_spark.functions.vector import (
    cosine_sim,
    dot,
    l2_norm,
    l2_sq,
)
from vector_search_test_spark.functions.chunking import (
    chunk_documents,
    pack_chunks,
    packing_stats,
)
from vector_search_test_spark.functions.hashing import portable_hash48
from vector_search_test_spark.functions.redact import pii_counts, redact_pii
from vector_search_test_spark.functions.textstats import (
    quality_score,
    repetition_ratio,
    unigram_lm_scores,
)

__all__ = [
    "l2_sq",
    "dot",
    "l2_norm",
    "cosine_sim",
    "portable_hash48",
    "chunk_documents",
    "pack_chunks",
    "packing_stats",
    "pii_counts",
    "redact_pii",
    "quality_score",
    "repetition_ratio",
    "unigram_lm_scores",
]

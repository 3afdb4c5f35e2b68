from vector_search_test_spark.functions.vector import (
    cosine_sim,
    dot,
    l2_norm,
    l2_sq,
)
from vector_search_test_spark.functions.hashing import portable_hash48

__all__ = ["l2_sq", "dot", "l2_norm", "cosine_sim", "portable_hash48"]

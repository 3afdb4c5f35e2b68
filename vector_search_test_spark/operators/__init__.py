from vector_search_test_spark.operators.knn import knn_exact, topk_global

__all__ = ["knn_exact", "topk_global"]

from vector_search_test_spark.operators.cluster import (
    connected_components,
    semantic_dedup,
    similarity_clusters,
)
from vector_search_test_spark.operators.dedup import (
    dedup_exact,
    jaccard_join,
    neardup_embedding,
    neardup_minhash,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from vector_search_test_spark.operators.ivf import (
    IvfIndex,
    ivf_add,
    ivf_append,
    ivf_build,
    ivf_load,
    ivf_save,
    ivf_save_bucketed,
    ivf_search,
    ivf_search_all,
)
from vector_search_test_spark.operators.knn import (
    filtered_topk,
    knn_exact,
    salted_topk_per_key,
    topk_global,
)
from vector_search_test_spark.operators.sampling import (
    contamination_report,
    hash_sample,
    hash_split,
    mix_corpus,
    stratified_sample,
)
from vector_search_test_spark.operators.pq import (
    ivfpq_adc_topk_all,
    ivfpq_encode,
    pq_adc_topk_all,
    pq_encode,
    pq_rerank,
    train_ivfpq_numpy,
    train_pq_numpy,
)
from vector_search_test_spark.operators.search import (
    build_text_index,
    hybrid_search_rrf,
    search_text,
)
from vector_search_test_spark.operators.timeseries import (
    asof_join,
    interval_join,
    sessionize,
)

__all__ = [
    "IvfIndex",
    "asof_join",
    "build_text_index",
    "connected_components",
    "contamination_report",
    "dedup_exact",
    "filtered_topk",
    "hybrid_search_rrf",
    "ivf_add",
    "ivf_append",
    "ivf_build",
    "ivf_load",
    "ivf_save",
    "ivf_save_bucketed",
    "ivf_search",
    "interval_join",
    "ivf_search_all",
    "jaccard_join",
    "hash_sample",
    "hash_split",
    "knn_exact",
    "mix_corpus",
    "ngram_jaccard_pairs",
    "neardup_embedding",
    "neardup_minhash",
    "ivfpq_adc_topk_all",
    "ivfpq_encode",
    "pq_adc_topk_all",
    "pq_encode",
    "train_ivfpq_numpy",
    "pq_rerank",
    "salted_topk_per_key",
    "train_pq_numpy",
    "search_text",
    "semantic_dedup",
    "sessionize",
    "similarity_clusters",
    "simhash_near_pairs",
    "stratified_sample",
    "topk_global",
]

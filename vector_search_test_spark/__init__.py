"""vector_search_test_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of the reference `vector_search_test`
(embed -> IVF index -> ANN top-k -> threshold similarity clustering ->
persist/export), extended with LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Architecture is Spark-first: DataFrame/SQL plans optimized by Catalyst,
vector math as native columnar expressions (whole-stage codegen), IVF cell
pruning as Parquet partition pruning, k-means via MLlib. No RDDs, no
row-at-a-time Python UDFs on hot paths. Implemented surface: see
``operators/`` (knn, ivf, cluster, dedup, search, timeseries),
``functions/`` (vector, hashing, embed, textstats), ``sources/`` (text,
multimodal), ``streaming/`` (ingest, stateful) — each module docstring
states what exists.

Reference behaviors are cited as `app.py:<line>` (the reference's single
file) in docstrings throughout.
"""

from vector_search_test_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"

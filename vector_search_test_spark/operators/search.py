"""Text-query search (SURVEY §2.5 Q1) — the reference's `search` method.

Reference (app.py:58-63): encode the query text with the sentence model,
then delegate to `search_by_vector`. Here: the single query string is
encoded driver-side (O(1) work — exactly where the reference encodes it)
and handed to `ivf_search`; a *corpus* is embedded executor-side via
`embed_text` (mapInPandas over Arrow batches, functions/embed.py).

`build_text_index` is the full text->index path: embed every document,
then IVF build — so Q1 runs end-to-end on text alone, no precomputed
vectors needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_test_spark.functions.embed import (
    DEFAULT_DIM,
    HashingEmbedder,
    embed_text,
)
from vector_search_test_spark.operators.ivf import IvfIndex, ivf_build, ivf_search


def build_text_index(
    docs: DataFrame,
    nlist: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    embedder: HashingEmbedder | None = None,
    seed: int = 42,
) -> IvfIndex:
    """Embed `text_col` (F1) then build the IVF index (I1/I2) —
    the reference's `build_index` (app.py:25-56) as one call."""
    embedded = embed_text(
        docs.select(F.col(id_col).alias("vec_id"), F.col(text_col)),
        text_col=text_col,
        out_col="embedding",
        dim=dim,
        embedder=embedder,
    ).localCheckpoint()  # embed once: both KMeans train and the postings
    # projection consume this, and mapInPandas is the most expensive
    # stage of the text path — never run it twice
    return ivf_build(embedded, nlist=nlist, id_col="vec_id", vec_col="embedding")


def search_text(
    index: IvfIndex,
    query_text: str,
    k: int = 5,
    nprobe: int = 2,
    dim: int = DEFAULT_DIM,
    embedder: HashingEmbedder | None = None,
) -> DataFrame:
    """Q1 — encode the query text, then ANN search (app.py:58-63).

    Raises if the index is empty, mirroring the reference's RuntimeError
    guard at app.py:60-61. Returns (vec_id, dist) ascending.
    """
    if index.nlist == 0:
        raise RuntimeError("Index not built. Call build_index first.")
    emb = embedder or HashingEmbedder(dim)
    qvec = [float(x) for x in emb.encode([query_text])[0]]
    return ivf_search(index, qvec, k=k, nprobe=nprobe)

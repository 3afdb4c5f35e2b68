"""Text embedding (SURVEY §2.3 F1).

The reference encodes with SentenceTransformer('all-MiniLM-L6-v2') in a
manual batch loop (reference app.py:34-43, batch_size=32 at app.py:35).
That model is unavailable here, so the engine keeps F1 as an *interface*:

- `embed_text(df, ...)` applies an embedder over Arrow batches via
  `mapInPandas` — the Spark-idiomatic replacement for the manual loop
  (Arrow batching is controlled by spark.sql.execution.arrow.maxRecordsPerBatch,
  SURVEY §4 X3). On a cluster, a real model would be loaded once per
  executor (lazy module global), exactly where the hash embedder sits.
- `HashingEmbedder` is the deterministic stand-in: feature-hashing of
  word tokens into `dim` buckets with md5-derived signs, L2-normalized —
  unit-length float32 vectors, mirroring the reference model's
  normalize module (SURVEY §1).

Correctness tests use the precomputed fixtures (embeddings.parquet, 64-dim);
the hash embedder exists so the *text* path (Q1: encode query then search,
app.py:58-63) is runnable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DEFAULT_DIM = 64


class HashingEmbedder:
    """Deterministic feature-hash embedder: tokens -> signed buckets -> unit vector.

    Batch encode is vectorized: md5 runs once per *unique* token in the
    batch (a token cache also persists across batches within an executor),
    then a single numpy scatter-add builds the whole matrix — no per-row
    Python in the Arrow batch loop.
    """

    def __init__(self, dim: int = DEFAULT_DIM):
        self.dim = dim
        self._tok_cache: dict[str, tuple[int, float]] = {}

    def _bucket_sign(self, tok: str) -> tuple[int, float]:
        got = self._tok_cache.get(tok)
        if got is None:
            h = hashlib.md5(tok.encode("utf-8")).digest()
            got = (
                int.from_bytes(h[:4], "big") % self.dim,
                1.0 if h[4] % 2 == 0 else -1.0,
            )
            self._tok_cache[tok] = got
        return got

    def encode_one(self, text: str) -> np.ndarray:
        return self.encode([text])[0]

    def encode(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        doc_idx: list[int] = []
        buckets: list[int] = []
        signs: list[float] = []
        for i, t in enumerate(texts):
            for tok in t.lower().split():
                b, s = self._bucket_sign(tok)
                doc_idx.append(i)
                buckets.append(b)
                signs.append(s)
        mat = np.zeros((len(texts), self.dim), dtype=np.float64)
        if doc_idx:
            np.add.at(
                mat,
                (np.asarray(doc_idx), np.asarray(buckets)),
                np.asarray(signs),
            )
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        np.divide(mat, norms, out=mat, where=norms > 0)
        return mat.astype(np.float32)


def embed_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    embedder: HashingEmbedder | None = None,
) -> DataFrame:
    """Append `out_col: array<float>` computed from `text_col` via mapInPandas.

    Replaces the reference's driver-side batch loop (app.py:34-43) with
    executor-parallel Arrow batches; schema is declared so downstream plans
    stay fully typed.
    """
    emb = embedder or HashingEmbedder(dim)
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = emb.encode(pdf[text_col].astype(str).tolist())
            pdf = pdf.copy()
            pdf[out_col] = [row for row in mat]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)

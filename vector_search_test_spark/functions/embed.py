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
    """Deterministic feature-hash embedder: tokens -> signed buckets -> unit vector."""

    def __init__(self, dim: int = DEFAULT_DIM):
        self.dim = dim

    def encode_one(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, dtype=np.float64)
        for tok in text.lower().split():
            h = hashlib.md5(tok.encode("utf-8")).digest()
            bucket = int.from_bytes(h[:4], "big") % self.dim
            sign = 1.0 if h[4] % 2 == 0 else -1.0
            v[bucket] += sign
        n = np.linalg.norm(v)
        if n > 0:
            v /= n
        return v.astype(np.float32)

    def encode(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        return np.vstack([self.encode_one(t) for t in texts])


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

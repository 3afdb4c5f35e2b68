"""Document chunking for training-data preparation (extension — no
reference counterpart): split each document's token sequence into
fixed-budget chunks with overlap, the step between corpus curation and
tokenization/packing.

Scan-only by construction: token split, window starts, slice+join, and
posexplode are all projections/generators — no shuffle at any corpus
size, and each input row expands independently (embarrassingly
parallel). The DuckDB twin reproduces chunk boundaries and text
byte-for-byte (whitespace tokens only — a real BPE tokenizer would slot
in behind the same (doc_id, chunk_id, chunk_text) contract as a Pandas
UDF, like the embedding seam in functions/embed.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    size: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per chunk: (id, chunk_id, chunk_text, n_tokens).

    Chunks cover `size` whitespace tokens and start every
    `size - overlap` tokens, so consecutive chunks share `overlap`
    tokens; the trailing partial chunk is kept (n_tokens <= size; a
    document shorter than `size` yields exactly one chunk). chunk_id is
    0-based in document order — deterministic, so chunk identity is
    stable across runs and engines."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # last start: the largest step-multiple offset still inside the doc;
    # empty/whitespace docs still produce start=1 (their single chunk)
    last_start = (F.greatest(n - 1, F.lit(0)) / step).cast("int") * step + 1
    starts = F.sequence(F.lit(1), last_start, F.lit(step))
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(toks, s, size), " ")
    )
    out = docs.select(
        F.col(id_col).alias("id"), F.posexplode(chunks).alias("chunk_id", "chunk_text")
    )
    return out.withColumn(
        "n_tokens", F.size(F.split(F.col("chunk_text"), " "))
    )


def chunk_documents_sql(
    size: int = 128,
    overlap: int = 16,
    docs_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of `chunk_documents`: (id, chunk_id, chunk_text,
    n_tokens), same boundaries and bytes (DuckDB list slicing is
    inclusive, so the slice end is start + size - 1)."""
    step = size - overlap
    toks = f"string_split({text_col}, ' ')"
    return f"""
        WITH starts AS (
            SELECT {id_col} AS id, {toks} AS toks,
                   UNNEST(range(1, greatest(len({toks}) - 1, 0) // {step} * {step} + 2, {step})) AS s
            FROM {docs_table}
        )
        SELECT id,
               CAST((s - 1) / {step} AS BIGINT) AS chunk_id,
               array_to_string(toks[s:s + {size - 1}], ' ') AS chunk_text,
               len(toks[s:s + {size - 1}]) AS n_tokens
        FROM starts
    """

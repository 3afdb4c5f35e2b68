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
from pyspark.sql import types as T


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


def greedy_pack(sizes: list[int], budget: int) -> list[int]:
    """Reference greedy first-fit-in-order packing: item i goes to the
    current pack unless it would overflow `budget`, else opens the next
    pack. Returns the pack id per item. Any item larger than `budget`
    gets a pack of its own. Python twin used by both the operator (per
    bucket) and the tests."""
    packs = []
    pack, fill = 0, 0
    for s in sizes:
        s = int(s)
        if fill > 0 and fill + s > budget:
            pack += 1
            fill = 0
        packs.append(pack)
        fill += s
    return packs


def pack_chunks(
    chunks: DataFrame,
    budget: int = 2048,
    n_buckets: int = 64,
    id_col: str = "id",
    order_col: str = "chunk_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Assign every chunk to a training pack of at most `budget` tokens
    (greedy first-fit in deterministic (id, chunk_id) order), returning
    the input plus (bucket, pack_id). Pack identity is (bucket, pack_id).

    Scale shape: a single global greedy scan is inherently sequential,
    so the corpus is hash-bucketed into `n_buckets` INDEPENDENT streams
    (deterministic md5 bucket — engine-portable like the sampling
    module, so the DuckDB twin `pack_chunks_sql` reproduces pack ids
    bit-for-bit) and the greedy fill runs per
    bucket inside applyInPandas — ONE shuffle on `bucket`, per-task
    state bounded by its bucket, no driver involvement. At 100 TB,
    n_buckets scales with the cluster (any value >= total-cores keeps
    every core busy); packing quality is unaffected because greedy
    first-fit's guarantee — consecutive packs sum past the budget, so
    mean fill exceeds budget/2 — holds within every bucket
    independently. Documents never straddle buckets (bucketing is by
    document id), so a pack only mixes whole documents' chunk runs."""
    out_schema = T.StructType(
        chunks.schema.fields
        + [
            T.StructField("bucket", T.IntegerType(), False),
            T.StructField("pack_id", T.LongType(), False),
        ]
    )
    in_cols = [f.name for f in chunks.schema.fields]

    def fill(pdf):
        pdf = pdf.sort_values([id_col, order_col]).reset_index(drop=True)
        pdf["pack_id"] = greedy_pack(pdf[token_col].tolist(), budget)
        return pdf[in_cols + ["bucket", "pack_id"]]

    with_bucket = chunks.withColumn(
        "bucket", _pack_bucket(id_col, n_buckets)
    )
    return with_bucket.groupBy("bucket").applyInPandas(fill, out_schema)


def _pack_bucket(id_col: str, n_buckets: int):
    """Engine-portable bucket id: first 8 md5 hex digits of
    'id:packbucket' as uint32, mod n_buckets (same scheme as
    operators/sampling.py::hash_fraction; < 2^32 so pmod == %)."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":packbucket")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(n_buckets)
    ).cast("int")


def pack_chunks_sql(
    chunks_sql: str,
    budget: int = 2048,
    n_buckets: int = 64,
    id_col: str = "id",
    order_col: str = "chunk_id",
    token_col: str = "n_tokens",
) -> str:
    """DuckDB twin of `pack_chunks` over a chunk subquery (e.g. the
    output of `chunk_documents_sql`), yielding (id, chunk_id, n_tokens,
    bucket, pack_id). The greedy first-fit recurrence is inherently
    sequential per bucket, so the twin is a recursive CTE advancing one
    row per bucket per step (rows within a step run set-at-a-time, so
    depth = max rows in any bucket — fine at oracle scale). The
    condition drops greedy_pack's `fill > 0` guard because every chunk
    has n_tokens >= 1, so fill is always positive after the first row."""
    bucket = (
        f"CAST(CAST(('0x' || substring(md5(CAST({id_col} AS VARCHAR) || ':packbucket'), 1, 8)) "
        f"AS UBIGINT) % {n_buckets} AS INT)"
    )
    return f"""
WITH RECURSIVE chunk_rows AS ({chunks_sql}),
ordered AS (
  SELECT {id_col} AS id, {order_col} AS chunk_id, {token_col} AS n_tokens,
         {bucket} AS bucket,
         row_number() OVER (
           PARTITION BY {bucket} ORDER BY {id_col}, {order_col}
         ) AS rn
  FROM chunk_rows
),
packs AS (
  SELECT bucket, rn, id, chunk_id, n_tokens,
         CAST(0 AS BIGINT) AS pack_id, n_tokens AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.bucket, o.rn, o.id, o.chunk_id, o.n_tokens,
         CASE WHEN p.fill + o.n_tokens > {budget}
              THEN p.pack_id + 1 ELSE p.pack_id END,
         CASE WHEN p.fill + o.n_tokens > {budget}
              THEN o.n_tokens ELSE p.fill + o.n_tokens END
  FROM packs p JOIN ordered o ON o.bucket = p.bucket AND o.rn = p.rn + 1
)
SELECT id, chunk_id, n_tokens, bucket, pack_id FROM packs
"""


def packing_stats(packed: DataFrame, budget: int, token_col: str = "n_tokens") -> DataFrame:
    """Per-(bucket, pack) fill and waste plus a corpus utilization row is
    one groupBy away; kept as a helper so callers audit packing quality
    without re-deriving the aggregation."""
    return (
        packed.groupBy("bucket", "pack_id")
        .agg(F.sum(token_col).alias("fill"), F.count("*").alias("n_chunks"))
        .withColumn("waste", F.lit(budget) - F.col("fill"))
    )

"""Exact (brute-force) k-nearest-neighbor operators.

These are the correctness oracle for the IVF path (SURVEY §5.2) and the
baseline for similarity search. The reference's exact equivalent is
`index.search` with nprobe = nlist (reference app.py:65-75).

Scale notes (100 TB design):
- `topk_global` (one query, N corpus): the query is a literal folded into
  the projection — a single map-only scan, then Catalyst's
  TakeOrderedAndProject merges per-partition top-k heaps on the driver.
  No shuffle at all.
- `knn_exact` (Q queries, N corpus): broadcast the query side (queries are
  small by construction; if not, use the IVF path), BroadcastNestedLoopJoin
  so every corpus partition scores all queries map-side, then a per-query
  window top-k. Spark 3.5+ inserts WindowGroupLimit, which cuts each
  partition to k rows per query BEFORE the shuffle — the shuffle moves
  O(Q * k * partitions) rows, not O(Q * N).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_search_test_spark.functions.vector import (
    UNROLL_MAX_TERMS,
    cosine_sim,
    l2_sq,
    l2_sq_const,
    l2_sq_unrolled,
)

_METRICS = {"l2_sq": l2_sq, "cosine": cosine_sim}


def _distance(metric: str, a, b) -> tuple[Column, bool]:
    """Returns (distance column, ascending?)."""
    if metric == "l2_sq":
        return l2_sq(a, b), True
    if metric == "cosine":
        # similarity: higher is closer
        return cosine_sim(a, b), False
    raise ValueError(f"unknown metric {metric!r}; expected one of {sorted(_METRICS)}")


def topk_global(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "l2_sq",
) -> DataFrame:
    """Top-k rows of `corpus` nearest to a single literal query vector.

    Mirrors reference search_by_vector (app.py:65-75) with nprobe=nlist.
    Returns (id_col, dist) with deterministic tie-break on id_col.
    """
    if metric == "l2_sq" and len(query_vec) <= UNROLL_MAX_TERMS:
        # unrolled-to-literals form: pure whole-stage codegen (see vector.py)
        dist, asc = l2_sq_const(F.col(vec_col), list(query_vec)), True
    else:
        # wide vectors: the HOF fold (the unrolled method would blow the
        # JIT budget / plan-conversion stack — vector.py UNROLL_MAX_TERMS)
        qlit = F.array(*[F.lit(float(x)).cast("float") for x in query_vec])
        dist, asc = _distance(metric, qlit, F.col(vec_col))
    scored = corpus.select(F.col(id_col), dist.alias("dist"))
    order = [F.col("dist").asc() if asc else F.col("dist").desc(), F.col(id_col).asc()]
    return scored.orderBy(*order).limit(k)


def salted_topk_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column],
    k: int,
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant per-key top-k: two-phase salted windows.

    A plain `Window.partitionBy(key)` sends EVERY row of a hot key to one
    task; WindowGroupLimit softens but cannot split the final per-key
    sort. Phase 1 partitions by (key, salt) — `salt` tasks share each hot
    key — and keeps a local top-k; phase 2 runs the exact window over the
    <= salt*k survivors per key. Result is identical to the unsalted
    window (each key's true top-k survives its salt bucket's local top-k;
    order_cols must totally order rows for determinism).

    The salt is a deterministic row hash, NOT spark_partition_id():
    partition ids change when a map task is recomputed after a fetch
    failure, which could land rows in different salt buckets across
    attempts and drop/duplicate rows from the phase-1 local top-k.
    """
    salted = df.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt)).cast("int"),
    )
    w1 = Window.partitionBy(*key_cols, "__salt").orderBy(*order_cols)
    local = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        local.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def knn_exact(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "l2_sq",
    broadcast: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors in `corpus` for every row of `queries`.

    Reference: batched self-kNN `index.search(self.embeddings, k)` at
    app.py:85, made exact (nprobe = nlist). Output: (query_id, vec_id,
    dist), ≤ k rows per query, deterministic tie-break on vec_id.

    `broadcast=True` assumes the query side fits in executor memory
    (spark.sql.autoBroadcastJoinThreshold does not apply to an explicit
    hint — an oversized query set will OOM). For a large query set pass
    broadcast=False (plain cross join, shuffled) or use the IVF path
    (operators/ivf.py), which prunes by cell instead of scoring all pairs.

    Pass `dim` (the embedding width) to score with the unrolled codegen
    expression instead of the interpreted HOF — same doubles, ~8x faster
    on bulk joins while dim <= UNROLL_MAX_TERMS (vector.py note); wider
    vectors automatically keep the HOF form (the unrolled method would
    run un-JITed, slower than the fold, and past ~384 terms the plan
    build itself overflows the stack).
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qv")
    )
    if metric == "l2_sq" and dim is not None and dim <= UNROLL_MAX_TERMS:
        dist, asc = l2_sq_unrolled(F.col("__qv"), F.col(vec_col), dim), True
    else:
        dist, asc = _distance(metric, F.col("__qv"), F.col(vec_col))
    scored = corpus.join(F.broadcast(q) if broadcast else q).select(
        "query_id", F.col(id_col).alias("vec_id"), dist.alias("dist")
    )
    order = [F.col("dist").asc() if asc else F.col("dist").desc(), F.col("vec_id").asc()]
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )

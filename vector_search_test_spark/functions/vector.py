"""Vector math as native columnar expressions (SURVEY §2.3 F2).

The reference computes squared L2 inside faiss's C++ kernels
(METRIC_L2 chosen at reference app.py:47-48; faiss METRIC_L2 returns
*squared* Euclidean — SURVEY §2.9 Q2). Here each distance is a Catalyst
`aggregate(zip_with(...))` expression: it runs inside whole-stage codegen
on the JVM, vectorizes over Parquet column batches, and never crosses into
Python. No sqrt is taken for l2_sq so distances and θ-filters match the
reference's semantics bit-for-bit.

Precision contract (shared with the DuckDB oracle): elements are stored
float32, every arithmetic step is performed in float64 after casting each
element, and the fold is a sequential left-to-right sum — the same order
DuckDB's list_sum uses — so Spark and the oracle produce identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def l2_sq(a: Column | str, b: Column | str) -> Column:
    """Squared Euclidean distance between two array<float> columns.

    Reference: faiss METRIC_L2 (app.py:47-48, app.py:70).
    """
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    diffsq = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffsq, F.lit(0.0), lambda acc, v: acc + v)


def dot(a: Column | str, b: Column | str) -> Column:
    """Inner product of two array<float> columns (double math)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array<float> column (double math)."""
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity = dot(a,b) / (|a| * |b|)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))

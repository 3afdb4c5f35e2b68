"""Wide-dimension (dim > UNROLL_MAX_TERMS) fallback paths, end-to-end
with value equality against driver numpy (VERDICT r3 #6).

The unroll-gate policy (functions/vector.py::UNROLL_MAX_TERMS = 96) is
measured and documented, but only dim-64 corpora run in anger elsewhere.
These tests push dim 128 and 384 through every wide-dim code path:

- knn_exact with dim=None / dim > cap -> the HOF fold,
- topk_global with a wide literal query -> the HOF-over-literal form,
- knn_exact_arrow -> the mapInPandas scale path,

and require BIT-identical doubles to the reference computation: per-pair,
per-dimension left-to-right float64 accumulation over float32 inputs —
the shared precision contract all three implementations document.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_test_spark.functions.vector import UNROLL_MAX_TERMS
from vector_search_test_spark.operators.knn import (
    knn_exact,
    knn_exact_arrow,
    topk_global,
)

N_CORPUS = 200
N_QUERIES = 5
K = 7


def _corpus(dim: int, n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, dim)).astype(np.float32)


def _ref_topk(qmat: np.ndarray, X: np.ndarray, k: int):
    """(query, vec_id, dist) triples via the documented summation order:
    float32 inputs widened to float64, one addend per dimension,
    left-to-right. Ties broken on vec_id ascending."""
    out = {}
    for qi in range(qmat.shape[0]):
        acc = np.zeros(X.shape[0], dtype=np.float64)
        for d in range(qmat.shape[1]):
            t = np.float64(qmat[qi, d]) - X[:, d].astype(np.float64)
            acc = acc + t * t
        order = np.lexsort((np.arange(X.shape[0]), acc))[:k]
        out[qi] = [(int(v), float(acc[v])) for v in order]
    return out


def _frames(spark, X: np.ndarray, nq: int):
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(X.shape[0])],
        "vec_id long, embedding array<float>",
    ).repartition(8)
    queries = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(nq)],
        "query_id long, query_vec array<float>",
    )
    return corpus, queries


@pytest.mark.parametrize("dim", [128, 384])
def test_knn_exact_arrow_wide_dim_bit_exact(spark, dim):
    assert dim > UNROLL_MAX_TERMS
    X = _corpus(dim, N_CORPUS, seed=dim)
    corpus, queries = _frames(spark, X, N_QUERIES)
    expected = _ref_topk(X[:N_QUERIES].copy(), X, K)

    got = knn_exact_arrow(queries, corpus, k=K).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.dist, r.vec_id)):
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.dist))
    assert set(by_q) == set(expected)
    for qi, exp in expected.items():
        assert [v for v, _ in by_q[qi]] == [v for v, _ in exp]
        for (_, got_d), (_, exp_d) in zip(by_q[qi], exp):
            # bit-exact: same float64, not approximately equal
            assert got_d == exp_d, (qi, got_d, exp_d)


def test_knn_exact_hof_wide_dim_matches_arrow(spark):
    """The JVM HOF fold (dim=None) and the Arrow path must agree exactly
    at a width where the unrolled form is gated off."""
    dim = 128
    X = _corpus(dim, 120, seed=7)
    corpus, queries = _frames(spark, X, 3)
    a = {
        (r.query_id, r.vec_id): r.dist
        for r in knn_exact(queries, corpus, k=K, dim=None).collect()
    }
    b = {
        (r.query_id, r.vec_id): r.dist
        for r in knn_exact_arrow(queries, corpus, k=K).collect()
    }
    assert a == b


def test_topk_global_wide_literal_query(spark):
    """One wide literal query through topk_global takes the
    HOF-over-literal branch (len > UNROLL_MAX_TERMS); values bit-equal
    to the numpy reference."""
    dim = 128
    X = _corpus(dim, 150, seed=11)
    corpus, _ = _frames(spark, X, 1)
    expected = _ref_topk(X[:1].copy(), X, K)[0]
    got = topk_global(corpus, [float(x) for x in X[0]], k=K).collect()
    assert [(r.vec_id, r.dist) for r in got] == expected


def test_knn_exact_arrow_plan_is_arrow_not_per_row(spark):
    """Plan pin for the scale claim: the wide-dim path runs ONE
    Arrow-batched MapInPandas (vectorized numpy) and a WindowGroupLimit
    merge — never a row-at-a-time BatchEvalPython UDF."""
    dim = 384
    X = _corpus(dim, 64, seed=3)
    corpus, queries = _frames(spark, X, 4)
    plan = (
        knn_exact_arrow(queries, corpus, k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    assert "WindowGroupLimit" in plan

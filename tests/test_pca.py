"""PCA projection tests (operators/pca.py)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table, spread
from vector_search_test_spark.operators.pca import (
    pca_project,
    pca_project_py,
    pca_project_sql,
    train_pca_numpy,
)


def _planted(n=40, dim=6, seed=7):
    """Data living in a 2-D subspace of R^dim plus tiny noise."""
    rng = np.random.default_rng(seed)
    basis = rng.normal(size=(2, dim))
    coef = rng.normal(size=(n, 2)) * [5.0, 2.0]
    return coef @ basis + rng.normal(size=(n, dim)) * 1e-3


def test_train_orthonormal_and_deterministic():
    X = _planted()
    mean, W = train_pca_numpy(X, 3)
    W = np.array(W)
    assert np.allclose(W.T @ W, np.eye(3), atol=1e-5)
    mean2, W2 = train_pca_numpy(X, 3)
    assert mean == mean2 and np.array_equal(W, np.array(W2))
    with pytest.raises(ValueError):
        train_pca_numpy(X, 0)


def test_planted_subspace_distances_preserved():
    """out_dim=2 on rank-2 data: pairwise distances survive projection
    (PCA is the distance-optimal linear map onto the data plane)."""
    X = _planted()
    mean, W = train_pca_numpy(X, 2)
    Y = np.array([pca_project_py(x, mean, W) for x in X])
    d_orig = ((X[0] - X[1:]) ** 2).sum(axis=1)
    d_proj = ((Y[0] - Y[1:]) ** 2).sum(axis=1)
    assert np.allclose(d_orig, d_proj, rtol=1e-3, atol=1e-3)


def test_spark_projection_matches_python_twin(spark, sf_dir):
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    pdf = emb.orderBy("vec_id").limit(30).toPandas()
    X = np.array(pdf["embedding"].tolist(), dtype=np.float32).astype(
        np.float64
    )
    mean, W = train_pca_numpy(X, 4)
    got = {
        r.vec_id: r.proj
        for r in pca_project(emb, mean, W).filter(F.col("vec_id") < 30).collect()
    }
    for vid, vec in zip(pdf["vec_id"], pdf["embedding"]):
        want = pca_project_py(
            [float(np.float32(v)) for v in vec], mean, W
        )
        assert got[int(vid)] == want, vid  # bit-identical, not approx


def test_sql_twin_matches_python_twin():
    import duckdb

    X = _planted(n=10, dim=4)
    mean, W = train_pca_numpy(X, 2)
    x32 = [float(np.float32(v)) for v in X[0]]
    exprs = pca_project_sql(f"[{', '.join(repr(v) for v in x32)}]", mean, W)
    got = duckdb.connect().execute(
        f"SELECT {exprs[0]}, {exprs[1]}"
    ).fetchone()
    assert list(got) == pca_project_py(x32, mean, W)


def test_pca_ivf_composition_recall(spark):
    """The PCA->IVF entry approximates exact kNN IN ITS OWN reduced
    space well (that is the IVF approximation; the projection loss vs
    full space is a property of the data, and the synthetic 64-dim
    fixture is NOT low-rank — full-space recall is only sanity-checked
    above random)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from vector_search_test_spark.operators.knn import knn_exact
    from vector_search_test_spark.operators.pca import pca_project

    sf = "/root/testdata/sf0.001"
    got = entrymod._q_pca_ivf_topk(spark, sf).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(by_q) == set(range(10)) and all(
        len(v) == entrymod._PP_K for v in by_q.values()
    )
    emb = spread(load_table(spark, sf, "embeddings")).select(
        "vec_id", "embedding"
    )
    mean, W = entrymod._pca_artifacts(sf)
    proj = pca_project(emb, mean, W).select(
        "vec_id", F.col("proj").alias("embedding")
    )
    qp = proj.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    red_exact = {}
    for r in knn_exact(qp, proj, k=entrymod._PP_K).collect():
        red_exact.setdefault(r.query_id, set()).add(r.vec_id)
    red_hits = sum(len(by_q[i] & red_exact[i]) for i in range(10))
    assert red_hits >= 0.6 * 10 * entrymod._PP_K  # IVF nprobe=2/8 floor
    # full-space sanity: far above the ~0.5-hit random baseline
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    full_exact = {}
    for r in knn_exact(q, emb, k=entrymod._PP_K).collect():
        full_exact.setdefault(r.query_id, set()).add(r.vec_id)
    assert sum(len(by_q[i] & full_exact[i]) for i in range(10)) >= 5

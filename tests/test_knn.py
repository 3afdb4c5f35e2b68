import numpy as np
from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.knn import knn_exact, topk_global


def _numpy_knn(emb: np.ndarray, ids: np.ndarray, q: np.ndarray, k: int):
    d = ((emb - q) ** 2).sum(axis=1)
    order = np.lexsort((ids, d))[:k]
    return [(int(ids[i]), float(d[i])) for i in order]


def test_topk_global_matches_numpy(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings")
    rows = df.collect()
    ids = np.array([r.vec_id for r in rows])
    emb = np.array([r.embedding for r in rows], dtype=np.float64)
    q = emb[0]
    want = _numpy_knn(emb, ids, q, 5)
    got = [(r.vec_id, r.dist) for r in topk_global(df, list(q), k=5).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-9


def test_knn_exact_matches_numpy(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings")
    rows = df.collect()
    ids = np.array([r.vec_id for r in rows])
    emb = np.array([r.embedding for r in rows], dtype=np.float64)
    queries = (
        df.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    got = knn_exact(queries, df, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.dist))
    for qid in range(5):
        want = _numpy_knn(emb, ids, emb[list(ids).index(qid)], 3)
        assert [g[0] for g in by_q[qid]] == [w[0] for w in want]
        # self is always the nearest neighbor at distance 0
        assert by_q[qid][0][0] == qid and abs(by_q[qid][0][1]) < 1e-12


def test_knn_returns_min_k_candidates(spark, sf_dir):
    # k > ntotal: faiss pads with -1 and the reference drops them
    # (app.py:72-73); we return min(k, n) rows (SURVEY §2.9 Q5).
    df = load_table(spark, sf_dir, "embeddings").limit(3)
    queries = df.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).limit(1)
    got = knn_exact(queries, df, k=10).collect()
    assert len(got) == 3


def test_salted_topk_equals_plain_window(spark):
    """Two-phase salted top-k == unsalted window, on a skewed key
    distribution (one key holds 90% of rows) at several salt widths."""
    import random

    from pyspark.sql import Window

    from vector_search_test_spark.operators.knn import salted_topk_per_key

    rng = random.Random(7)
    rows = [("hot" if i % 10 else f"k{i % 7}", i, rng.random()) for i in range(2000)]
    df = spark.createDataFrame(rows, "key string, id long, v double")
    order = [F.desc("v"), F.asc("id")]
    w = Window.partitionBy("key").orderBy(*order)
    want = sorted(
        (r.key, r.id)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 4)
        .collect()
    )
    for salt in (1, 4, 32):
        got = sorted(
            (r.key, r.id)
            for r in salted_topk_per_key(
                df, key_cols=["key"], order_cols=order, k=4, salt=salt
            ).collect()
        )
        assert got == want


def test_knn_exact_unbroadcast_matches_broadcast(spark, sf_dir):
    """The broadcast=False escape hatch (for oversized query sets) must
    produce identical results to the broadcast path."""
    from vector_search_test_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(
        (r.query_id, r.vec_id, round(r.dist, 9))
        for r in knn_exact(queries, emb, k=3, broadcast=True).collect()
    )
    b = sorted(
        (r.query_id, r.vec_id, round(r.dist, 9))
        for r in knn_exact(queries, emb, k=3, broadcast=False).collect()
    )
    assert a == b and len(a) == 15


def test_knn_exact_arrow_bit_identical(spark, sf_dir):
    """The Arrow scorer must reproduce knn_exact bit-for-bit (same
    per-dimension left-to-right float64 summation as the l2_sq fold)."""
    from vector_search_test_spark.operators.knn import knn_exact_arrow

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(
        (r.query_id, r.vec_id, r.dist)
        for r in knn_exact(queries, emb, k=4, dim=64).collect()
    )
    b = sorted(
        (r.query_id, r.vec_id, r.dist)
        for r in knn_exact_arrow(queries, emb, k=4).collect()
    )
    assert a == b  # exact doubles, not approx


def test_knn_exact_arrow_wide_dim(spark):
    """Past UNROLL_MAX_TERMS the JVM paths degrade to the HOF fold; the
    Arrow scorer is the intended wide-dim path and must agree with it."""
    from vector_search_test_spark.operators.knn import knn_exact_arrow

    dim, n = 256, 60
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.pmod(F.hash(F.col("id") * i), F.lit(1000)) / 1000.0).cast(
                "float"
            ),
        ).alias("embedding"),
    ).localCheckpoint()
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(
        (r.query_id, r.vec_id, r.dist)
        for r in knn_exact(queries, corpus, k=3, dim=dim).collect()  # HOF fallback
    )
    b = sorted(
        (r.query_id, r.vec_id, r.dist)
        for r in knn_exact_arrow(queries, corpus, k=3).collect()
    )
    assert a == b


def test_search_text_unbuilt_index_guard():
    """Reference RuntimeError guard (app.py:60-61) on an empty index."""
    import pytest

    from vector_search_test_spark.operators.ivf import IvfIndex
    from vector_search_test_spark.operators.search import search_text

    with pytest.raises(RuntimeError, match="Index not built"):
        search_text(IvfIndex(centroids=[], postings=None), "hello")


def test_range_search_contains_knn_and_thresholds(spark, sf_dir):
    """range_search at radius r returns EXACTLY the pairs under r: it
    contains every kNN hit whose dist <= r and nothing above r; a huge
    radius degenerates to the full corpus per query."""
    from vector_search_test_spark.io import load_table, spread
    from vector_search_test_spark.operators.knn import knn_exact, range_search

    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    r = 1.6
    hits = range_search(q, emb, radius=r)
    rows = hits.collect()
    assert rows and all(row.dist <= r for row in rows)
    knn = knn_exact(q, emb, k=5)
    knn_under = {(x.query_id, x.vec_id) for x in knn.collect() if x.dist <= r}
    got = {(x.query_id, x.vec_id) for x in rows}
    assert knn_under <= got
    n = emb.count()
    assert range_search(q, emb, radius=1e9).count() == 3 * n
    # cosine flavor: similarity >= radius
    cos = range_search(q, emb, radius=0.99, metric="cosine")
    assert all(row.dist >= 0.99 for row in cos.collect())


def test_contrastive_examples_contract(spark, sf_dir):
    """1 pos + n_neg negs per anchor; the positive is the true nearest;
    negatives never collide with the excluded top or the anchor; the
    draw is deterministic across calls."""
    from vector_search_test_spark.io import load_table, spread
    from vector_search_test_spark.operators.knn import (
        contrastive_examples,
        knn_exact,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = contrastive_examples(q, emb, n_neg=4, exclude_top=6).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r.query_id, []).append(r)
    assert set(by_anchor) == {0, 1, 2, 3, 4}
    # ground truth: top-7 nearest (k=7 > exclude_top=6 incl. self-skip)
    top = {}
    for r in knn_exact(q, emb, k=7).collect():
        if r.query_id != r.vec_id:
            top.setdefault(r.query_id, []).append(r.vec_id)
    for a, rows in by_anchor.items():
        pos = [r for r in rows if r.role == "pos"]
        negs = sorted(
            (r for r in rows if r.role == "neg"), key=lambda r: r.rank
        )
        assert len(pos) == 1 and len(negs) == 4
        assert pos[0].vec_id == top[a][0]          # hardest positive
        excluded = set(top[a][:6]) | {a}
        assert not excluded & {r.vec_id for r in negs}
        assert [r.rank for r in negs] == [1, 2, 3, 4]
    again = contrastive_examples(q, emb, n_neg=4, exclude_top=6).collect()
    key = lambda rs: sorted((r.query_id, r.vec_id, r.role, r.rank) for r in rs)
    assert key(again) == key(out)

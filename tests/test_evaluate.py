"""Index-evaluation operator tests (operators/evaluate.py)."""

from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table, spread
from vector_search_test_spark.operators.evaluate import (
    ivf_index_stats,
    recall_at_k,
)


def test_recall_planted_cases(spark):
    exact = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5)],
        "query_id long, vec_id long",
    )
    approx = spark.createDataFrame(
        # q0 perfect, q1 half (one wrong id), q2 missing entirely
        [(0, 1), (0, 2), (1, 3), (1, 99)],
        "query_id long, vec_id long",
    )
    got = {r.query_id: r for r in recall_at_k(exact, approx).collect()}
    assert set(got) == {0, 1, 2}  # the silent-miss query still gets a row
    assert (got[0].n_hit, got[0].recall) == (2, 1.0)
    assert (got[1].n_hit, got[1].recall) == (1, 0.5)
    assert (got[2].n_hit, got[2].recall) == (0, 0.0)
    assert all(got[q].n_exact == exact.filter(
        F.col("query_id") == q).count() for q in got)


def test_recall_one_at_full_probe(spark, sf_dir):
    """nprobe = nlist makes IVF exhaustive, so recall must be exactly 1
    for every query — the identity the gauge is calibrated against."""
    from vector_search_test_spark.operators.ivf import ivf_build, ivf_search_all
    from vector_search_test_spark.operators.knn import knn_exact

    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    idx = ivf_build(emb, nlist=4)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = knn_exact(q, emb, k=3)
    approx = ivf_search_all(idx, q, k=3, nprobe=4)
    rows = recall_at_k(exact, approx).collect()
    assert len(rows) == 5
    assert all(r.recall == 1.0 and r.n_hit == r.n_exact for r in rows)


def test_ivf_index_stats_known_postings(spark):
    postings = spark.createDataFrame(
        [(0, i) for i in range(6)] + [(1, 10), (1, 11)] + [(2, 20)],
        "list_id int, vec_id long",
    )
    r = ivf_index_stats(postings).first()
    assert (r.ntotal, r.nlist_used, r.min_list, r.max_list) == (9, 3, 1, 6)
    assert r.avg_list == 3.0
    # imbalance = nlist * sum(n^2) / ntotal^2 = 3 * (36+4+1) / 81
    assert abs(r.imbalance - 3 * 41 / 81) < 1e-6


def test_ivf_index_stats_even_lists_is_one(spark):
    postings = spark.createDataFrame(
        [(l, l * 10 + i) for l in range(4) for i in range(5)],
        "list_id int, vec_id long",
    )
    r = ivf_index_stats(postings).first()
    assert r.imbalance == 1.0 and r.max_list == r.min_list == 5


def test_key_skew_stats_planted(spark):
    from vector_search_test_spark.operators.evaluate import key_skew_stats

    # keys: hot x6, warm x2, a/b/c x1 each -> 5 keys, 11 rows
    rows = [("hot",)] * 6 + [("warm",)] * 2 + [("a",), ("b",), ("c",)]
    df = spark.createDataFrame(rows, "k string")
    got = key_skew_stats(df, "k", top_n=3).collect()
    assert [(r.key, r.n_rows, r.rank) for r in got] == [
        ("hot", 6, 1), ("warm", 2, 2), ("a", 1, 3)  # tie a<b<c
    ]
    hot = got[0]
    assert abs(hot.frac - 6 / 11) < 1e-6
    assert abs(hot.skew - 6 * 5 / 11) < 1e-6  # ~2.7x its fair share
    # even keys -> skew exactly 1 for every key
    even = spark.createDataFrame(
        [(k,) for k in "xyz" for _ in range(4)], "k string"
    )
    assert all(r.skew == 1.0 for r in key_skew_stats(even, "k").collect())


def test_cluster_silhouette_planted_geometry(spark):
    """Two tight planted clusters far apart -> silhouette near 1;
    a centroid-equidistant point scores ~0; inertia is the k-means
    objective restricted to the list."""
    import pytest

    from vector_search_test_spark.operators.evaluate import (
        cluster_silhouette,
    )

    cents = [[0.0, 0.0], [10.0, 0.0]]
    pts = (
        [(i, [0.1 * (i % 2), 0.1]) for i in range(4)]          # near c0
        + [(10 + i, [10.0 + 0.1 * (i % 2), -0.1]) for i in range(4)]  # near c1
        + [(99, [5.0, 0.0])]                                    # equidistant
    )
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    got = {r.list_id: r for r in cluster_silhouette(df, cents).collect()}
    # the equidistant point ties -> first centroid (list 0) by tie-break
    assert got[0].n_vecs == 5 and got[1].n_vecs == 4
    assert got[1].mean_silhouette > 0.99
    # own-cluster inertia: sum of squared dists to the OWN centroid
    exp_inertia1 = sum((0.1) ** 2 + (0.1) ** 2 for _ in range(2)) + sum(
        0.0 + (0.1) ** 2 for _ in range(2)
    )
    assert abs(got[1].inertia - round(exp_inertia1, 6)) < 1e-6
    # equidistant point drags list 0's mean below list 1's
    assert got[0].mean_silhouette < got[1].mean_silhouette
    with pytest.raises(ValueError):
        cluster_silhouette(df, [[0.0, 0.0]])


def test_recall_curve_monotone_and_anchored(spark):
    """Recall cannot decrease as nprobe grows, and nprobe=nlist is 1."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    rows = {
        r.nprobe: r.mean_recall
        for r in entrymod._q_ivf_recall_curve(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {1, 2, 4, 8}
    vals = [rows[n] for n in (1, 2, 4, 8)]
    assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:]))
    assert vals[-1] == 1.0  # exhaustive probe == exact search


def test_recall_curve_degenerate_nlist_clamp(spark, tmp_path):
    """ADVICE r12: with a corpus so small that nlist < max(nprobes)
    (nlist = min(8, n)), ivf_search_curve clamps+dedupes the probe
    values — the entry must map each REQUESTED nprobe through its
    clamped twin instead of left-joining the raw value into a miss
    (which reported recall 0 for the clamped-away values while the
    oracle reported the real clamped recall)."""
    import sys

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    rng = np.random.default_rng(7)
    vecs = [[float(np.float32(x)) for x in rng.normal(size=4)] for _ in range(3)]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    rows = {
        r.nprobe: r.mean_recall
        for r in entrymod._q_ivf_recall_curve(spark, str(tmp_path)).collect()
    }
    # every REQUESTED value reports a row, labeled by the request
    assert set(rows) == {1, 2, 4, 8}
    # nlist = 3 here, so requested 4 and 8 both clamp to an exhaustive
    # probe: real recall 1.0, never the left-join-miss 0.0
    assert rows[4] == 1.0 and rows[8] == 1.0
    assert rows[1] <= rows[2] + 1e-9 <= rows[4] + 2e-9


def test_mrl_curve_anchor_and_planted_prefix(spark):
    """Matryoshka prefix-dim recall curve: the largest cut IS the
    ground truth (recall 1.0 by construction); when all the signal
    lives in the first 8 dims (rest zero), every cut recalls 1.0."""
    import numpy as np

    from vector_search_test_spark.operators.evaluate import mrl_recall_curve

    rng = np.random.default_rng(3)
    n, cuts = 40, (8, 16, 32)
    X = np.zeros((n, 32), dtype=np.float64)
    X[:, :8] = rng.normal(size=(n, 8))  # signal only in the first block
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    rows = {
        r.dim: r.mean_recall
        for r in mrl_recall_curve(q, emb, k=4, cuts=cuts).collect()
    }
    assert set(rows) == set(cuts)
    assert all(v == 1.0 for v in rows.values())


def test_mrl_curve_matches_numpy_twin(spark):
    """Cross-implementation equality on random data: numpy replays the
    SAME segment-grouped distance accumulation (cumulative sum of
    per-segment left-to-right sums), the same (dist, vec_id) tie-break,
    and the same recall arithmetic."""
    import numpy as np

    from vector_search_test_spark.operators.evaluate import mrl_recall_curve

    rng = np.random.default_rng(11)
    n, dim, k, cuts = 60, 16, 5, (4, 8, 16)
    X = rng.normal(size=(n, dim)).astype(np.float32).astype(np.float64)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    q = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = {
        r.dim: r.mean_recall
        for r in mrl_recall_curve(q, emb, k=k, cuts=cuts).collect()
    }

    def topk(qi, cut):
        # segment-grouped accumulation, matching l2_sq_prefix_array
        d = np.zeros(n)
        lo = 0
        for hi in cuts:
            if hi > cut:
                break
            seg = np.zeros(n)
            for j in range(lo, hi):  # left-to-right within the segment
                t = X[qi, j] - X[:, j]
                seg = seg + t * t
            d = d + seg
            lo = hi
        order = sorted(range(n), key=lambda i: (d[i], i))
        return set(order[:k])

    want = {}
    for cut in cuts:
        recs = []
        for qi in range(6):
            exact = topk(qi, cuts[-1])
            recs.append(round(len(topk(qi, cut) & exact) / len(exact), 6))
        want[cut] = round(
            sum(int(round(r * 1e6)) for r in recs) / 1e6 / len(recs), 6
        )
    assert got == want


def test_cluster_top_terms_semantics_and_determinism(spark):
    """Known geometry: two well-separated cells; term ranking is
    document frequency within the cell with (df DESC, term ASC)
    tie-break; repartitioning does not change the result."""
    from vector_search_test_spark.operators.evaluate import (
        cluster_top_terms,
    )

    cents = [[0.0, 0.0], [10.0, 10.0]]
    emb = spark.createDataFrame(
        [(0, [0.1, 0.0]), (1, [0.0, 0.2]), (2, [10.0, 9.9]), (3, [9.8, 10.1])],
        "vec_id long, embedding array<double>",
    )
    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),   # df counts distinct per doc
            (1, "apple cherry"),
            (2, "dog elephant"),
            (3, "dog fox"),
        ],
        "doc_id long, text string",
    )
    out = cluster_top_terms(docs, emb, cents, top_n=2)
    rows = {(r.list_id, r.rank): (r.term, r.df_docs) for r in out.collect()}
    assert rows[(0, 1)] == ("apple", 2)       # in both cell-0 docs
    assert rows[(0, 2)] in {("banana", 1), ("cherry", 1)}
    assert rows[(0, 2)][0] == "banana"        # tie -> term ASC
    assert rows[(1, 1)] == ("dog", 2)
    again = {
        (r.list_id, r.rank): (r.term, r.df_docs)
        for r in cluster_top_terms(
            docs.repartition(5), emb.repartition(3), cents, top_n=2
        ).collect()
    }
    assert again == rows
    import pytest

    with pytest.raises(ValueError):
        cluster_top_terms(docs, emb, cents, top_n=0)


def test_cluster_top_terms_plan_shape(spark, sf_dir):
    """Scale pin: WindowGroupLimit prunes per-list top-n before the
    final shuffle; no cartesian product anywhere."""
    from vector_search_test_spark.io import load_table, spread
    from vector_search_test_spark.operators.evaluate import (
        cluster_top_terms,
    )

    from __spark_entry__ import _partial_probe_centroids

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    plan = (
        cluster_top_terms(docs, emb, _partial_probe_centroids(sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "Cartesian" not in plan


def test_ranked_quality_planted_cases(spark):
    """Hand-computed MRR / NDCG on planted rankings: perfect match,
    reversed-but-complete, first-hit-at-rank-2, and a silent miss."""
    import math

    from vector_search_test_spark.operators.evaluate import (
        dcg_weights,
        ranked_quality_at_k,
    )

    # ground truth: q0/q1/q2 have neighbors (1,2,3); q3 has (7,)
    exact = spark.createDataFrame(
        [(0, 1, 0.1), (0, 2, 0.2), (0, 3, 0.3),
         (1, 1, 0.1), (1, 2, 0.2), (1, 3, 0.3),
         (2, 1, 0.1), (2, 2, 0.2), (2, 3, 0.3),
         (3, 7, 0.5)],
        "query_id long, vec_id long, dist double",
    )
    approx = spark.createDataFrame(
        # q0: perfect order; q1: wrong doc first, truth at ranks 2-3
        # (only 2 of 3 found); q2: nothing relevant; q3: absent
        [(0, 1, 0.1), (0, 2, 0.2), (0, 3, 0.3),
         (1, 99, 0.05), (1, 1, 0.1), (1, 2, 0.2),
         (2, 98, 0.1), (2, 99, 0.2)],
        "query_id long, vec_id long, dist double",
    )
    k = 3
    got = {
        r.query_id: r
        for r in ranked_quality_at_k(exact, approx, k=k).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    w, prefix = dcg_weights(k)
    # q0: everything in place
    assert (got[0].first_hit_rank, got[0].mrr, got[0].ndcg) == (1, 1.0, 1.0)
    # q1: first hit at rank 2; dcg = w[1] + w[2], idcg = prefix[2]
    assert got[1].first_hit_rank == 2 and got[1].mrr == 0.5
    assert got[1].ndcg == round((w[1] + w[2]) / prefix[2], 6)
    # the quantized value tracks the real log2 arithmetic
    real = (1 / math.log2(3) + 1 / math.log2(4)) / (
        1 + 1 / math.log2(3) + 1 / math.log2(4)
    )
    assert abs(got[1].ndcg - real) < 1e-6
    # q2: relevant never surfaced
    assert got[2].first_hit_rank is None
    assert (got[2].mrr, got[2].ndcg) == (0.0, 0.0)
    # q3: approx returned no rows at all — still a row, all-zero
    assert (got[3].mrr, got[3].ndcg) == (0.0, 0.0)
    # q3's idcg truncates at n_exact=1 < k (not penalized for physics):
    # a one-row perfect approx would score ndcg = 1
    perfect = spark.createDataFrame(
        [(3, 7, 0.5)], "query_id long, vec_id long, dist double"
    )
    g3 = {
        r.query_id: r
        for r in ranked_quality_at_k(
            exact.filter("query_id = 3"), perfect, k=k
        ).collect()
    }
    assert (g3[3].mrr, g3[3].ndcg) == (1.0, 1.0)


def test_ranked_quality_rank_derivation_ties(spark):
    """Ranks derive from (dist ASC, vec_id ASC) — the repo-wide
    deterministic tie-break — so equal distances rank by id."""
    from vector_search_test_spark.operators.evaluate import (
        ranked_quality_at_k,
    )

    exact = spark.createDataFrame(
        [(0, 5, 0.0), (0, 6, 0.0)], "query_id long, vec_id long, dist double"
    )
    # tie on dist: id 5 must take rank 1, so first_hit_rank = 1
    approx = spark.createDataFrame(
        [(0, 6, 0.1), (0, 5, 0.1)], "query_id long, vec_id long, dist double"
    )
    r = ranked_quality_at_k(exact, approx, k=2).collect()[0]
    assert r.first_hit_rank == 1 and r.mrr == 1.0 and r.ndcg == 1.0


def test_dcg_weights_contract():
    import math

    import pytest

    from vector_search_test_spark.operators.evaluate import dcg_weights

    w, prefix = dcg_weights(10)
    # strictly decreasing positive weights; prefix strictly increasing
    assert all(a > b > 0 for a, b in zip(w, w[1:]))
    assert prefix == [sum(w[: j + 1]) for j in range(10)]
    # quantization error under 1e-9 relative
    for i, x in enumerate(w):
        assert abs(x - 1e12 / math.log2(i + 2)) <= 1.0
    with pytest.raises(ValueError):
        dcg_weights(0)


def test_quantization_error_report_ladder(spark, sf_dir):
    """The ladder is ordered: float32 is exact; more bytes buys less
    error among the lossy rungs on the fixture; every mse is finite
    and non-negative and n_vecs is the corpus."""
    import pyarrow.parquet as pq_pa
    import numpy as np

    from vector_search_test_spark.io import load_table, spread
    from vector_search_test_spark.operators.evaluate import (
        quantization_error_report,
    )
    from vector_search_test_spark.operators.pca import train_pca_numpy
    from vector_search_test_spark.operators.pq import train_pq_numpy

    tbl = pq_pa.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    pdf = tbl.to_pandas().sort_values("vec_id")
    X = np.array(
        [np.asarray(v, dtype=np.float32) for v in pdf["embedding"]],
        dtype=np.float64,
    )
    books = train_pq_numpy(X, m=8, ksub=16)
    mean, W = train_pca_numpy(X, 8)
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    out = {r.method: r for r in quantization_error_report(
        emb, books, mean, W).collect()}
    assert set(out) == {"float32", "sq8", "pq", "pca"}
    n = emb.count()
    assert all(r.n_vecs == n for r in out.values())
    assert out["float32"].mse == 0.0
    assert all(r.mse >= 0.0 for r in out.values())
    # bytes ladder: float32 256 > sq8 68 > pca 32 > pq 8
    assert (out["float32"].bytes_per_vec, out["sq8"].bytes_per_vec,
            out["pca"].bytes_per_vec, out["pq"].bytes_per_vec) == (
        256, 68, 32, 8)
    # SQ8 keeps every dim at 8 bits: far less error than 8-byte PQ
    assert out["sq8"].mse < out["pq"].mse
    # numpy cross-check of the sq8 rung (decode = codes * scale)
    scale = (np.abs(X).max(axis=1) / 127.0).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        codes = np.where(
            scale[:, None] > 0,
            np.clip(np.round(X / scale[:, None].astype(np.float64)),
                    -127, 127),
            0.0,
        )
    err = ((codes * scale[:, None].astype(np.float64) - X) ** 2).sum(axis=1)
    assert abs(out["sq8"].mse - round(
        float(np.round(err * 1e9).sum()) / 1e9 / n, 6)) < 2e-6

"""Product quantization (operators/pq.py): encode invariants,
cross-engine bit-equality of the full encode+ADC pipeline vs the DuckDB
twin, ADC-vs-exact semantics (reconstruction identity, recall floor,
full-rerank equality with exact kNN), and the scale-critical plan shapes
(scan-only encode, broadcast LUT + WindowGroupLimit search)."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.knn import knn_exact
from vector_search_test_spark.operators.pq import (
    adc_lut,
    pq_adc_oracle_sql,
    pq_adc_topk_all,
    pq_encode,
    pq_rerank,
    train_pq_numpy,
)

M, KSUB, K = 8, 8, 5


def _fixture_matrix(sf_dir):
    import pyarrow.parquet as pq_pa

    pdf = (
        pq_pa.read_table(f"{sf_dir}/embeddings.parquet")
        .to_pandas()
        .sort_values("vec_id")
    )
    X = np.array(
        [np.asarray(v, dtype=np.float32) for v in pdf["embedding"]],
        dtype=np.float64,
    )
    return pdf, X


def _books_and_luts(sf_dir, nq=5):
    pdf, X = _fixture_matrix(sf_dir)
    books = train_pq_numpy(X, m=M, ksub=KSUB)
    luts = [
        (int(qid), adc_lut([float(np.float32(v)) for v in vec], books))
        for qid, vec in zip(pdf["vec_id"][:nq], pdf["embedding"][:nq])
    ]
    return pdf, X, books, luts


def test_train_shapes_and_determinism(sf_dir):
    _, X = _fixture_matrix(sf_dir)
    books = train_pq_numpy(X, m=M, ksub=KSUB)
    assert len(books) == M
    dsub = X.shape[1] // M
    for book in books:
        assert 1 <= len(book) <= KSUB
        assert all(len(c) == dsub for c in book)
    again = train_pq_numpy(X, m=M, ksub=KSUB)
    assert books == again  # seeded: bit-identical retrain
    with pytest.raises(ValueError):
        train_pq_numpy(X, m=7)  # 64 % 7 != 0


def test_encode_invariants_and_reconstruction_identity(spark, sf_dir):
    """m codes per vector, all in range, each code IS the argmin
    centroid (verified against a straightforward python re-encode), and
    the ADC distance equals the exact query-to-reconstruction squared
    L2 computed independently."""
    pdf, X, books, luts = _books_and_luts(sf_dir, nq=3)
    emb = load_table(spark, sf_dir, "embeddings")
    rows = {r.vec_id: list(r.codes) for r in pq_encode(emb, books).collect()}
    assert set(rows) == set(pdf["vec_id"])
    dsub = X.shape[1] // M
    cents = [np.array(b, dtype=np.float64) for b in books]
    for vid, codes in rows.items():
        assert len(codes) == M
        x = X[list(pdf["vec_id"]).index(vid)]
        for j, code in enumerate(codes):
            assert 0 <= code < len(books[j])
            d = ((cents[j] - x[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1)
            assert code == int(np.argmin(d))

    out = pq_adc_topk_all(
        pq_encode(emb, books), luts, k=K
    ).collect()
    lut_by_q = dict(luts)
    for r in out:
        want = sum(
            lut_by_q[r.query_id][j][rows[r.vec_id][j]] for j in range(M)
        )
        assert abs(r.dist - want) < 1e-9


def test_full_pipeline_matches_duckdb_twin(spark, sf_dir):
    _, _, books, luts = _books_and_luts(sf_dir, nq=5)
    emb = load_table(spark, sf_dir, "embeddings")
    got = sorted(
        (r.query_id, r.vec_id, round(r.dist, 6))
        for r in pq_adc_topk_all(pq_encode(emb, books), luts, k=K).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = sorted(
        (int(q), int(v), d)
        for q, v, d in con.execute(
            pq_adc_oracle_sql(books, luts, k=K)
        ).fetchall()
    )
    assert got == want


def test_adc_recall_floor_vs_exact(spark, sf_dir):
    """ADC is approximate — and the fixture's embeddings are isotropic
    random vectors, the hardest case for any quantizer (no cluster
    structure to exploit), so absolute recall is intrinsically low.
    What MUST hold: every query retrieves itself (its reconstruction is
    the closest of all reconstructions), k rows per query, and overlap
    with the exact top-k beats the random-subset baseline K/N. The
    production answer for high recall is pq_rerank (tested below to be
    EXACT given enough candidates), not raw ADC."""
    pdf, X, books, luts = _books_and_luts(sf_dir, nq=5)
    emb = load_table(spark, sf_dir, "embeddings")
    adc = {}
    for r in pq_adc_topk_all(pq_encode(emb, books), luts, k=K).collect():
        adc.setdefault(r.query_id, set()).add(r.vec_id)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {}
    for r in knn_exact(q, emb, k=K).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(adc[qid] & exact[qid]) / K for qid in exact
    ]
    n = emb.count()
    assert min(len(v) for v in adc.values()) == K
    assert all(qid in adc[qid] for qid in exact)  # self always found
    assert sum(recalls) / len(recalls) >= 1.5 * K / n  # beats random


def test_rerank_with_full_candidates_equals_exact(spark, sf_dir):
    """pq_rerank is exact on its candidate set, so reranking R=ntotal
    ADC candidates must reproduce the exact kNN result row-for-row —
    pinning that the refinement stage computes true distances."""
    pdf, X, books, luts = _books_and_luts(sf_dir, nq=3)
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    codes = pq_encode(emb, books)
    topr = pq_adc_topk_all(codes, luts[:3], k=n)
    queries = [
        (int(qid), [float(np.float32(v)) for v in vec])
        for qid, vec in zip(pdf["vec_id"][:3], pdf["embedding"][:3])
    ]
    got = sorted(
        (r.query_id, r.vec_id, round(r.dist, 6))
        for r in pq_rerank(topr, emb, queries, k=K).collect()
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    want = sorted(
        (r.query_id, r.vec_id, round(r.dist, 6))
        for r in knn_exact(q, emb, k=K).collect()
    )
    assert got == want


def test_pq_plan_shapes(spark, sf_dir):
    """Encode: one Arrow python stage, no Exchange (scan-only). Search:
    broadcast LUT join + WindowGroupLimit partial top-k before the
    single shuffle."""
    _, _, books, luts = _books_and_luts(sf_dir, nq=2)
    emb = load_table(spark, sf_dir, "embeddings")
    enc_plan = (
        pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in enc_plan
    assert enc_plan.count("MapInPandas") == 1

    search_plan = (
        pq_adc_topk_all(pq_encode(emb, books), luts, k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in search_plan or "BroadcastHashJoin" in search_plan
    assert "WindowGroupLimit" in search_plan


def test_rerank_pipeline_matches_duckdb_twin(spark, sf_dir):
    """The two-stage (ADC shortlist -> exact refine) pipeline matches
    the DuckDB twin row-for-row at R=10, k=5."""
    from vector_search_test_spark.operators.pq import pq_rerank_oracle_sql

    pdf, X, books, luts = _books_and_luts(sf_dir, nq=3)
    queries = [
        (int(qid), [float(np.float32(v)) for v in vec])
        for qid, vec in zip(pdf["vec_id"][:3], pdf["embedding"][:3])
    ]
    emb = load_table(spark, sf_dir, "embeddings")
    codes = pq_encode(emb, books)
    topr = pq_adc_topk_all(codes, luts[:3], k=10)
    got = sorted(
        (r.query_id, r.vec_id, round(r.dist, 6))
        for r in pq_rerank(topr, emb, queries, k=K).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = sorted(
        (int(q), int(v), d)
        for q, v, d in con.execute(
            pq_rerank_oracle_sql(books, luts[:3], queries, r=10, k=K)
        ).fetchall()
    )
    assert got == want


def test_ivfpq_pipeline_matches_duckdb_twin(spark, sf_dir):
    """Coarse assign -> residual encode -> pruned ADC matches the DuckDB
    twin row-for-row (nlist=4, nprobe=2, the pruned configuration)."""
    from vector_search_test_spark.operators.pq import (
        ivfpq_adc_topk_all,
        ivfpq_encode,
        ivfpq_luts,
        ivfpq_oracle_sql,
        train_ivfpq_numpy,
    )

    pdf, X = _fixture_matrix(sf_dir)
    coarse, books = train_ivfpq_numpy(X, nlist=4, m=M, ksub=KSUB)
    queries = [
        (int(qid), [float(np.float32(v)) for v in vec])
        for qid, vec in zip(pdf["vec_id"][:4], pdf["embedding"][:4])
    ]
    luts = ivfpq_luts(queries, coarse, books, nprobe=2)
    emb = load_table(spark, sf_dir, "embeddings")
    postings = ivfpq_encode(emb, coarse, books)
    got = sorted(
        (r.query_id, r.vec_id, round(r.dist, 6))
        for r in ivfpq_adc_topk_all(postings, luts, k=K).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = sorted(
        (int(q), int(v), d)
        for q, v, d in con.execute(
            ivfpq_oracle_sql(coarse, books, luts, k=K)
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_ivfpq_encode_and_pruning_semantics(spark, sf_dir):
    """Postings cover every vector exactly once with in-range cell/code
    ids; every ADC hit comes from a cell the query actually probed; each
    query gets k rows; and the query's own coarse cell is always probed
    first (rank-1 probe = own assignment), so self is always scanned."""
    from vector_search_test_spark.operators.pq import (
        ivfpq_adc_topk_all,
        ivfpq_encode,
        ivfpq_luts,
        train_ivfpq_numpy,
    )

    pdf, X = _fixture_matrix(sf_dir)
    coarse, books = train_ivfpq_numpy(X, nlist=4, m=M, ksub=KSUB)
    queries = [
        (int(qid), [float(np.float32(v)) for v in vec])
        for qid, vec in zip(pdf["vec_id"][:4], pdf["embedding"][:4])
    ]
    luts = ivfpq_luts(queries, coarse, books, nprobe=2)
    emb = load_table(spark, sf_dir, "embeddings")
    rows = ivfpq_encode(emb, coarse, books).collect()
    assert sorted(r.vec_id for r in rows) == sorted(pdf["vec_id"])
    cell_of = {}
    for r in rows:
        assert 0 <= r.list_id < len(coarse)
        assert len(r.codes) == M
        assert all(0 <= c < len(books[j]) for j, c in enumerate(r.codes))
        cell_of[r.vec_id] = r.list_id

    probed = {}
    for qid, cell, _ in luts:
        probed.setdefault(qid, []).append(cell)
    for qid, _ in queries:
        # rank-1 probe is the query's own assignment cell
        assert probed[qid][0] == cell_of[qid]

    hits = ivfpq_adc_topk_all(
        ivfpq_encode(emb, coarse, books), luts, k=K
    ).collect()
    per_q = {}
    for r in hits:
        per_q.setdefault(r.query_id, []).append(r)
        assert cell_of[r.vec_id] in probed[r.query_id]  # pruning honored
    assert all(len(v) == K for v in per_q.values())
    assert set(per_q) == {qid for qid, _ in queries}


def test_ivfpq_save_load_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    """Persistence: save -> load reproduces the identical search result,
    and the loaded postings scan statically prunes to the probed
    list_id directories (the faiss scan-nprobe-lists replay, now over
    compressed codes)."""
    from vector_search_test_spark.operators.pq import (
        ivfpq_adc_topk_all,
        ivfpq_encode,
        ivfpq_load,
        ivfpq_luts,
        ivfpq_save,
        train_ivfpq_numpy,
    )

    pdf, X = _fixture_matrix(sf_dir)
    coarse, books = train_ivfpq_numpy(X, nlist=4, m=M, ksub=KSUB)
    queries = [
        (int(qid), [float(np.float32(v)) for v in vec])
        for qid, vec in zip(pdf["vec_id"][:3], pdf["embedding"][:3])
    ]
    luts = ivfpq_luts(queries, coarse, books, nprobe=2)
    emb = load_table(spark, sf_dir, "embeddings")
    postings = ivfpq_encode(emb, coarse, books)
    want = sorted(
        (r.query_id, r.vec_id, round(r.dist, 6))
        for r in ivfpq_adc_topk_all(postings, luts, k=K).collect()
    )

    path = str(tmp_path / "ivfpq_idx")
    ivfpq_save(postings, coarse, books, path)
    lp, lc, lb = ivfpq_load(spark, path)
    assert lc == coarse and lb == books  # quantizer round-trips exactly
    out = ivfpq_adc_topk_all(lp, luts, k=K)
    got = sorted(
        (r.query_id, r.vec_id, round(r.dist, 6)) for r in out.collect()
    )
    assert got == want

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan


# ---------------------------------------------------------------------------
# OPQ (Ge et al. CVPR'13): learned rotation before PQ
# ---------------------------------------------------------------------------


def test_opq_trains_no_worse_than_pq_and_recall_holds(spark, sf_dir):
    """The OPQ trainer keeps the best iterate INCLUDING the identity
    rotation (iteration 0 == plain PQ), so its training quantization
    error is <= plain PQ's by construction — asserted exactly. On the
    fixture (isotropic vectors, the no-win case for rotations) ADC
    recall@K must therefore hold at least plain PQ's level."""
    from vector_search_test_spark.operators.pq import (
        opq_encode,
        rotate_queries,
        train_opq_numpy,
    )

    pdf, X = _fixture_matrix(sf_dir)
    books_pq = train_pq_numpy(X, m=M, ksub=KSUB)
    R, books_opq = train_opq_numpy(X, m=M, ksub=KSUB)

    def train_err(Y, books):
        cents = [np.array(b) for b in books]
        dsub = Y.shape[1] // M
        err = 0.0
        for j in range(M):
            sub = Y[:, j * dsub : (j + 1) * dsub]
            d = ((sub[:, None, :] - cents[j][None, :, :]) ** 2).sum(axis=2)
            err += float(d.min(axis=1).sum())
        return err

    e_pq = train_err(X, books_pq)
    e_opq = train_err(X @ np.array(R), books_opq)
    assert e_opq <= e_pq * (1 + 1e-9), (e_opq, e_pq)

    # rotation is orthogonal (float32-rounded): R Rᵀ ≈ I
    Rm = np.array(R)
    assert np.abs(Rm @ Rm.T - np.eye(Rm.shape[0])).max() < 1e-4

    # ADC recall@K vs exact, OPQ >= PQ on the same queries
    nq = 5
    queries = [
        (int(qid), [float(np.float32(v)) for v in vec])
        for qid, vec in zip(
            pdf["vec_id"].tolist()[:nq], pdf["embedding"].tolist()[:nq]
        )
    ]
    emb = load_table(spark, sf_dir, "embeddings")

    def recall(topk_df):
        got = {}
        for r in topk_df.collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        q = emb.filter(F.col("vec_id") < nq).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        exact = {}
        for r in knn_exact(q, emb, k=K).collect():
            exact.setdefault(r.query_id, set()).add(r.vec_id)
        return sum(
            len(got[qid] & exact[qid]) / K for qid in exact
        ) / len(exact)

    luts_pq = [(qid, adc_lut(vec, books_pq)) for qid, vec in queries]
    r_pq = recall(pq_adc_topk_all(pq_encode(emb, books_pq), luts_pq, k=K))
    luts_opq = [
        (qid, adc_lut(rq, books_opq))
        for qid, rq in rotate_queries(queries, R)
    ]
    r_opq = recall(
        pq_adc_topk_all(opq_encode(emb, R, books_opq), luts_opq, k=K)
    )
    assert r_opq >= r_pq - 1e-9, (r_opq, r_pq)


def test_opq_pipeline_matches_duckdb_twin(spark, sf_dir):
    """Cross-engine bit-equality of rotate + encode + ADC: the oracle
    rotates the corpus with the list_sum fold and replays the full
    pipeline (same contract as the plain-PQ twin test)."""
    from vector_search_test_spark.operators.pq import (
        opq_encode,
        rotate_queries,
        rotate_sql,
        train_opq_numpy,
    )

    pdf, X = _fixture_matrix(sf_dir)
    R, books = train_opq_numpy(X, m=M, ksub=KSUB, n_iter=3)
    queries = [
        (int(qid), [float(np.float32(v)) for v in vec])
        for qid, vec in zip(
            pdf["vec_id"].tolist()[:3], pdf["embedding"].tolist()[:3]
        )
    ]
    luts = [
        (qid, adc_lut(rq, books)) for qid, rq in rotate_queries(queries, R)
    ]
    emb = load_table(spark, sf_dir, "embeddings")
    got = sorted(
        (r.query_id, r.vec_id, round(r.dist, 6))
        for r in pq_adc_topk_all(opq_encode(emb, R, books), luts, k=K).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    prelude = (
        f"rot AS MATERIALIZED (SELECT vec_id, "
        f"{rotate_sql('embedding', R)} AS remb FROM embeddings),"
    )
    want = sorted(
        (int(q), int(v), d)
        for q, v, d in con.execute(
            pq_adc_oracle_sql(
                books, luts, k=K, table="rot", vec_expr="remb",
                prelude=prelude,
            )
        ).fetchall()
    )
    assert got == want


def test_lloyd_multi_matches_sequential():
    """The batched multi-subspace Lloyd driver loop (r17) is
    bit-identical to per-subspace _lloyd_numpy calls — on real
    fixture-like data, random data, and a degenerate corpus with fewer
    distinct points than k (which takes the sequential fallback)."""
    import numpy as np

    from vector_search_test_spark.operators.ivf import (
        _lloyd_numpy,
        _lloyd_numpy_multi,
    )

    rng = np.random.default_rng(42)
    cases = [
        ([rng.normal(size=(300, 8)) for _ in range(4)], 16, 15),
        ([rng.normal(size=(50, 4)) for _ in range(2)], 8, 15),
        # degenerate: 3 distinct rows tiled -> k-means++ stops early
        (
            [np.tile(rng.normal(size=(3, 4)), (40, 1)) for _ in range(2)],
            8,
            15,
        ),
    ]
    for subs, k, it in cases:
        seeds = [1234567 + j for j in range(len(subs))]
        got = _lloyd_numpy_multi(subs, k, seeds, it)
        want = [
            _lloyd_numpy(subs[j], k, seeds[j], it)
            for j in range(len(subs))
        ]
        assert got == want

"""Scalar quantization (operators/sq.py): code-range and
reconstruction-error invariants, zero-vector edge, recall against the
exact float path, and the JVM-only plan pin."""

import math

from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.knn import topk_global
from vector_search_test_spark.operators.sq import sq8_encode, sq8_l2_topk


def test_sq8_codes_and_reconstruction_error(spark, sf_dir):
    """Codes live in [-127, 127]; per-dimension reconstruction error is
    bounded by scale/2 (round-to-nearest)."""
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    enc = sq8_encode(emb).join(emb, "vec_id")
    rows = enc.collect()
    assert rows
    for r in rows:
        assert all(-127 <= c <= 127 for c in r.codes)
        assert len(r.codes) == len(r.embedding)
        for c, v in zip(r.codes, r.embedding):
            assert abs(c * r.scale - v) <= r.scale / 2 + 1e-7


def test_sq8_zero_vector(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in sq8_encode(df).collect()}
    assert rows[0].scale == 0.0 and rows[0].codes == [0, 0, 0]
    assert rows[1].codes[1] == -127  # max-|x| dim saturates the range


def test_sq8_recall_vs_exact(spark, sf_dir):
    """int8 decode error is tiny relative to inter-vector distances at
    this dim/scale: the SQ8 top-5 for vec 0 must equal the exact float
    top-5 (self first), and distances must agree to ~1e-3."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    exact = topk_global(emb, qvec, k=5).collect()
    sq = sq8_l2_topk(sq8_encode(emb), qvec, k=5).collect()
    assert [r.vec_id for r in sq] == [r.vec_id for r in exact]
    assert sq[0].vec_id == 0 and sq[0].dist < 1e-4
    for a, b in zip(sq, exact):
        assert math.isclose(a.dist, b.dist, abs_tol=2e-2)


def test_ivfsq8_full_probe_equals_flat_sq8(spark, sf_dir):
    """IVF-SQ8 at nprobe = nlist degenerates to the flat SQ8 scan (the
    same exactness gate the float IVF path pins); at nprobe=2 the
    result is a subset drawn only from the probed cells."""
    import __spark_entry__ as entrymod
    from vector_search_test_spark.operators.ivf import assign_cells
    from vector_search_test_spark.operators.sq import ivfsq8_search

    emb = load_table(spark, sf_dir, "embeddings")
    cents = entrymod._partial_probe_centroids(sf_dir)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    postings = assign_cells(emb.select("vec_id", "embedding"), cents)
    enc = sq8_encode(postings, extra_cols=("list_id",))

    full = ivfsq8_search(enc, qvec, cents, k=5, nprobe=len(cents)).collect()
    flat = sq8_l2_topk(sq8_encode(emb), qvec, k=5).collect()
    assert [(r.vec_id, r.dist) for r in full] == [
        (r.vec_id, r.dist) for r in flat
    ]

    pruned = ivfsq8_search(enc, qvec, cents, k=5, nprobe=2).collect()
    assert len(pruned) == 5
    assert pruned[0].vec_id == 0  # self lives in the nearest cell


def test_ivfsq8_save_load_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    """Disk round-trip returns the identical result, and a probe over
    the loaded postings prunes to the probed list_id partitions
    (PartitionFilters in the scan — the same contract as the float IVF
    and IVF-PQ indexes)."""
    import __spark_entry__ as entrymod
    from vector_search_test_spark.operators.ivf import assign_cells
    from vector_search_test_spark.operators.sq import (
        ivfsq8_load,
        ivfsq8_save,
        ivfsq8_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = entrymod._partial_probe_centroids(sf_dir)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    enc = sq8_encode(
        assign_cells(emb.select("vec_id", "embedding"), cents),
        extra_cols=("list_id",),
    )
    want = [tuple(r) for r in ivfsq8_search(enc, qvec, cents, k=5).collect()]

    path = str(tmp_path / "ivfsq8")
    ivfsq8_save(enc, cents, path)
    loaded, lcents = ivfsq8_load(spark, path)
    assert lcents == cents
    out = ivfsq8_search(loaded, qvec, lcents, k=5)
    assert [tuple(r) for r in out.collect()] == want

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan


def test_bq_packing_and_hamming(spark):
    """Known-vector bit packing (strictly-positive -> bit set; zero and
    negative -> clear), self-distance 0, sign-flip distance = number of
    flipped strictly-positive/negative transitions, and a dimension not
    divisible by 32 packs into a final partial word."""
    from vector_search_test_spark.operators.sq import (
        bq_encode,
        bq_hamming_topk,
        bq_pack,
    )

    v = [1.0, -1.0, 0.0, 2.5] + [0.0] * 28       # bits 0 and 3 -> 9
    w = [-x for x in v]                           # bit 1 only -> 2
    df = spark.createDataFrame(
        [(0, v), (1, w)], "vec_id long, embedding array<float>"
    )
    rows = {r.vec_id: r.bits for r in bq_encode(df).collect()}
    assert rows[0] == [9] and rows[1] == [2]
    assert bq_pack(v) == [9] and bq_pack(w) == [2]

    out = {
        r.vec_id: r.hamming
        for r in bq_hamming_topk(bq_encode(df), v, k=2).collect()
    }
    assert out[0] == 0
    assert out[1] == 3  # bits {0,3} vs {1}: symmetric difference

    odd = spark.createDataFrame(
        [(0, [1.0] * 40)], "vec_id long, embedding array<float>"
    )
    (r,) = bq_encode(odd).collect()
    assert r.bits == [2**32 - 1, 2**8 - 1]  # 32 full bits + 8 in word 2


def test_bq_rerank_recovers_exact_topk(spark, sf_dir):
    """With a generous shortlist (r = corpus size) the binary-then-
    rerank result IS the exact float top-k; with r=50 the refined
    distances are exact L2 for whatever the shortlist surfaced, and the
    self-match still tops the list (its Hamming distance is 0)."""
    from vector_search_test_spark.operators.sq import bq_encode, bq_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    exact = [tuple(r) for r in topk_global(emb, qvec, k=5).collect()]
    bits = bq_encode(emb)
    full = [tuple(r) for r in bq_rerank(bits, emb, qvec, k=5, r=n).collect()]
    assert full == exact

    pruned = bq_rerank(bits, emb, qvec, k=5, r=50).collect()
    assert len(pruned) == 5 and pruned[0].vec_id == 0
    assert all(
        pruned[i].dist <= pruned[i + 1].dist for i in range(len(pruned) - 1)
    )


def test_bq_degenerate_rows_sink(spark):
    """Review pin: an empty embedding packs to [] (not the garbage
    [0, 0] a descending sequence(0,-1) would produce), and its NULL
    Hamming distance sorts LAST — a degenerate row must never outrank a
    real match."""
    from vector_search_test_spark.operators.sq import bq_encode, bq_hamming_topk

    df = spark.createDataFrame(
        [(0, []), (1, [1.0, -2.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    bits = {r.vec_id: r.bits for r in bq_encode(df).collect()}
    assert bits[0] == []
    out = bq_hamming_topk(bq_encode(df), [1.0, -2.0, 3.0], k=2).collect()
    assert [r.vec_id for r in out] == [1, 0]
    assert out[0].hamming == 0 and out[1].hamming is None


def test_bq_stays_jvm_side(spark, sf_dir):
    from vector_search_test_spark.operators.sq import bq_encode, bq_hamming_topk

    emb = load_table(spark, sf_dir, "embeddings")
    plan = (
        bq_hamming_topk(bq_encode(emb), [0.1] * 64, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_sq8_stays_jvm_side(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [0.0] * 64
    plan = (
        sq8_l2_topk(sq8_encode(emb), qvec, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan

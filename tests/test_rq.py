"""Residual quantization (operators/rq.py) — the additive-codebook
rung. Load-bearing assertions: the Arrow encode kernel matches a plain
per-row numpy reference (per-dimension accumulation + first-min
argmin), reconstruction error falls as levels stack (the reason RQ
exists), and the LUT search returns exactly the brute-force ADC
ranking."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.rq import (
    rq_encode,
    rq_l2_topk,
    rq_lut,
    train_rq_numpy,
)


def _load_X(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    ids = [int(r.vec_id) for r in rows]
    X = np.array(
        [np.asarray(r.embedding, dtype=np.float32) for r in rows],
        dtype=np.float64,
    )
    return ids, X


def _ref_encode(X, books):
    """Reference per-row encode: the same arithmetic discipline as the
    kernel (float64, per-dimension order, first-min argmin)."""
    R = X.copy()
    codes = np.empty((len(X), len(books)), dtype=np.int64)
    for l, book in enumerate(books):
        C = np.array(book, dtype=np.float64)
        d = np.zeros((len(R), len(C)), dtype=np.float64)
        for i in range(R.shape[1]):
            t = R[:, i : i + 1] - C[None, :, i]
            d += t * t
        idx = np.argmin(d, axis=1)
        codes[:, l] = idx
        R = R - C[idx]
    return codes, R


def test_encode_matches_reference(spark, sf_dir):
    ids, X = _load_X(spark, sf_dir)
    books = train_rq_numpy(X, levels=2, k=16)
    want, _ = _ref_encode(X, books)
    got = {
        int(r.vec_id): list(r.codes)
        for r in rq_encode(
            load_table(spark, sf_dir, "embeddings"), books
        ).collect()
    }
    for vid, codes in zip(ids, want):
        assert got[vid] == list(codes), vid


def test_reconstruction_error_falls_with_levels(spark, sf_dir):
    _, X = _load_X(spark, sf_dir)
    errs = []
    for levels in (1, 2, 3):
        books = train_rq_numpy(X, levels=levels, k=16)
        _, R = _ref_encode(X, books)
        errs.append(float((R * R).sum()))
    assert errs[0] > errs[1] > errs[2], errs


def test_lut_topk_matches_bruteforce(spark, sf_dir):
    ids, X = _load_X(spark, sf_dir)
    books = train_rq_numpy(X, levels=2, k=16)
    q = X[ids.index(0)]
    lut = rq_lut([float(v) for v in q], books)
    codes, _ = _ref_encode(X, books)
    dists = [lut[int(a) * 16 + int(b)] for a, b in codes]
    want = sorted(zip(dists, ids))[:5]
    got = rq_l2_topk(
        rq_encode(load_table(spark, sf_dir, "embeddings"), books),
        lut,
        k2=16,
        k=5,
    ).collect()
    assert [(int(r.vec_id)) for r in got] == [i for _, i in want]
    for r, (d, _) in zip(got, want):
        assert r.dist == round(d, 6)
        assert 0 <= r.c1 < 16 and 0 <= r.c2 < 16


def test_train_validations():
    with pytest.raises(ValueError):
        train_rq_numpy(np.zeros((4, 4)), levels=0)
    with pytest.raises(ValueError):
        rq_lut([0.0] * 4, [[[0.0] * 4]])  # 1 level, not the 2-level path

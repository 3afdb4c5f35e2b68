"""Grouped vector statistics (operators/vstats.py): planted-mean
semantics, DuckDB-twin equality on the fixture, and the one-shuffle
plan shape."""

import duckdb
import numpy as np
from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.vstats import (
    source_centroids,
    source_centroids_sql,
)


def test_planted_centroid_mean(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string"
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (2, [3.0, 6.0]),
            (3, [5.0, -1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.source, r.dim): (r.n_vecs, r.avg_val)
        for r in source_centroids(docs, emb).collect()
    }
    assert got == {
        ("a", 0): (2, 2.0),
        ("a", 1): (2, 4.0),
        ("b", 0): (1, 5.0),
        ("b", 1): (1, -1.0),
    }


def test_matches_duckdb_twin_on_fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    got = sorted(
        (r.source, r.dim, r.n_vecs, r.avg_val)
        for r in source_centroids(docs, emb).collect()
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    want = sorted(
        (s, int(d), int(n), a)
        for s, d, n, a in con.execute(source_centroids_sql()).fetchall()
    )
    assert got == want
    # non-degenerate: every (source, dim) cell present
    n_sources = docs.select("source").distinct().count()
    dim = len(emb.first().embedding)
    assert len(got) == n_sources * dim


def test_quantization_close_to_true_mean(spark, sf_dir):
    """The integer quantization exists for cross-engine determinism, not
    accuracy loss: per-cell error vs the float64 mean is < 1e-6."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        (r.source, r.dim): r.avg_val
        for r in source_centroids(docs, emb).collect()
    }
    rows = docs.select("doc_id", "source").join(
        emb, docs.doc_id == emb.vec_id
    ).collect()
    acc = {}
    for r in rows:
        for d, v in enumerate(np.asarray(r.embedding, dtype=np.float64)):
            acc.setdefault((r.source, d), []).append(v)
    for key, vals in acc.items():
        assert abs(got[key] - float(np.mean(vals))) < 1e-6


def test_single_shuffle_plan(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    plan = (
        source_centroids(docs, emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one join-side broadcast or shuffle + ONE aggregation exchange; no Python
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan


def test_embedding_norm_stats_planted(spark):
    import math

    from vector_search_test_spark.operators.vstats import embedding_norm_stats

    rows = [
        (0, "a", [3.0, 4.0]),     # norm 5
        (1, "a", [0.0, 0.0]),     # dead vector
        (2, "b", [1.0, 0.0]),     # norm 1
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    )
    got = {r.label: r for r in embedding_norm_stats(df, "label").collect()}
    a = got["a"]
    assert (a.n_vecs, a.n_zero) == (2, 1)
    assert a.min_norm == 0.0 and a.max_norm == 5.0
    assert abs(a.mean_norm - 2.5) < 1e-6
    b = got["b"]
    assert (b.n_vecs, b.n_zero, b.mean_norm) == (1, 0, 1.0)


def test_embedding_drift_report_planted(spark):
    """Planted shift: the current snapshot is the reference shifted by
    +0.5 in dim 0 only — the report localizes the drift to that
    dimension and keeps stds equal."""
    import numpy as np

    from vector_search_test_spark.operators.vstats import (
        embedding_drift_report,
    )

    rng = np.random.RandomState(7)
    base = rng.uniform(-0.5, 0.5, size=(40, 4)).astype("float32")
    shifted = base.copy()
    shifted[:, 0] += 0.5
    ref = spark.createDataFrame(
        [(r.tolist(),) for r in base], "embedding array<float>"
    )
    cur = spark.createDataFrame(
        [(r.tolist(),) for r in shifted], "embedding array<float>"
    )
    out = {r["dim"]: r for r in embedding_drift_report(ref, cur).collect()}
    assert len(out) == 4
    assert out[0]["mean_shift"] == 0.5
    for d in (1, 2, 3):
        assert out[d]["mean_shift"] == 0.0
        assert out[d]["std_ref"] == out[d]["std_cur"]
    # numpy cross-check on one mean
    assert abs(out[2]["mean_ref"] - round(float(base[:, 2].mean()), 6)) < 2e-6
    assert out[0]["n_ref"] == 40 and out[0]["n_cur"] == 40


def test_label_shift_report_planted(spark):
    """Planted shift with a vanishing and an appearing class: counts,
    shares, and TVD parts are exact; sum(tvd_part) is the total
    variation distance."""
    from vector_search_test_spark.operators.vstats import (
        label_shift_report,
    )

    ref = spark.createDataFrame(
        [(0,)] * 6 + [(1,)] * 4, "label int"
    )
    cur = spark.createDataFrame(
        [(0,)] * 5 + [(2,)] * 5, "label int"
    )
    out = {r["label"]: r for r in label_shift_report(ref, cur).collect()}
    assert out[0]["share_ref"] == 0.6 and out[0]["share_cur"] == 0.5
    assert out[1]["n_cur"] == 0 and out[1]["share_cur"] == 0.0  # vanished
    assert out[2]["n_ref"] == 0 and out[2]["share_ref"] == 0.0  # appeared
    tvd = sum(r["tvd_part"] for r in out.values())
    # |0.6-0.5|/2 + |0.4-0|/2 + |0-0.5|/2 = 0.05 + 0.2 + 0.25 = 0.5
    assert abs(tvd - 0.5) < 1e-9


def test_embedding_zscore_gate_planted(spark):
    """Known profile, known vectors: exact z scores, std=0 dims
    skipped, all-zero-std profile yields NULL score / False flag."""
    from vector_search_test_spark.operators.vstats import (
        embedding_zscore_gate,
    )

    df = spark.createDataFrame(
        [(0, [0.0, 5.0]), (1, [2.0, 5.0]), (2, [0.5, 99.0])],
        "vec_id long, embedding array<float>",
    )
    # dim 0: mean 0, std 1; dim 1: std 0 (uncheckable)
    out = {
        r.id: r
        for r in embedding_zscore_gate(
            df, means=[0.0, 5.0], stds=[1.0, 0.0], theta=1.0
        ).collect()
    }
    assert out[0].max_absz == 0.0 and not out[0].drifted
    assert out[1].max_absz == 2.0 and out[1].drifted
    # dim 1's wild value is invisible: std = 0 dims never score
    assert out[2].max_absz == 0.5 and not out[2].drifted
    # every dim uncheckable -> NULL score, gate stays closed
    allzero = embedding_zscore_gate(
        df, means=[0.0, 0.0], stds=[0.0, 0.0], theta=1.0
    ).collect()
    assert all(r.max_absz is None and not r.drifted for r in allzero)
    import pytest

    with pytest.raises(ValueError):
        embedding_zscore_gate(df, means=[0.0], stds=[1.0, 1.0])


def test_embedding_dim_profile_matches_report(spark, sf_dir):
    """The profile helper and embedding_drift_report compute through
    the same quantized sums: profile(mean/std) rounded 6dp equals the
    report's ref-side columns."""
    from vector_search_test_spark.io import load_table
    from vector_search_test_spark.operators.vstats import (
        embedding_dim_profile,
        embedding_drift_report,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    prof = {
        r.dim: (round(r.mean, 6), round(r.std, 6))
        for r in embedding_dim_profile(emb).collect()
    }
    rep = {
        r.dim: (r.mean_ref, r.std_ref)
        for r in embedding_drift_report(emb, emb).collect()
    }
    assert prof == rep

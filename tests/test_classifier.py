"""Quality-classifier tests (operators/classifier.py): learning
actually happens (accuracy beats majority class on a planted target),
the DuckDB twin is value-identical, training is deterministic, and the
contract errors are loud."""

import pytest
from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.classifier import (
    quality_classifier_oracle_sql,
    quality_classifier_scores,
    quality_classifier_train,
)

# the entry's planted text-derived target (the fixture's lang/source
# columns are independent of the text — see the entry docstring)
_TARGET_SQL = (
    "len(list_filter(string_split(lower(text), ' '), "
    "t -> t IN ('join', 'hash'))) > "
    "len(list_filter(string_split(lower(text), ' '), "
    "t -> t IN ('slow', 'scan')))"
)


def _target_col():
    toks = F.split(F.lower(F.col("text")), " ")
    n_pos = F.size(F.filter(toks, lambda t: (t == "join") | (t == "hash")))
    n_neg = F.size(F.filter(toks, lambda t: (t == "slow") | (t == "scan")))
    return n_pos > n_neg


def test_classifier_learns_planted_target(spark, sf_dir):
    """8 GD rounds must recover the planted vocabulary-ratio label well
    above the majority class — the 'training actually moves' pin that
    caught the unstandardized-features version (which sat AT majority
    forever)."""
    docs = load_table(spark, sf_dir, "documents")
    out = quality_classifier_scores(
        docs, _target_col(), n_buckets=32, rounds=8, lr=2.0
    ).collect()
    n = len(out)
    acc = sum(1 for r in out if r.pred == r.y) / n
    majority = max(sum(r.y for r in out), n - sum(r.y for r in out)) / n
    assert acc >= 0.75, f"acc {acc:.3f} — classifier did not learn"
    assert acc > majority + 0.1, f"acc {acc:.3f} vs majority {majority:.3f}"
    # scores separate the classes, not just the hard predictions
    mean_pos = sum(r.qscore for r in out if r.y == 1) / sum(
        1 for r in out if r.y == 1
    )
    mean_neg = sum(r.qscore for r in out if r.y == 0) / sum(
        1 for r in out if r.y == 0
    )
    assert mean_pos - mean_neg > 0.2


def test_classifier_matches_duckdb_twin(spark, sf_dir):
    """Value-for-value: quantized moments/margins/gradients + 9dp
    sigmoid make the 8 unrolled GD rounds bit-replayable in SQL."""
    import duckdb

    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        (r.doc_id, r.y, r.qscore, r.pred)
        for r in quality_classifier_scores(
            docs, _target_col(), n_buckets=32, rounds=8, lr=2.0
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        (int(i), int(y), float(s), int(p))
        for i, y, s, p in con.execute(
            quality_classifier_oracle_sql(
                _TARGET_SQL, n_buckets=32, rounds=8, lr=2.0
            )
        ).fetchall()
    )
    assert got == want


def test_classifier_training_deterministic(spark, sf_dir):
    """Two independent trainings produce identical weight vectors (the
    quantized-sum argument: nothing order-sensitive survives)."""
    docs = load_table(spark, sf_dir, "documents")
    w1, _ = quality_classifier_train(
        docs, _target_col(), n_buckets=16, rounds=3, lr=2.0
    )
    w2, _ = quality_classifier_train(
        docs, _target_col(), n_buckets=16, rounds=3, lr=2.0
    )
    assert w1 == w2
    assert len(w1) == 17  # n_buckets + bias
    assert any(w != 0.0 for w in w1)  # gradient actually flowed


def test_classifier_contract_errors(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        quality_classifier_train(docs, F.lit(True), rounds=0)
    with pytest.raises(ValueError):
        quality_classifier_train(docs, F.lit(True), n_buckets=0)


def test_classifier_excludes_empty_docs(spark):
    """Zero-token documents carry no features and are absent from the
    scored output (mirrored in the twin's WHERE len(toks) > 0)."""
    docs = spark.createDataFrame(
        [(0, "join join hash"), (1, ""), (2, "slow scan scan")],
        "doc_id long, text string",
    )
    out = quality_classifier_scores(
        docs, F.col("doc_id") == 0, n_buckets=8, rounds=2, lr=2.0
    ).collect()
    assert sorted(r.doc_id for r in out) == [0, 2]

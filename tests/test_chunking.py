"""Document chunking (functions/chunking.py): boundary semantics on
planted docs, full-coverage/overlap invariants, DuckDB-twin
bit-equality on the fixture corpus, and the scan-only plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from vector_search_test_spark.functions.chunking import (
    chunk_documents,
    chunk_documents_sql,
)
from vector_search_test_spark.io import load_table


def _words(k):
    return " ".join(f"w{i}" for i in range(k))


def test_chunk_boundaries_planted(spark):
    """10 tokens, size 4, overlap 1 (step 3): starts at tokens 0/3/6/9 ->
    chunks of 4,4,4,1 tokens; a short doc yields one whole chunk."""
    df = spark.createDataFrame(
        [(1, _words(10)), (2, _words(2))], "doc_id long, text string"
    )
    got = sorted(
        (r.id, r.chunk_id, r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, size=4, overlap=1).collect()
    )
    assert got == [
        (1, 0, "w0 w1 w2 w3", 4),
        (1, 1, "w3 w4 w5 w6", 4),
        (1, 2, "w6 w7 w8 w9", 4),
        (1, 3, "w9", 1),
        (2, 0, "w0 w1", 2),
    ]


def test_chunk_coverage_and_overlap_invariants(spark):
    """Every token position is covered, consecutive chunks overlap by
    exactly `overlap` tokens (except the trailing partial), and
    re-joining chunk 0's unique prefix + each chunk's tail reconstructs
    the document."""
    n, size, overlap = 53, 8, 3
    df = spark.createDataFrame([(1, _words(n))], "doc_id long, text string")
    rows = sorted(
        (r.chunk_id, r.chunk_text.split(" ")) for r in chunk_documents(
            df, size=size, overlap=overlap
        ).collect()
    )
    step = size - overlap
    seen = set()
    for cid, toks in rows:
        start = cid * step
        assert toks == [f"w{i}" for i in range(start, min(start + size, n))]
        seen.update(range(start, min(start + size, n)))
    assert seen == set(range(n))
    for (c1, t1), (c2, t2) in zip(rows, rows[1:]):
        if len(t2) >= overlap:
            assert t1[-overlap:] == t2[:overlap] or len(t1) < size


def test_chunking_matches_duckdb_on_fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        (r.id, r.chunk_id, r.chunk_text, r.n_tokens)
        for r in chunk_documents(docs, size=32, overlap=8).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        (int(i), int(c), t, int(nt))
        for i, c, t, nt in con.execute(
            chunk_documents_sql(size=32, overlap=8)
        ).fetchall()
    )
    assert got == want
    assert len(got) > len({i for i, *_ in got})  # multi-chunk docs exist


def test_chunking_is_scan_only(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        chunk_documents(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_chunking_rejects_bad_overlap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        chunk_documents(docs, size=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(docs, size=8, overlap=-1)

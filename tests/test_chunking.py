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


def test_greedy_pack_reference_semantics():
    from vector_search_test_spark.functions.chunking import greedy_pack

    assert greedy_pack([3, 3, 3], 6) == [0, 0, 1]
    assert greedy_pack([5, 5, 5], 4) == [0, 1, 2]  # oversized: own packs
    assert greedy_pack([], 8) == []
    assert greedy_pack([2, 2, 2, 2], 4) == [0, 0, 1, 1]


def test_pack_chunks_invariants_and_python_twin(spark, sf_dir):
    """No pack exceeds the budget (chunk size <= budget here), chunks are
    preserved exactly, assignment is deterministic, equals the reference
    greedy fill per bucket, and mean fill beats budget/2 in every bucket
    with 2+ packs (the greedy guarantee)."""
    from vector_search_test_spark.functions.chunking import (
        greedy_pack,
        pack_chunks,
        packing_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, size=32, overlap=8)
    budget = 96
    packed = pack_chunks(chunks, budget=budget, n_buckets=8)
    rows = packed.collect()
    assert len(rows) == chunks.count()  # nothing lost or duplicated
    assert {(r.id, r.chunk_id) for r in rows} == {
        (r.id, r.chunk_id) for r in chunks.collect()
    }

    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    fills = []
    for bucket, brows in by_bucket.items():
        brows.sort(key=lambda r: (r.id, r.chunk_id))
        want = greedy_pack([r.n_tokens for r in brows], budget)
        assert [r.pack_id for r in brows] == want, f"bucket {bucket}"
        pack_fill = {}
        for r in brows:
            pack_fill[r.pack_id] = pack_fill.get(r.pack_id, 0) + r.n_tokens
        assert all(v <= budget for v in pack_fill.values())
        if len(pack_fill) >= 2:
            fills.append(sum(pack_fill.values()) / len(pack_fill))
    assert fills and all(f > budget / 2 for f in fills)

    stats = packing_stats(packed, budget)
    srow = stats.agg(F.min("waste").alias("lo"), F.max("waste").alias("hi")).first()
    assert 0 <= srow.lo and srow.hi <= budget

    again = {(r.id, r.chunk_id): (r.bucket, r.pack_id) for r in
             pack_chunks(chunks, budget=budget, n_buckets=8).collect()}
    assert again == {(r.id, r.chunk_id): (r.bucket, r.pack_id) for r in rows}


def test_pack_chunks_matches_duckdb_recursive_twin(spark, sf_dir):
    """Cross-engine bit-equality of the full packing pipeline: the md5
    bucket hash AND the greedy first-fit recurrence (DuckDB recursive
    CTE) reproduce every (bucket, pack_id) assignment."""
    from vector_search_test_spark.functions.chunking import (
        pack_chunks,
        pack_chunks_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, size=32, overlap=8)
    got = sorted(
        (r.id, r.chunk_id, r.n_tokens, r.bucket, r.pack_id)
        for r in pack_chunks(chunks, budget=96, n_buckets=8).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        tuple(int(v) for v in row)
        for row in con.execute(
            pack_chunks_sql(
                chunk_documents_sql(size=32, overlap=8),
                budget=96,
                n_buckets=8,
            )
        ).fetchall()
    )
    assert got == want
    assert len({b for *_, b, _p in got}) > 1  # multiple buckets exercised


def test_pack_chunks_single_shuffle(spark, sf_dir):
    """Scale shape: exactly one Exchange (the bucket shuffle) feeds the
    per-bucket greedy fill."""
    from vector_search_test_spark.functions.chunking import pack_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, size=32, overlap=8)
    plan = (
        pack_chunks(chunks, budget=96, n_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def test_chunking_unicode_twin_and_empty_inputs(spark):
    """Unicode text (multi-byte tokens) chunks byte-identically across
    engines, and empty inputs yield empty outputs without error for
    chunking and packing."""
    import duckdb

    from vector_search_test_spark.functions.chunking import pack_chunks

    df = spark.createDataFrame(
        [(1, "héllo wörld 中文 токены emoji🙂 mixé"), (2, "")],
        "doc_id long, text string",
    )
    got = sorted(
        (r.id, r.chunk_id, r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, size=3, overlap=1).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.execute(
        "INSERT INTO documents VALUES (1, 'héllo wörld 中文 токены emoji🙂 mixé'), (2, '')"
    )
    want = sorted(
        (int(i), int(c), t, int(n))
        for i, c, t, n in con.execute(
            chunk_documents_sql(size=3, overlap=1)
        ).fetchall()
    )
    assert got == want
    assert any("中文" in t for _, _, t, _ in got)

    empty = spark.createDataFrame([], "doc_id long, text string")
    ch = chunk_documents(empty, size=4, overlap=1)
    assert ch.count() == 0
    assert pack_chunks(ch, budget=8, n_buckets=4).count() == 0


def test_packing_efficiency_bound(spark, sf_dir):
    """The entry-level dashboard certifies greedy first-fit's
    fill > budget/2 guarantee numerically and its counts reconcile
    with the packed table."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    r = entrymod._q_packing_efficiency(spark, sf_dir).first()
    # fill > budget/2 holds for every CLOSED pack; each bucket's last
    # (still-open) pack is exempt -> at most n_buckets underfull packs
    assert r.frac_above_half >= 1 - entrymod._PACK_BUCKETS / r.n_packs
    assert 0.5 < r.mean_fill <= 1.0 and 0.0 < r.min_fill <= 1.0
    assert r.n_chunks >= r.n_packs >= 1
    assert r.sum_tokens <= r.n_packs * entrymod._PACK_BUDGET

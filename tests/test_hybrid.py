"""Filtered vector search (operators/knn.py::filtered_topk) and hybrid
BM25+vector RRF retrieval (operators/search.py::hybrid_search_rrf):
filter-then-rank correctness, scan pushdown, fusion arithmetic, and the
DuckDB twin on the fixture."""

import duckdb
import pytest
from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.knn import filtered_topk, topk_global
from vector_search_test_spark.operators.search import hybrid_search_rrf


def test_filtered_topk_filter_then_rank(spark, sf_dir):
    """Excluding the best match must promote the next-nearest (the
    post-filter composition would return k-1 rows instead); with a
    vacuous predicate the result equals the unfiltered top-k."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    plain = [r.vec_id for r in topk_global(emb, qvec, k=5).collect()]
    assert plain[0] == 0  # self is nearest
    excl = [
        r.vec_id
        for r in filtered_topk(
            emb, qvec, predicate=F.col("vec_id") != 0, k=5
        ).collect()
    ]
    assert len(excl) == 5 and 0 not in excl
    assert excl[:4] == plain[1:5]  # rank shifted, not truncated
    vac = [
        r.vec_id
        for r in filtered_topk(emb, qvec, predicate=F.lit(True), k=5).collect()
    ]
    assert vac == plain


def test_filtered_topk_pushes_predicate_to_scan(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.join(
        docs.select(F.col("doc_id").alias("vec_id"), "lang"), "vec_id"
    )
    qvec = [float(x) for x in emb.first().embedding]
    plan = (
        filtered_topk(corpus, qvec, predicate=F.col("lang") == "en", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "lang" in plan
    assert "TakeOrderedAndProject" in plan


def test_hybrid_rrf_semantics(spark, sf_dir):
    """The query document tops both legs, so it must rank first with
    rrf = 2/(60+1); every fused score equals the recomputed
    1/(60+lex)+1/(60+vec) with NULL legs contributing 0."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qtext = docs.filter(F.col("doc_id") == 0).first().text
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    rows = hybrid_search_rrf(docs, emb, qtext, qvec, k=10).collect()
    by_id = {r.doc_id: r for r in rows}
    # the query doc's own embedding is distance 0 -> vector rank 1 is
    # guaranteed; BM25 rank 1 is NOT (a shorter doc with higher tf of
    # the rare query terms can outscore the source doc), but the query
    # doc must appear in the lexical leg (it contains every query term)
    assert 0 in by_id
    assert by_id[0].vec_rank == 1
    assert by_id[0].lex_rank is not None
    for r in rows:
        want = (1.0 / (60 + r.lex_rank) if r.lex_rank else 0.0) + (
            1.0 / (60 + r.vec_rank) if r.vec_rank else 0.0
        )
        assert r.rrf == round(want, 6)
    # descending, tie-broken by id
    key = [(-r.rrf, r.doc_id) for r in rows]
    assert key == sorted(key)


def test_hybrid_rrf_matches_duckdb_twin(spark, sf_dir):
    import __spark_entry__ as entrymod

    got = sorted(
        tuple(r)
        for r in entrymod._q_hybrid_search_rrf(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    want = sorted(
        (int(i), rr, None if lr is None else int(lr),
         None if vr is None else int(vr))
        for i, rr, lr, vr in con.execute(
            entrymod._hybrid_rrf_oracle_sql()
        ).fetchall()
    )
    assert got == want


def test_hybrid_precomputed_stats_identical_and_actionless(spark, sf_dir):
    """Supplying corpus_stats=(n_docs, avgdl) must (a) change nothing in
    the result — the precomputed scalars are exact — and (b) remove the
    corpus-wide scalar aggregate from the QUERY path: building the plan
    triggers no Spark action at all (jobs only run when the caller
    executes the returned DataFrame)."""
    from vector_search_test_spark.operators.search import bm25_corpus_stats

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qtext = docs.filter(F.col("doc_id") == 0).first().text
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    stats = bm25_corpus_stats(docs)

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = hybrid_search_rrf(
        docs, emb, qtext, qvec, k=10, corpus_stats=stats
    )
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "plan construction ran a Spark job"

    # one scan per leg: the lexical leg derives document frequency from
    # the same tf subtree (window over term), not a second branch that
    # would re-scan the docs table (plan captured pre-execution — the
    # post-AQE string repeats every node in its Initial Plan section)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") == 1
    assert plan.count("embeddings.parquet") == 1

    got = sorted(tuple(r) for r in df.collect())
    want = sorted(
        tuple(r) for r in hybrid_search_rrf(docs, emb, qtext, qvec, k=10).collect()
    )
    assert got == want


def test_hybrid_rejects_empty_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError):
        hybrid_search_rrf(docs, emb, "   ", [0.0] * 64)


def test_late_interaction_planted_maxsim(spark):
    """MaxSim prefers a doc matching ALL query tokens somewhere over a
    doc matching one token repeatedly — the late-interaction property
    single-vector scoring cannot express."""
    from vector_search_test_spark.operators.search import (
        late_interaction_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),                 # the query doc
            (2, "alpha beta gamma delta"),     # matches both tokens
            (3, "alpha alpha alpha alpha"),    # one token, repeated
            (4, "zzz yyy xxx www"),            # matches nothing well
        ],
        "doc_id long, text string",
    )
    out = late_interaction_topk(docs, "alpha beta", k=4)
    rows = out.collect()
    score = {r.doc_id: r.maxsim for r in rows}
    # self-identical token sets tie at the top: per query token the
    # max similarity is an exact 1.0 self-match in docs 1 and 2
    assert abs(score[1] - 2.0) < 1e-6 and abs(score[2] - 2.0) < 1e-6
    # full coverage beats repeated single-token coverage
    assert score[2] > score[3]
    assert score[3] > score[4]
    # ranking is on the quantized integer sum with doc_id ties
    ordered = [r.doc_id for r in rows]
    assert ordered.index(1) < ordered.index(2) or score[1] != score[2]


def test_late_interaction_token_cap_and_determinism(spark):
    """Only the first max_tokens tokens score; empty tokens are
    dropped; repeated runs are identical."""
    from vector_search_test_spark.operators.search import (
        late_interaction_topk,
    )

    docs = spark.createDataFrame(
        [(1, "a  b   c"), (2, "c b a"), (3, "")],
        "doc_id long, text string",
    )
    out1 = sorted(map(tuple, late_interaction_topk(
        docs, "a b c", k=5, max_tokens=2).collect()))
    out2 = sorted(map(tuple, late_interaction_topk(
        docs, "a b c", k=5, max_tokens=2).collect()))
    assert out1 == out2
    # doc 3 has no tokens -> no score row
    assert all(r[0] != 3 for r in out1)

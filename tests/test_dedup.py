"""Dedup-suite tests: LSH recall vs the exact quadratic oracle, exact-dup
grouping, shingle edge cases, simhash banding soundness."""

import numpy as np
from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.dedup import (
    dedup_exact,
    jaccard_join,
    neardup_embedding,
    neardup_minhash,
    ngram_jaccard_pairs,
    shingles,
    simhash_near_pairs,
)


def test_minhash_finds_all_planted_pairs(spark, sf_dir):
    """LSH banding must recover every pair the exact all-pairs Jaccard
    finds at theta=0.9 (at j~0.99 the miss probability of a 4x4 banding
    is ~(1-j^4)^4 ~ 1e-6)."""
    docs = load_table(spark, sf_dir, "documents")
    lsh = {(r.a, r.b): r.jaccard for r in neardup_minhash(docs, threshold=0.9).collect()}
    exact = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    assert lsh == exact
    assert len(exact) > 0


def test_jaccard_join_prefix_filter_is_lossless(spark, sf_dir):
    """The AllPairs prefix-filtered similarity join must return EXACTLY the
    all-pairs result (the prefix lemma guarantees recall 1.0; the verify
    step guarantees precision 1.0) — at several thresholds, on a corpus
    with planted exact duplicates."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.union(docs.withColumn("doc_id", F.col("doc_id") + 10000))
    for theta in (0.3, 0.5, 0.8):
        fast = {(r.a, r.b): r.jaccard for r in jaccard_join(dup, threshold=theta).collect()}
        slow = {
            (r.a, r.b): r.jaccard
            for r in ngram_jaccard_pairs(dup, threshold=theta).collect()
        }
        assert fast == slow
        assert len(fast) >= docs.count()  # every planted dup pair found


def test_dedup_exact_duplicate_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.union(docs.withColumn("doc_id", F.col("doc_id") + 10000))
    out = dedup_exact(dup).collect()
    n = docs.count()
    assert len(out) == n
    assert all(r.n_dupes == 2 for r in out)
    # representative is always the original (lower) id
    assert all(r.rep_id < 10000 for r in out)


def test_shingles_short_doc_guard(spark):
    df = spark.createDataFrame([("a b",), ("x y z w",), ("solo",)], "text string")
    got = df.select(shingles("text", 3).alias("sh")).collect()
    assert got[0].sh == ["a b"]  # shorter than n -> whole text
    assert got[1].sh == ["x y z", "y z w"]
    assert got[2].sh == ["solo"]


def test_simhash_pairs_have_true_hamming(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    pairs = simhash_near_pairs(docs, bits=32, max_hamming=2, num_chunks=4).collect()
    assert len(pairs) > 0
    assert all(0 <= r.hamming <= 2 for r in pairs)
    # canonical orientation, no dupes
    keys = [(r.a, r.b) for r in pairs]
    assert all(a < b for a, b in keys) and len(keys) == len(set(keys))


def test_neardup_embedding_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        (r.a, r.b): r.cos
        for r in neardup_embedding(emb, threshold=0.4, k=20, nlist=4).collect()
    }
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    d = ((mat[:, None, :] - mat[None, :, :]) ** 2).sum(-1)
    cosm = (mat @ mat.T) / (
        np.linalg.norm(mat, axis=1)[:, None] * np.linalg.norm(mat, axis=1)[None, :]
    )
    want = {}
    order = np.argsort(ids)
    for qi in range(len(ids)):
        nn = np.lexsort((ids, d[qi]))[:20]
        for j in nn:
            a, b = ids[qi], ids[j]
            if a < b and cosm[qi, j] >= 0.4:
                want[(int(a), int(b))] = round(float(cosm[qi, j]), 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


def test_dedup_operators_handle_empty_corpus(spark):
    """Empty input -> empty output (no crash) for every dedup operator;
    IVF build on an empty corpus raises the reference-style guard."""
    import pytest

    from vector_search_test_spark.operators.dedup import jaccard_join
    from vector_search_test_spark.operators.ivf import ivf_build
    from vector_search_test_spark.operators.knn import topk_global

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert dedup_exact(empty_docs).count() == 0
    assert neardup_minhash(empty_docs).count() == 0
    assert jaccard_join(empty_docs).count() == 0
    assert simhash_near_pairs(empty_docs).count() == 0

    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert topk_global(empty_emb, [0.0, 1.0], k=5).count() == 0
    with pytest.raises(ValueError, match="empty corpus"):
        ivf_build(empty_emb, nlist=2)


def test_neardup_decisions_chain_and_consistency(spark, sf_dir):
    """Decision pipeline semantics: a planted duplicate CHAIN (A~B and
    B~C verified pairs, A~C possibly below threshold) collapses to ONE
    representative (min id) — the connected-component closure near-dedup
    requires because similarity is not transitive; untouched docs keep
    themselves; the kept set equals (corpus - non-rep members). Also
    cross-checked against neardup_minhash: every pair's two sides map to
    the same rep."""
    from vector_search_test_spark.operators.dedup import (
        neardup_dedup_decisions,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    chain = [
        (1001, base + " endA"),
        (1002, base + " endB"),  # ~ both neighbors
        (1003, base + " endC"),
    ]
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.union(
        spark.createDataFrame(chain, "doc_id long, text string")
    )
    dec = {r.id: (r.rep_id, r.keep) for r in
           neardup_dedup_decisions(planted).collect()}
    assert dec[1001] == (1001, True)
    assert dec[1002] == (1001, False)
    assert dec[1003] == (1001, False)

    pairs = neardup_minhash(planted).collect()
    assert any({p.a, p.b} == {1001, 1002} for p in pairs)
    for p in pairs:
        assert dec[p.a][0] == dec[p.b][0], (p.a, p.b)
    n_nonrep = sum(1 for rep, keep in dec.values() if not keep)
    assert sum(1 for _, keep in dec.values() if keep) == len(dec) - n_nonrep
    assert len(dec) == planted.count()


def test_incremental_dedup_semantics_and_plan(spark, sf_dir):
    """Incoming rows that duplicate the existing corpus are dropped;
    within-batch duplicates survive once (min id); genuinely new texts
    survive; normalization (lower+trim) applies across the boundary.
    Plan: the existing side reduces to a distinct projection feeding a
    LeftAnti join."""
    from vector_search_test_spark.operators.dedup import incremental_dedup

    existing = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [
            (10, "  ALPHA beta "),   # dup of existing after normalize
            (11, "epsilon zeta"),    # new
            (12, "epsilon zeta"),    # within-batch dup -> min id wins
            (13, "eta theta"),       # new
        ],
        "doc_id long, text string",
    )
    out = incremental_dedup(incoming, existing)
    got = sorted(r.id for r in out.collect())
    assert got == [11, 13]

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "BatchEvalPython" not in plan


def test_dup_ngram_profile_semantics_and_twin(spark, sf_dir):
    """A verbatim copy scores dup_frac 1.0 on both twins, a
    disjoint-vocabulary doc scores 0.0, internal-only repetition does
    NOT count as duplication (min_docs=2 is cross-document), a short
    doc falls back to the whole-text gram, and the DuckDB twin agrees
    on the planted fixture."""
    import duckdb

    from vector_search_test_spark.operators.dedup import dup_ngram_profile

    data = [
        (0, "a b c d e f g h"),
        (1, "a b c d e f g h"),          # verbatim copy of 0
        (2, "p q r s t u v w"),          # fully unique
        (3, "x y x y x y x y"),          # internal repetition only
        (4, "zz qq"),                    # shorter than n -> whole-text gram
        (5, "a b c d e tail1 tail2 tail3"),  # partial overlap with 0/1
    ]
    docs = spark.createDataFrame(data, "doc_id long, text string")
    rows = {
        r.doc_id: r for r in dup_ngram_profile(docs, n=5, min_docs=2).collect()
    }
    assert rows[0].dup_frac == 1.0 and rows[1].dup_frac == 1.0
    assert rows[2].dup_frac == 0.0
    # doc 3's grams repeat internally but exist in no other doc
    assert rows[3].dup_frac == 0.0 and rows[3].n_grams == 4
    assert rows[4].n_grams == 1  # whole-text fallback
    # doc 5 shares exactly the gram "a b c d e" with docs 0/1
    assert rows[5].n_dup == 1 and rows[5].n_grams == 4
    assert rows[5].dup_frac == 0.25

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in data)
        + ") AS t(doc_id, text)"
    )
    import __spark_entry__ as entrymod

    want = {
        int(i): (int(ng), int(nd), frac)
        for i, ng, nd, frac in con.execute(
            entrymod._dup_ngram_oracle_sql()
        ).fetchall()
    }
    got = {
        i: (r.n_grams, r.n_dup, r.dup_frac) for i, r in rows.items()
    }
    assert got == want


def test_strip_dup_ngrams_semantics(spark):
    """Span removal (Lee et al. second half): a verbatim copy is fully
    stripped (clean_text '', n_dropped == n_tokens), a unique doc is
    untouched (normalized re-join), and a doc sharing exactly one
    5-gram loses exactly those 5 tokens while its unique tail
    survives."""
    from vector_search_test_spark.operators.dedup import strip_dup_ngrams

    data = [
        (0, "a b c d e f g h"),
        (1, "a b c d e f g h"),              # verbatim copy
        (2, "p q r s t u v w"),              # unique
        (3, "a b c d e tail1 tail2 tail3 tail4"),  # shares "a b c d e"
    ]
    docs = spark.createDataFrame(data, "doc_id long, text string")
    rows = {
        r.doc_id: r for r in strip_dup_ngrams(docs, n=5, min_docs=2).collect()
    }
    assert rows[0].clean_text == "" and rows[0].n_dropped == 8
    assert rows[1].clean_text == "" and rows[1].n_dropped == 8
    assert rows[2].clean_text == "p q r s t u v w"
    assert rows[2].n_dropped == 0
    # doc 3: gram "a b c d e" covers tokens 1..5; tail survives
    assert rows[3].clean_text == "tail1 tail2 tail3 tail4"
    assert rows[3].n_tokens == 9 and rows[3].n_dropped == 5


def test_dup_ngram_ops_stay_jvm_side(spark):
    """Neither exact-substring-dedup operator ships rows to Python: the
    gram stream, coverage expansion, and the indexed-lambda rewrite are
    all Catalyst expressions."""
    from vector_search_test_spark.operators.dedup import (
        dup_ngram_profile,
        strip_dup_ngrams,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4} w{i+5}") for i in range(20)],
        "doc_id long, text string",
    )
    for out in (dup_ngram_profile(docs), strip_dup_ngrams(docs)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_minhash_estimate_quality_planted(spark):
    """Identical docs estimate exactly 1.0 with zero error; the
    estimator stays within the H=16 quantization of truth on planted
    near-dups (|est - jacc| bounded well below 1)."""
    from vector_search_test_spark.operators.dedup import (
        minhash_estimate_quality,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base.replace("kappa", "lambda")
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, near)], "doc_id long, text string"
    )
    rows = {(r.a, r.b): r for r in minhash_estimate_quality(docs).collect()}
    exact_pair = rows[(0, 1)]
    assert exact_pair.est_jaccard == 1.0
    assert exact_pair.jaccard == 1.0 and exact_pair.abs_err == 0.0
    for r in rows.values():
        assert 0.0 <= r.est_jaccard <= 1.0
        assert abs(r.abs_err - abs(r.est_jaccard - r.jaccard)) < 1e-6
        assert r.abs_err < 0.6  # H=16 keeps the estimator in the ballpark


# ---------------------------------------------------------------------------
# SemDeDup (dedup.py::semdedup_prune — Abbas et al. 2023)
# ---------------------------------------------------------------------------


def test_semdedup_keeps_low_centroid_sim_member(spark):
    """Two near-identical vectors land in the same cluster: the one
    FARTHER from the centroid is kept (paper §2.2 rule), the other
    dropped; a diverse same-cluster member survives; cross-cluster
    near-dups are (by design) not compared."""
    from vector_search_test_spark.operators.dedup import semdedup_prune

    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (1, [10.0, 0.1]),    # cluster 0, very aligned with centroid
        (2, [10.0, 0.11]),   # near-dup of 1, slightly less aligned
        (3, [5.0, 2.0]),     # cluster 0, diverse
        (4, [0.1, 8.0]),     # cluster 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in semdedup_prune(df, cents, tau=0.99).collect()}
    assert out[1].list_id == 0 and out[2].list_id == 0
    assert out[4].list_id == 1
    # 1 vs 2: cos > 0.99; id 2 has LOWER cent_sim -> earlier in the
    # (cent_sim ASC, id) order -> kept; id 1 dropped
    assert out[2].cent_sim < out[1].cent_sim
    assert out[2].keep == 1 and out[1].keep == 0
    assert out[3].keep == 1 and out[4].keep == 1


def test_semdedup_partition_invariance_and_validation(spark, sf_dir):
    import pytest

    from vector_search_test_spark.io import spread
    from vector_search_test_spark.operators.dedup import semdedup_prune

    from __spark_entry__ import _partial_probe_centroids

    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    cents = _partial_probe_centroids(sf_dir)
    a = {
        (r.vec_id, r.list_id, r.cent_sim, r.keep)
        for r in semdedup_prune(emb, cents, tau=0.35).collect()
    }
    b = {
        (r.vec_id, r.list_id, r.cent_sim, r.keep)
        for r in semdedup_prune(emb.repartition(13), cents, tau=0.35).collect()
    }
    assert a == b
    assert len(a) == emb.count()  # every row annotated, none lost
    with pytest.raises(ValueError):
        semdedup_prune(emb, cents, tau=1.5)


# ---------------------------------------------------------------------------
# winnowing candidate pairs (dedup.py::winnowing_candidate_pairs)
# ---------------------------------------------------------------------------


def test_winnowing_candidates_planted_overlap(spark):
    """Two docs sharing a long run become a candidate pair; an unrelated
    doc pairs with neither."""
    from vector_search_test_spark.operators.dedup import (
        winnowing_candidate_pairs,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (0, f"intro words {shared} outro one"),
            (1, f"{shared} other tail entirely"),
            (2, "nothing in common with those documents at all"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.a, r.b): (r.shared, r.containment)
        for r in winnowing_candidate_pairs(df, min_shared=1).collect()
    }
    assert (0, 1) in pairs
    assert all({a, b} == {0, 1} for a, b in pairs)
    s, c = pairs[(0, 1)]
    assert s >= 1 and 0 < c <= 1


def test_winnowing_candidates_stop_fp_cap(spark):
    """A fingerprint present in every doc is boilerplate: with max_df
    below the corpus size it must not generate pairs on its own."""
    from vector_search_test_spark.operators.dedup import (
        winnowing_candidate_pairs,
    )

    boiler = "the same header line for every document"
    df = spark.createDataFrame(
        [(i, f"{boiler} unique tail {i} {i * 7} {i * 13}") for i in range(6)],
        "doc_id long, text string",
    )
    capped = winnowing_candidate_pairs(df, min_shared=1, max_df=3).collect()
    uncapped = winnowing_candidate_pairs(
        df, min_shared=1, max_df=None
    ).collect()
    assert len(uncapped) == 15  # all-pairs through the boilerplate fps
    assert len(capped) < len(uncapped)


def test_winnowing_candidates_matches_duckdb(spark, sf_dir):
    import duckdb

    from vector_search_test_spark.operators.dedup import (
        winnowing_candidate_pairs,
        winnowing_candidates_oracle_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        (r.a, r.b, r.shared, r.containment)
        for r in winnowing_candidate_pairs(docs).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        (int(a), int(b), int(s), float(c))
        for a, b, s, c in con.execute(
            winnowing_candidates_oracle_sql()
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_winnowing_candidates_rejects_bad_min_shared(spark, sf_dir):
    import pytest

    from vector_search_test_spark.operators.dedup import (
        winnowing_candidate_pairs,
    )

    with pytest.raises(ValueError):
        winnowing_candidate_pairs(
            load_table(spark, sf_dir, "documents"), min_shared=0
        )


def test_prebuilt_superset_restriction_equals_rebuild(spark, sf_dir):
    """The persistent-signature-table seam's central claim (r12):
    superset-built MinHash tables semi-join-filtered to a subset's ids
    produce EXACTLY the pairs (and decisions) a from-scratch build over
    the subset produces — and a family-parameter mismatch is rejected
    loudly instead of silently changing sensitivity."""
    import pytest

    from vector_search_test_spark.operators.dedup import (
        minhash_tables,
        neardup_dedup_decisions,
    )

    docs = load_table(spark, sf_dir, "documents")
    subset = docs.filter(F.col("doc_id") % 3 != 1)  # proper subset
    tables = minhash_tables(docs)

    via_prebuilt = {
        (r.a, r.b): r.jaccard
        for r in neardup_minhash(
            subset, threshold=0.9, prebuilt=tables
        ).collect()
    }
    rebuilt = {
        (r.a, r.b): r.jaccard
        for r in neardup_minhash(subset, threshold=0.9).collect()
    }
    assert via_prebuilt == rebuilt
    # pairs must only involve subset ids (the semi-join actually cuts)
    kept = {r.doc_id for r in subset.select("doc_id").collect()}
    assert all(a in kept and b in kept for a, b in via_prebuilt)

    dec_pre = {
        (r.id, r.rep_id, r.keep)
        for r in neardup_dedup_decisions(subset, prebuilt=tables).collect()
    }
    dec_new = {
        (r.id, r.rep_id, r.keep)
        for r in neardup_dedup_decisions(subset).collect()
    }
    assert dec_pre == dec_new

    # family-parameter mismatch: loud, not silent (r12 review finding)
    with pytest.raises(ValueError, match="prebuilt MinHash tables"):
        neardup_minhash(subset, bands=8, prebuilt=tables)


def test_incremental_neardup_planted_and_cascade(spark):
    """Incremental LSH near-dup gate (dedup.py::incremental_neardup):
    re-ingested exact copies match their standing original at jaccard
    1.0; genuinely new docs keep with NULL match; within the batch an
    earlier doc drops a later near-dup, and drops CASCADE through
    chains (the documented semdedup one-join rule: b drops c even
    though a dropped b)."""
    from vector_search_test_spark.operators.dedup import (
        incremental_neardup,
        minhash_tables,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    existing_rows = [
        (1, base),
        (2, "completely different standing text about spark and parquet files"),
    ]
    # a ~ b ~ c chain on its OWN vocabulary (unrelated to the standing
    # docs), long enough that single-word edits stay above theta=0.9:
    # 100 words, 98 shingles; one edit perturbs 3 shingles -> j ~ 0.94;
    # two edits (a vs c) -> j ~ 0.89 < 0.9, so only CONSECUTIVE links
    # verify and the chain is a real cascade, not a clique
    chain = [f"zz{i}token" for i in range(100)]
    a_words = list(chain)
    b_words = list(chain); b_words[30] = "editone"
    c_words = list(b_words); c_words[70] = "edittwo"
    incoming_rows = [
        (100, base),                 # exact copy of standing doc 1
        (101, "an entirely novel document with no relatives anywhere"),
        (102, " ".join(a_words)),    # chain head: no standing match
        (103, " ".join(b_words)),    # dropped by 102
        (104, " ".join(c_words)),    # dropped by 103 (itself dropped)
    ]
    existing = minhash_tables(
        spark.createDataFrame(existing_rows, "doc_id long, text string")
    )
    incoming = spark.createDataFrame(incoming_rows, "doc_id long, text string")
    got = {
        r.id: (r.keep, r.match_id, r.jaccard)
        for r in incremental_neardup(incoming, existing, threshold=0.9).collect()
    }
    assert got[100] == (0, 1, 1.0)            # exact re-ingest -> original
    assert got[101][0] == 1 and got[101][1] is None and got[101][2] is None
    assert got[102][0] == 1                    # chain head survives
    assert got[103] == (0, 102, got[103][2]) and got[103][2] >= 0.9
    # the cascade: 104's only verified match is 103 (itself dropped;
    # 104 vs 102 sits below theta, so keep-one-per-group would differ)
    assert got[104][0] == 0 and got[104][1] == 103


def test_cross_source_dup_matrix_planted(spark):
    """Planted provenance: one within-source exact pair, one
    cross-source near pair — the matrix separates diagonal from
    off-diagonal and orders cells lexicographically."""
    from vector_search_test_spark.operators.dedup import (
        cross_source_dup_matrix,
    )

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (0, base, "wiki"),
        (1, base, "wiki"),                  # within-wiki exact dup
        (2, base + " tail", "web"),         # web mirrors wiki
        (3, "entirely different unrelated text with many other words", "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in cross_source_dup_matrix(docs, threshold=0.5).collect()
    }
    assert out[("wiki", "wiki")]["n_pairs"] == 1
    assert out[("wiki", "wiki")]["within_source"]
    assert out[("wiki", "wiki")]["n_docs"] == 2
    # cross cell ordered lexicographically: ('web', 'wiki'), both
    # wiki docs pair with the web mirror -> 2 pairs over 3 docs
    assert out[("web", "wiki")]["n_pairs"] == 2
    assert not out[("web", "wiki")]["within_source"]
    assert out[("web", "wiki")]["n_docs"] == 3
    assert ("web", "web") not in out  # doc 3 pairs with nothing


def test_paragraph_dedup_planted(spark):
    """CCNet semantics on a planted corpus: cross-document boilerplate
    collapses to its (min id, min pos) occurrence; within-doc repeats
    collapse too; blank paragraphs never count; reassembly preserves
    order and is fingerprinted."""
    import hashlib

    from vector_search_test_spark.operators.dedup import paragraph_dedup

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    docs = spark.createDataFrame(
        [
            (0, "header\nunique zero\nfooter"),
            (1, "header\nunique one\nfooter"),      # boilerplate dupes
            (2, "Header\nheader"),                  # norm-dup of doc 0's + case
            (3, "only here\n\n  \nonly here"),      # blank + within-doc dup
            (4, ""),                                # nothing
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in paragraph_dedup(docs).collect()}
    assert len(out) == 5
    # doc 0 owns header & footer (min id), keeps everything
    assert (out[0].n_pars, out[0].n_kept, out[0].n_dropped) == (3, 3, 0)
    assert out[0].cleaned_md5 == md5("header\nunique zero\nfooter")
    # doc 1 loses both boilerplate lines, keeps its unique middle
    assert (out[1].n_pars, out[1].n_kept) == (3, 1)
    assert out[1].cleaned_md5 == md5("unique one")
    # doc 2: both paragraphs normalize to 'header', owned by doc 0
    assert (out[2].n_pars, out[2].n_kept) == (2, 0)
    assert out[2].cleaned_md5 == md5("")
    # doc 3: blanks dropped from the count; within-doc dup collapses
    assert (out[3].n_pars, out[3].n_kept) == (2, 1)
    assert out[3].cleaned_md5 == md5("only here")
    # doc 4: empty text -> zero-count row
    assert (out[4].n_pars, out[4].n_kept) == (0, 0)
    assert out[4].cleaned_md5 == md5("")
    # global invariant: total kept = number of distinct normalized
    # non-blank paragraphs
    # (header, unique zero, footer, unique one, only here)
    assert sum(r.n_kept for r in out.values()) == 5


def test_neardup_keep_best_elects_quality_winner(spark):
    """Planted near-dup group where the BEST-quality member is NOT the
    min id: keep-best must elect it (vs decisions' min-id rule),
    singletons stay their own representative, and ties fall back to
    min id."""
    from vector_search_test_spark.functions.textstats import quality_score
    from vector_search_test_spark.operators.dedup import (
        neardup_dedup_decisions,
        neardup_keep_best,
    )

    # docs 1/2/3 are near-identical (one token differs); doc 2 carries
    # a longer, cleaner body -> strictly higher quality_score. doc 9
    # is unrelated.
    dup = (
        "the quick brown fox jumps over the lazy dog near the old "
        "river bank while birds watch from tall green trees"
    )
    rows = [
        (1, dup + " one"),
        (2, dup + " one and the story continues with calm clear words"),
        (3, dup + " two"),
        (9, "completely different text about astronomy and orbits"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qs = {
        r.doc_id: r.q
        for r in docs.select(
            "doc_id", F.round(quality_score("text"), 6).alias("q")
        ).collect()
    }
    assert qs[2] > qs[1] and qs[2] > qs[3]

    out = {r.id: r for r in neardup_keep_best(docs, threshold=0.5).collect()}
    dec = {
        r.id: r
        for r in neardup_dedup_decisions(docs, threshold=0.5).collect()
    }
    # the three dups form one group under both policies
    assert dec[1].rep_id == dec[2].rep_id == dec[3].rep_id == 1
    assert out[1].rep_id == out[2].rep_id == out[3].rep_id == 2
    assert out[2].keep and not out[1].keep and not out[3].keep
    # singleton: own representative either way
    assert out[9].rep_id == 9 and out[9].keep
    # per-doc q column matches the standalone score
    for i, r in out.items():
        assert r.q == qs[i]


def test_fingerprint_kernel_matches_expression(spark):
    """The Arrow fingerprint kernel (fingerprint_shingle_table) must
    produce element- AND order-identical shingle arrays to the
    fingerprint_shingles expression form it replaced in the MinHash /
    PPJoin asset builds — including multi-byte, astral-plane,
    zero-width, multi-space, short-document, and NULL input."""
    from vector_search_test_spark.operators.dedup import (
        fingerprint_shingle_table,
        fingerprint_shingles,
    )

    zwsp = "​"
    samples = [
        "hello world again and again hello world again",
        "héllo wörld café crème über alles",
        "漢字 テスト emoji \U0001f600 ok",
        f"zero{zwsp}width and nbsp inside token",
        "a b",  # shorter than n: whole-text single gram
        "one",  # single token
        "double  space   runs",  # empty tokens kept by the splitter
        "",  # empty text
        None,  # NULL text
        "UPPER Case MiXeD İstanbul ß",
        "repeat repeat repeat repeat repeat",  # gram dedup
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "doc_id long, text string"
    )
    want = {
        r.doc_id: list(r.sh)
        for r in df.select(
            "doc_id", fingerprint_shingles("text", 3).alias("sh")
        )
        .filter(F.size("sh") > 0)
        .collect()
    }
    got = {
        r.id: list(r.sh)
        for r in fingerprint_shingle_table(df, n=3).collect()
    }
    assert got == want  # same rows kept, same arrays, same ORDER
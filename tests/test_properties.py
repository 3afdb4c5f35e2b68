"""Property tests (SURVEY §5.4) — hypothesis over small generated corpora.

Each property pins a semantic invariant of the engine, not a fixture
value: theta=0 unclusters everything, input permutation cannot change the
partition, duplicate texts collapse (§2.9 Q1), k > n returns n rows
(§2.9 Q5), and the prefix-filtered Jaccard join equals the quadratic
all-pairs form on arbitrary corpora. max_examples is kept small because
every example runs real Spark jobs.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_search_test_spark.functions.embed import HashingEmbedder
from vector_search_test_spark.operators.cluster import similarity_clusters
from vector_search_test_spark.operators.dedup import jaccard_join, ngram_jaccard_pairs
from vector_search_test_spark.operators.knn import topk_global

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
text_st = st.lists(st.sampled_from(WORDS), min_size=1, max_size=6).map(" ".join)
corpus_st = st.lists(text_st, min_size=2, max_size=10)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _corpus_df(spark, texts):
    emb = HashingEmbedder(dim=16)
    mat = emb.encode(list(texts))
    rows = [(i, t, [float(x) for x in mat[i]]) for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows, "id long, text string, embedding array<float>"
    )


@settings(**_SETTINGS)
@given(texts=corpus_st)
def test_theta_zero_unclusters_everything(spark, texts):
    """dist < 0 is unsatisfiable -> no edges -> every text gets -1."""
    out = similarity_clusters(
        _corpus_df(spark, texts), threshold=0.0, k=5, nlist=2
    ).collect()
    assert all(r.cluster_id == -1 for r in out)


@settings(**_SETTINGS)
@given(texts=corpus_st, seed=st.randoms(use_true_random=False))
def test_permutation_invariant_partition(spark, texts, seed):
    """Shuffling input row order cannot change WHO clusters with whom
    (cluster ids may renumber; the partition of texts may not — §2.9 Q6)."""

    def partition(ts):
        out = similarity_clusters(
            _corpus_df(spark, ts), threshold=1.2, k=5, nlist=2
        ).collect()
        groups = {}
        for r in out:
            groups.setdefault(r.cluster_id, set()).add(r.text)
        singles = {frozenset([t]) for t in groups.pop(-1, set())}
        return {frozenset(v) for v in groups.values()} | singles

    shuffled = list(texts)
    seed.shuffle(shuffled)
    assert partition(texts) == partition(shuffled)


@settings(**_SETTINGS)
@given(texts=corpus_st)
def test_duplicates_collapse_to_one_row(spark, texts):
    """§2.9 Q1: export has one row per DISTINCT text even when the corpus
    holds duplicates."""
    doubled = list(texts) + list(texts)
    out = similarity_clusters(
        _corpus_df(spark, doubled), threshold=0.5, k=5, nlist=2
    ).collect()
    assert len(out) == len(set(doubled))


@settings(**_SETTINGS)
@given(texts=corpus_st, k=st.integers(min_value=1, max_value=50))
def test_topk_returns_min_k_n_rows(spark, texts, k):
    """§2.9 Q5: k > ntotal returns exactly ntotal rows, never padding."""
    df = _corpus_df(spark, texts)
    qvec = [float(x) for x in df.first().embedding]
    got = topk_global(df.select(F.col("id").alias("vec_id"), "embedding"), qvec, k=k)
    assert got.count() == min(k, len(texts))


@settings(**_SETTINGS)
@given(texts=corpus_st, theta=st.sampled_from([0.3, 0.6, 0.9]))
def test_jaccard_prefix_join_lossless_on_random_corpora(spark, texts, theta):
    """The AllPairs/PPJoin prefix filter must be exactly lossless for any
    corpus and threshold, not just the fixtures."""
    df = _corpus_df(spark, texts).select(
        F.col("id").alias("doc_id"), "text"
    )
    fast = {(r.a, r.b, r.jaccard) for r in jaccard_join(df, n=2, threshold=theta).collect()}
    slow = {
        (r.a, r.b, r.jaccard)
        for r in ngram_jaccard_pairs(df, n=2, threshold=theta).collect()
    }
    assert fast == slow


# --- pure-python kernels (no Spark per example -> generous max_examples) ---

_PURE_SETTINGS = dict(max_examples=200, deadline=None)


@settings(**_PURE_SETTINGS)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=50), max_size=60),
    budget=st.integers(min_value=1, max_value=100),
)
def test_greedy_pack_invariants(sizes, budget):
    """For ANY item sequence: pack ids are a non-decreasing 0-based
    sequence without gaps; no pack exceeds the budget unless one of its
    items alone does (then it holds exactly that item); and any two
    consecutive packs together overflow the budget (the fill >
    budget/2-on-average guarantee)."""
    from vector_search_test_spark.functions.chunking import greedy_pack

    packs = greedy_pack(sizes, budget)
    assert len(packs) == len(sizes)
    if not packs:
        return
    assert packs[0] == 0
    assert all(0 <= b - a <= 1 for a, b in zip(packs, packs[1:]))
    fill: dict[int, int] = {}
    for s, p in zip(sizes, packs):
        fill[p] = fill.get(p, 0) + s
    items: dict[int, list] = {}
    for s, p in zip(sizes, packs):
        items.setdefault(p, []).append(s)
    for p, f in fill.items():
        if f > budget:
            assert len(items[p]) == 1 and items[p][0] > budget
    for p in range(len(fill) - 1):
        assert fill[p] + fill[p + 1] > budget


@settings(**_PURE_SETTINGS)
@given(
    n=st.integers(min_value=1, max_value=200),
    size=st.integers(min_value=1, max_value=40),
    overlap_frac=st.floats(min_value=0.0, max_value=0.99),
)
def test_chunk_starts_cover_every_token(n, size, overlap_frac):
    """The chunk-start arithmetic (mirrored from chunk_documents and its
    DuckDB twin) covers every token exactly, for any doc length, chunk
    size, and overlap."""
    overlap = min(int(size * overlap_frac), size - 1)
    step = size - overlap
    last_start = (max(n - 1, 0) // step) * step + 1
    starts = list(range(1, last_start + 1, step))
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + size, n + 1)))
    assert covered == set(range(1, n + 1))
    assert all(s2 - s1 == step for s1, s2 in zip(starts, starts[1:]))


@settings(**_PURE_SETTINGS)
@given(
    base_keys=st.sets(st.integers(min_value=0, max_value=60), min_size=0, max_size=40),
    upd_keys=st.sets(st.integers(min_value=0, max_value=60), min_size=0, max_size=40),
)
def test_upsert_count_algebra(base_keys, upd_keys):
    """Pure twin of operators/snapshot.py::upsert's row algebra:
    |result| = |base| - |base∩updates| + |updates|; updated keys carry
    the update's payload, untouched keys the base's, and the key sets
    union exactly."""
    base = {k: f"b{k}" for k in base_keys}
    upd = {k: f"u{k}" for k in upd_keys}
    result = {**{k: v for k, v in base.items() if k not in upd}, **upd}
    assert len(result) == len(base) - len(base_keys & upd_keys) + len(upd)
    assert set(result) == base_keys | upd_keys
    for k, v in result.items():
        assert v == (f"u{k}" if k in upd_keys else f"b{k}")


@settings(**_SETTINGS)
@given(
    base_keys=st.lists(
        st.integers(0, 30), min_size=1, max_size=15, unique=True
    ),
    upd_keys=st.lists(st.integers(0, 40), min_size=1, max_size=8, unique=True),
    n_buckets=st.sampled_from([1, 3, 8]),
)
def test_bucketed_upsert_equals_plain_upsert(
    spark, base_keys, upd_keys, n_buckets
):
    """The partition-scoped disk path must be semantically invisible:
    for arbitrary key sets and bucket counts (including n_buckets=1,
    where every upsert rewrites the single bucket), writing base then
    updates through upsert_bucketed and reading the manifest back
    equals the in-memory upsert plan."""
    import shutil
    import tempfile

    from vector_search_test_spark.operators.snapshot import (
        read_current_snapshot,
        upsert,
        upsert_bucketed,
    )

    base = spark.createDataFrame(
        [(k, f"b{k}") for k in sorted(base_keys)], "doc_id long, text string"
    )
    upd = spark.createDataFrame(
        [(k, f"u{k}") for k in sorted(upd_keys)], "doc_id long, text string"
    )
    d = tempfile.mkdtemp(prefix="sg_bucketed_prop_")
    try:
        upsert_bucketed(base, d, "v0", n_buckets=n_buckets)
        upsert_bucketed(upd, d, "v1", n_buckets=n_buckets)
        got = sorted(
            tuple(r)
            for r in read_current_snapshot(spark, d)
            .select("doc_id", "text")
            .collect()
        )
        want = sorted(tuple(r) for r in upsert(base, upd).collect())
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(**_SETTINGS)
@given(
    scores=st.lists(
        st.sampled_from([0.1, 0.25, 0.25, 0.5, 0.5, 0.5, 0.9]),
        min_size=1,
        max_size=12,
    ),
    frac=st.sampled_from([0.0, 0.2, 0.5, 0.8, 1.0]),
)
def test_top_fraction_equals_declarative_topk(spark, scores, frac):
    """The histogram top-frac plan equals row_number-over-full-order on
    ANY score multiset (heavy ties included) at any fraction."""
    from vector_search_test_spark.operators.sampling import (
        top_fraction_by_score,
    )

    rows = [(i, float(s)) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    k = int(frac * len(rows))
    want = {
        d
        for d, _ in sorted(rows, key=lambda r: (-r[1], r[0]))[:k]
    }
    got = {r.doc_id for r in top_fraction_by_score(df, "s", frac).collect()}
    assert got == want


@settings(**_SETTINGS)
@given(
    weights=st.fixed_dictionaries(
        {
            "a": st.sampled_from([0.0, 0.5, 1.0, 2.5]),
            "b": st.sampled_from([0.0, 1.0, 3.0]),
        }
    )
)
def test_epoch_upsample_exact_multiplicity_bounds(spark, weights):
    """Every row appears floor(w) or ceil(w) times; integer weights are
    exact; total output is within the Bernoulli envelope."""
    import math

    from vector_search_test_spark.operators.sampling import epoch_upsample

    rows = [(i, "a") for i in range(8)] + [(100 + i, "b") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = epoch_upsample(df, weights)
    per = {
        (r.source, r.doc_id): r.c
        for r in out.groupBy("source", "doc_id")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for (s, _), c in per.items():
        w = weights[s]
        assert math.floor(w) <= c <= math.ceil(w), (s, w, c)
    for s, w in weights.items():
        if w == int(w):  # integer epochs are exact for every row
            n = sum(1 for (ss, _) in per if ss == s)
            assert n == (8 if w > 0 else 0)
            assert all(c == w for (ss, _), c in per.items() if ss == s)


# ---------------------------------------------------------------------------
# r10 data-selection operators: randomized cross-engine properties
# ---------------------------------------------------------------------------

_src_st = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), text_st),
    min_size=3,
    max_size=12,
)


@settings(**_SETTINGS)
@given(rows=_src_st, alpha=st.sampled_from([0.0, 0.3, 0.7, 1.0]))
def test_temperature_mixture_matches_duckdb_on_random_corpora(
    spark, rows, alpha
):
    """The realized (id, source, epoch) multiset equals the DuckDB twin
    on arbitrary corpora and α — the quantized-weight determinism
    holds beyond the fixture."""
    import duckdb

    from vector_search_test_spark.operators.sampling import (
        temperature_mixture,
        temperature_mixture_sql,
    )

    data = [(i, s, t) for i, (s, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, source string, text string")
    got = {
        (r.doc_id, r.source, r.epoch)
        for r in temperature_mixture(
            df.select("doc_id", "source"), alpha=alpha
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", data)
    want = set(
        con.execute(temperature_mixture_sql(alpha=alpha)).fetchall()
    )
    assert got == want
    if alpha == 1.0:
        assert len(got) == len(data)  # identity mix


@settings(**_SETTINGS)
@given(rows=_src_st, frac=st.sampled_from([0.25, 0.5, 1.0]))
def test_dsir_select_matches_duckdb_on_random_corpora(spark, rows, frac):
    """DSIR selection replays in DuckDB on arbitrary corpora: same
    quantized log-ratios, same Gumbel, same top-frac set."""
    import duckdb

    from vector_search_test_spark.operators.sampling import (
        dsir_select,
        dsir_select_sql,
    )

    data = [(i, s, t) for i, (s, t) in enumerate(rows)]
    # need at least one target and one raw row for the models
    if not any(s == "a" for _, s, _ in data):
        data.append((len(data), "a", "alpha beta"))
    if all(s == "a" for _, s, _ in data):
        data.append((len(data), "b", "gamma delta"))
    df = spark.createDataFrame(data, "doc_id long, source string, text string")
    got = {
        (r.doc_id, r.n_grams, r.logw, r.score)
        for r in dsir_select(
            df, F.col("source") == "a", frac, n_buckets=64
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", data)
    want = set(
        con.execute(
            dsir_select_sql("documents", "source = 'a'", frac, n_buckets=64)
        ).fetchall()
    )
    assert got == want


@settings(**_SETTINGS)
@given(texts=st.lists(
    st.text(
        alphabet=st.sampled_from("ab .!?\"{\n"), min_size=0, max_size=40
    ),
    min_size=1,
    max_size=8,
))
def test_c4_flags_match_duckdb_on_adversarial_text(spark, texts):
    """C4 signals/flags agree across engines on adversarial inputs:
    empty docs, quote/brace/newline soup, punctuation-only lines."""
    import duckdb

    from vector_search_test_spark.functions import textstats as ts

    data = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(data, "doc_id long, text string")
    sig, flg = ts.c4_signals("text"), ts.c4_flags("text")
    got = {
        tuple(r)
        for r in df.select(
            "doc_id",
            *[v.alias(k) for k, v in sig.items()],
            *[v.alias(k) for k, v in flg.items()],
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", data)
    cols = ", ".join(
        [f"{v} AS {k}" for k, v in ts.c4_signals_sql("text").items()]
        + [f"{v} AS {k}" for k, v in ts.c4_flags_sql("text").items()]
    )
    want = set(con.execute(f"SELECT doc_id, {cols} FROM d").fetchall())
    assert got == want


@settings(**_SETTINGS)
@given(
    syms=st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
    pair=st.tuples(
        st.sampled_from(["a", "b", "c"]), st.sampled_from(["a", "b", "c"])
    ),
)
def test_merge_pair_equals_sequential_reference(spark, syms, pair):
    """The JVM BPE merge fold equals the sequential greedy reference on
    arbitrary symbol sequences — including same-symbol runs (the
    floor(run/2) case) and empty input."""
    from vector_search_test_spark.operators.bpe import merge_pair

    a, b = pair
    out, pend = [], ""
    for x in syms:
        if pend == a and x == b:
            out.append(a + b)
            pend = ""
        elif pend == "":
            pend = x
        else:
            out.append(pend)
            pend = x
    if pend:
        out.append(pend)
    df = spark.createDataFrame([(syms,)], "s array<string>")
    got = df.select(
        merge_pair(F.col("s"), F.lit(a), F.lit(b)).alias("m")
    ).first().m
    assert got == out
    # merge conservation: k merges shrink the sequence by exactly k
    # (the merged symbol is 2 chars; input symbols are 1 char, so it
    # is always distinguishable)
    k = sum(1 for y in got if y == a + b)
    assert len(got) == len(syms) - k


# --------------------------------------------------------------------------
# r13 additions
# --------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(texts=corpus_st, bench_idx=st.sets(st.integers(0, 9), max_size=4))
def test_bloom_never_loses_a_true_match(spark, texts, bench_idx):
    """No false negatives on ARBITRARY corpora: the bloom-prefiltered
    report's n_hits/overlap/contaminated equal the exact report's,
    even through a tiny (high-FPR) bitmap."""
    from vector_search_test_spark.operators.sampling import (
        bloom_contamination_report,
        contamination_report,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    bench = docs.filter(
        F.col("doc_id").isin([i for i in bench_idx if i < len(texts)] or [0])
    ).select("text")
    bloom = {
        r["id"]: (r["n_hits"], r["overlap"], r["contaminated"])
        for r in bloom_contamination_report(
            docs, bench, n=2, m_bits=64, k=2, threshold=0.6
        ).collect()
    }
    exact = {
        r["id"]: (r["n_hits"], r["overlap"], r["contaminated"])
        for r in contamination_report(
            docs, bench, n=2, threshold=0.6
        ).collect()
    }
    assert bloom == exact


@settings(**_SETTINGS)
@given(
    ids=st.sets(st.integers(0, 10_000), min_size=1, max_size=40),
    n_shards=st.sampled_from([1, 2, 4, 8]),
)
def test_training_shards_partition_and_determinism(spark, ids, n_shards):
    """Arbitrary id sets: shards partition the corpus exactly, and the
    audit is a pure function of (ids, seed) — engine fingerprints equal
    a pure-python replay of hash -> shard -> rank -> fp."""
    import hashlib

    from vector_search_test_spark.operators.sampling import training_shards

    docs = spark.createDataFrame(
        [(i, f"t {i}") for i in sorted(ids)], "doc_id long, text string"
    )
    rows = training_shards(docs, n_shards, seed="p").collect()
    assert sum(r["n_docs"] for r in rows) == len(ids)

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    by_shard = {}
    for i in sorted(ids):
        h = h48(f"p:{i}")
        by_shard.setdefault(h % n_shards, []).append((h, i))
    expect = {}
    for s, hs in by_shard.items():
        hs.sort()
        expect[s] = (
            len(hs),
            sum(
                (rank + 1) * (h % 1000003) % 2147483647
                for rank, (h, _) in enumerate(hs)
            )
            % 2147483647,
        )
    got = {r["shard"]: (r["n_docs"], r["order_fp"]) for r in rows}
    assert got == expect


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 50)),
        min_size=2,
        max_size=30,
    )
)
def test_zorder_layouts_always_partition_rows(spark, vals):
    """Arbitrary integer pairs: both layouts partition every row into
    exactly one file, fences bound the data, and the scanned verdict is
    consistent with the fences."""
    from vector_search_test_spark.operators.snapshot import (
        zorder_layout_stats,
    )

    df = spark.createDataFrame(vals, "a long, b long")
    rows = zorder_layout_stats(df, "a", "b", bits=4, n_files=4).collect()
    for layout in ("zorder", "linear"):
        rs = [r for r in rows if r["layout"] == layout]
        assert sum(r["n_rows"] for r in rs) == len(vals)
        for r in rs:
            assert r["min_a"] <= r["max_a"] and r["min_b"] <= r["max_b"]


# ---------------------------------------------------------------------------
# r14 additions
# ---------------------------------------------------------------------------

vec_st = st.lists(
    st.floats(-1.0, 1.0, allow_nan=False, width=32), min_size=3, max_size=3
)


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(vec_st, vec_st, st.sampled_from(["s1", "s2"])),
        min_size=1,
        max_size=8,
    ),
    theta=st.floats(-1.0, 1.0, allow_nan=False),
)
def test_clip_gate_threshold_is_exactly_rounded_cosine(spark, rows, theta):
    """For arbitrary pairs and thresholds: kept <=> the 6dp-rounded
    cosine clears theta, NULL scores (zero-norm towers) never pass,
    and per-source retention is exactly n_kept/n_pairs."""
    import math

    from vector_search_test_spark.sources.multimodal import clip_pair_filter

    df = spark.createDataFrame(
        [(i, s, a, b) for i, (a, b, s) in enumerate(rows)],
        "id long, source string, img_emb array<float>, txt_emb array<float>",
    )
    out = clip_pair_filter(df, None, theta, id_col="id").collect()
    assert len(out) == len(rows)
    by_src = {}
    for r in out:
        a, b, _ = rows[r["id"]]
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(x) * float(x) for x in b))
        if na * nb == 0:
            assert r["clip_score"] is None and not r["kept"]
        else:
            assert r["kept"] == (r["clip_score"] >= theta)
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        kept = sum(1 for r in rs if r["kept"])
        assert rs[0]["src_n_pairs"] == len(rs)
        assert rs[0]["src_n_kept"] == kept
        assert rs[0]["src_retention"] == round(kept / len(rs), 6)


@settings(**_SETTINGS)
@given(
    seeds=st.lists(
        st.tuples(vec_st, st.integers(0, 3)), min_size=1, max_size=6
    ),
    targets=st.lists(vec_st, min_size=1, max_size=5),
    k=st.integers(1, 5),
)
def test_label_propagation_invariants(spark, seeds, targets, k):
    """Arbitrary geometry: every target gets exactly one prediction,
    the predicted label exists among the seeds, n_considered =
    min(k, |seeds|), and vote_frac = n_votes / n_considered."""
    from vector_search_test_spark.operators.knn import knn_label_propagation

    sdf = spark.createDataFrame(
        [(i, v, l) for i, (v, l) in enumerate(seeds)],
        "vec_id long, embedding array<float>, label int",
    )
    tdf = spark.createDataFrame(
        [(100 + i, v) for i, v in enumerate(targets)],
        "vec_id long, embedding array<float>",
    )
    out = knn_label_propagation(tdf, sdf, k=k).collect()
    assert len(out) == len(targets)
    seed_labels = {l for _, l in seeds}
    want_considered = min(k, len(seeds))
    for r in out:
        assert r["pred_label"] in seed_labels
        assert r["n_considered"] == want_considered
        assert r["vote_frac"] == round(r["n_votes"] / want_considered, 6)
        assert 1 <= r["n_votes"] <= want_considered


@settings(**_SETTINGS)
@given(
    counts=st.lists(st.integers(1, 9), min_size=1, max_size=4),
    budget=st.integers(1, 500),
    alpha=st.sampled_from([0.0, 0.3, 1.0]),
)
def test_token_budget_plan_conservation(spark, counts, budget, alpha):
    """Arbitrary source sizes: target shares sum to ~1, natural shares
    sum to ~1, and target_tokens sums to the budget within one
    rounding unit per source."""
    from vector_search_test_spark.operators.sampling import token_budget_plan

    rows = []
    for s, n_docs in enumerate(counts):
        for d in range(n_docs):
            rows.append((s * 100 + d, "w " * (s + 1) + "end", f"src{s}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = token_budget_plan(docs, budget, alpha=alpha).collect()
    assert len(out) == len(counts)
    assert abs(sum(r["nat_share"] for r in out) - 1.0) < 1e-4
    assert abs(sum(r["target_share"] for r in out) - 1.0) < 1e-4
    assert abs(sum(r["target_tokens"] for r in out) - budget) <= len(counts)
    for r in out:
        assert r["sample_rate"] <= 1.0
        assert r["sample_rate"] <= r["epochs"] + 1e-9


@settings(**_SETTINGS)
@given(
    labels_ref=st.lists(st.integers(0, 3), min_size=1, max_size=12),
    labels_cur=st.lists(st.integers(0, 3), min_size=1, max_size=12),
)
def test_label_shift_tvd_bounds(spark, labels_ref, labels_cur):
    """Arbitrary label multisets: shares sum to 1 on each side, TVD =
    sum(tvd_part) is in [0, 1], and it is 0 iff the distributions are
    identical."""
    from vector_search_test_spark.operators.vstats import label_shift_report

    ref = spark.createDataFrame([(x,) for x in labels_ref], "label int")
    cur = spark.createDataFrame([(x,) for x in labels_cur], "label int")
    out = label_shift_report(ref, cur).collect()
    assert abs(sum(r["share_ref"] for r in out) - 1.0) < 1e-4
    assert abs(sum(r["share_cur"] for r in out) - 1.0) < 1e-4
    tvd = sum(r["tvd_part"] for r in out)
    assert -1e-9 <= tvd <= 1.0 + 1e-9
    from collections import Counter

    same = Counter(labels_ref) == Counter(labels_cur) and len(
        labels_ref
    ) == len(labels_cur)
    if same:
        assert tvd < 1e-9


@settings(**_SETTINGS)
@given(
    vecs=st.lists(vec_st, min_size=2, max_size=10),
)
def test_embedding_drift_identical_snapshots_report_zero(spark, vecs):
    """The same snapshot on both sides: every dimension reports zero
    mean shift and identical stds."""
    from vector_search_test_spark.operators.vstats import (
        embedding_drift_report,
    )

    df = spark.createDataFrame([(v,) for v in vecs], "embedding array<float>")
    out = embedding_drift_report(df, df).collect()
    assert len(out) == 3
    for r in out:
        assert r["mean_shift"] == 0.0
        assert r["std_ref"] == r["std_cur"]
        assert r["n_ref"] == r["n_cur"] == len(vecs)

"""Text-analysis function tests (fixture-anchored where ground truth
exists: n_chars is precomputed by the driver)."""

from pyspark.sql import functions as F

from vector_search_test_spark.functions import textstats as ts
from vector_search_test_spark.io import load_table


def test_char_count_matches_fixture_n_chars(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bad = docs.filter(ts.char_count("text") != F.col("n_chars")).count()
    assert bad == 0


def test_token_counts(spark):
    df = spark.createDataFrame([("a b c",), ("hello, world!",)], "text string")
    got = df.select(
        ts.token_count_ws("text").alias("ws"),
        ts.token_count_regex("text").alias("re"),
    ).collect()
    assert (got[0].ws, got[0].re) == (3, 3)
    # 'hello' ',' 'world' '!' -> 4 regex tokens, 2 ws tokens
    assert (got[1].ws, got[1].re) == (2, 4)


def test_lang_id_deterministic_and_sensible(spark):
    df = spark.createDataFrame(
        [
            ("the cat is in the house",),
            ("der hund ist nicht mit ein",),
            ("el que es en un los y por",),
            ("xyzzy plugh",),  # zero hits everywhere -> en by priority
        ],
        "text string",
    )
    got = [r.pred for r in df.select(ts.lang_id("text").alias("pred")).collect()]
    assert got == ["en", "de", "es", "en"]


def test_quality_score_bounds(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    mm = docs.select(
        F.min(ts.quality_score("text")).alias("lo"),
        F.max(ts.quality_score("text")).alias("hi"),
    ).first()
    assert 0.0 <= mm.lo <= mm.hi <= 1.0


def _py_hash48(s: str, salt: int | None = None) -> int:
    import hashlib

    if salt is not None:
        s = f"{salt}:{s}"
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_fingerprints_match_python_twin(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame([(base,)], "text string")
    row = df.select(
        ts.doc_fingerprint("text").alias("fp"),
        ts.rolling_fingerprint("text", 3).alias("rfp"),
    ).first()
    assert row.fp == _py_hash48(base)
    toks = base.split()
    shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    assert row.rfp == min(_py_hash48(s, salt=0) for s in shingles)
    # a distant edit keeps the fingerprint iff the minimizing shingle survives
    edited = base + " iota"
    row2 = spark.createDataFrame([(edited,)], "text string").select(
        ts.rolling_fingerprint("text", 3).alias("rfp")
    ).first()
    toks2 = edited.split()
    sh2 = {" ".join(toks2[i : i + 3]) for i in range(len(toks2) - 2)}
    assert row2.rfp == min(_py_hash48(s, salt=0) for s in sh2)


def test_repetition_ratio_planted_and_twin(spark, sf_dir):
    """Planted loops score high, varied text scores 0, and the DuckDB
    twin agrees bit-for-bit on the fixture corpus."""
    import duckdb

    df = spark.createDataFrame(
        [
            # bigrams: 5 occurrences, 2 distinct -> 3 repeats -> 0.6
            ("buy now buy now buy now",),
            ("alpha beta gamma delta",),  # no repeats
            ("one",),  # shorter than n -> 0
        ],
        "text string",
    )
    got = [
        r.rr for r in df.select(ts.repetition_ratio("text").alias("rr")).collect()
    ]
    assert got[0] == round(3 / 5, 6)
    assert got[1] == 0.0
    assert got[2] == 0.0

    docs = load_table(spark, sf_dir, "documents")
    got_fix = {
        r.doc_id: r.rr
        for r in docs.select(
            "doc_id", ts.repetition_ratio("text").alias("rr")
        ).collect()
    }
    con = duckdb.connect()
    want_fix = dict(
        con.execute(
            f"SELECT doc_id, {ts.repetition_ratio_sql('text')} "
            f"FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    )
    assert got_fix == want_fix


def test_unigram_lm_scores_semantics_and_twin(spark, sf_dir):
    """A document made of the corpus's commonest tokens out-scores one
    made of rare tokens; n_tokens matches the whitespace count; ppl is
    exp(-avg_logprob); and the DuckDB twin agrees bit-for-bit on the
    fixture corpus."""
    import math

    import duckdb

    docs = load_table(spark, sf_dir, "documents")
    rows = {r.doc_id: r for r in ts.unigram_lm_scores(docs).collect()}
    n_ws = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", ts.token_count_ws("text").alias("n")
        ).collect()
    }
    assert set(rows) == set(n_ws)
    for doc_id, r in rows.items():
        assert r.n_tokens == n_ws[doc_id]
        assert r.ppl == round(math.exp(-r.avg_logprob) + 0, 6) or abs(
            r.ppl - math.exp(-r.avg_logprob)
        ) < 1e-4  # both rounded from the same unrounded value
        assert r.avg_logprob < 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        int(i): (int(n), a, p)
        for i, n, a, p in con.execute(ts.unigram_lm_oracle_sql()).fetchall()
    }
    got = {i: (r.n_tokens, r.avg_logprob, r.ppl) for i, r in rows.items()}
    assert got == want

    # planted contrast: common-token doc beats rare-token doc
    planted = spark.createDataFrame(
        [(1, "the the the the"), (2, "zzqxj9v7 zzqxj9v7 qqwwzz17 vvkkpp23")],
        "doc_id long, text string",
    )
    both = docs.select("doc_id", "text").union(
        planted.select(F.col("doc_id") + 1_000_000, "text")
    )
    s = {r.doc_id: r.avg_logprob for r in ts.unigram_lm_scores(both).collect()}
    assert s[1_000_001] > s[1_000_002]


def test_unigram_lm_plan_shape(spark, sf_dir):
    """Vocab joins back by broadcast (default) and the whole pipeline
    stays JVM-side — no Python evaluation anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        ts.unigram_lm_scores(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_source_kl_divergence_semantics_and_twin(spark, sf_dir):
    """KL >= 0 (up to quantization), a planted disjoint-vocabulary
    source dominates every natural source, and the DuckDB twin agrees
    bit-for-bit."""
    import duckdb

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    rows = {r.source: r for r in ts.source_kl_divergence(docs).collect()}
    assert all(r.kl >= -1e-6 for r in rows.values())  # Gibbs, quantized

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        s: (int(n), k)
        for s, n, k in con.execute(ts.source_kl_oracle_sql()).fetchall()
    }
    got = {s: (r.n_tokens, r.kl) for s, r in rows.items()}
    assert got == want

    alien = spark.createDataFrame(
        [(900_000 + i, "zz%d qq%d vv%d" % (i, i, i), "alien")
         for i in range(10)],
        "doc_id long, text string, source string",
    )
    both = docs.union(alien)
    kl2 = {r.source: r.kl for r in ts.source_kl_divergence(both).collect()}
    assert kl2["alien"] > max(v for s, v in kl2.items() if s != "alien")


def test_source_kl_is_full_vocabulary_kl(spark):
    """Pin the TRUE-KL semantics (ADVICE r6: the r6 version truncated
    the sum to stratum-present terms): on a tiny fixture the result
    must equal a brute-force Python KL computed over the FULL shared
    vocabulary — including terms absent from the stratum, whose
    smoothed probability 1/(n_s+V) is nonzero. The truncated variant
    differs on this fixture (vocabularies only partially overlap), so
    the equality is discriminating."""
    import math
    from collections import Counter

    data = [
        (0, "a a b c", "s1"),
        (1, "a b b d", "s1"),
        (2, "c d d e e e", "s2"),
        (3, "f f g", "s2"),
    ]
    docs = spark.createDataFrame(data, "doc_id long, text string, source string")
    got = {r.source: r.kl for r in ts.source_kl_divergence(docs).collect()}

    per_src: dict[str, Counter] = {}
    corpus: Counter = Counter()
    for _, text, src in data:
        toks = text.split(" ")
        per_src.setdefault(src, Counter()).update(toks)
        corpus.update(toks)
    V = len(corpus)
    N = sum(corpus.values())
    for src, cnt in per_src.items():
        n_s = sum(cnt.values())
        full = sum(
            ((cnt[t] + 1) / (n_s + V))
            * math.log(((cnt[t] + 1) / (n_s + V)) / ((corpus[t] + 1) / (N + V)))
            for t in corpus  # FULL vocabulary, absent terms included
        )
        assert abs(got[src] - full) < 1e-6, (src, got[src], full)
        truncated = sum(
            ((cnt[t] + 1) / (n_s + V))
            * math.log(((cnt[t] + 1) / (n_s + V)) / ((corpus[t] + 1) / (N + V)))
            for t in cnt
        )
        assert abs(truncated - full) > 1e-4  # the fixture discriminates


def test_gopher_rules_planted_cases(spark):
    """Each published Gopher rule (Rae et al. 2021 A1.1) is exercised by
    a doc planted to fail exactly that rule; a clean long doc passes all."""
    good = " ".join(
        ["the quick brown fox jumps over that lazy dog have with"] * 6
    )  # 60 words, all alpha, 2+ stopwords, sane lengths
    cases = [
        # (text, failing_flag)
        ("too short of the", "pass_word_count"),
        (" ".join(["a"] * 60) + " the of", "pass_word_len"),  # mean len < 3
        (" ".join(["###"] * 30) + " " + good, "pass_symbol"),
        ("\n".join(["- bullet line the of have"] * 10) + "\nplain", None),
        ("\n".join(["- b"] * 20), "pass_bullet"),
        ("\n".join([good + "..."] * 10), "pass_ellipsis"),
        (" ".join(["1234"] * 55) + " the of and be that", "pass_alpha"),
        (" ".join(["zebra yak xylo walrus vole umbra"] * 10), "pass_stop"),
        (good, None),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "doc_id long, text string"
    )
    flg = ts.gopher_flags("text")
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in flg.items()]
        ).collect()
    }
    for i, (_, fail) in enumerate(cases):
        r = rows[i]
        if fail is not None:
            assert getattr(r, fail) == 0, (i, fail, r)
            assert r.gopher_pass == 0
    assert rows[len(cases) - 1].gopher_pass == 1, rows[len(cases) - 1]
    # the 90%-bullet boundary: 10 of 11 lines bulleted = 0.909... > 0.9 fails,
    # planted case index 3 has 10 of 11 -> exactly 0.909091 -> fails bullet
    assert rows[3].pass_bullet == 0


def test_gopher_signals_match_duckdb_twin(spark, sf_dir):
    """Value-level twin check on the real fixture (the oracle gate runs
    the same comparison at sf0.01; this pins it at the unit level)."""
    import duckdb

    docs = load_table(spark, sf_dir, "documents")
    sig = ts.gopher_signals("text")
    got = {
        r.doc_id: (r.word_count, r.mean_word_len, r.stop_hits)
        for r in docs.select(
            "doc_id", *[v.alias(k) for k, v in sig.items()]
        ).collect()
    }
    s = ts.gopher_signals_sql("text")
    con = duckdb.connect()
    exp = {
        row[0]: (row[1], row[2], row[3])
        for row in con.execute(
            f"SELECT doc_id, {s['word_count']}, {s['mean_word_len']}, "
            f"{s['stop_hits']} FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    }
    assert got == exp


def test_vocab_stats_planted():
    """Hand-computable corpus: counts, hapax, modal token + tie-break."""
    from vector_search_test_spark.session import get_session

    spark = get_session("t", shuffle_partitions=4)
    df = spark.createDataFrame(
        [
            (0, "a a b c", "s1"),   # s1: a:3, b:2, c:1, d:1
            (1, "a b d", "s1"),
            (2, "x x y", "s2"),     # s2: x:2, y:1 -> modal x
        ],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in ts.vocab_stats_per_source(df).collect()}
    s1 = got["s1"]
    assert (s1.n_tokens, s1.n_types, s1.n_hapax) == (7, 4, 2)
    assert s1.top_tok == "a" and abs(s1.top_frac - 3 / 7) < 1e-6
    assert abs(s1.ttr - 4 / 7) < 1e-6 and abs(s1.hapax_frac - 0.5) < 1e-6
    s2 = got["s2"]
    assert (s2.n_tokens, s2.n_types, s2.n_hapax) == (3, 2, 1)
    assert s2.top_tok == "x"
    # tie-break: equal counts -> lexicographically first token wins
    df2 = spark.createDataFrame(
        [(0, "b a", "s")], "doc_id long, text string, source string"
    )
    assert ts.vocab_stats_per_source(df2).first().top_tok == "a"


def test_bigram_lm_planted_and_hand_computed(spark):
    """Hand-computed probabilities on a 2-doc corpus; a doc reusing the
    corpus's common transition scores better than a reversed one."""
    import math

    data = [
        (0, "a b a b", "s"),  # bigrams: ab, ba, ab
        (1, "b a", "s"),      # ba
    ]
    df = spark.createDataFrame(data, "doc_id long, text string, source string")
    got = {r.doc_id: r for r in ts.bigram_lm_scores(df).collect()}
    # unigrams: a:3, b:3, N=6, V=2 ; c1(a)=c1(b)=3
    # c2(a,b)=2, c2(b,a)=2
    lam, om = 0.7, 0.3
    p_ab = lam * 2 / 3 + om * (3 + 1) / (6 + 2)
    p_ba = p_ab
    q = round(math.log(p_ab) * 1e12)
    alp0 = (q * 3 / 1e12) / 3
    assert got[0].n_bigrams == 3
    assert abs(got[0].avg_logprob - round(alp0, 6)) < 1e-9
    assert abs(got[0].ppl - round(math.exp(-alp0), 6)) < 1e-9
    assert got[1].n_bigrams == 1
    # single-token doc has no bigrams -> excluded
    df2 = spark.createDataFrame(
        [(9, "hello", "s")] + data, "doc_id long, text string, source string"
    )
    assert {r.doc_id for r in ts.bigram_lm_scores(df2).collect()} == {0, 1}
    # planted: common-transition doc beats the rare-transition doc
    base = [(i, "the cat sat on the mat", "s") for i in range(5)]
    probe = [(100, "the cat sat", "s"), (101, "sat cat the", "s")]
    df3 = spark.createDataFrame(
        base + probe, "doc_id long, text string, source string"
    )
    got3 = {r.doc_id: r.ppl for r in ts.bigram_lm_scores(df3).collect()}
    assert got3[100] < got3[101]


# ---------------------------------------------------------------------------
# C4 heuristics (Raffel et al. 2020 §2.2; textstats.py::c4_signals/c4_flags)
# ---------------------------------------------------------------------------

_C4_DOCS = [
    # passes everything: 5 sentences, terminal-punct >=3-word lines
    (0, "one two three.\nfour five six!\nseven eight nine?\n"
        "ten eleven twelve.\nlast full line here."),
    (1, "short.\nno"),                          # <5 sentences, short lines
    (2, "Lorem Ipsum dolor sit amet. a b c. d e f. g h i. j k l."),
    (3, "var x = { a: 1 }. one. two. three. four five."),   # brace
    (4, "enable javascript to view this.\none two three here.\n"
        "four five six more.\nseven eight nine.\nten eleven twelve."),
    (5, "buy viagra now. a b c. d e f. g h i. j k l m."),   # badword
    (6, ""),                                    # empty doc
    (7, "win big at the casino. a b c. d e f. g h i. j k l."),
    # CRLF document (ADVICE r10): without the \r strip, Java regex `$`
    # matches before the trailing \r (lines kept) while DuckDB's RE2 `$`
    # does not (lines dropped) — this doc pins the cross-engine parity
    (8, "one two three.\r\nfour five six!\r\nseven eight nine?\r\n"
        "ten eleven twelve.\r\nlast full line here."),
]


def test_c4_signals_match_duckdb(spark):
    import duckdb

    df = spark.createDataFrame(_C4_DOCS, "doc_id long, text string")
    sig = ts.c4_signals("text")
    flg = ts.c4_flags("text")
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
    con.executemany("INSERT INTO d VALUES (?, ?)", _C4_DOCS)
    cols = ", ".join(
        [f"{v} AS {k}" for k, v in ts.c4_signals_sql("text").items()]
        + [f"{v} AS {k}" for k, v in ts.c4_flags_sql("text").items()]
    )
    want = set(con.execute(f"SELECT doc_id, {cols} FROM d").fetchall())
    assert got == want


def test_c4_flags_semantics(spark):
    df = spark.createDataFrame(_C4_DOCS, "doc_id long, text string")
    flg = ts.c4_flags("text")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in flg.items()]
        ).collect()
    }
    assert out[0].c4_pass == 1
    assert out[1].pass_sentences == 0 and out[1].c4_pass == 0
    assert out[2].pass_lorem == 0
    assert out[3].pass_brace == 0
    # the javascript rule is a LINE filter: doc 4's other four lines
    # survive (page passes lines) while the js line itself is excluded
    # from kept_line_frac — exactly 4/5
    assert out[4].pass_lines == 1
    sig = ts.c4_signals("text")
    k4 = (
        df.filter(F.col("doc_id") == 4)
        .select(sig["kept_line_frac"].alias("f"))
        .first()
        .f
    )
    assert abs(k4 - 0.8) < 1e-9
    assert out[5].pass_badword == 0
    assert out[6].pass_lines == 0 and out[6].c4_pass == 0
    # punctuation-adjacent badword ('casino.') must still trip the
    # page filter — the rule is CONTAINS, not token equality
    assert out[7].pass_badword == 0
    # CRLF doc: all 5 lines end in terminal punctuation once \r is
    # stripped — it must PASS (and match DuckDB, via the twin test)
    assert out[8].c4_pass == 1


def test_c4_projection_is_scan_only(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sig = ts.c4_signals("text")
    plan = (
        docs.select("doc_id", *[v.alias(k) for k, v in sig.items()])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer et al. 2003;
# textstats.py::winnowing_fingerprints)
# ---------------------------------------------------------------------------


def _py_winnow(text, k=3, w=4):
    """Independent pure-Python reimplementation of the winnowing scheme
    (same hash48 family member) — the cross-implementation oracle."""
    import hashlib

    toks = text.lower().split(" ")
    if len(toks) >= k:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    else:
        grams = [" ".join(toks)]
    h = [
        int(hashlib.md5(f"0:{g}".encode()).hexdigest()[:12], 16)
        for g in grams
    ]
    wl = min(w, len(h))
    out = set()
    for i in range(len(h) - wl + 1):
        mn = min(h[i : i + wl])
        pos = max(j for j in range(i, i + wl) if h[j] == mn)
        out.add((pos, h[pos]))
    return out


def test_winnowing_matches_pure_python(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "a b a b a b a b a b"),  # heavy hash ties -> tie rule exercised
        (2, "one two"),              # shorter than k -> single whole gram
        (3, "x"),                    # single token
        (4, "p q r s"),              # fewer grams than w -> one window
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in ts.winnowing_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for i, t in texts:
        assert got[i] == _py_winnow(t), f"doc {i}"


def test_winnowing_matches_duckdb_on_fixture(spark, sf_dir):
    import duckdb

    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        (r.doc_id, r.pos, r.fp)
        for r in ts.winnowing_fingerprints(docs).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        (int(d), int(p), int(f))
        for d, p, f in con.execute(ts.winnowing_oracle_sql()).fetchall()
    )
    assert got == want
    # density sanity: winnowing keeps ~2/(w+1) of grams, never all of them
    n_grams = docs.select(
        F.sum(F.greatest(ts.token_count_ws("text") - 2, F.lit(1)))
    ).first()[0]
    assert 0 < len(got) < n_grams


def test_winnowing_shared_run_guarantee(spark):
    """Paper §3: two documents sharing a run of >= w + k - 1 words share
    at least one selected fingerprint."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 = w + k - 1 words
    df = spark.createDataFrame(
        [
            (0, f"unrelated prefix words here {shared} trailing bits"),
            (1, f"{shared} completely different suffix content"),
        ],
        "doc_id long, text string",
    )
    fps = {}
    for r in ts.winnowing_fingerprints(df).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[0] & fps[1]


def test_winnowing_is_scan_only(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        ts.winnowing_fingerprints(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_winnowing_rejects_bad_params(spark, sf_dir):
    import pytest

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        ts.winnowing_fingerprints(docs, w=0)
    with pytest.raises(ValueError):
        ts.winnowing_fingerprints(docs, k=0)


# ---------------------------------------------------------------------------
# CCNet perplexity buckets (Wenzek et al. 2020; textstats.py::ppl_buckets)
# ---------------------------------------------------------------------------


def test_ppl_buckets_balanced_and_ordered(spark):
    """Per-source thirds: sizes differ by at most 1, every head ppl <=
    every middle ppl <= every tail ppl, and the planted word-salad doc
    lands in the tail."""
    base = [(i, "the cat sat on the mat", "s") for i in range(8)]
    salad = [(100, "mat the on sat cat the", "s")]
    df = spark.createDataFrame(
        base + salad, "doc_id long, text string, source string"
    )
    rows = ts.ppl_buckets(df).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r.ppl)
    sizes = sorted(len(v) for v in by_bucket.values())
    assert max(sizes) - min(sizes) <= 1
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    assert next(r.bucket for r in rows if r.doc_id == 100) == "tail"


def test_ppl_buckets_matches_duckdb_on_fixture(spark, sf_dir):
    import duckdb

    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        (r.doc_id, r.source, r.ppl, r.bucket)
        for r in ts.ppl_buckets(docs).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        (int(d), s, float(p), b)
        for d, s, p, b in con.execute(ts.ppl_buckets_oracle_sql()).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# PMI collocations (Mikolov et al. 2013; textstats.py::pmi_phrases)
# ---------------------------------------------------------------------------


def test_pmi_phrases_planted_collocation(spark):
    """A pair that always co-occurs outranks independent pairs, and the
    hand-computed PMI matches ln(N * c2 / (c1u * c1v))."""
    import math

    docs = [(i, "new york " + " ".join(["w%d x%d" % (i, j) for j in range(3)]), "s") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    rows = ts.pmi_phrases(df, min_count=3, top_n=5).collect()
    assert rows[0].u == "new" and rows[0].v == "york"
    n_total = 6 * 8  # 8 tokens per doc
    want = round(round(math.log((6 * n_total) / (6 * 6)) * 1e12) / 1e12, 6)
    assert abs(rows[0].pmi - want) < 1e-9
    assert rows[0].pair_count == 6


def test_pmi_phrases_ignores_empty_tokens(spark):
    """ADVICE r10: repeated whitespace must not mint '' unigrams or
    ('', w) bigrams — 'a  b' (double space) reads as the pair (a, b),
    and N counts only real words. Pinned by hand-PMI on a doubled-space
    corpus and by the DuckDB twin on the same rows."""
    import math

    import duckdb

    rows = [
        (0, "new  york  new  york  new  york", "s"),  # all double-spaced
        (1, "foo   bar", "s"),                        # triple space
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = [
        (r.u, r.v, r.pair_count, r.pmi)
        for r in ts.pmi_phrases(df, min_count=1, top_n=10).collect()
    ]
    assert all(u != "" and v != "" for u, v, _, _ in got)
    # N = 8 real tokens; ('new','york') c2=3, c1=3 each; ('foo','bar') once
    by_pair = {(u, v): (c, p) for u, v, c, p in got}
    assert by_pair[("new", "york")][0] == 3
    want = round(round(math.log((3 * 8) / (3 * 3)) * 1e12) / 1e12, 6)
    assert abs(by_pair[("new", "york")][1] - want) < 1e-9
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want_rows = [
        (u, v, int(c), float(p))
        for u, v, c, p in con.execute(
            ts.pmi_phrases_oracle_sql(min_count=1, top_n=10)
        ).fetchall()
    ]
    assert got == want_rows


def test_pmi_phrases_min_count_filters(spark):
    df = spark.createDataFrame(
        [(0, "a b a b a b", "s"), (1, "c d", "s")],
        "doc_id long, text string, source string",
    )
    got = {(r.u, r.v) for r in ts.pmi_phrases(df, min_count=2, top_n=10).collect()}
    assert ("c", "d") not in got  # seen once: below support
    assert ("a", "b") in got


def test_pmi_phrases_matches_duckdb_on_fixture(spark, sf_dir):
    import duckdb

    docs = load_table(spark, sf_dir, "documents")
    got = [
        (r.u, r.v, r.pair_count, r.pmi)
        for r in ts.pmi_phrases(docs).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = [
        (u, v, int(c), float(p))
        for u, v, c, p in con.execute(ts.pmi_phrases_oracle_sql()).fetchall()
    ]
    assert got == want and len(got) == 50  # ORDER preserved, not just set

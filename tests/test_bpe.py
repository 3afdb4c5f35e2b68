"""BPE merge training tests (operators/bpe.py — Sennrich et al. 2016).

The merge fold is the subtle part: greedy left-to-right non-overlapping,
runs of identical symbols merge floor(run/2) times. Pinned against
hand-written cases, a pure-Python reference, and the DuckDB unrolled
twin on the fixture.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.bpe import (
    bpe_merges,
    bpe_merges_oracle_sql,
    merge_pair,
)


def _py_merge(s, a, b):
    out, pend = [], ""
    for x in s:
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
    return out


def _py_bpe(texts, rounds=8):
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                vocab[w] += 1
    syms = {w: list(w) for w in vocab}
    merges = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for w, c in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, a + b, c))
        syms = {w: _py_merge(s, a, b) for w, s in syms.items()}
    return merges


def test_merge_pair_cases(spark):
    cases = [
        (["a", "a", "a"], "a", "a", ["aa", "a"]),
        (["a", "a", "a", "a"], "a", "a", ["aa", "aa"]),
        (["a", "b", "a", "b"], "a", "b", ["ab", "ab"]),
        (["n", "e", "w"], "e", "w", ["n", "ew"]),
        (["x"], "a", "b", ["x"]),
        (["b", "a", "b"], "a", "b", ["b", "ab"]),
    ]
    df = spark.createDataFrame(
        [(s, a, b) for s, a, b, _ in cases],
        "s array<string>, a string, b string",
    )
    got = [
        r.m
        for r in df.select(
            merge_pair(F.col("s"), F.col("a"), F.col("b")).alias("m")
        ).collect()
    ]
    assert got == [w for *_, w in cases]
    for s, a, b, w in cases:
        assert _py_merge(s, a, b) == w  # the reference agrees with itself


def test_bpe_matches_pure_python(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wider wide wide new",
        "aaaa aaa aa a",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = sorted(tuple(r) for r in bpe_merges(df, rounds=6).collect())
    want = sorted(_py_bpe(texts, rounds=6))
    assert got == want


def test_bpe_matches_duckdb_on_fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = sorted(tuple(r) for r in bpe_merges(docs).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        (int(r), a, b, m, int(c))
        for r, a, b, m, c in con.execute(bpe_merges_oracle_sql()).fetchall()
    )
    assert got == want and len(got) == 8
    # merges compound: later rounds may reuse earlier merged symbols
    assert all(m == a + b for _, a, b, m, _ in got)


def test_bpe_early_stop_on_fused_vocab(spark):
    # single-char words only: no adjacent pairs exist -> zero merges
    df = spark.createDataFrame([("a b c a",)], "text string")
    assert bpe_merges(df, rounds=4).count() == 0


def test_bpe_rejects_bad_rounds(spark):
    df = spark.createDataFrame([("ab",)], "text string")
    with pytest.raises(ValueError):
        bpe_merges(df, rounds=0)


def test_bpe_fertility_hand_computed(spark):
    """One source, known merges: 'ab ab abc d' with 2 rounds merges
    (a,b) then (ab,c): subword counts 1, 1, 1, 1 -> fertility 1.0;
    verify against the pure-Python replay too."""
    from vector_search_test_spark.operators.bpe import bpe_fertility

    df = spark.createDataFrame(
        [(0, "ab ab abc d", "s")], "doc_id long, text string, source string"
    )
    r = bpe_fertility(df, rounds=2).collect()[0]
    # round 1 merges (a,b) [count 3]; round 2 merges (ab,c) [count 1]
    assert (r.source, r.n_words, r.n_subwords, r.fertility) == (
        "s", 4, 4, 1.0,
    )


def test_bpe_fertility_matches_duckdb_on_fixture(spark, sf_dir):
    from vector_search_test_spark.operators.bpe import (
        bpe_fertility,
        bpe_fertility_oracle_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = sorted(tuple(r) for r in bpe_fertility(docs).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        (s, int(nw), int(ns), float(f))
        for s, nw, ns, f in con.execute(bpe_fertility_oracle_sql()).fetchall()
    )
    assert got == want and len(got) > 0
    # more merges can only reduce (or keep) total subword counts
    fewer = {r.source: r.n_subwords for r in bpe_fertility(docs, rounds=2).collect()}
    more = {r.source: r.n_subwords for r in bpe_fertility(docs, rounds=8).collect()}
    assert all(more[s] <= fewer[s] for s in fewer)


def test_bpe_fertility_oracle_survives_early_exhaustion(spark, tmp_path):
    """Review finding (r10): with merges exhausted before `rounds`, the
    replay CTE chain must NOT wipe the vocabulary — the bx{r} no-op
    sentinel keeps it intact and both engines agree."""
    from vector_search_test_spark.operators.bpe import (
        bpe_fertility,
        bpe_fertility_oracle_sql,
    )

    df = spark.createDataFrame(
        [(0, "ab ab ab c d", "s")], "doc_id long, text string, source string"
    )
    got = sorted(tuple(r) for r in bpe_fertility(df, rounds=8).collect())
    pq = str(tmp_path / "docs.parquet")
    df.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    want = sorted(
        (s, int(nw), int(ns), float(f))
        for s, nw, ns, f in con.execute(
            bpe_fertility_oracle_sql(rounds=8)
        ).fetchall()
    )
    assert got == want == [("s", 5, 5, 1.0)]


def test_bpe_excludes_separator_words_both_engines(spark, tmp_path):
    """Review finding (r10): words containing chr(31) (the oracle's
    accumulator separator) are excluded from the vocabulary on BOTH
    sides, so the engines keep agreeing when the corpus carries US
    control characters."""
    df = spark.createDataFrame(
        [(0, "a\x1fb a\x1fb cc cc cc", "s")],
        "doc_id long, text string, source string",
    )
    got = sorted(tuple(r) for r in bpe_merges(df, rounds=3).collect())
    pq = str(tmp_path / "docs.parquet")
    df.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    want = sorted(
        (int(r), a, b, m, int(c))
        for r, a, b, m, c in con.execute(
            bpe_merges_oracle_sql(rounds=3)
        ).fetchall()
    )
    assert got == want == [(1, "c", "c", "cc", 3)]


def test_bpe_encode_planted(spark):
    """Known merges over a tiny doc set: exact tokens, counts, md5."""
    import hashlib

    from vector_search_test_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [
            (0, "ab ab"),          # both words merge fully
            (1, "aab b"),          # greedy: [a, ab] + [b]
            (2, ""),               # no valid words
            (3, "AB"),             # lowercased then merged
        ],
        "doc_id long, text string",
    )
    out = {
        r.id: r for r in bpe_encode(docs, merges=[("a", "b")]).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert (out[0].n_words, out[0].n_chars, out[0].n_subwords) == (2, 4, 2)
    assert out[0].fertility == 1.0
    assert out[0].tokens_md5 == md5("ab ab")
    assert (out[1].n_words, out[1].n_subwords) == (2, 3)
    assert out[1].tokens_md5 == md5("a ab b")
    assert out[1].fertility == 1.5
    # empty doc: a row with zero counts, NULL fertility, md5('')
    assert (out[2].n_words, out[2].n_subwords) == (0, 0)
    assert out[2].fertility is None
    assert out[2].tokens_md5 == md5("")
    assert out[3].tokens_md5 == md5("ab")


def test_bpe_encode_run_semantics_match_merge_pair(spark):
    """Runs of the merged pair collapse exactly like merge_pair /
    subword-nmt: [a,a,a] -> [aa, a]."""
    import hashlib

    from vector_search_test_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame([(0, "aaa aaaa")], "doc_id long, text string")
    r = bpe_encode(docs, merges=[("a", "a")]).collect()[0]
    assert r.n_subwords == 4  # [aa, a] + [aa, aa]
    assert r.tokens_md5 == hashlib.md5(b"aa a aa aa").hexdigest()


def test_bpe_encode_reproduces_fertility(spark, sf_dir):
    """VERDICT r14 next-#4 done-criterion: applying the TRAINED merges
    with bpe_encode reproduces bpe_fertility's per-source token counts
    exactly — the zero-shuffle per-occurrence folds and the
    vocab-joined Heaps path are the same tokenizer."""
    from pyspark.sql import functions as F

    from vector_search_test_spark.io import load_table
    from vector_search_test_spark.operators.bpe import (
        bpe_encode,
        bpe_fertility,
        bpe_merges,
    )

    docs = load_table(spark, sf_dir, "documents").limit(300)
    trained = [
        (r.left, r.right)
        for r in bpe_merges(docs, rounds=4).orderBy("round").collect()
    ]
    want = {
        r.source: (r.n_words, r.n_subwords, r.fertility)
        for r in bpe_fertility(docs, merges=trained).collect()
    }
    enc = bpe_encode(docs, merges=trained).join(
        docs.select(F.col("doc_id").alias("id"), "source"), "id"
    )
    got = {
        r.source: (r.n_words, r.n_subwords, r.fertility)
        for r in enc.groupBy("source")
        .agg(
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_subwords").cast("long").alias("n_subwords"),
        )
        .select(
            "source",
            "n_words",
            "n_subwords",
            F.round(F.col("n_subwords") / F.col("n_words"), 6).alias(
                "fertility"
            ),
        )
        .collect()
    }
    assert got == want


def test_bpe_encode_unicode_matches_jvm_split(spark):
    """The r16 Arrow kernel's Python char split + fold must agree with
    the JVM merge_pair fold on non-ASCII text, including an
    astral-plane code point (F.split(w, '') and Python list(w) must
    both split on CODE POINTS, never surrogate halves)."""
    import hashlib

    from vector_search_test_spark.operators.bpe import bpe_encode, merge_pair

    text = "café \U0001f600a\U0001f600 ßßx"
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    merges = [("\U0001f600", "a"), ("ß", "ß")]
    r = bpe_encode(docs, merges=merges).collect()[0]

    # JVM reference: fold each word with merge_pair itself
    words = spark.createDataFrame(
        [(w,) for w in text.lower().split(" ")], "w string"
    )
    sym = F.split("w", "")
    for a, b in merges:
        sym = merge_pair(sym, F.lit(a), F.lit(b))
    jvm = [r2.toks for r2 in words.select(sym.alias("toks")).collect()]
    flat = [t for toks in jvm for t in toks]
    assert r.n_subwords == len(flat)
    assert r.n_chars == sum(len(w) for w in text.lower().split(" "))
    assert r.tokens_md5 == hashlib.md5(" ".join(flat).encode()).hexdigest()

"""Unigram-LM tokenizer trainer (operators/unigram.py) — the Viterbi-EM
family next to BPE. The load-bearing assertions:

- the Spark trainer and the engine-free Python twin agree EXACTLY on
  (keys, costs) — the agreement the oracle literals depend on;
- the DP is provably optimal: brute-force enumeration of every
  segmentation of every fixture word confirms min (cost, seg);
- corpus application (fertility) agrees with recomputing from the
  trainer's own segmentations — the cross-check VERDICT r15 next-#7
  names.
"""

import math

import pytest
from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.unigram import (
    _BIG,
    _m_step,
    seed_candidates,
    unigram_apply,
    unigram_fertility,
    unigram_train,
    unigram_train_py,
    viterbi_segment_py,
    viterbi_state,
    word_vocab,
)


def _fixture_word_counts(spark, sf_dir):
    rows = word_vocab(load_table(spark, sf_dir, "documents")).collect()
    return {r.w: int(r.cnt) for r in rows}


def test_spark_trainer_matches_python_twin(spark, sf_dir):
    """The whole EM loop, engine vs engine-free: same seeding, same
    per-round counts/pruning, same final keys AND integer costs."""
    wc = _fixture_word_counts(spark, sf_dir)
    keys_py, costs_py, counts_py = unigram_train_py(
        wc, vocab_size=64, rounds=3, max_len=4
    )
    out, keys_sp, costs_sp = unigram_train(
        load_table(spark, sf_dir, "documents"),
        vocab_size=64,
        rounds=3,
        max_len=4,
    )
    assert keys_sp == keys_py
    assert costs_sp == costs_py
    got = {r.piece: int(r.n_occ) for r in out.collect()}
    assert got == {k: counts_py.get(k, 0) for k in keys_py}


def test_viterbi_dp_is_optimal_vs_bruteforce(spark, sf_dir):
    """Enumerate EVERY segmentation of every fixture word (lengths
    <= 8, pieces <= 4 chars) and confirm the DP returns the minimum
    (cost, seg-string) — both the Python twin and the Spark fold."""
    wc = _fixture_word_counts(spark, sf_dir)
    keys, costs, _ = unigram_train_py(wc, vocab_size=64, rounds=2)
    key_pos = {k: i + 1 for i, k in enumerate(keys)}

    def all_segs(w):
        if not w:
            yield (0, [])
            return
        for l in range(1, min(4, len(w)) + 1):
            p = w[:l]
            pos = key_pos.get(p, 0)
            if pos <= 0:
                continue
            for c, rest in all_segs(w[l:]):
                yield (costs[pos - 1] + c, [p] + rest)

    words = sorted(wc)
    expected = {}
    for w in words:
        best = min((c, " ".join(s)) for c, s in all_segs(w))
        got_c, got_pieces = viterbi_segment_py(w, key_pos, costs, 4)
        assert (got_c, " ".join(got_pieces)) == best, w
        expected[w] = best

    df = spark.createDataFrame([(w,) for w in words], "w string")
    st = df.select(
        "w", viterbi_state(F.col("w"), keys, costs, 4).alias("st")
    ).collect()
    for r in st:
        assert (int(r.st.c), r.st.seg) == expected[r.w], r.w


def test_fertility_cross_check(spark, sf_dir):
    """unigram_fertility (distinct-word DP + join-back) reproduces the
    per-source fertility recomputed directly from the Python twin's
    segmentations — and subwords per word is always >= 1."""
    wc = _fixture_word_counts(spark, sf_dir)
    keys, costs, _ = unigram_train_py(wc, vocab_size=64, rounds=3)
    key_pos = {k: i + 1 for i, k in enumerate(keys)}
    np = {
        w: len(viterbi_segment_py(w, key_pos, costs, 4)[1]) for w in wc
    }

    docs = load_table(spark, sf_dir, "documents")
    exp = {}
    for r in docs.select("source", "text").collect():
        s = exp.setdefault(r.source, [0, 0])
        for w in r.text.lower().split(" "):
            if w:
                s[0] += 1
                s[1] += np[w]
    got = unigram_fertility(docs, keys, costs).collect()
    assert len(got) == len(exp)
    for r in got:
        n_w, n_sub = exp[r.source]
        assert (int(r.n_words), int(r.n_subwords)) == (n_w, n_sub)
        assert r.fertility == round(n_sub / n_w, 6) >= 1.0


def test_em_objective_non_increasing(spark, sf_dir):
    """Hard-EM sanity: the total corpus Viterbi cost under the trained
    costs never increases round over round on the fixture (the
    monotone-improvement property Viterbi-EM is chosen for)."""
    wc = _fixture_word_counts(spark, sf_dir)

    def total_cost(keys, costs):
        key_pos = {k: i + 1 for i, k in enumerate(keys)}
        return sum(
            cnt * viterbi_segment_py(w, key_pos, costs, 4)[0]
            for w, cnt in wc.items()
        )

    totals = []
    for rounds in (1, 2, 3, 4):
        keys, costs, _ = unigram_train_py(wc, vocab_size=64, rounds=rounds)
        totals.append(total_cost(keys, costs))
    assert all(a >= b for a, b in zip(totals, totals[1:])), totals


def test_seed_candidates_rules():
    wc = {"abab": 3, "ba": 2, "c": 1}
    keys, weights = seed_candidates(wc, vocab_size=6, max_len=3)
    # all single chars retained
    assert {"a", "b", "c"} <= set(keys)
    assert len(keys) == 6
    # weights count overlapping occurrences times word frequency
    assert weights["ab"] == 6  # two per 'abab' occurrence, cnt 3
    assert weights["ba"] == 3 + 2
    with pytest.raises(ValueError):
        seed_candidates(wc, vocab_size=3, max_len=3)  # <= alphabet


def test_m_step_cost_formula():
    counts = {"a": 9, "b": 0}
    keys = ["a", "b"]
    costs = _m_step(counts, keys)
    # T=9, V=2: p(a) = 10/11, p(b) = 1/11
    assert costs[0] == int(math.floor(-math.log(10 / 11) * 1e6 + 0.5))
    assert costs[1] == int(math.floor(-math.log(1 / 11) * 1e6 + 0.5))
    assert all(0 < c < _BIG for c in costs)


def test_single_char_words_and_short_words(spark):
    """Words shorter than max_len and single-char words segment
    correctly through the windowed DP (the window-padding edge)."""
    keys = ["a", "ab", "b"]
    costs = [10, 5, 10]
    df = spark.createDataFrame([("a",), ("ab",), ("ba",)], "w string")
    got = {
        r.w: (int(r.st.c), r.st.seg)
        for r in df.select(
            "w", viterbi_state(F.col("w"), keys, costs, 4).alias("st")
        ).collect()
    }
    assert got["a"] == (10, "a")
    assert got["ab"] == (5, "ab")
    assert got["ba"] == (20, "b a")


def test_rounds_validation(spark, sf_dir):
    with pytest.raises(ValueError):
        unigram_train_py({"a": 1}, vocab_size=2, rounds=0)
    with pytest.raises(ValueError):
        unigram_train(
            load_table(spark, sf_dir, "documents"), rounds=0
        )

"""Unicode/robustness hardening of the text suite (VERDICT r3 #7).

Pins byte-vs-char behavior of the text operators on multi-byte,
zero-width, and astral-plane input, and — the part that matters for the
oracle gate — Spark-vs-DuckDB PARITY of every *_sql twin on the same
strings, so the text operators are provably safe to scale to real web
corpora where such input is the norm, not the exception.

Pinned semantics:
- char_count counts CODE POINTS (never UTF-8 bytes, never UTF-16 units):
  one astral emoji = 1, one CJK char = 1 — equal to Python len().
- token_count_ws splits on the single ASCII space only: NBSP (U+00A0),
  zero-width space (U+200B) and tabs do NOT separate tokens.
- token_count_regex treats every non-[a-z0-9 ] code point as its own
  token (Java regex and RE2 are both code-point-based).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from vector_search_test_spark.functions import textstats as ts

ZWSP = "​"
NBSP = " "

SAMPLES = [
    "hello world",
    "héllo wörld",                  # precomposed latin accents
    "café crème",
    "café decomposed",                   # combining accent (e + U+0301)
    "漢字 テスト",         # CJK + katakana
    "emoji \U0001f600 ok",                     # astral plane
    f"zero{ZWSP}width split",                  # ZWSP inside a token
    f"nbsp{NBSP}not a separator",              # NBSP inside a token
    "tabs\tand spaces",
    "ünïcödé!!!",
    "mixed 漢 and latin é2",
    "  leading and trailing  ",
]


@pytest.fixture(scope="module")
def spark_rows(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "doc_id long, text string"
    )
    rows = df.select(
        "doc_id",
        ts.char_count("text").alias("n_chars"),
        ts.token_count_ws("text").alias("tok_ws"),
        ts.token_count_regex("text").alias("tok_re"),
    ).collect()
    return {r.doc_id: r for r in rows}


@pytest.fixture(scope="module")
def duck_rows():
    con = duckdb.connect()
    con.register(
        "docs", pd.DataFrame({"doc_id": range(len(SAMPLES)), "text": SAMPLES})
    )
    rows = con.execute(
        f"""
        SELECT doc_id,
               length(text) AS n_chars,
               {ts.token_count_ws_sql('text')} AS tok_ws,
               {ts.token_count_regex_sql('text')} AS tok_re
        FROM docs
        """
    ).fetchall()
    return {r[0]: r for r in rows}


def test_char_count_is_code_points(spark_rows):
    for i, s in enumerate(SAMPLES):
        assert spark_rows[i].n_chars == len(s), repr(s)


def test_ws_tokenizer_only_ascii_space(spark_rows):
    for i, s in enumerate(SAMPLES):
        assert spark_rows[i].tok_ws == len(s.split(" ")), repr(s)
    # the adversarial rows: invisible "separators" do NOT split
    assert spark_rows[6].tok_ws == 2   # zero<ZWSP>width | split
    assert spark_rows[7].tok_ws == 3   # nbsp<NBSP>not | a | separator


@pytest.mark.parametrize("col", ["n_chars", "tok_ws", "tok_re"])
def test_spark_duckdb_parity_on_unicode(spark_rows, duck_rows, col):
    """The oracle-parity gate: every *_sql twin must agree with its Spark
    expression on multi-byte / zero-width / astral input."""
    idx = {"n_chars": 1, "tok_ws": 2, "tok_re": 3}[col]
    for i, s in enumerate(SAMPLES):
        assert getattr(spark_rows[i], col) == duck_rows[i][idx], (col, repr(s))


def test_quality_and_fingerprint_total_functions(spark):
    """quality_score / punct_ratio / doc_fingerprint stay total (no null,
    no crash) on unicode + whitespace-only + empty input."""
    edge = SAMPLES + ["", "   ", ZWSP, "\U0001f600"]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(edge)], "doc_id long, text string"
    )
    out = df.select(
        ts.quality_score("text").alias("q"),
        ts.punct_ratio("text").alias("p"),
        ts.doc_fingerprint("text").alias("fp"),
    ).collect()
    assert len(out) == len(edge)
    for r in out:
        assert r.q is not None and 0.0 <= r.q <= 1.0
        assert r.p is not None and 0.0 <= r.p <= 1.0
        assert r.fp is not None

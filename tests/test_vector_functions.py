import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_test_spark.functions.vector import cosine_sim, dot, l2_norm, l2_sq
from vector_search_test_spark.functions.hashing import portable_hash48
from vector_search_test_spark.io import load_table


def test_l2_sq_matches_numpy(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings").limit(20).cache()
    rows = df.collect()
    a = np.array(rows[0].embedding, dtype=np.float64)
    got = (
        df.filter(F.col("vec_id") == rows[1].vec_id)
        .select(
            l2_sq(
                F.array(*[F.lit(float(x)).cast("float") for x in rows[0].embedding]),
                F.col("embedding"),
            ).alias("d")
        )
        .first()
        .d
    )
    b = np.array(rows[1].embedding, dtype=np.float64)
    assert got == pytest.approx(float(((a - b) ** 2).sum()), rel=1e-9)


def test_dot_norm_cosine(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])],
        "a array<float>, b array<float>",
    )
    row = df.select(
        dot("a", "b").alias("d"), l2_norm("a").alias("na"), cosine_sim("a", "b").alias("c")
    ).first()
    assert row.d == pytest.approx(32.0)
    assert row.na == pytest.approx(math.sqrt(14.0))
    assert row.c == pytest.approx(32.0 / (math.sqrt(14) * math.sqrt(77)))


def test_dot_unrolled_bitexact_vs_fold(spark):
    """dot_unrolled must produce BIT-identical doubles to the HOF fold
    it replaces (late_interaction's MaxSim hot loop) on exact-width
    arrays — including the -0.0-first-product association the explicit
    0.0D seed preserves — and surface short arrays as an ANSI
    out-of-bounds error (never a silently partial sum)."""
    import struct

    from vector_search_test_spark.functions.vector import dot_unrolled

    cases = [
        ([1.5, -2.25, 3.125, 0.1], [4.0, 5.5, -6.75, 0.3]),
        ([-0.0, 2.0, 3.0, 4.0], [5.0, -0.0, 0.0, 1e-30]),  # -0.0 first product
        ([0.0, 0.0, 0.0, 0.0], [-1.0, 0.0, -0.0, 0.0]),
        ([1e30, -1e30, 1.0, 1e-30], [1e8, 1e8, 1.0, 1e30]),
    ]
    df = spark.createDataFrame(cases, "a array<float>, b array<float>")
    rows = df.select(
        dot("a", "b").alias("fold"),
        dot_unrolled("a", "b", 4).alias("unrolled"),
    ).collect()
    for r in rows:
        assert struct.pack("<d", r.fold) == struct.pack("<d", r.unrolled)
    # declared-width contract: a short array errors under ANSI (Spark 4
    # default), never a silently partial sum — the divergence from the
    # fold that makes exact-width arrays a caller requirement
    short = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0])], "a array<float>, b array<float>"
    )
    with pytest.raises(Exception, match="INVALID_ARRAY_INDEX|out of bounds"):
        short.select(dot_unrolled("a", "b", 4).alias("unrolled")).collect()


def test_portable_hash48_matches_duckdb(spark):
    import duckdb

    from vector_search_test_spark.functions.hashing import hash48_sql

    texts = ["abc", "hello world", "", "ünïcode ✓", "x" * 500]
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = {r.s: r.h for r in df.select("s", portable_hash48("s").alias("h")).collect()}
    got_salted = {
        r.s: r.h for r in df.select("s", portable_hash48("s", salt=7).alias("h")).collect()
    }
    con = duckdb.connect()
    for t in texts:
        want = con.execute(f"select {hash48_sql('$tx')}", {"tx": t}).fetchone()[0]
        assert got[t] == want, t
        want_s = con.execute(f"select {hash48_sql('$tx', salt=7)}", {"tx": t}).fetchone()[0]
        assert got_salted[t] == want_s, t

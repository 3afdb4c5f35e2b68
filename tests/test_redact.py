"""PII redaction (functions/redact.py): planted-PII detection, engine
twin bit-equality (Java regex vs RE2 on the deliberately ASCII-only
patterns), idempotence, and the scan-only plan shape."""

import duckdb
from pyspark.sql import functions as F

from vector_search_test_spark.functions.redact import (
    pii_counts,
    pii_counts_sql,
    redact_pii,
    redact_pii_sql,
)
from vector_search_test_spark.io import load_table

PLANTED = [
    ("contact alice.smith+spam@example.co.uk today", "contact <EMAIL> today", (1, 0, 0)),
    ("server at 192.168.001.1 rebooted", "server at <IP> rebooted", (0, 1, 0)),
    ("call +4915112345678 or 555-867-5309 now", "call <PHONE> or <PHONE> now", (0, 0, 2)),
    ("a@b.io on 10.0.0.1 dial 020 555 1234", "<EMAIL> on <IP> dial <PHONE>", (1, 1, 1)),
    ("no pii here, just the year 20260101", "no pii here, just the year 20260101", (0, 0, 0)),
    ("", "", (0, 0, 0)),
]


def test_redaction_and_counts_planted(spark):
    df = spark.createDataFrame([(t,) for t, _, _ in PLANTED], "text string")
    counts = pii_counts("text")
    got = df.select(
        redact_pii("text").alias("red"),
        counts["email"].alias("e"),
        counts["ipv4"].alias("i"),
        counts["phone"].alias("p"),
    ).collect()
    for row, (_, want_red, (we, wi, wp)) in zip(got, PLANTED):
        assert row.red == want_red, (row.red, want_red)
        assert (row.e, row.i, row.p) == (we, wi, wp)


def test_redaction_matches_duckdb_twin(spark):
    df = spark.createDataFrame([(t,) for t, _, _ in PLANTED], "text string")
    got = [r.red for r in df.select(redact_pii("text").alias("red")).collect()]
    con = duckdb.connect()
    csql = pii_counts_sql("t")
    rows = con.execute(
        f"SELECT {redact_pii_sql('t')}, {csql['email']}, {csql['ipv4']}, {csql['phone']} "
        "FROM (SELECT UNNEST(?) AS t)",
        [[t for t, _, _ in PLANTED]],
    ).fetchall()
    assert [r[0] for r in rows] == got
    spark_counts = df.select(
        pii_counts("text")["email"].alias("e"),
        pii_counts("text")["ipv4"].alias("i"),
        pii_counts("text")["phone"].alias("p"),
    ).collect()
    assert [(r[1], r[2], r[3]) for r in rows] == [
        (r.e, r.i, r.p) for r in spark_counts
    ]


def test_redaction_idempotent_and_fixture_twin(spark, sf_dir):
    """Redacting twice changes nothing (tokens are not PII), and the two
    engines agree on the whole fixture corpus."""
    docs = load_table(spark, sf_dir, "documents")
    once = docs.select("doc_id", redact_pii("text").alias("red"))
    twice = once.select("doc_id", redact_pii("red").alias("red2"))
    diff = (
        once.join(twice, "doc_id")
        .filter(F.col("red") != F.col("red2"))
        .count()
    )
    assert diff == 0
    got = {r.doc_id: r.red for r in once.collect()}
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT doc_id, {redact_pii_sql('text')} "
            f"FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    )
    assert got == want


def test_redaction_is_scan_only(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        docs.select(redact_pii("text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan

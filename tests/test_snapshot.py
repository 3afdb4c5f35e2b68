"""Corpus snapshot maintenance (operators/snapshot.py): upsert/delete
row-count algebra, replacement semantics, broadcast-anti plan shape."""

from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.snapshot import delete_keys, upsert


def test_upsert_semantics_and_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    edited = docs.filter(F.col("doc_id") < 7).withColumn(
        "text", F.lit("edited")
    )
    appended = docs.filter(F.col("doc_id") < 3).withColumn(
        "doc_id", F.col("doc_id") + 50_000
    )
    snap = upsert(docs, edited.unionByName(appended))
    assert snap.count() == n + 3  # |base| - 7 + 10
    got = {r.doc_id: r.text for r in snap.filter(
        (F.col("doc_id") < 7) | (F.col("doc_id") >= 50_000)
    ).collect()}
    assert all(got[i] == "edited" for i in range(7))
    assert all(50_000 + i in got for i in range(3))
    untouched = snap.join(docs, ["doc_id", "text"]).filter(
        F.col("doc_id") >= 7
    )
    assert untouched.count() == n - 7  # every other base row byte-equal


def test_delete_keys(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    tomb = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    nt = tomb.count()
    out = delete_keys(docs, tomb)
    assert out.count() == n - nt
    assert out.filter(F.col("doc_id") % 10 == 0).count() == 0


def test_upsert_plan_broadcasts_updates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    upd = docs.filter(F.col("doc_id") < 5)
    plan = (
        upsert(docs, upd)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

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


def test_stream_upsert_snapshots_foreachbatch(spark, sf_dir, tmp_path):
    """Streaming upserts across two micro-batches: the _CURRENT
    snapshot equals the sequential batch upsert chain (edit wins, new
    key appends, untouched rows survive), and both version dirs exist
    (copy-on-write — the previous snapshot was never mutated)."""
    import os

    from pyspark.sql import types as T

    from vector_search_test_spark.operators.snapshot import (
        read_current_snapshot,
        stream_upsert_snapshots,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    b1 = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], schema
    )
    b2 = spark.createDataFrame(
        [(2, "two-edited"), (9, "nine")], schema
    )
    inp = tmp_path / "ups_in"
    inp.mkdir()
    for i, df in enumerate([b1, b2]):
        sub = tmp_path / f"ups_stage{i}"
        df.coalesce(1).write.parquet(str(sub))
        (pq,) = [f for f in os.listdir(sub) if f.endswith(".parquet")]
        os.rename(sub / pq, inp / f"{i:02d}.parquet")
        os.utime(inp / f"{i:02d}.parquet", (1_700_000_000 + i,) * 2)

    out = tmp_path / "snapdir"
    out.mkdir()
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(inp))
    )
    q = (
        stream_upsert_snapshots(stream, str(out))
        .option("checkpointLocation", str(tmp_path / "ups_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.doc_id, r.text)
        for r in read_current_snapshot(spark, str(out)).collect()
    )
    assert got == [
        (1, "one"),
        (2, "two-edited"),
        (3, "three"),
        (9, "nine"),
    ]
    assert os.path.isdir(out / "v0") and os.path.isdir(out / "v1")
    # the previous version still holds the pre-edit state (never mutated)
    v0 = sorted(
        (r.doc_id, r.text)
        for r in spark.read.parquet(str(out / "v0")).collect()
    )
    assert v0 == [(1, "one"), (2, "two"), (3, "three")]

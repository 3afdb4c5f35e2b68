"""Streaming deduplication (streaming/ingest.py::stream_dedup): the
global mode must emit exactly the batch DISTINCT key set over any
micro-batch split, and the watermark-bounded mode
(dropDuplicatesWithinWatermark) must show BOTH documented behaviors
non-vacuously — a duplicate inside the delay is dropped, a duplicate
arriving after its original's state expired is re-emitted."""

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_search_test_spark.io import load_table
from vector_search_test_spark.streaming.ingest import (
    stream_dedup,
    stream_dedup_event_keys,
)

BASE = dt.datetime(2026, 1, 1, 0, 0, 0)

KV_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def _row(key, sec):
    return (key, BASE + dt.timedelta(seconds=sec))


def _write_ordered_files(tmp_path, inp, dfs):
    inp.mkdir()
    for i, p in enumerate(dfs):
        sub = tmp_path / f"dd_stage{i}"
        p.coalesce(1).write.parquet(str(sub))
        (pq,) = [f for f in os.listdir(sub) if f.endswith(".parquet")]
        os.rename(sub / pq, inp / f"{i:02d}.parquet")
        os.utime(inp / f"{i:02d}.parquet", (1_700_000_000 + i,) * 2)


def _drain(spark, stream, tmp_path, qname):
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"{qname}_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = sum(
        1
        for p in q.recentProgress
        if (p["numInputRows"] if isinstance(p, dict) else p.numInputRows) > 0
    )
    return spark.sql(f"SELECT * FROM {qname}").collect(), n_batches


def test_global_mode_equals_batch_distinct(spark, sf_dir, tmp_path):
    """Fixture events split across two micro-batches: the emitted key
    set equals batch SELECT DISTINCT, with no key emitted twice."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    mid = b.lo + (b.hi - b.lo) / 2
    parts = [
        ev.filter(F.col("ts") <= F.lit(mid)),
        ev.filter(F.col("ts") > F.lit(mid)),
    ]
    inp = tmp_path / "dedup_in"
    _write_ordered_files(tmp_path, inp, parts)
    rows, n_batches = _drain(
        spark,
        stream_dedup_event_keys(spark, str(inp), max_files_per_trigger=1),
        tmp_path,
        "dd_global",
    )
    got = [(r.user_id, r.event_type) for r in rows]
    want = {
        (r.user_id, r.event_type)
        for r in ev.select("user_id", "event_type").distinct().collect()
    }
    assert n_batches >= 2  # the split actually exercised cross-batch state
    assert len(got) == len(set(got))  # no duplicate emissions
    assert set(got) == want


def test_within_watermark_drop_and_expiry(spark, tmp_path):
    """Bounded-state mode, delay = 1 hour. Planted construction:
    - key 'short': first at t=0; file 0's clock row advances the
      watermark to 2 h, so its state (alive until t=1 h) expires (state
      cleanup applies the advanced watermark one batch later — hence
      the interposed clock-only file 1); the duplicate arrives in file 2
      at t=2.5 h (above the 2 h watermark, not late) and MUST re-emit —
      the documented weakening of bounded state.
    - key 'near': first at t=2h50m (state until 3h50m); the duplicate
      at t=2h55m is inside the delay and MUST be dropped.
    Both behaviors asserted on the same run, so neither test leg can go
    vacuous without failing."""
    file0 = spark.createDataFrame(
        [_row("short", 0), _row("near", 10_200), _row("clock", 10_800)],
        KV_SCHEMA,
    )
    file1 = spark.createDataFrame([_row("clock", 11_000)], KV_SCHEMA)
    file2 = spark.createDataFrame(
        [_row("short", 9_000), _row("near", 10_500)], KV_SCHEMA
    )
    inp = tmp_path / "wm_in"
    _write_ordered_files(tmp_path, inp, [file0, file1, file2])
    stream = spark.readStream.schema(KV_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(inp))
    rows, n_batches = _drain(
        spark,
        stream_dedup(stream, ["key"], watermark_col="ts", delay="1 hour"),
        tmp_path,
        "dd_wm",
    )
    counts = {}
    for r in rows:
        counts[r.key] = counts.get(r.key, 0) + 1
    assert n_batches >= 3
    assert counts["short"] == 2  # state expired -> re-emitted
    assert counts["near"] == 1  # inside delay -> deduplicated
    assert counts["clock"] == 1


def test_global_mode_survives_expiry_scenario(spark, tmp_path):
    """The SAME input that re-emits under bounded state stays exactly
    deduplicated in global mode — the contrast that makes the bounded
    mode's weakening visible."""
    file0 = spark.createDataFrame(
        [_row("short", 0), _row("clock", 10_800)], KV_SCHEMA
    )
    file1 = spark.createDataFrame([_row("short", 9_000)], KV_SCHEMA)
    inp = tmp_path / "glob_in"
    _write_ordered_files(tmp_path, inp, [file0, file1])
    stream = spark.readStream.schema(KV_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(inp))
    rows, n_batches = _drain(
        spark, stream_dedup(stream, ["key"]), tmp_path, "dd_glob2"
    )
    got = sorted(r.key for r in rows)
    assert n_batches >= 2
    assert got == ["clock", "short"]

"""Final-flush + out-of-order hardening for stateful sessionization
(round-4 verdict items #3 and #4).

- `final_flush=True` must make the streamed result equal the FULL batch
  sessionize output (not "minus each key's last session"): the drain
  sentinel advances the watermark past every key's gap horizon and the
  event-time timeouts emit the trailing open sessions.
- `watermark_delay_seconds=N` (buffered mode) must reproduce the batch
  result even when events arrive out of order across micro-batches, as
  long as the reordering stays inside the watermark delay.
"""

import os

import pytest
from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.timeseries import sessionize
from vector_search_test_spark.streaming.stateful import (
    SENTINEL_USER_ID,
    stream_sessionize,
)

GAP = 1800


def _batch_sessions(ev_batch):
    sess = sessionize(ev_batch, gap_seconds=GAP)
    return sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 6))
        for r in sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .collect()
    )


def _write_ordered_files(tmp_path, inp, parts):
    inp.mkdir()
    for i, p in enumerate(parts):
        sub = tmp_path / f"part_stage{i}"
        p.coalesce(1).write.parquet(str(sub))
        (pq,) = [f for f in os.listdir(sub) if f.endswith(".parquet")]
        os.rename(sub / pq, inp / f"{i:02d}.parquet")
        # mtime order = processing order for the file-stream source
        os.utime(inp / f"{i:02d}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))


def _run_stream(spark, stream, tmp_path, qname):
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"{qname}_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 6))
        for r in spark.sql(f"SELECT * FROM {qname}").collect()
    )


def test_final_flush_equals_full_batch(spark, sf_dir, tmp_path):
    """Ordered arrival across three micro-batches + final_flush: streamed
    sessions == the COMPLETE batch result, including each user's trailing
    session (previously lost in state forever)."""
    ev_batch = load_table(spark, sf_dir, "events")
    bounds = ev_batch.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    cuts = [bounds.lo + (bounds.hi - bounds.lo) * f for f in (1 / 3, 2 / 3)]
    parts = [
        ev_batch.filter(F.col("ts") <= F.lit(cuts[0])),
        ev_batch.filter((F.col("ts") > F.lit(cuts[0])) & (F.col("ts") <= F.lit(cuts[1]))),
        ev_batch.filter(F.col("ts") > F.lit(cuts[1])),
    ]
    inp = tmp_path / "flush_in"
    _write_ordered_files(tmp_path, inp, parts)

    stream = stream_sessionize(
        spark, str(inp), gap_seconds=GAP, max_files_per_trigger=1, final_flush=True
    )
    got = _run_stream(spark, stream, tmp_path, "flush_full")
    want = _batch_sessions(ev_batch)
    assert got == want
    assert len(got) > 0
    assert all(uid != SENTINEL_USER_ID for uid, *_ in got)
    # sentinel write is idempotent: the staging dir gained exactly one file
    assert sorted(os.listdir(inp))[-1] == "zz_sentinel.parquet"


def test_out_of_order_buffered_matches_batch(spark, sf_dir, tmp_path):
    """Events delivered OUT OF ORDER across micro-batches (deterministic
    +/-30 min jitter on the arrival order, one file per micro-batch): the
    buffered mode with a 2 h watermark delay reproduces the batch result
    exactly — a late event merges into its true session instead of
    splicing wrongly."""
    ev_batch = load_table(spark, sf_dir, "events")
    jitter = (F.pmod(F.xxhash64("event_id"), F.lit(3600)) - F.lit(1800)).cast("long")
    jittered = ev_batch.withColumn(
        "arrival_key",
        (F.unix_timestamp("ts") + jitter).cast("long"),
    ).orderBy("arrival_key", "event_id")
    n = jittered.count()
    third = (n + 2) // 3
    from pyspark.sql.window import Window

    rn = F.row_number().over(Window.orderBy("arrival_key", "event_id"))
    ranked = jittered.withColumn("rn", rn)
    parts = [
        ranked.filter(F.col("rn") <= third).drop("rn", "arrival_key"),
        ranked.filter((F.col("rn") > third) & (F.col("rn") <= 2 * third)).drop(
            "rn", "arrival_key"
        ),
        ranked.filter(F.col("rn") > 2 * third).drop("rn", "arrival_key"),
    ]
    inp = tmp_path / "ooo_in"
    _write_ordered_files(tmp_path, inp, parts)

    stream = stream_sessionize(
        spark,
        str(inp),
        gap_seconds=GAP,
        max_files_per_trigger=1,
        final_flush=True,
        watermark_delay_seconds=7200,
    )
    got = _run_stream(spark, stream, tmp_path, "ooo_sessions")
    want = _batch_sessions(ev_batch)
    assert got == want
    assert len(got) > 0


def test_ordered_splice_would_fail_out_of_order(spark, sf_dir, tmp_path):
    """Contrast pin: the O(1)-state ordered mode is NOT safe under the
    same out-of-order arrival — documenting why buffered mode exists. (If
    this ever starts passing, the jitter degenerated and the buffered
    test above stopped exercising out-of-orderness.)"""
    ev_batch = load_table(spark, sf_dir, "events")
    jitter = (F.pmod(F.xxhash64("event_id"), F.lit(3600)) - F.lit(1800)).cast("long")
    jittered = ev_batch.withColumn(
        "arrival_key", (F.unix_timestamp("ts") + jitter).cast("long")
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(Window.orderBy("arrival_key", "event_id"))
    ranked = jittered.withColumn("rn", rn)
    n = ev_batch.count()
    half = n // 2
    parts = [
        ranked.filter(F.col("rn") <= half).drop("rn", "arrival_key"),
        ranked.filter(F.col("rn") > half).drop("rn", "arrival_key"),
    ]
    inp = tmp_path / "ooo_ordered_in"
    _write_ordered_files(tmp_path, inp, parts)

    stream = stream_sessionize(
        spark, str(inp), gap_seconds=GAP, max_files_per_trigger=1, final_flush=True
    )
    got = _run_stream(spark, stream, tmp_path, "ooo_ordered")
    want = _batch_sessions(ev_batch)
    assert got != want

"""Custom stateful streaming operator: gap-based sessionization via
`applyInPandasWithState` (SURVEY §7 P6 extension; the reference has no
streaming — SURVEY §2.8).

This is the canonical shape for stateful logic Structured Streaming's
built-in windows can't express: per-key state (`GroupState`) carried
across micro-batches, Arrow-batched pandas compute inside each batch
(vectorized numpy — no per-row Python), append-mode emission of finalized
results only. Semantics mirror operators/timeseries.py::sessionize: a
session breaks when the whole-second gap to the previous event exceeds
`gap_seconds` (batch uses `unix_timestamp`, which truncates to seconds —
the stream side floors microseconds identically so the two agree
bit-for-bit).

A session is emitted ("closed") only when a later event for the same key
proves the gap was exceeded; each key's trailing open session stays in
state. Callers that need a final flush append a sentinel event past the
gap horizon or drain state at teardown — tests compare closed sessions
against the batch result minus each key's last session, which is exact
under event-time-ordered arrival (the in-order assumption is documented;
out-of-order hardening belongs to a watermark buffer upstream, not this
operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)

# open session carried between micro-batches: bounds in microseconds
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("end_us", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("v", T.DoubleType(), True),
    ]
)


def sessionize_stateful(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based session aggregates over a stream: (user_id,
    session_start, session_end, n_events, sum_value), one row per CLOSED
    session, emitted in the micro-batch whose events closed it."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def close_sessions(key_tuple, pdf_iter, state):
        import numpy as np
        import pandas as pd

        (uid,) = key_tuple
        if state.exists:
            s_start, s_end, s_n, s_v = state.get
        else:
            s_start = None
            s_end = s_n = 0
            s_v = 0.0
        closed: list[tuple] = []
        # Concatenate ALL of the batch's chunks before sorting: Arrow
        # hands a key's micro-batch data as multiple chunks (per
        # maxRecordsPerBatch / shuffle map partition) in NO time order, so
        # per-chunk processing would splice sessions out of order.
        chunks = [pdf for pdf in pdf_iter if not pdf.empty]
        for pdf in ([pd.concat(chunks)] if chunks else []):
            pdf = pdf.sort_values([ts_col, "event_id"])
            # normalize to datetime64[us] before the int view: under
            # pandas 2.x the Arrow column may arrive as datetime64[ns] OR
            # [us]; a bare astype(int64) silently changes unit with it
            us = pdf[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
            sec = us // 1_000_000
            vals = pdf[value_col].fillna(0.0).to_numpy(dtype="float64")
            brk = np.empty(len(us), dtype=bool)
            brk[0] = True
            brk[1:] = (sec[1:] - sec[:-1]) > gap_seconds
            gid = np.cumsum(brk) - 1
            last = np.append(brk[1:], True)
            g_start = us[brk]
            g_end = us[last]
            g_n = np.bincount(gid)
            g_v = np.bincount(gid, weights=vals)
            # splice the open session with the batch's first group
            if s_start is not None and sec[0] - (s_end // 1_000_000) <= gap_seconds:
                g_start[0] = s_start
                g_n[0] += s_n
                g_v[0] += s_v
            elif s_start is not None:
                closed.append((uid, s_start, s_end, s_n, s_v))
            # all groups but the last are proven closed by a later event
            for i in range(len(g_start) - 1):
                closed.append(
                    (uid, int(g_start[i]), int(g_end[i]), int(g_n[i]), float(g_v[i]))
                )
            s_start = int(g_start[-1])
            s_end = int(g_end[-1])
            s_n = int(g_n[-1])
            s_v = float(g_v[-1])
        if s_start is not None:
            state.update((s_start, s_end, s_n, s_v))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    return (
        events.groupBy(key)
        .applyInPandasWithState(
            close_sessions,
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_sessionize(
    spark,
    input_dir: str,
    gap_seconds: int = 1800,
    max_files_per_trigger: int | None = None,
    nanos_ts: bool = False,
) -> DataFrame:
    """File-stream wrapper: events parquet directory -> closed-session
    aggregates. The fixture's ts physical type (physical INT96 as Spark
    writes vs INT64 TIMESTAMP(NANOS) vs timestamp[us]) is detected from the
    parquet footer metadata and normalized to TimestampType micros —
    `nanos_ts` is kept for API compatibility but ignored.
    `max_files_per_trigger` bounds each micro-batch (availableNow then
    drains the source across several batches — how tests exercise the
    cross-batch state carry)."""
    from vector_search_test_spark.streaming.ingest import events_stream_reader

    del nanos_ts  # auto-detected; see docstring
    ev = events_stream_reader(spark, input_dir, max_files_per_trigger)
    return sessionize_stateful(ev, gap_seconds=gap_seconds)

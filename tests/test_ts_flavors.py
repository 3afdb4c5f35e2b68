"""Three-flavor parquet timestamp regression (round-4 verdict item #1).

events.ts has shipped in two fixture flavors (INT64 TIMESTAMP(NANOS) and
timestamp[us]); Spark itself writes a third — physical INT96
(`spark.sql.parquet.outputTimestampType=INT96`, the default) — for any
TimestampType column, i.e. for the output of run_stream_to_parquet or any
upstream Spark job. pyarrow's *logical* schema reports INT96 and
INT64-nanos identically as "timestamp[ns]", so flavor detection must read
the footer's physical type (streaming/ingest.py::_events_ts_flavor); the
round-4 bug applied the nanosAsLong raw-long schema to INT96 and crashed
with PARQUET_COLUMN_DATA_TYPE_MISMATCH.

Each flavor here is materialized from the same fixture rows, streamed
through the shared events reader, and must match the batch-normalized read
bit-for-bit.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.streaming.ingest import (
    _events_ts_flavor,
    events_stream_source,
)


def _write_flavor(spark, sf_dir, out_dir, flavor):
    if flavor == "int96":
        # Spark's own writer: TimestampType -> physical INT96 by default
        assert (
            spark.conf.get("spark.sql.parquet.outputTimestampType") == "INT96"
        )
        load_table(spark, sf_dir, "events").coalesce(1).write.parquet(
            str(out_dir)
        )
    elif flavor == "ntz":
        out_dir.mkdir()
        shutil.copy(f"{sf_dir}/events.parquet", out_dir / "events.parquet")
    elif flavor == "int64_nanos":
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/events.parquet")
        idx = t.schema.get_field_index("ts")
        t = t.set_column(idx, "ts", t.column("ts").cast(pa.timestamp("ns")))
        out_dir.mkdir()
        # parquet format 2.6 stores ns-timestamps as INT64 TIMESTAMP(NANOS)
        pq.write_table(t, out_dir / "events.parquet", version="2.6")
    else:
        raise AssertionError(flavor)


@pytest.mark.parametrize("flavor", ["int96", "ntz", "int64_nanos"])
def test_stream_source_normalizes_all_ts_flavors(spark, sf_dir, tmp_path, flavor):
    inp = tmp_path / f"ev_{flavor}"
    _write_flavor(spark, sf_dir, inp, flavor)
    assert _events_ts_flavor(str(inp)) == (
        "ntz" if flavor == "ntz" else flavor
    )

    stream = events_stream_source(spark, str(inp)).select(
        "event_id", "ts", "user_id", "value"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(f"flavor_{flavor}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.event_id, r.ts, r.user_id, r.value)
        for r in spark.sql(f"SELECT * FROM flavor_{flavor}").collect()
    )
    want = sorted(
        (r.event_id, r.ts, r.user_id, r.value)
        for r in load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "value")
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_flavor_detector_empty_dir(tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    assert _events_ts_flavor(str(d)) == "empty"

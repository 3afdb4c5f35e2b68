"""Structured Streaming ingest (SURVEY §7 P6 — optional extension).

The reference has no streaming (SURVEY §2.8): its app is request/response
over in-memory state. The natural streaming extension mirrors faiss's
train/add split (app.py:52-55): *training* stays batch (k-means over a
frozen snapshot), while *add* — assign each arriving vector to its nearest
frozen centroid — is a stateless projection, exactly what a streaming
micro-batch can run. `stream_assign_cells` is therefore identical in
semantics to operators/ivf.py::assign_cells, applied to a readStream.

`stream_event_window_counts` is the standard watermark + tumbling-window
aggregation over the events table (late data dropped past the watermark).

Both are testable without a long-running cluster via
`trigger(availableNow=True)`: process everything currently in the source,
then stop — results must equal the batch equivalent on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_search_test_spark.operators.ivf import assign_cells

EMBEDDING_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)

# events.parquet has shipped in two fixture flavors (see io.load_table):
# TIMESTAMP(NANOS) — streamed as raw long nanos via
# spark.sql.legacy.parquet.nanosAsLong and converted in-plan — and plain
# timestamp[us]. readStream needs an explicit schema, so the flavor is
# detected from the parquet footer (events_stream_source).
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _events_ts_is_nanos(input_dir: str) -> bool:
    """True when the parquet files under `input_dir` carry TIMESTAMP(NANOS)
    (read via the footer — a stream schema must be declared up front, so
    the flavor has to be known before the first micro-batch)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        return False
    return str(pq.read_schema(files[0]).field("ts").type) == "timestamp[ns]"


def events_stream_source(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream over an events parquet directory, normalized to
    TimestampType micros regardless of the fixture's ts physical type."""
    if _events_ts_is_nanos(input_dir):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .parquet(input_dir)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    schema = T.StructType(
        [
            f
            if f.name != "ts"
            else T.StructField("ts", T.TimestampNTZType(), True)
            for f in EVENTS_STREAM_SCHEMA.fields
        ]
    )
    return (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def stream_assign_cells(
    spark: SparkSession,
    input_dir: str,
    centroids: list[list[float]],
) -> DataFrame:
    """Streaming IVF `add`: readStream of (vec_id, embedding) parquet,
    nearest-frozen-centroid assignment as a stateless whole-stage-codegen
    projection. Write with `.writeStream.partitionBy('list_id')` to grow
    the same partitioned-postings layout ivf_save produces."""
    stream = (
        spark.readStream.schema(EMBEDDING_STREAM_SCHEMA)
        .parquet(input_dir)
        .select("vec_id", "embedding")
    )
    return assign_cells(stream, centroids).select("list_id", "vec_id", "embedding")


def stream_event_window_counts(
    spark: SparkSession,
    input_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window event counts: the canonical streaming
    aggregation (late rows beyond the watermark are dropped; state is
    bounded by the watermark horizon)."""
    ev = events_stream_source(spark, input_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            # decimal sum: exact and summation-order-independent (fixture
            # values have 2 decimals), so the streaming result matches the
            # batch oracle bit-for-bit regardless of micro-batch order
            F.sum(F.col("value").cast("decimal(38,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_by: str | None = None,
    output_mode: str = "append",
) -> None:
    """Run a streaming query with availableNow (drain the source, then
    stop) — the batch-equivalent execution used by tests and backfills."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(partition_by)
    q = writer.start()
    q.awaitTermination()

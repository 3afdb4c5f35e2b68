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

# events.parquet carries TIMESTAMP(NANOS); streamed as raw long nanos
# (spark.sql.legacy.parquet.nanosAsLong) and converted in-plan, same as
# io.load_table does for batch.
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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .parquet(input_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
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

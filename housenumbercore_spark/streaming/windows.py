"""Event-time windowed aggregation over a file-source stream.

``readStream`` over the events parquet + watermark + 1-hour tumbling
windows; the availableNow trigger drains everything that exists and stops,
giving batch-equivalent results (verified against the DuckDB oracle — the
value sum is integer-cent quantized so the comparison is exact regardless
of summation order).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pinning import pin

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE events file-source stream (single definition — the three
    streaming consumers must read the same input): typed schema, globbed to
    the events.parquet file under ``sf_dir``."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def drain_to_df(writer_source: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Drain a streaming frame through an availableNow memory sink and
    return the result PINNED (pinning.py, truncate=True — the lineage
    roots at a temp view this function drops, so it must not be replayed)
    with the temp view dropped — a leaked memory-sink table otherwise
    holds the full result set in driver memory for the life of the
    session (bench/driver sweeps run dozens of these on ONE
    SparkSession)."""
    name = "drain_" + uuid.uuid4().hex[:10]
    spark = writer_source.sparkSession
    try:
        q = (
            writer_source.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = pin(spark.table(name), truncate=True)
    finally:
        # drop even when the stream or pin raises — a failed drain would
        # otherwise leak its partial memory-sink rows for the session's
        # lifetime, the exact leak this function exists to prevent
        spark.catalog.dropTempView(name)
    return out


def windowed_event_counts_stream(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming plan (unstarted): per (hour window, event_type) counts and
    integer-cent value sums with a watermark for late data."""
    stream = events_stream(spark, sf_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def run_stream_to_completion(
    spark: SparkSession, sf_dir: str, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Drain the stream with trigger(availableNow) into a memory sink and
    return the final result (pinned; no memory-sink table left behind)."""
    return drain_to_df(
        windowed_event_counts_stream(spark, sf_dir, window, watermark)
    )


def sessionize(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (built-in session_window — gap-based), the
    streaming-native sessionization a training-data event pipeline needs.
    ``watermark`` bounds late data like windowed_event_counts_stream's."""
    return drain_to_df(
        events_stream(spark, sf_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )

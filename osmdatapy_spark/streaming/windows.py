"""Structured-Streaming-compatible window aggregations over the events
table (beyond-reference scope; the reference is strictly batch, SURVEY §2.9).

``tumbling_counts`` is written against a generic DataFrame so the SAME
function serves batch (driver correctness oracle) and streaming
(``readStream`` + watermark) — the Spark unifying idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from osmdatapy_spark.suite._util import dec


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling-window count + exact-decimal sum per event_type.

    In streaming mode add ``.withWatermark('ts', '1 hour')`` upstream; the
    aggregation state then expires with the watermark — bounded state at
    100 TB/day event rates."""
    return (
        events.groupBy(F.window("ts", duration).alias("w"), col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value", 18, 6)).cast("double").alias("total_value"),
        )
        .select(col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def streaming_tumbling_counts(
    spark: SparkSession, events_path: str, duration: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """The same aggregation as an actual stream (parquet file source,
    availableNow-style processing in tests)."""
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)
    return tumbling_counts(stream.withWatermark("ts", watermark), duration)

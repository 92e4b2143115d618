"""Structured Streaming over the events table.

The reference is batch-BSP only (SURVEY.md §2.1: streaming absent); the
engine adds a thin streaming layer so the same windowed aggregation
logic runs in both modes. The transformation is defined ONCE
(windowed_event_agg) and applied to either a batch DataFrame or a
readStream DataFrame — tests assert batch == streaming on the same
parquet input (memory sink, processAllAvailable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_agg(events: DataFrame, window: str = "5 minutes") -> DataFrame:
    """Tumbling-window count/sum per event_type. Works in batch and
    streaming (watermark added only when the input is streaming)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", "30 minutes")
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_events_from_parquet(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a parquet directory (file-source streaming)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def run_stream_to_memory(
    agg: DataFrame, name: str = "stream_out"
) -> "object":
    """Drive a streaming aggregation to completion into a memory sink;
    returns the query handle (caller reads spark.sql(f'select * from
    {name}'))."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q

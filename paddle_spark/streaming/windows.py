"""Windowed aggregation over the events stream.

``streaming_windowed_agg`` is the Structured Streaming plan (watermark +
tumbling window, append mode — late rows beyond the watermark are
dropped, the streaming analog of the reference's TTL-stale heartbeat
discard, status_server.py:79-101). ``batch_windowed_agg`` is the identical
logical aggregation as a batch plan (same results on a static table; used
as the DuckDB-oracle-checkable twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def batch_windowed_agg(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling-window count/sum per event_type (batch twin)."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_windowed_agg(
    spark: SparkSession, path: str, minutes: int = 60, watermark: str = "2 hours"
) -> DataFrame:
    """The same aggregation as a streaming plan over a file source."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(path)
        .withWatermark("ts", watermark)
    )
    return batch_windowed_agg(stream, minutes)


def run_stream_once(
    spark: SparkSession, agg: DataFrame, name: str = "stream_out"
) -> DataFrame:
    """Drive a streaming plan to completion over the static files
    (memory sink + processAllAvailable) and return the materialized rows.
    Append mode emits only watermark-closed windows; for a finite file
    source 'complete' mode materializes everything — which is what the
    smoke check wants."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)

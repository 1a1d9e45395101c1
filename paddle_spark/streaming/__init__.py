"""Structured Streaming re-expressions (SURVEY.md §2.9).

The reference is request/response; its streaming-shaped behaviors
(heartbeats, TTL staleness, continuation flags) map onto batch constructs
in the extraction job. This module provides the genuinely-streaming
equivalents for the `events` table so the engine also covers a streaming
ingest path: watermarked tumbling-window aggregation and a file-source ->
memory-sink smoke harness (runnable synchronously in tests via
``processAllAvailable``).
"""

from paddle_spark.streaming.windows import (
    batch_windowed_agg,
    streaming_windowed_agg,
    run_stream_once,
)

__all__ = ["batch_windowed_agg", "streaming_windowed_agg", "run_stream_once"]

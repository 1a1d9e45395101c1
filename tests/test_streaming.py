"""Structured Streaming smoke: windowed agg over the events parquet."""

from pyspark.sql import functions as F

from paddle_spark.streaming import (
    batch_windowed_agg,
    run_stream_once,
    streaming_windowed_agg,
)

EVENTS_PATH = "/root/testdata/sf0.001/events.parquet"


def test_stream_matches_batch(spark, events, tmp_path):
    # the file stream source wants a directory; stage the single file
    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    import shutil

    shutil.copy(EVENTS_PATH, src_dir / "part-0.parquet")
    agg = streaming_windowed_agg(spark, str(src_dir), minutes=60)
    streamed = run_stream_once(spark, agg, name="t_stream")
    batch = batch_windowed_agg(events, minutes=60)
    s = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in streamed.collect()
    }
    b = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in batch.collect()
    }
    assert s == b and len(b) > 0

"""Stateful streaming sessionization must agree with the batch twin."""

import shutil

from paddle_spark.streaming.stateful import run_stateful_once, stateful_sessionize

EVENTS_PATH = "/root/testdata/sf0.001/events.parquet"


def test_stateful_sessionize_matches_batch(spark, events, tmp_path):
    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(EVENTS_PATH, src_dir / "part-0.parquet")

    streamed = run_stateful_once(
        spark, stateful_sessionize(spark, str(src_dir)), name="t_sessions"
    )
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"]) for r in streamed.collect()
    }

    import __spark_entry__ as em

    batch = em.q_sessionize(spark, "/root/testdata/sf0.001")
    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"]) for r in batch.collect()
    }
    assert got == want and len(want) > 0


def test_state_survives_across_batches(spark, events, tmp_path):
    """Split the input into two files arriving as separate micro-batches;
    final per-user state must equal the single-batch result (keyed state
    carries last_ts across the boundary)."""
    from pyspark.sql import functions as F

    src_dir = tmp_path / "events_2batch"
    src_dir.mkdir()
    # two halves by time — the second batch continues sessions of the first;
    # maxFilesPerTrigger=1 forces two micro-batches through one query
    # (keyed state persists between them)
    mid_row = events.selectExpr(
        "percentile_approx(unix_timestamp(ts), 0.5) AS m"
    ).collect()[0]
    mid = F.to_timestamp(F.from_unixtime(F.lit(mid_row["m"])))
    events.filter(F.col("ts") <= mid).coalesce(1).write.mode("overwrite").parquet(
        str(src_dir / "stage")
    )
    import glob
    import shutil as sh

    f1 = glob.glob(str(src_dir / "stage" / "*.parquet"))[0]
    sh.copy(f1, src_dir / "0_first.parquet")
    events.filter(F.col("ts") > mid).coalesce(1).write.mode("overwrite").parquet(
        str(src_dir / "stage2")
    )
    f2 = glob.glob(str(src_dir / "stage2" / "*.parquet"))[0]
    sh.copy(f2, src_dir / "1_second.parquet")
    sh.rmtree(src_dir / "stage")
    sh.rmtree(src_dir / "stage2")

    from paddle_spark.streaming.windows import EVENTS_SCHEMA
    from paddle_spark.streaming.stateful import make_sessionizer, OUTPUT_SCHEMA, STATE_SCHEMA
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    agg = stream.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(1800.0),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    streamed = run_stateful_once(spark, agg, name="t_sessions_2b")
    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in streamed.collect()}

    import __spark_entry__ as em

    batch = em.q_sessionize(spark, "/root/testdata/sf0.001")
    want = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in batch.collect()}
    assert got == want

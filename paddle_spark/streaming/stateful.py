"""Custom stateful streaming operator: per-user sessionization.

`applyInPandasWithState` keeps (last_ts, session count, event count) per
user across micro-batches — the streaming twin of the batch lag+cumsum
sessionize query (__spark_entry__.q_sessionize). A gap > `gap_sec` between
consecutive events opens a new session.

This is the re-expression of the reference's per-process mutable state
(the instance-status tracker counting active requests across a process
lifetime, /root/reference/server/model_repo/layout-parsing/1/
layout_status.py:88-98) as Spark-managed keyed state: the state store
replaces the module-level singleton, and exactly-once micro-batch
semantics replace the atomic-rename heartbeat file.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from paddle_spark.streaming.windows import EVENTS_SCHEMA

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.DoubleType()),    # epoch seconds
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def make_sessionizer(gap_sec: float = 1800.0):
    def sessionize(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            ts = pdf["ts"].astype("int64").to_numpy() / 1e9  # epoch sec
            for t in ts:
                if last_ts is None or (t - last_ts) > gap_sec:
                    n_sessions += 1
                last_ts = float(t)
                n_events += 1
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return sessionize


def stateful_sessionize(
    spark: SparkSession, path: str, gap_sec: float = 1800.0
) -> DataFrame:
    """Streaming plan: file source -> keyed state sessionization."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return stream.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_sec),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_once(spark: SparkSession, agg: DataFrame, name: str) -> DataFrame:
    """Drive to completion over static files; 'update' mode emits the
    latest row per key — dedup by user keeping the final state."""
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    raw = spark.table(name)
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

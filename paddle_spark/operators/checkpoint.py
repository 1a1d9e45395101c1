"""Checkpoint / lineage / idempotent resume (SURVEY.md §2 T1/T2/F10).

Re-expresses the reference's per-process heartbeat-file accounting
(/root/reference/server/model_repo/layout-parsing/1/layout_status.py:61-86,
aggregated by /root/reference/server/status_server.py:56-123) as rows in a
``checkpoint`` table:

    run_id, bucket, n_docs, n_failures, docs_per_sec,
    started_at, finished_at, status

Resume = anti-join: pages whose bucket already has a ``success`` row for
this run_id are skipped (the batch analog of TTL-dropping stale heartbeats,
status_server.py:79-101). Output is written ``partitionBy("bucket")`` with
dynamic partition overwrite, so re-running a bucket replaces exactly its
own files — exactly-once per url without a transactional table.

On a cluster with the Iceberg runtime jar this maps 1:1 onto
``writeTo(...).overwritePartitions()`` + an Iceberg checkpoint table —
pass ``output_table``/``checkpoint_table`` (see ``write_extracted`` /
``append_checkpoint``; ``iceberg_catalog_configured`` probes the binding).
The sandbox falls back to plain parquet directories with identical layout.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from paddle_spark.config import DEFAULT_CONFIG, ExtractConfig
from paddle_spark.operators.extract_job import extract_pages, extraction_metrics

def iceberg_catalog_configured(spark: SparkSession, catalog: str = "iceberg") -> bool:
    """True when an Iceberg catalog is bound on this session (the runtime
    jar + ``spark.sql.catalog.<name>`` conf). The sandbox has neither, so
    the parquet-directory fallback below carries identical semantics."""
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    return bool(impl)

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_failures", T.LongType(), False),
        T.StructField("blocks_kept", T.LongType(), False),
        T.StructField("blocks_dropped", T.LongType(), False),
        T.StructField("docs_per_sec", T.DoubleType(), False),
        T.StructField("started_at", T.TimestampType(), False),
        T.StructField("finished_at", T.TimestampType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)


def read_checkpoint(spark: SparkSession, path: str | None) -> DataFrame:
    if path and os.path.isdir(path) and any(
        f.endswith(".parquet") for root, _, fs in os.walk(path) for f in fs
    ):
        return spark.read.schema(CHECKPOINT_SCHEMA).parquet(path)
    return spark.createDataFrame([], CHECKPOINT_SCHEMA)


def completed_buckets(
    spark: SparkSession,
    path: str,
    run_id: str,
    checkpoint_table: str | None = None,
) -> DataFrame:
    """Buckets already extracted successfully for this run (F10 analog:
    keep only fresh, successful lineage rows)."""
    if checkpoint_table is not None:
        cp = (
            spark.read.table(checkpoint_table)
            if spark.catalog.tableExists(checkpoint_table)
            else spark.createDataFrame([], CHECKPOINT_SCHEMA)
        )
    else:
        cp = read_checkpoint(spark, path)
    return (
        cp.filter((F.col("run_id") == run_id) & (F.col("status") == "success"))
        .select("bucket")
        .distinct()
    )


def write_extracted(
    extracted: DataFrame,
    output_path: str | None = None,
    output_table: str | None = None,
) -> None:
    """Durable-write the extracted frame, replacing exactly the bucket
    partitions present in it (idempotent resume).

    Iceberg path (``output_table`` on a configured catalog):
    ``writeTo(...).overwritePartitions()`` — a single ACID snapshot commit.
    Parquet-dir fallback: dynamic partition overwrite, scoped to THIS write
    via the writer option (never mutates session conf — a leaked
    ``partitionOverwriteMode=dynamic`` would silently turn every later
    ``mode('overwrite')`` in the session into a partial overwrite).
    """
    if output_table is not None:
        spark = extracted.sparkSession
        if spark.catalog.tableExists(output_table):
            # ACID snapshot commit replacing exactly the buckets present
            # in the frame (the Iceberg-native analog of dynamic
            # partition overwrite). Existence is checked explicitly —
            # never except-fallback into createOrReplace, which would
            # clobber other buckets' durable data on a resume.
            extracted.writeTo(output_table).overwritePartitions()
        else:
            # existence was checked above, so plain create (CTAS) — also
            # the only create form the session catalog supports, which is
            # what the sandbox test exercises this path against
            extracted.writeTo(output_table).partitionedBy(F.col("bucket")).create()
        return
    (
        extracted.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(output_path)
    )


def append_checkpoint(
    cp_rows: DataFrame,
    checkpoint_path: str | None = None,
    checkpoint_table: str | None = None,
) -> None:
    """Append lineage rows (Iceberg table when bound, else parquet dir)."""
    if checkpoint_table is not None:
        if cp_rows.sparkSession.catalog.tableExists(checkpoint_table):
            cp_rows.writeTo(checkpoint_table).append()
        else:
            cp_rows.writeTo(checkpoint_table).create()
        return
    cp_rows.write.mode("append").parquet(checkpoint_path)


def run_extract_job(
    spark: SparkSession,
    pages: DataFrame,
    output_path: str,
    checkpoint_path: str,
    run_id: str | None = None,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    n_partitions: int | None = None,
    output_table: str | None = None,
    checkpoint_table: str | None = None,
) -> dict:
    """Run (or resume) the extraction job.

    Returns a summary dict: {run_id, n_docs, n_failures, buckets_done,
    buckets_skipped, docs_per_sec}.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    done = completed_buckets(spark, checkpoint_path, run_id, checkpoint_table)
    done_set = {r["bucket"] for r in done.collect()}
    n_skipped = len(done_set)
    if n_skipped >= cfg.n_buckets:
        # fully resumed: nothing to extract, write, or record — a no-op
        # re-run costs one checkpoint-table read, nothing else
        return {
            "run_id": run_id, "n_docs": 0, "n_failures": 0,
            "buckets_skipped": n_skipped, "elapsed_sec": 0.0,
            "docs_per_sec": 0.0,
        }

    # Resume filter: done buckets are at most n_buckets values, collected
    # above — a driver-side isin predicate beats even a broadcast anti-join
    # (no join at all, and the NOT-IN can partition-prune a bucketed scan).
    from paddle_spark.functions import url_bucket_col

    pages_b = pages.withColumn(
        "bucket", url_bucket_col(F.col("url"), cfg.n_buckets, cfg.salt)
    )
    todo = (
        pages_b.filter(~F.col("bucket").isin(sorted(done_set)))
        if done_set
        else pages_b
    ).drop("bucket")

    t0 = time.time()
    # Every output row is stamped with its producing run_id — per-row
    # lineage that also makes the metrics read below EXACT (stale partitions
    # left in a reused output dir by an earlier run can never be attributed
    # to this run, even for buckets this run's input does not cover).
    # shuffle=True (not auto): this path WRITES partitionBy(bucket), so
    # the salted repartition doubles as output clustering — without it
    # every task would emit a file into every bucket directory (the
    # small-files trap, guide §6). The auto-skip is for noop/analysis
    # consumers, not the partitioned sink.
    extracted = extract_pages(todo, cfg, n_partitions, shuffle=True).withColumn(
        "run_id", F.lit(run_id)
    )
    write_extracted(extracted, output_path, output_table)
    elapsed = time.time() - t0

    # Lineage/metrics from durable output — but NEVER a full-table pass:
    # bucket ∈ candidates prunes to this run's partitions (done buckets
    # were skipped; untouched buckets can't hold our run_id), run_id == ours
    # excludes stale rows, and the groupBy reads 4 narrow int columns
    # (column pruning: the heavy `text` column is never scanned).
    candidates = [b for b in range(cfg.n_buckets) if b not in done_set]
    out = (
        spark.read.table(output_table)
        if output_table is not None
        else spark.read.parquet(output_path)
    )
    this_run = out.filter(
        F.col("bucket").isin(candidates) & (F.col("run_id") == run_id)
    )
    metrics = extraction_metrics(this_run)
    now = F.current_timestamp()
    total = metrics.agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("docs"),
        F.coalesce(F.sum("n_failures"), F.lit(0)).alias("fails"),
    ).collect()[0]
    docs_per_sec = float(total["docs"]) / elapsed if elapsed > 0 else 0.0
    cp_rows = metrics.select(
        F.lit(run_id).alias("run_id"),
        F.col("bucket"),
        F.col("n_docs").cast("long"),
        F.col("n_failures").cast("long"),
        F.col("blocks_kept").cast("long"),
        F.col("blocks_dropped").cast("long"),
        F.lit(docs_per_sec).alias("docs_per_sec"),
        (now - F.expr(f"INTERVAL {int(elapsed)} SECONDS")).alias("started_at"),
        now.alias("finished_at"),
        F.lit("success").alias("status"),
    )
    append_checkpoint(cp_rows, checkpoint_path, checkpoint_table)

    return {
        "run_id": run_id,
        "n_docs": int(total["docs"]),
        "n_failures": int(total["fails"]),
        "buckets_skipped": n_skipped,
        "elapsed_sec": elapsed,
        "docs_per_sec": docs_per_sec,
    }


def run_extract_job_grouped(
    spark: SparkSession,
    pages: DataFrame,
    output_path: str,
    checkpoint_path: str,
    run_id: str | None = None,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    n_groups: int = 4,
    n_partitions: int | None = None,
    output_table: str | None = None,
    checkpoint_table: str | None = None,
) -> dict:
    """Incremental-commit variant: buckets are processed in ``n_groups``
    sequential sub-jobs, each committing its own output partitions and
    lineage rows. A crash in group k preserves groups 0..k-1 durably —
    at 10^12-doc scale this bounds re-work to one group instead of the
    whole run. Resume semantics are unchanged (same run_id anti-join);
    the reference analog is the per-instance heartbeat cadence
    (layout_status.py:100-102) turned into commit cadence.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    from paddle_spark.functions import url_bucket_col
    from pyspark.sql import functions as F

    # skipped = buckets already durable for this run_id (counted once —
    # each sub-job's own counter sees the full run's lineage)
    n_skipped = completed_buckets(
        spark, checkpoint_path, run_id, checkpoint_table
    ).count()
    totals = {"n_docs": 0, "n_failures": 0, "buckets_skipped": n_skipped,
              "elapsed_sec": 0.0}
    for g in range(n_groups):
        sub = pages.where(
            F.pmod(
                url_bucket_col(F.col("url"), cfg.n_buckets, cfg.salt), F.lit(n_groups)
            )
            == g
        )
        s = run_extract_job(
            spark, sub, output_path, checkpoint_path, run_id=run_id, cfg=cfg,
            n_partitions=n_partitions, output_table=output_table,
            checkpoint_table=checkpoint_table,
        )
        totals["n_docs"] += s["n_docs"]
        totals["n_failures"] += s["n_failures"]
        totals["elapsed_sec"] += s["elapsed_sec"]
    totals["run_id"] = run_id
    totals["docs_per_sec"] = (
        totals["n_docs"] / totals["elapsed_sec"] if totals["elapsed_sec"] else 0.0
    )
    return totals

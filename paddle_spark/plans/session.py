"""SparkSession builder with the engine's scale-oriented defaults.

Local mode is the sandbox; the same conf block is what we'd pass to
``spark-submit`` on a real cluster (minus master/driver-memory, which the
cluster manager owns). Iceberg catalog config is attached only when the
runtime has the Iceberg Spark runtime jar (import-gated — not present in
this sandbox, where tables fall back to parquet directories with the same
layout; see paddle_spark.operators.checkpoint).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def build_session(
    app_name: str = "paddle_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build a local session sized to the sandbox.

    ``cores=None`` uses ``local[*]``. On a real cluster, drop the
    ``master`` call and submit with ``spark-submit --py-files``.
    """
    if cores is None:
        master = "local[*]"
        n = os.cpu_count() or 8
    else:
        master = f"local[{cores}]"
        n = cores
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # shuffle partitions ~ cores in local mode; AQE coalesces further
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size is the analog of the reference's max_batch_size
        # (config_gpu_paddlex.pbtxt:2); HTML docs are ~2-20 KB so a few
        # hundred rows per batch keeps Python workers fed without ballooning
        # the per-batch memory footprint.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Capture ``df.explain(mode)`` as a string for assertions/logs."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )

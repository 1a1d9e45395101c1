"""The extraction pipeline: pages -> mapInPandas(extract_batch) -> extracted.

One narrow waist (SURVEY.md §7): a single ``mapInPandas`` stage holds both
branches, chosen per row inside the Arrow batch — mirroring the reference's
single ``_run_impl`` entry (model.py:374). The Spark layer only classifies,
partitions and batches; extraction semantics live entirely in
``paddle_spark.kernels`` (pure, Spark-free), which is what makes the
per-url byte-identity invariant hold at any parallelism.

Scale design (100 TB / 10^12 rows):
- Input scan stays columnar: we select exactly (url, warc_ts, html, lang)
  — column pruning reaches the parquet/Iceberg scan.
- ``repartition(n, salted url-hash)`` is the job's only shuffle; it defuses
  host-domain skew (one mega-host = many buckets) and sets the unit of
  checkpoint lineage. Everything downstream is map-only.
- Extraction runs in Arrow-batched Python workers (one per core — the
  analog of the reference's Triton instance pool,
  config_gpu_paddlex.pbtxt:18-24); per-doc try/except means one poisoned
  payload can never fail a task (T5, model.py:569-589).
- Output writes partitioned by ``bucket``, so a re-run of failed buckets is
  a partition overwrite — idempotent resume without rewriting good data.
"""

from __future__ import annotations

import os
from dataclasses import replace

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from paddle_spark.config import DEFAULT_CONFIG, ExtractConfig
from paddle_spark.functions import url_bucket_col
from paddle_spark.kernels.extract import extract_document, sha256_text

# Output schema = the `extracted` table (SURVEY.md §1.2).
EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("bucket", T.IntegerType(), False),
        # input-payload hash: per-row input lineage, and the change-detection
        # key for incremental re-extraction over crawl snapshots
        # (operators/delta.delta_extract)
        T.StructField("payload_xxh", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("text_sha256", T.StringType(), False),
        T.StructField("n_blocks_kept", T.IntegerType(), False),
        T.StructField("n_blocks_dropped", T.IntegerType(), False),
        T.StructField("parse_ok", T.BooleanType(), False),
        T.StructField("branch", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)

_IN_COLS = ["url", "warc_ts", "html", "wet_text", "lang", "bucket", "payload_xxh"]


def make_extract_batch(cfg: ExtractConfig):
    """Build the mapInPandas body with `cfg` captured by closure (the
    analog of the per-request kwargs dict, model.py:400-431 — but constant
    per job, shipped once in the serialized closure)."""

    # Resolve the pixel decoder AT PLAN CONSTRUCTION (this runs on the
    # driver when the mapInPandas stage is declared): ocr_images with
    # pixel_codec='off' refuses here, and 'native' without PIL raises
    # ImportError here — never per-row inside the fault-isolation try
    # (same contract as operators/scanned.py).
    pixel_decode = None
    if cfg.ocr_images:
        from paddle_spark.kernels.pixels import decoder_for

        pixel_decode = decoder_for(cfg.pixel_codec)

    def extract_batch(batches):
        for pdf in batches:
            if cfg.fail_batch_marker and pdf["url"].str.contains(
                cfg.fail_batch_marker, regex=False
            ).any():
                raise RuntimeError(
                    f"fault injection: batch contains {cfg.fail_batch_marker!r}"
                )
            n = len(pdf)
            out = {
                "url": pdf["url"].to_numpy(),
                "warc_ts": pdf["warc_ts"].to_numpy(),
                "lang": pdf["lang"].to_numpy(),
                "bucket": pdf["bucket"].to_numpy(),
                "payload_xxh": pdf["payload_xxh"].to_numpy(),
                "text": [None] * n,
                "text_sha256": [""] * n,
                "n_blocks_kept": [0] * n,
                "n_blocks_dropped": [0] * n,
                "parse_ok": [False] * n,
                "branch": [""] * n,
                "error": [None] * n,
            }
            payloads = pdf["html"].to_numpy()
            # wet_text only exists when the caller opted into WET
            # passthrough (streaming/extract_stream feeds html-only)
            wet = (
                pdf["wet_text"].to_numpy()
                if "wet_text" in pdf.columns
                else [None] * n
            )
            for i in range(n):
                if payloads[i] is None and wet[i] is not None:
                    # WET conversion record: the text IS the extraction
                    # output (Common Crawl pre-extracted it) — pass it
                    # through verbatim instead of failing on a null
                    # payload, with the same digest convention
                    out["text"][i] = wet[i]
                    out["text_sha256"][i] = sha256_text(wet[i])
                    out["parse_ok"][i] = True
                    out["branch"][i] = "wet"
                    continue
                r = extract_document(payloads[i], cfg, pixel_decode)
                out["text"][i] = r.text
                out["text_sha256"][i] = r.text_sha256
                out["n_blocks_kept"][i] = r.n_blocks_kept
                out["n_blocks_dropped"][i] = r.n_blocks_dropped
                out["parse_ok"][i] = r.parse_ok
                out["branch"][i] = r.branch
                out["error"][i] = r.error or None
            yield pd.DataFrame(out)

    return extract_batch


# logical operators that introduce an exchange: downstream of one, the
# frame's partitioning is (at least) spark.sql.shuffle.partitions wide
_WIDE_NODES = ("Join", "Aggregate", "Window", "Deduplicate", "Repartition",
               "Sort")


def _local_row_groups(files: list[str]) -> int | None:
    """Total parquet row groups across LOCAL input files, or None when any
    file is remote/unreadable (callers must then stay conservative). Row
    groups bound how many scan partitions can actually carry rows — with
    a files.minPartitionNum floor, byte-range splits of a one-row-group
    file are empty except one, so the raw partition COUNT over-reports
    parallelism."""
    if not files:
        return None
    try:
        import pyarrow.parquet as pq

        total = 0
        for f in files:
            if f.startswith("file:"):
                f = f[5:]
            elif "://" in f:
                return None
            if not os.path.exists(f):
                return None
            total += pq.ParquetFile(f).metadata.num_row_groups
        return total
    except Exception:
        return None


def _needs_fanout_shuffle(pages: DataFrame, n_parts: int) -> bool:
    """Best-effort auto decision for the salted repartition: False only
    when the input is provably at least min(n_parts, cores)-way parallel.

    Wide plans (joins/aggregates/windows/repartitions upstream) are
    judged by spark.sql.shuffle.partitions — their output partitioning —
    WITHOUT touching df.rdd: materializing the RDD of an adaptive plan
    finalizes it and eagerly runs every upstream shuffle stage at
    plan-declaration time. Narrow scan-shaped plans have no stages to
    run, so the exact partition count is safe to read there; it is then
    clamped by the input files' total parquet row-group count, because
    split-size floors can produce byte-range splits that carry no rows.
    Anything unprovable keeps the shuffle (the skew-defense default)."""
    try:
        spark = pages.sparkSession
        need = min(n_parts, spark.sparkContext.defaultParallelism)
        lp = pages._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
        if any(k in lp for k in _WIDE_NODES):
            return int(spark.conf.get("spark.sql.shuffle.partitions")) < need
        incoming = pages.rdd.getNumPartitions()  # narrow: nothing to run
        rgs = _local_row_groups(pages.inputFiles())
        if rgs is not None:
            incoming = min(incoming, rgs)
        return incoming < need
    except Exception:
        return True


def extract_pages(
    pages: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    n_partitions: int | None = None,
    shuffle: bool | None = None,
) -> DataFrame:
    """Declare the extraction plan over a `pages` DataFrame.

    ``n_partitions`` defaults to ``cfg.n_buckets`` — on a real cluster set
    it to ~2-3x total cores; AQE cannot resize this map stage, so the
    repartition width is the parallelism knob.

    ``shuffle`` controls the salted repartition ahead of the kernel stage:
    ``True`` forces it (skew defense for inputs clustered by host/crawl
    order), ``False`` skips it, and the default ``None`` skips it only
    when the incoming frame already has at least ``min(n_partitions,
    defaultParallelism)`` partitions — a well-sharded corpus then flows
    scan -> kernel with NO shuffle of the payload bytes at all (guide
    §2.4/§8: the extraction output is per-row pure, so partitioning can
    never change results — oracle-pinned). The shuffle stays the default
    whenever the input arrives in few or skewed partitions.
    """
    n_parts = n_partitions or cfg.n_buckets
    # WET conversion rows (html null, text pre-extracted by the crawl)
    # pass through the kernel stage verbatim when cfg.wet_passthrough;
    # their lineage hash keys on the text bytes so delta extraction
    # still detects changes. Off by default: reading `text` would break
    # the F1 column-pruning invariant for ordinary corpora.
    use_wet = cfg.wet_passthrough and "text" in pages.columns
    wet_text = (
        F.when(F.col("html").isNull(), F.col("text"))
        if use_wet
        else F.lit(None).cast("string")
    )
    src = pages.select(
        "url",
        "warc_ts",
        "html",
        wet_text.alias("wet_text"),
        "lang",
        url_bucket_col(F.col("url"), cfg.n_buckets, cfg.salt).alias("bucket"),
        # JVM-side input hash (xxhash64 of the raw input) rides through
        # the kernel untouched: input lineage + delta-extraction key
        F.xxhash64(
            F.coalesce(F.col("html"), F.encode(wet_text, "utf-8"))
            if use_wet
            else F.col("html")
        ).alias("payload_xxh"),
    )
    if shuffle is None:
        shuffle = _needs_fanout_shuffle(pages, n_parts)
    if shuffle:
        # The one shuffle: salted url-hash. Bucket count (lineage
        # granularity) and partition count (parallelism) are decoupled on
        # purpose.
        src = src.repartition(n_parts, "bucket", "url")
    return src.mapInPandas(make_extract_batch(cfg), schema=EXTRACTED_SCHEMA)


def extraction_metrics(extracted: DataFrame) -> DataFrame:
    """Per-bucket extraction metrics (A3/A4 analog: the reference's
    instance-status aggregation, status_server.py:56-123, re-expressed as a
    groupBy over lineage buckets)."""
    return extracted.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).cast("long").alias("n_failures"),
        F.sum("n_blocks_kept").cast("long").alias("blocks_kept"),
        F.sum("n_blocks_dropped").cast("long").alias("blocks_dropped"),
    )


def with_config(**overrides) -> ExtractConfig:
    return replace(DEFAULT_CONFIG, **overrides)

"""Extraction job entry point.

Launch (cluster):
    zip -r paddle_spark.zip paddle_spark
    spark-submit --py-files paddle_spark.zip jobs/extract.py \
        --input <pages table/path> --output <extracted path> \
        --checkpoint <checkpoint path> --run-id R1 --n-partitions 2048

Launch (sandbox smoke):
    spark-submit --master 'local[8]' --py-files paddle_spark.zip \
        jobs/extract.py --gen 2000 --output /tmp/out --checkpoint /tmp/cp

Re-running the same command with the same --run-id resumes: buckets with
committed lineage are anti-joined away and their output partitions are
left untouched (idempotent per-bucket overwrite).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Allow running from the source tree without --py-files (dev convenience);
# on a cluster the zip on --py-files provides the package instead.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="paddle_spark extraction job")
    ap.add_argument("--input", help="pages parquet path (url, warc_ts, html, text, lang)")
    ap.add_argument("--input-warc", nargs="+", default=None, metavar="PATH",
                    help="instead of --input, WARC/WET archive paths "
                         "(Common Crawl's native layout; one archive = one "
                         "task via warc_paths_to_pages)")
    ap.add_argument("--gen", type=int, default=0,
                    help="instead of --input, synthesize N deterministic pages")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--output", default=None, help="extracted parquet dir path")
    ap.add_argument("--checkpoint", default=None, help="checkpoint parquet dir path")
    ap.add_argument("--output-table", default=None,
                    help="catalog table target instead of --output (Iceberg: "
                         "writeTo().overwritePartitions() per bucket)")
    ap.add_argument("--checkpoint-table", default=None,
                    help="catalog table for lineage instead of --checkpoint")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--n-partitions", type=int, default=None,
                    help="map-stage width (default: n_buckets)")
    ap.add_argument("--n-buckets", type=int, default=64,
                    help="lineage granularity (checkpoint unit)")
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--bucket-groups", type=int, default=1,
                    help="commit incrementally in N sequential bucket groups\n"
                         "(crash loses at most one group)")
    ap.add_argument("--max-pages-per-doc", type=int, default=None)
    ap.add_argument("--ocr-images", action="store_true",
                    help="run the deterministic OCR chain over standalone "
                         "image payloads (off by default: keeps pixel "
                         "decode off the hot path)")
    ap.add_argument("--no-ocr-scanned-pdfs", dest="ocr_scanned_pdfs",
                    action="store_false", default=True,
                    help="disable the scanned-PDF image-XObject OCR fallback")
    ap.add_argument("--pixel-codec", default="auto",
                    choices=["auto", "python", "system", "native", "off"],
                    help="decode path for any pixel work (kernels/pixels."
                         "decoder_for); 'auto' = system codecs when "
                         "bound, pure Python otherwise")
    args = ap.parse_args(argv)
    if sum(bool(x) for x in (args.gen, args.input, args.input_warc)) != 1:
        ap.error("exactly one of --input / --input-warc / --gen is required")
    if not args.output and not args.output_table:
        ap.error("one of --output / --output-table is required")
    if not args.checkpoint and not args.checkpoint_table:
        ap.error("one of --checkpoint / --checkpoint-table is required")

    from pyspark.sql import SparkSession

    from paddle_spark.config import ExtractConfig
    from paddle_spark.operators.checkpoint import (
        run_extract_job,
        run_extract_job_grouped,
    )
    from paddle_spark.sources.synth import gen_pages_spark

    # spark-submit owns master/memory; default only if launched bare.
    spark = (
        SparkSession.builder.appName("paddle_spark_extract")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    cfg = ExtractConfig(
        n_buckets=args.n_buckets,
        salt=args.salt,
        max_pages_per_doc=args.max_pages_per_doc,
        # WET conversion records carry pre-extracted text; only archive
        # ingestion opts into reading the text column
        wet_passthrough=bool(args.input_warc),
        ocr_images=args.ocr_images,
        ocr_scanned_pdfs=args.ocr_scanned_pdfs,
        pixel_codec=args.pixel_codec,
    )

    if args.gen:
        n_parts = args.n_partitions or spark.sparkContext.defaultParallelism
        pages = gen_pages_spark(spark, args.gen, seed=args.seed, n_partitions=n_parts)
    elif args.input_warc:
        from paddle_spark.sources.warc import warc_paths_to_pages

        pages = warc_paths_to_pages(spark, args.input_warc)
    else:
        pages = spark.read.parquet(args.input)

    if args.bucket_groups > 1:
        summary = run_extract_job_grouped(
            spark, pages, output_path=args.output,
            checkpoint_path=args.checkpoint, run_id=args.run_id, cfg=cfg,
            n_groups=args.bucket_groups, n_partitions=args.n_partitions,
            output_table=args.output_table,
            checkpoint_table=args.checkpoint_table,
        )
    else:
        summary = run_extract_job(
            spark,
            pages,
            output_path=args.output,
            checkpoint_path=args.checkpoint,
            run_id=args.run_id,
            cfg=cfg,
            n_partitions=args.n_partitions,
            output_table=args.output_table,
            checkpoint_table=args.checkpoint_table,
        )
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Multimodal media job: (media_id, payload) -> metadata / pixels / features.

    spark-submit --py-files paddle_spark.zip jobs/media.py \
        --gen 3000 --output /tmp/media_out --codec system --features

The image-pipeline user surface as a launchable job (the same
spark-submit contract as jobs/extract.py): binary metadata always;
REAL pixel statistics and dhash/histogram visual features when the
codec knob allows decode. ``--codec`` is ExtractConfig.pixel_codec's
CLI face — 'python' (pure, bit-exact), 'system' (ctypes libpng/giflib/
libwebp where present), 'native' (PIL), 'fake' (digest stand-in,
metadata-only pipelines), and refuses decode-dependent outputs under
'off' at plan construction, not per-row.

Prints one JSON line: {"n_media", "n_decoded", "decode_rate",
"by_kind": {...}, "elapsed_sec", "imgs_per_sec"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="paddle_spark media job")
    ap.add_argument("--input", help="parquet with (media_id long, payload binary)")
    ap.add_argument("--gen", type=int, default=0,
                    help="synthesize N mixed-codec images instead")
    ap.add_argument("--output", required=True)
    ap.add_argument("--codec", default="auto",
                    choices=["auto", "python", "system", "native", "fake"])
    ap.add_argument("--features", action="store_true",
                    help="also write dhash + histogram visual features")
    ap.add_argument("--max-dim", type=int, default=640)
    ap.add_argument("--n-partitions", type=int, default=None)
    args = ap.parse_args(argv)
    if not args.gen and not args.input:
        ap.error("one of --input / --gen is required")

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.appName("paddle_spark_media")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from paddle_spark.operators.multimodal import (
        binary_meta, pixel_stats, visual_features,
    )
    from paddle_spark.sources.synth import gen_media_spark

    n_parts = args.n_partitions or spark.sparkContext.defaultParallelism
    if args.gen:
        media = gen_media_spark(spark, args.gen, n_partitions=n_parts)
    else:
        media = spark.read.parquet(args.input)

    t0 = time.time()
    meta = binary_meta(media)
    meta.write.mode("overwrite").parquet(os.path.join(args.output, "meta"))

    n_decoded = None
    if args.codec != "fake":
        stats = pixel_stats(media, max_dim=args.max_dim, codec=args.codec)
        stats.write.mode("overwrite").parquet(
            os.path.join(args.output, "pixels")
        )
        n_decoded = (
            spark.read.parquet(os.path.join(args.output, "pixels"))
            .filter(F.col("decode_ok"))
            .count()
        )
    if args.features and args.codec == "fake":
        # visual_features has no digest stand-in arm (decoder_for knows
        # no 'fake'); skip it like the pixel stage does instead of
        # crashing on a flag combination the CLI accepts
        print("skipping --features: codec='fake' has no pixel decode",
              file=sys.stderr)
    if args.features and args.codec != "fake":
        feats = visual_features(media, codec=args.codec)
        feats.write.mode("overwrite").parquet(
            os.path.join(args.output, "features")
        )
    elapsed = time.time() - t0

    meta_df = spark.read.parquet(os.path.join(args.output, "meta"))
    n_media = meta_df.count()
    by_kind = {
        r["kind"]: r["n"]
        for r in meta_df.groupBy("kind").agg(F.count("*").alias("n")).collect()
    }
    print(
        json.dumps(
            {
                "n_media": n_media,
                "n_decoded": n_decoded,
                "decode_rate": (
                    round(n_decoded / n_media, 4) if n_decoded is not None
                    and n_media else None
                ),
                "by_kind": by_kind,
                "elapsed_sec": round(elapsed, 3),
                "imgs_per_sec": round(n_media / elapsed, 1) if elapsed else None,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Incremental extraction across snapshots (operators/delta.py):
only changed payloads re-extract, and the merged output is row-identical
to a full re-extraction of the new snapshot."""

import pytest
from pyspark.sql import functions as F

from paddle_spark.operators.delta import delta_extract, delta_stats
from paddle_spark.operators.extract_job import extract_pages
from paddle_spark.sources.synth import gen_pages_spark


@pytest.fixture(scope="module")
def snapshots(spark):
    # snapshot 1: docs 0..199 (seed 42); snapshot 2: same urls, but docs
    # 0..39 re-rendered with a different seed (changed payloads) + 20 new
    from paddle_spark.sources.synth import gen_page_row

    v1 = gen_pages_spark(spark, 200, seed=42, n_partitions=4)
    # changed: v1's first 40 urls re-rendered with a different seed
    v1_rows = sorted([r["url"] for r in v1.collect()])[:40]
    changed_rows = []
    for k, url in enumerate(v1_rows):
        _, ts, payload, text, lang = gen_page_row(k, seed=43)
        changed_rows.append((url, ts, payload, text, lang))
    changed = spark.createDataFrame(
        changed_rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    keep = v1.join(changed.select("url"), "url", "left_anti")
    extra = gen_pages_spark(spark, 20, seed=42, n_partitions=2, start=10000)
    v2 = keep.unionByName(changed).unionByName(extra)
    return v1, v2


def test_delta_equals_full_reextraction(spark, snapshots):
    v1, v2 = snapshots
    prev = extract_pages(v1, n_partitions=4).withColumn("run_id", F.lit("r1"))
    merged = delta_extract(v2, prev, n_partitions=4)
    full = extract_pages(v2, n_partitions=4)
    assert merged.count() == v2.count()
    m = {r["url"]: (r["text_sha256"], r["payload_xxh"]) for r in merged.collect()}
    f = {r["url"]: (r["text_sha256"], r["payload_xxh"]) for r in full.collect()}
    assert m == f, "delta output must equal full re-extraction"


def test_delta_stats_counts(spark, snapshots):
    v1, v2 = snapshots
    prev = extract_pages(v1, n_partitions=4)
    s = delta_stats(v2, prev)
    assert s["snapshot_docs"] == 220
    assert s["to_extract"] == 60          # 40 changed + 20 new
    assert s["unchanged"] == 160
    assert 0.72 < s["work_saved_frac"] < 0.73


def test_delta_only_extracts_changed(spark, snapshots):
    """The fresh branch's plan touches only changed/new rows (anti-join),
    never the unchanged majority."""
    v1, v2 = snapshots
    prev = extract_pages(v1, n_partitions=4)
    new_keyed = v2.withColumn("payload_xxh", F.xxhash64("html"))
    todo = new_keyed.join(
        prev.select("url", "payload_xxh"), ["url", "payload_xxh"], "left_anti"
    )
    assert todo.count() == 60

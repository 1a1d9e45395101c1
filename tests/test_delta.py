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


def test_delta_duplicate_keys(spark, snapshots):
    """Crawls re-fetch pages: duplicate (url, payload_xxh) rows in either
    the snapshot or the previous output collapse to one — merged output
    equals full re-extraction of the deduplicated snapshot."""
    v1, v2 = snapshots
    # duplicate rows on both sides: v2 with 30 rows repeated, prev built
    # from v1 with 25 rows repeated (e.g. two runs unioned)
    v2_dup = v2.unionByName(v2.limit(30))
    prev_dup = extract_pages(v1, n_partitions=4)
    prev_dup = prev_dup.unionByName(prev_dup.limit(25)).withColumn(
        "run_id", F.lit("r1")
    )
    merged = delta_extract(v2_dup, prev_dup, n_partitions=4)
    full = extract_pages(v2.dropDuplicates(["url"]), n_partitions=4)
    assert merged.count() == v2.count()  # one row per distinct key
    m = {r["url"]: (r["text_sha256"], r["payload_xxh"]) for r in merged.collect()}
    f = {r["url"]: (r["text_sha256"], r["payload_xxh"]) for r in full.collect()}
    assert m == f


def test_delta_job_static_overwrite(spark, snapshots, tmp_path):
    """Reusing an output dir across snapshot runs must not leave stale
    bucket partitions behind when a bucket's urls all disappear."""
    import jobs.delta as job

    v1, v2 = snapshots
    (tmp_path / "snap1").mkdir()
    v1.write.mode("overwrite").parquet(str(tmp_path / "snap1" / "pages"))
    # shrink: keep only 10 urls — most buckets empty out entirely
    v_small = v2.orderBy("url").limit(10)
    v_small.write.mode("overwrite").parquet(str(tmp_path / "snap2"))
    prev = extract_pages(v1, n_partitions=4).withColumn("run_id", F.lit("r1"))
    prev.write.mode("overwrite").parquet(str(tmp_path / "prev"))
    out = str(tmp_path / "out")
    rc = job.main(["--input-new", str(tmp_path / "snap1" / "pages"),
                   "--prev", str(tmp_path / "prev"), "--output", out])
    assert rc == 0
    rc = job.main(["--input-new", str(tmp_path / "snap2"),
                   "--prev", str(tmp_path / "prev"), "--output", out])
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.count() == 10  # no stale rows from the first run
    # output == prev is refused
    with pytest.raises(SystemExit):
        job.main(["--input-new", str(tmp_path / "snap2"),
                  "--prev", str(tmp_path / "prev"),
                  "--output", str(tmp_path / "prev")])


def test_delta_wet_snapshot(spark):
    """WET conversion rows (html null, text pre-extracted) must key the
    delta on the text bytes: unchanged WET rows carry forward (never
    re-extract), changed ones re-run, and distinct-text WET rows sharing
    a url keep distinct keys instead of collapsing under a constant
    null-input hash."""
    import datetime as dt

    from paddle_spark.operators.extract_job import with_config

    ts = dt.datetime(2024, 1, 1)
    wet1 = [(f"https://wet{i}.example/p", ts, None, f"wet text {i}", "en")
            for i in range(20)]
    # same url, two distinct WET texts — both must survive
    wet1 += [("https://wetdup.example/p", ts, None, "alpha text", "en"),
             ("https://wetdup.example/p", ts, None, "beta text", "en")]
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    v1 = gen_pages_spark(spark, 30, seed=42, n_partitions=2).unionByName(
        spark.createDataFrame(wet1, schema)
    )
    # v2: first 5 WET rows change text, rest identical
    wet2 = [(f"https://wet{i}.example/p", ts, None,
             f"changed wet {i}" if i < 5 else f"wet text {i}", "en")
            for i in range(20)]
    wet2 += wet1[20:]
    v2 = gen_pages_spark(spark, 30, seed=42, n_partitions=2).unionByName(
        spark.createDataFrame(wet2, schema)
    )
    cfg = with_config(wet_passthrough=True)
    prev = extract_pages(v1, cfg, n_partitions=4)
    s = delta_stats(v2, prev, wet=True)
    assert s["snapshot_docs"] == 52
    assert s["to_extract"] == 5, "unchanged WET rows must not re-extract"
    merged = delta_extract(v2, prev, cfg, n_partitions=4)
    full = extract_pages(v2, cfg, n_partitions=4)
    assert merged.count() == full.count() == 52
    m = {(r["url"], r["payload_xxh"]): r["text_sha256"] for r in merged.collect()}
    f = {(r["url"], r["payload_xxh"]): r["text_sha256"] for r in full.collect()}
    assert m == f, "WET delta output must equal full re-extraction"
    # every WET row passed through (no parse_ok=false regressions)
    bad = merged.filter(F.col("url").contains(".example/") & ~F.col("parse_ok"))
    assert bad.count() == 0


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


def test_delta_bloom_prefilter_identical(spark, snapshots):
    """The Bloom-prefilter arm must be row-identical to the plain path:
    no false negatives means nothing unchanged leaks into re-extraction
    incorrectly and nothing new is lost."""
    v1, v2 = snapshots
    prev = extract_pages(v1, n_partitions=4).withColumn("run_id", F.lit("r1"))
    plain = delta_extract(v2, prev, n_partitions=4)
    bloomed = delta_extract(v2, prev, n_partitions=4, bloom_prefilter=True)
    p = {r["url"]: (r["text_sha256"], r["payload_xxh"]) for r in plain.collect()}
    b = {r["url"]: (r["text_sha256"], r["payload_xxh"]) for r in bloomed.collect()}
    assert p == b

"""Checkpoint lineage + idempotent resume (SURVEY.md §5.4).

Simulates a crash after a partial run: first run covers only half the
buckets (its checkpoint rows committed), then the full job resumes and
must (a) skip completed buckets, (b) produce exactly-once output per url,
(c) leave lineage rows for every bucket.
"""

import pytest
from pyspark.sql import functions as F

from paddle_spark.config import ExtractConfig
from paddle_spark.functions import url_bucket_col
from paddle_spark.operators.checkpoint import (
    completed_buckets,
    read_checkpoint,
    run_extract_job,
)

CFG = ExtractConfig(n_buckets=8)


@pytest.fixture()
def paths(tmp_path):
    return str(tmp_path / "extracted"), str(tmp_path / "checkpoint")


def test_full_run_writes_lineage(spark, tiny_pages, paths):
    out_path, cp_path = paths
    summary = run_extract_job(
        spark, tiny_pages, out_path, cp_path, run_id="r1", cfg=CFG, n_partitions=4
    )
    assert summary["n_docs"] == tiny_pages.count()
    cp = read_checkpoint(spark, cp_path)
    rows = cp.filter(F.col("run_id") == "r1").collect()
    assert {r["bucket"] for r in rows} == set(range(CFG.n_buckets))
    assert all(r["status"] == "success" for r in rows)
    assert sum(r["n_docs"] for r in rows) == summary["n_docs"]
    assert all(r["docs_per_sec"] > 0 for r in rows)


def test_resume_skips_done_buckets_exactly_once(spark, tiny_pages, paths):
    out_path, cp_path = paths
    # --- phase 1: "crashed" run that only processed buckets 0-3 ---
    half = tiny_pages.withColumn(
        "b", url_bucket_col(F.col("url"), CFG.n_buckets, CFG.salt)
    ).filter(F.col("b") < 4).drop("b")
    s1 = run_extract_job(
        spark, half, out_path, cp_path, run_id="r2", cfg=CFG, n_partitions=4
    )
    done = completed_buckets(spark, cp_path, "r2")
    assert {r["bucket"] for r in done.collect()} == {0, 1, 2, 3}

    # --- phase 2: resume with the FULL input ---
    s2 = run_extract_job(
        spark, tiny_pages, out_path, cp_path, run_id="r2", cfg=CFG, n_partitions=4
    )
    assert s2["buckets_skipped"] == 4
    # resumed run processed only the remainder
    assert s1["n_docs"] + s2["n_docs"] == tiny_pages.count()

    # exactly-once per url in the final output
    out = spark.read.parquet(out_path)
    assert out.count() == tiny_pages.count()
    assert out.select("url").distinct().count() == tiny_pages.count()

    # lineage: one success row per bucket for r2
    cp = read_checkpoint(spark, cp_path).filter(F.col("run_id") == "r2")
    per_bucket = cp.groupBy("bucket").count().collect()
    assert {r["bucket"] for r in per_bucket} == set(range(CFG.n_buckets))
    assert all(r["count"] == 1 for r in per_bucket)


def test_crash_then_resume_exactly_once(spark, tiny_pages, paths):
    """A task-level crash (fault injection, not per-doc) fails the whole
    job atomically: no partial output commit, no checkpoint rows. The
    clean re-run then completes exactly-once."""
    import pytest as _pytest

    from dataclasses import replace

    out_path, cp_path = paths
    poisoned = replace(CFG, fail_batch_marker="/p/000000")  # hits many batches
    with _pytest.raises(Exception):
        run_extract_job(
            spark, tiny_pages, out_path, cp_path, run_id="r4", cfg=poisoned,
            n_partitions=4,
        )
    # job-level atomicity: no committed output, no lineage rows
    import os

    committed = os.path.exists(os.path.join(out_path, "_SUCCESS")) or any(
        f.endswith(".parquet")
        for root, _, fs in os.walk(out_path)
        for f in fs
        if "_temporary" not in root
    ) if os.path.isdir(out_path) else False
    assert not committed
    assert completed_buckets(spark, cp_path, "r4").count() == 0

    # clean resume completes everything exactly-once
    s = run_extract_job(
        spark, tiny_pages, out_path, cp_path, run_id="r4", cfg=CFG, n_partitions=4
    )
    assert s["n_docs"] == tiny_pages.count()
    out = spark.read.parquet(out_path)
    assert out.select("url").distinct().count() == tiny_pages.count()


def test_grouped_commit_bounds_rework(spark, tiny_pages, paths):
    """Crash mid-run with grouped commits: completed groups stay durable,
    the re-run redoes only the remainder."""
    import pytest as _pytest
    from dataclasses import replace

    from paddle_spark.operators.checkpoint import run_extract_job_grouped

    out_path, cp_path = paths
    # find a url in the LAST group (bucket % 4 == 3) to poison
    victim = (
        tiny_pages.withColumn(
            "b", url_bucket_col(F.col("url"), CFG.n_buckets, CFG.salt)
        )
        .filter(F.col("b") % 4 == 3)
        .select("url")
        .first()["url"]
    )
    poisoned = replace(CFG, fail_batch_marker=victim)
    with _pytest.raises(Exception):
        run_extract_job_grouped(
            spark, tiny_pages, out_path, cp_path, run_id="rg", cfg=poisoned,
            n_groups=4, n_partitions=4,
        )
    # groups 0-2 committed durably (their buckets have lineage), group 3 not
    done = {r["bucket"] for r in completed_buckets(spark, cp_path, "rg").collect()}
    assert done and all(b % 4 != 3 for b in done)

    # clean resume completes only the remainder, exactly-once overall
    s = run_extract_job_grouped(
        spark, tiny_pages, out_path, cp_path, run_id="rg", cfg=CFG,
        n_groups=4, n_partitions=4,
    )
    assert s["buckets_skipped"] == len(done)
    out = spark.read.parquet(out_path)
    assert out.count() == tiny_pages.count()
    assert out.select("url").distinct().count() == tiny_pages.count()


def test_rerun_same_run_id_is_noop(spark, tiny_pages, paths):
    out_path, cp_path = paths
    run_extract_job(spark, tiny_pages, out_path, cp_path, run_id="r3", cfg=CFG)
    before = spark.read.parquet(out_path).count()
    s = run_extract_job(spark, tiny_pages, out_path, cp_path, run_id="r3", cfg=CFG)
    assert s["n_docs"] == 0
    assert s["buckets_skipped"] == CFG.n_buckets
    assert spark.read.parquet(out_path).count() == before


def test_reused_output_dir_never_attributes_stale_data(spark, tiny_pages, paths):
    """Round-1 advice repro: a grouped run into a directory that already
    holds an EARLIER run's output must (a) not record the old run's docs as
    this run's successes, (b) actually process every group of the current
    input. Exactness comes from the per-row run_id stamp."""
    from paddle_spark.operators.checkpoint import run_extract_job_grouped

    out_path, cp_path = paths
    # old run over the full corpus, separate checkpoint dir (dead lineage)
    run_extract_job(
        spark, tiny_pages, out_path, cp_path + "_old", run_id="old", cfg=CFG,
        n_partitions=4,
    )
    # new grouped run over a 60-doc subset into the SAME output dir
    subset = tiny_pages.limit(60)
    n_subset = subset.count()
    s = run_extract_job_grouped(
        spark, subset, out_path, cp_path, run_id="new", cfg=CFG, n_groups=4,
        n_partitions=4,
    )
    assert s["n_docs"] == n_subset, "lineage must count ONLY this run's docs"
    cp = read_checkpoint(spark, cp_path).filter(F.col("run_id") == "new")
    assert sum(r["n_docs"] for r in cp.collect()) == n_subset
    # and the output rows carry their producing run_id
    out = spark.read.parquet(out_path)
    per_run = {r["run_id"]: r["n"] for r in out.groupBy("run_id").agg(F.count("*").alias("n")).collect()}
    assert per_run["new"] == n_subset


def test_metrics_read_is_partition_pruned(spark, tiny_pages, paths):
    """The lineage/metrics read must touch only this run's bucket
    partitions — never a full-table scan of the output dir (round-1
    verdict item #6)."""
    out_path, cp_path = paths
    # pre-existing durable lineage for buckets 0-5 under the same run_id
    half = tiny_pages.withColumn(
        "b", url_bucket_col(F.col("url"), CFG.n_buckets, CFG.salt)
    ).filter(F.col("b") < 6).drop("b")
    run_extract_job(spark, half, out_path, cp_path, run_id="r9", cfg=CFG,
                    n_partitions=4)
    # resume: only buckets 6,7 remain
    run_extract_job(spark, tiny_pages, out_path, cp_path, run_id="r9",
                    cfg=CFG, n_partitions=4)
    # replicate the metrics read the job performs and check that the scan
    # (a) partition-prunes on bucket and (b) never reads the heavy text col
    out = spark.read.parquet(out_path)
    pruned = out.filter(
        F.col("bucket").isin([6, 7]) & (F.col("run_id") == "r9")
    ).groupBy("bucket").count()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split(
        "PartitionFilters", 1
    )[1][:200], plan
    scan = plan.split("ReadSchema", 1)[1][:300]
    assert "text" not in scan, scan


def test_table_write_branch(spark, tiny_pages, tmp_path):
    """The writeTo()-based table sink (the Iceberg binding; here exercised
    against the session catalog): create-partitioned on first run, append
    for checkpoint rows, run_extract_job end-to-end with table targets."""
    from paddle_spark.operators.checkpoint import iceberg_catalog_configured

    assert not iceberg_catalog_configured(spark)  # sandbox: no iceberg jar
    out_t, cp_t = "ps_out_tbl", "ps_cp_tbl"
    for t in (out_t, cp_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        s = run_extract_job(
            spark, tiny_pages, str(tmp_path / "unused_out"),
            str(tmp_path / "unused_cp"), run_id="t1", cfg=CFG, n_partitions=4,
            output_table=out_t, checkpoint_table=cp_t,
        )
        assert s["n_docs"] == tiny_pages.count()
        assert spark.table(out_t).count() == s["n_docs"]
        cp = spark.table(cp_t)
        assert cp.filter(F.col("run_id") == "t1").count() == CFG.n_buckets
        # partitioning metadata captured at create time
        desc = spark.sql(f"DESCRIBE TABLE {out_t}").collect()
        assert any("bucket" in (r["col_name"] or "") for r in desc)
        # second invocation, same run_id: everything skipped, lineage append-only
        s2 = run_extract_job(
            spark, tiny_pages, str(tmp_path / "unused_out"),
            str(tmp_path / "unused_cp"), run_id="t1", cfg=CFG, n_partitions=4,
            output_table=out_t, checkpoint_table=cp_t,
        )
        assert s2["n_docs"] == 0 and s2["buckets_skipped"] == CFG.n_buckets
        assert spark.table(out_t).count() == s["n_docs"]
    finally:
        for t in (out_t, cp_t):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_iceberg_catalog_contract(spark, tiny_pages, tmp_path):
    """The REAL Iceberg arm (writeTo + overwritePartitions on an Iceberg
    catalog), gated on the runtime jar being on the classpath — the same
    run-where-available pattern as the PIL parity tests. In this sandbox
    the jar is absent and the test skips; on a cluster image with
    iceberg-spark-runtime it exercises: hadoop-catalog binding,
    create-partitioned on first write, ACID overwritePartitions replacing
    exactly the buckets present on resume, and append-only lineage."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        pytest.skip("iceberg-spark-runtime jar not on the classpath")

    from paddle_spark.operators.checkpoint import iceberg_catalog_configured

    spark.conf.set("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", str(tmp_path / "wh"))
    assert iceberg_catalog_configured(spark, "ice")
    out_t, cp_t = "ice.db.ps_out", "ice.db.ps_cp"
    try:
        s = run_extract_job(
            spark, tiny_pages, str(tmp_path / "uo"), str(tmp_path / "uc"),
            run_id="i1", cfg=CFG, n_partitions=4,
            output_table=out_t, checkpoint_table=cp_t,
        )
        assert s["n_docs"] == tiny_pages.count()
        n_total = spark.table(out_t).count()
        assert n_total == s["n_docs"]
        # same run_id: full resume, zero new rows, lineage intact
        s2 = run_extract_job(
            spark, tiny_pages, str(tmp_path / "uo"), str(tmp_path / "uc"),
            run_id="i1", cfg=CFG, n_partitions=4,
            output_table=out_t, checkpoint_table=cp_t,
        )
        assert s2["n_docs"] == 0 and s2["buckets_skipped"] == CFG.n_buckets
        assert spark.table(out_t).count() == n_total
        # new run over a SUBSET of buckets: overwritePartitions must
        # replace exactly those buckets and leave the rest untouched
        sub = tiny_pages.withColumn(
            "b", url_bucket_col(F.col("url"), CFG.n_buckets, CFG.salt)
        ).filter(F.col("b") < 2).drop("b")
        run_extract_job(
            spark, sub, str(tmp_path / "uo"), str(tmp_path / "uc"),
            run_id="i2", cfg=CFG, n_partitions=4,
            output_table=out_t, checkpoint_table=cp_t,
        )
        out = spark.table(out_t)
        assert out.count() == n_total  # same rows, buckets 0-1 replaced
        assert out.filter((F.col("bucket") < 2) & (F.col("run_id") == "i2")).count() > 0
        assert out.filter((F.col("bucket") >= 2) & (F.col("run_id") != "i1")).count() == 0
    finally:
        for t in (out_t, cp_t):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

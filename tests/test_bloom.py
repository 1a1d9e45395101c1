"""Bloom-filter corpus membership: no false negatives ever, bounded
false positives, exact agreement with the anti-join on the fixture,
and a map-only probe plan (broadcast joins, no shuffle of the probed
side)."""

from __future__ import annotations

from pyspark.sql import functions as F

from paddle_spark.operators.bloom import (
    DEFAULT_K,
    DEFAULT_M_BITS,
    bloom_build,
    bloom_filter_new,
    bloom_probe,
)


def _corpus(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(f"{tag} document body "), F.col("id")).alias("text"),
    )


def test_no_false_negatives(spark):
    corpus = _corpus(spark, 0, 2000, "old")
    bloom = bloom_build(corpus, "text")
    probed = bloom_probe(corpus, bloom, "text")
    assert probed.filter(~F.col("in_bloom")).count() == 0


def test_false_positive_rate_bounded(spark):
    """2000 inserted keys at m=2^18, k=5 -> expected FP rate ~7e-8;
    assert the measured rate on 2000 disjoint keys stays under 1%."""
    old = _corpus(spark, 0, 2000, "old")
    fresh = _corpus(spark, 0, 2000, "new")  # disjoint text by tag
    bloom = bloom_build(old, "text")
    fp = bloom_probe(fresh, bloom, "text").filter(F.col("in_bloom")).count()
    assert fp / 2000 < 0.01


def test_filter_new_matches_exact_anti_join(spark):
    old = _corpus(spark, 0, 1000, "doc")
    both = _corpus(spark, 0, 1500, "doc")  # 1000 old + 500 fresh
    bloom = bloom_build(old, "text")
    survivors = sorted(
        r["doc_id"] for r in bloom_filter_new(both, bloom, "text").collect()
    )
    exact = sorted(
        r["doc_id"]
        for r in both.join(old.select("text"), "text", "left_anti").collect()
    )
    assert survivors == exact
    assert survivors == list(range(1000, 1500))


def test_probe_plan_is_map_only_broadcast(spark):
    """The probed side must not shuffle: k broadcast hash joins, no
    sort-merge join, no cartesian product anywhere in the plan."""
    old = _corpus(spark, 0, 100, "old")
    bloom = bloom_build(old, "text")
    plan = bloom_probe(old, bloom, "text")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == DEFAULT_K
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bitset_bounded(spark):
    """The build output can never exceed m/64 rows — the broadcast-size
    guarantee the 100-TB story rests on."""
    corpus = _corpus(spark, 0, 5000, "x")
    n = bloom_build(corpus, "text").count()
    assert n <= DEFAULT_M_BITS // 64

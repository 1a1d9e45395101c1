"""Curation funnel: composed operators, planted dups removed end-to-end."""

import pytest
from pyspark.sql import functions as F

from paddle_spark.operators.curate import curate


DONOR_TEXT = (
    "The quick brown fox jumps over the lazy dog and it runs on for a "
    "while in the sun with a friend on the hill for fun and the day is "
    "long and the grass is green on the wide open field of the valley."
)


@pytest.fixture(scope="module")
def pages_with_dups(spark, tiny_pages):
    """tiny corpus + three pages with IDENTICAL crafted English content
    (guaranteed to pass the lang + quality gates) under distinct urls."""
    payload = (
        f"<html><body><article><p>{DONOR_TEXT}</p></article></body></html>"
    ).encode()
    rows = [
        (f"https://dup{k}.example/copy", None, payload, None, "en")
        for k in ("A", "B", "C")
    ]
    extra = spark.createDataFrame(rows, tiny_pages.schema)
    return tiny_pages.unionByName(extra)


def test_curation_funnel(spark, pages_with_dups):
    curated, counts = curate(
        pages_with_dups, langs=("en",), min_quality=0.2, min_tokens=10
    )
    rows = curated.collect()
    urls = {r["url"] for r in rows}

    # funnel is monotone and non-empty
    assert (
        counts["docs_in"]
        >= counts["extracted_ok"]
        >= counts["after_lang"]
        >= counts["after_quality"]
        >= counts["after_exact_dedup"]
        >= counts["after_near_dedup"]
        > 0
    )
    # the three identical copies collapsed to one representative (min url)
    survivors = {u for u in urls if u.startswith("https://dup")}
    assert survivors == {"https://dupA.example/copy"}
    # exact dedup removed at least the two planted copies
    assert counts["after_exact_dedup"] <= counts["after_quality"] - 2

    # every curated row satisfies the gates
    for r in rows:
        assert r["lang_guess"] == "en"
        assert r["quality_score"] >= 0.2
        assert r["n_tokens"] >= 10
        assert r["text"]


def test_curation_no_text_dups(spark, pages_with_dups):
    curated, _ = curate(pages_with_dups, langs=("en",), min_quality=0.2)
    n = curated.count()
    assert curated.select("text_sha256").distinct().count() == n


def test_repetition_gate(spark, tiny_pages):
    """The optional Gopher-repetition gate removes docs without changing
    any other stage (off by default = identical funnel)."""
    from paddle_spark.operators.curate import curate

    base, c0 = curate(tiny_pages, n_partitions=4)
    gated, c1 = curate(
        tiny_pages, n_partitions=4, max_dup_line_frac=0.05,
        max_top_bigram_frac=0.5,
    )
    assert "after_repetition" in c1 and "after_repetition" not in c0
    assert c1["after_repetition"] <= c1["after_quality"]
    assert gated.count() <= base.count()

"""Caption enrichment stage tests (J1/J2/J5/J6/X2/F5/F7/F8)."""

import pytest
from pyspark.sql import functions as F

from paddle_spark.operators.enrich import (
    block_keys,
    caption_blocks,
    image_keys,
    stub_caption_col,
)


@pytest.fixture(scope="module")
def fixtures(spark):
    blocks = spark.createDataFrame(
        [
            # url, page, block_id, label, x1,y1,x2,y2, text
            ("u1", 0, 0, "text", 0.0, 0.0, 500.0, 100.0, "intro para"),
            ("u1", 0, 1, "image", 100.0, 200.0, 400.0, 500.0, "fig"),
            ("u1", 0, 2, "image", 100.2, 199.8, 400.4, 499.6, "fig dup"),  # same key, later wins
            ("u1", 0, 3, "image", 10.0, 10.0, 50.0, 50.0, "tiny icon"),    # fails size gate
            ("u2", 0, 0, "image", 100.0, 200.0, 400.0, 500.0, "unmatched"),
        ],
        "url string, page_no int, block_id int, label string, "
        "x1 double, y1 double, x2 double, y2 double, text string",
    )
    images = spark.createDataFrame(
        [
            ("u1", 0, "img_in_image_box_100_200_400_500.jpg"),
            ("u1", 0, "img_in_image_box_10_10_50_50.jpg"),     # matches tiny -> gated out
            ("u1", 0, "other_image_77_88_99_11.jpg"),          # fails key-pattern filter
            ("u2", 0, "img_in_image_box_1_2_3_4.jpg"),         # no matching block key
        ],
        "url string, page_no int, filename string",
    )
    return blocks, images


def test_image_key_parse(fixtures):
    _, images = fixtures
    out = {r["filename"]: r["bbox_key"] for r in image_keys(images).collect()}
    assert out["img_in_image_box_100_200_400_500.jpg"] == "100_200_400_500"
    assert "other_image_77_88_99_11.jpg" not in out  # F7 pattern filter


def test_block_key_lastwins(fixtures):
    blocks, _ = fixtures
    bk = block_keys(blocks)
    dup = bk.filter(
        (F.col("url") == "u1") & (F.col("bbox_key") == "100_200_400_500")
    ).collect()
    assert len(dup) == 1
    assert dup[0]["block_id"] == 2  # later duplicate wins (J5)


def test_caption_merge_back(fixtures):
    blocks, images = fixtures
    out = {(r["url"], r["block_id"]): r for r in caption_blocks(blocks, images).collect()}
    # matched image block got the caption appended with a space (J6)
    captioned = out[("u1", 2)]
    assert captioned["captioned"]
    assert captioned["text"] == "fig dup [image 300x299]"
    # non-image and unmatched blocks pass through (J2)
    assert out[("u1", 0)]["text"] == "intro para" and not out[("u1", 0)]["captioned"]
    assert out[("u2", 0)]["text"] == "unmatched" and not out[("u2", 0)]["captioned"]
    # size-gated tiny image not captioned (F5)
    assert not out[("u1", 3)]["captioned"]


def test_disabled_flag_passthrough(fixtures):
    blocks, images = fixtures
    out = caption_blocks(blocks, images, enabled=False)
    assert out.filter(F.col("captioned")).count() == 0
    assert out.count() == blocks.count()


def test_stub_caption_deterministic(spark):
    df = spark.range(1).select(
        stub_caption_col(F.lit(0.0), F.lit(0.0), F.lit(250.0), F.lit(100.0)).alias("c")
    )
    assert df.collect()[0]["c"] == "[image 250x100]"


def test_caption_join_is_broadcast(fixtures):
    blocks, images = fixtures
    plan = caption_blocks(blocks, images)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_injectable_captioner_success(fixtures):
    blocks, images = fixtures
    out = caption_blocks(
        blocks, images, captioner=lambda w, h: f"a {w}x{h} figure"
    )
    rows = {(r["url"], r["block_id"]): r for r in out.collect()}
    assert rows[("u1", 2)]["captioned"]
    assert rows[("u1", 2)]["text"].endswith("a 300x299 figure")
    assert not rows[("u1", 0)]["captioned"]  # non-image untouched


def test_failing_captioner_isolated(fixtures):
    """J7 fault semantics: a captioner that raises never fails the stage —
    every block passes through, captioned=false (the batch analog of the
    reference's dropped caption thread, layout_captioning.py:407-421)."""
    blocks, images = fixtures

    def boom(w, h):
        raise RuntimeError("model down")

    out = caption_blocks(blocks, images, captioner=boom)
    rows = out.collect()
    assert len(rows) == 4  # 5 blocks minus one last-wins key collapse (J5)
    assert all(not r["captioned"] for r in rows)
    texts = {(r["url"], r["block_id"]): r["text"] for r in rows}
    assert texts[("u1", 2)] == "fig dup"  # original text intact


def test_slow_captioner_deadline(fixtures):
    """Batch deadline: once the budget is spent, remaining items are
    skipped (bounded stage latency), never an error."""
    import time

    blocks, images = fixtures

    def slow(w, h):
        time.sleep(0.2)
        return "late caption"

    out = caption_blocks(blocks, images, captioner=slow, caption_timeout_s=0.0)
    rows = out.collect()
    assert len(rows) == 4
    assert all(not r["captioned"] for r in rows)

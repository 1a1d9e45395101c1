"""Enrichment stage: image-block caption join + merge-back (SURVEY §2 M6).

Re-expresses the reference's caption pipeline as DataFrame stages:

1. Markdown image keys parse to bbox join keys — the filename
   ``img_in_image_box_{x1}_{y1}_{x2}_{y2}.jpg`` functions as a *computed
   join key* (/root/reference/server/model_repo/layout-parsing/1/
   layout_captioning.py:193-199; parse rule 'last 4 numbers',
   imageCaptioningExperiments/bbox_text_matcher.py:10-26).
2. Blocks build the same key by rounding their bbox
   (bbox_text_matcher.py:28-37) with duplicate keys collapsing
   last-wins (layout_captioning.py:249 — J5/D4).
3. Size gate before the expensive captioner: w >= 100, h >= 100,
   area >= 10000 (layout_captioning.py:203-221, caption_config.yaml:9-11).
4. The captioner itself is an injectable stage (the reference calls a
   remote BLIP Triton, layout_captioning.py:278-319); here a
   deterministic stub computes a caption from the image geometry. The
   join shape is what scales — captioning 10^9 images is a map stage.
5. Merge-back appends the caption to the block text with a single space
   (layout_captioning.py:322-343 — J6), left-join semantics: blocks
   without a caption pass through unchanged (J2).

Gated by an enable flag like the reference's IMAGE_CAPTIONING_ENABLED
(model.py:63-73 — F8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from paddle_spark.functions import bbox_key_col, bbox_key_from_filename


def image_keys(images: DataFrame, filename_col: str = "filename") -> DataFrame:
    """Parse bbox keys from image filenames (X2), keeping only keys of the
    reference's image-box naming scheme (F7 key-pattern filter)."""
    return (
        images.withColumn("bbox_key", bbox_key_from_filename(F.col(filename_col)))
        .filter(F.col(filename_col).contains("img_in_image_box"))
        .filter(F.col("bbox_key").isNotNull())
    )


def block_keys(blocks: DataFrame, order_col: str = "block_id") -> DataFrame:
    """Build bbox keys for blocks; duplicate keys collapse last-wins
    (J5: the reference's dict build overwrites earlier entries)."""
    keyed = blocks.withColumn(
        "bbox_key",
        bbox_key_col(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")),
    )
    w = W.partitionBy("url", "page_no", "bbox_key").orderBy(F.desc(order_col))
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stub_caption_col(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Deterministic stand-in captioner: geometry-derived text. The real
    deployment swaps this column for a Pandas-UDF model call; everything
    around it (keys, joins, merge) is unchanged."""
    w = (x2 - x1).cast("long")
    h = (y2 - y1).cast("long")
    return F.concat(
        F.lit("[image "), w.cast("string"), F.lit("x"), h.cast("string"), F.lit("]")
    )


def make_batch_captioner(fn, timeout_s: float = 30.0):
    """Wrap a per-image Python captioner ``fn(w, h) -> str`` as an
    Arrow-batched stage with the reference's J7 fault semantics
    (layout_captioning.py:407-421: per-caption 30 s thread join; a failed
    or timed-out caption is dropped, the block survives):

    - per-item try/except — one raising caption never fails the task;
    - a per-batch deadline — once ``timeout_s`` is spent, remaining items
      in the batch get no caption (bounded stage latency; the batch analog
      of the thread-join timeout, which also cannot preempt a running
      call).

    Returns a mapInPandas body over (url, page_no, bbox_key, x1,y1,x2,y2).
    """
    import time

    import pandas as pd

    def caption_batch(batches):
        for pdf in batches:
            t0 = time.monotonic()
            caps = []
            for w, h in zip(pdf["x2"] - pdf["x1"], pdf["y2"] - pdf["y1"]):
                if time.monotonic() - t0 > timeout_s:
                    caps.append(None)  # deadline: skip, don't fail
                    continue
                try:
                    caps.append(fn(int(w), int(h)))
                except Exception:  # per-item isolation
                    caps.append(None)
            out = pdf[["url", "page_no", "bbox_key"]].copy()
            out["caption"] = pd.Series(caps, dtype="object")
            yield out

    return caption_batch


def caption_blocks(
    blocks: DataFrame,
    images: DataFrame,
    enabled: bool = True,
    min_w: float = 100.0,
    min_h: float = 100.0,
    min_area: float = 10000.0,
    captioner=None,
    caption_timeout_s: float = 30.0,
) -> DataFrame:
    """Full enrichment: join captions onto image blocks by bbox key and
    append to block text. Pass-through when disabled (F8).

    blocks: (url, page_no, block_id, label, x1, y1, x2, y2, text)
    images: (url, page_no, filename)
    captioner: the injectable model stage (J7). None -> the deterministic
      geometry stub (pure Column). A Python callable ``fn(w, h) -> str``
      runs Arrow-batched with per-item failure isolation and a batch
      deadline (``make_batch_captioner``) — the swap point for a real
      BLIP/VLM call; blocks whose caption fails or times out pass through
      with ``captioned=false``.
    Returns blocks with `text` caption-enriched and `captioned` flag.
    """
    if not enabled:
        return blocks.withColumn("captioned", F.lit(False))

    im = image_keys(images).select("url", "page_no", "bbox_key").distinct()
    bk = block_keys(blocks)

    # size gate BEFORE the captioner (predicate-before-expensive-work,
    # layout_captioning.py:259-262)
    gated = bk.filter(
        (F.col("label") == "image")
        & ((F.col("x2") - F.col("x1")) >= min_w)
        & ((F.col("y2") - F.col("y1")) >= min_h)
        & (((F.col("x2") - F.col("x1")) * (F.col("y2") - F.col("y1"))) >= min_area)
    )
    # J1: equi-join on the computed key; images-with-keys is small per doc
    # batch — broadcast it
    matched = gated.join(F.broadcast(im), ["url", "page_no", "bbox_key"])
    if captioner is None:
        captions = matched.select(
            "url",
            "page_no",
            "bbox_key",
            stub_caption_col(
                F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")
            ).alias("caption"),
        )
    else:
        captions = matched.select(
            "url", "page_no", "bbox_key", "x1", "y1", "x2", "y2"
        ).mapInPandas(
            make_batch_captioner(captioner, caption_timeout_s),
            schema="url string, page_no int, bbox_key string, caption string",
        ).filter(F.col("caption").isNotNull())
    # J2/J6: left merge-back; unmatched blocks keep their text
    out = bk.join(captions, ["url", "page_no", "bbox_key"], "left").select(
        "url",
        "page_no",
        "block_id",
        "label",
        "x1", "y1", "x2", "y2",
        F.when(
            F.col("caption").isNotNull(),
            F.concat_ws(" ", F.col("text"), F.col("caption")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        F.col("caption").isNotNull().alias("captioned"),
    )
    return out

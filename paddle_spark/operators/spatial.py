"""Grid-bucketed spatial joins — the scale path for geometric theta joins.

The reference's overlap relation (J3, bbox_text_matcher.py:40-68) is a
theta predicate; as a raw DataFrame join Spark can only execute it as a
BroadcastNestedLoopJoin / cartesian — fine per document (the kernels do a
vectorized per-page matrix), fatal across 10^9 boxes. This module applies
the same discipline as the LSH dedup work: generate candidates with an
EQUI-join, then apply the exact predicate.

Construction: each box, expanded by ``margin_ratio`` x its OWN dims, is
exploded onto the grid cells it covers; two boxes satisfying the overlap
predicate (margin = ratio x max(dims)) have expanded rectangles that
geometrically intersect (ratio*max(a,b) <= ratio*a + ratio*b), so they
share at least one covered cell — candidates are a superset, the exact
filter restores precision 1.0, and ``distinct`` collapses multi-cell hits.

Cell size trades shuffle width vs candidate fan-out: ~the median box size
is a good default; boxes spanning many cells (page-wide banners) emit one
row per cell — cap via cells-per-box guard if a corpus has degenerate
geometry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from paddle_spark.functions import boxes_overlap_cond


def _cells(df: DataFrame, margin_ratio: float, cell: float) -> DataFrame:
    w = F.col("x2") - F.col("x1")
    h = F.col("y2") - F.col("y1")
    ex1 = F.col("x1") - w * margin_ratio
    ex2 = F.col("x2") + w * margin_ratio
    ey1 = F.col("y1") - h * margin_ratio
    ey2 = F.col("y2") + h * margin_ratio
    cxs = F.sequence(
        F.floor(ex1 / F.lit(cell)).cast("int"), F.floor(ex2 / F.lit(cell)).cast("int")
    )
    cys = F.sequence(
        F.floor(ey1 / F.lit(cell)).cast("int"), F.floor(ey2 / F.lit(cell)).cast("int")
    )
    return df.withColumn("cx", F.explode(cxs)).withColumn("cy", F.explode(cys))


def bucketed_above_join(
    texts: DataFrame,
    images: DataFrame,
    id_col: str = "box_id",
    max_distance: float = 100.0,
    cell: float = 256.0,
) -> DataFrame:
    """J4 at scale: 'text directly above image' (text.y2 <= img.y1, gap <=
    max_distance, x-overlap — bbox_text_matcher.py:70-83) via grid cells.

    A qualifying pair's text 'reach strip' (x1..x2, y2..y2+max_distance)
    intersects the image's top edge (x1..x2 at y1), so bucketing the strip
    and the edge onto the same grid makes candidates a superset; the exact
    predicate restores precision 1.0.
    """
    from paddle_spark.functions import above_cond

    t = texts.select(F.col(id_col).alias("id"), "x1", "y1", "x2", "y2")
    i = images.select(F.col(id_col).alias("id"), "x1", "y1", "x2", "y2")

    def grid(df, gy1: Column, gy2: Column):
        cxs = F.sequence(
            F.floor(F.col("x1") / F.lit(cell)).cast("int"),
            F.floor(F.col("x2") / F.lit(cell)).cast("int"),
        )
        cys = F.sequence(
            F.floor(gy1 / F.lit(cell)).cast("int"),
            F.floor(gy2 / F.lit(cell)).cast("int"),
        )
        return df.withColumn("cx", F.explode(cxs)).withColumn("cy", F.explode(cys))

    te = grid(t, F.col("y2"), F.col("y2") + F.lit(max_distance))
    ie = grid(i, F.col("y1"), F.col("y1"))
    a, b = te.alias("t"), ie.alias("i")
    pairs = a.join(
        b, (F.col("t.cx") == F.col("i.cx")) & (F.col("t.cy") == F.col("i.cy"))
    ).filter(above_cond("t", "i", max_distance))
    return pairs.select(
        F.col("t.id").alias("text_id"), F.col("i.id").alias("image_id")
    ).distinct()


def bucketed_overlap_join(
    boxes: DataFrame,
    id_col: str = "box_id",
    margin_ratio: float = 0.1,
    cell: float = 256.0,
) -> DataFrame:
    """Self-join: pairs (a < b) satisfying the reference overlap-or-nearby
    predicate, via grid-cell candidates. Output identical to the exact
    theta join (oracle-checked); the plan is a hash equi-join on
    (cx, cy) — shuffle-partitionable, no cartesian anywhere."""
    src = boxes.select(
        F.col(id_col).alias("id"), "x1", "y1", "x2", "y2"
    )
    e = _cells(src, margin_ratio, cell)
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cx") == F.col("b.cx"))
        & (F.col("a.cy") == F.col("b.cy"))
        & (F.col("a.id") < F.col("b.id")),
    ).filter(boxes_overlap_cond("a", "b", margin_ratio))
    return pairs.select(
        F.col("a.id").alias("a"), F.col("b.id").alias("b")
    ).distinct()

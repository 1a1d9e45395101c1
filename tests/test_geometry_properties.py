"""Distributed-determinism properties of the geometry kernels.

Upstream box order is an implementation detail (Arrow batch boundaries,
detector output order); the kernels' results must not depend on it beyond
their declared tie-breaks — this is what per-url byte-identity across
partitionings rests on for the layout branch.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from paddle_spark.kernels import geometry as G


def _boxes(raw):
    """Distinct, well-formed boxes from raw tuples."""
    seen = set()
    rows = []
    for x, y, w, h in raw:
        key = (round(x, 1), round(y, 1))
        if key in seen:
            continue
        seen.add(key)
        rows.append([x, y, x + w, y + h])
    return np.array(rows) if rows else np.empty((0, 4))


box_strategy = st.lists(
    st.tuples(
        st.floats(0, 900, allow_nan=False),
        st.floats(0, 900, allow_nan=False),
        st.floats(5, 200, allow_nan=False),
        st.floats(5, 200, allow_nan=False),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=80, deadline=None)
@given(box_strategy, st.randoms(use_true_random=False))
def test_reading_order_input_order_invariant(raw, rnd):
    bs = _boxes(raw)
    if len(bs) < 2:
        return
    perm_in = np.array(rnd.sample(range(len(bs)), len(bs)))
    ordered_a = bs[G.reading_order(bs, page_w=1000)]
    shuffled = bs[perm_in]
    ordered_b = shuffled[G.reading_order(shuffled, page_w=1000)]
    assert np.allclose(ordered_a, ordered_b)


@settings(max_examples=80, deadline=None)
@given(box_strategy, st.randoms(use_true_random=False))
def test_nms_result_input_order_invariant(raw, rnd):
    bs = _boxes(raw)
    if len(bs) < 2:
        return
    # distinct scores so the score-desc tie-break never depends on index
    scores = np.linspace(0.99, 0.5, len(bs))
    labels = np.zeros(len(bs), dtype=np.int64)
    kept_a = bs[G.nms(bs, scores, labels, 0.5)]
    perm_in = np.array(rnd.sample(range(len(bs)), len(bs)))
    kept_b = bs[perm_in][G.nms(bs[perm_in], scores[perm_in], labels, 0.5)]
    assert np.allclose(
        sorted(map(tuple, kept_a.tolist())), sorted(map(tuple, kept_b.tolist()))
    )


@settings(max_examples=60, deadline=None)
@given(box_strategy)
def test_nms_idempotent(raw):
    bs = _boxes(raw)
    if len(bs) == 0:
        return
    scores = np.linspace(0.99, 0.5, len(bs))
    labels = np.zeros(len(bs), dtype=np.int64)
    keep1 = G.nms(bs, scores, labels, 0.5)
    b1, s1 = bs[keep1], scores[keep1]
    keep2 = G.nms(b1, s1, labels[: len(b1)], 0.5)
    assert len(keep2) == len(b1)  # a second pass removes nothing


@settings(max_examples=60, deadline=None)
@given(box_strategy)
def test_group_lines_input_order_invariant(raw):
    bs = _boxes(raw)
    if len(bs) < 2:
        return
    lines_a = G.group_lines(bs, 0.5)
    rev = bs[::-1].copy()
    lines_b = G.group_lines(rev, 0.5)[::-1]
    # same partition of boxes into lines (ids may relabel but can't here:
    # ids are y-ordered, so they must match exactly)
    assert (lines_a == lines_b).all()


def test_bucketed_overlap_join_equals_theta(spark):
    """Grid-bucketed spatial join returns EXACTLY the theta-join pairs
    (candidates superset + exact filter), across cell sizes, and its plan
    carries no cartesian product."""
    import random

    from pyspark.sql import functions as F

    from paddle_spark.functions import boxes_overlap_cond
    from paddle_spark.operators.spatial import bucketed_overlap_join

    rng = random.Random(5)
    rows = []
    for i in range(200):
        x1 = rng.uniform(0, 1600); y1 = rng.uniform(0, 2100)
        rows.append((i, x1, y1, x1 + rng.uniform(5, 700), y1 + rng.uniform(5, 300)))
    boxes = spark.createDataFrame(rows, "box_id long, x1 double, y1 double, x2 double, y2 double")
    a, b = boxes.alias("a"), boxes.alias("b")
    exact = {
        (r["a"], r["b"])
        for r in a.join(
            b, (F.col("a.box_id") < F.col("b.box_id")) & boxes_overlap_cond("a", "b", 0.1)
        ).select(F.col("a.box_id").alias("a"), F.col("b.box_id").alias("b")).collect()
    }
    assert exact, "fixture should produce overlapping pairs"
    for cell in (64.0, 256.0, 1024.0):
        got = {(r["a"], r["b"]) for r in bucketed_overlap_join(boxes, cell=cell).collect()}
        assert got == exact, f"cell={cell}"
    plan = bucketed_overlap_join(boxes)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_bucketed_above_join_equals_theta(spark):
    import random

    from pyspark.sql import functions as F

    from paddle_spark.functions import above_cond
    from paddle_spark.operators.spatial import bucketed_above_join

    rng = random.Random(11)
    rows = []
    for i in range(200):
        x1 = rng.uniform(0, 1600); y1 = rng.uniform(0, 2100)
        rows.append((i, x1, y1, x1 + rng.uniform(5, 600), y1 + rng.uniform(5, 250)))
    boxes = spark.createDataFrame(rows, "box_id long, x1 double, y1 double, x2 double, y2 double")
    t, i_ = boxes.alias("t"), boxes.alias("i")
    exact = {
        (r["a"], r["b"])
        for r in t.join(
            i_, (F.col("t.box_id") != F.col("i.box_id")) & above_cond("t", "i", 100.0)
        ).select(F.col("t.box_id").alias("a"), F.col("i.box_id").alias("b")).collect()
    }
    assert exact
    for cell in (64.0, 256.0, 2048.0):
        got = {
            (r["text_id"], r["image_id"])
            for r in bucketed_above_join(boxes, boxes, cell=cell).collect()
        }
        assert got == exact, f"cell={cell}"

"""The pure-Python small-N geometry chain must be BIT-IDENTICAL to the
NumPy executable spec (same pattern as segment_blocks vs its reference):
corpus pages, the closed-form oracle fixture, and hypothesis-random pages
all compare exactly — texts, labels, scores, bbox floats, drop counts."""

from hypothesis import given, settings
from hypothesis import strategies as st

from paddle_spark.config import DEFAULT_CONFIG
from paddle_spark.kernels import layout as L
from paddle_spark.kernels.geometry_fast import process_page_py
from paddle_spark.sources.synth import _rng, make_oracle_pdf, make_pdf


def _numpy_process(page):
    """Force the NumPy path regardless of the size dispatch."""
    big = dict(page)
    boxes = list(page.get("boxes", []))
    # pad with boxes that the threshold filter provably removes (score 0)
    pad = [
        {"box_id": 1000 + k, "label": "text", "label_id": 0,
         "x1": 0.0, "y1": 0.0, "x2": 1.0, "y2": 1.0, "score": 0.0, "text": ""}
        for k in range(L._FAST_MAX + 1 - len(boxes))
    ]
    big["boxes"] = boxes + pad
    blocks, dropped = L.process_page(big, DEFAULT_CONFIG)
    return blocks, dropped - len(pad)


def _assert_equal(page):
    fast = process_page_py(page, DEFAULT_CONFIG)
    ref = _numpy_process(page)
    assert fast == ref, page


def test_corpus_pdf_pages_identical():
    n = 0
    for i in range(0, 6000, 3):
        rng = _rng(42, i)
        pages = L.parse_synthetic_pdf(make_pdf(rng, i))
        for page in pages:
            if len(page.get("boxes", [])) <= L._FAST_MAX:
                _assert_equal(page)
                n += 1
    assert n > 1000


def test_oracle_fixture_identical():
    for i in (0, 7, 99):
        for page in L.parse_synthetic_pdf(make_oracle_pdf(i)):
            _assert_equal(page)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 19),                      # label_id
            st.floats(0.0, 1700.0, width=32),        # x1
            st.floats(0.0, 2200.0, width=32),        # y1
            st.floats(1.0, 1700.0, width=32),        # w
            st.floats(1.0, 400.0, width=32),         # h
            st.floats(0.0, 1.0, width=32),           # score
        ),
        max_size=20,
    )
)
def test_random_pages_identical(raw):
    boxes = [
        {
            "box_id": k, "label": "", "label_id": lid,
            "x1": x, "y1": y, "x2": x + w, "y2": y + h,
            "score": s, "text": f"t{k}",
        }
        for k, (lid, x, y, w, h, s) in enumerate(raw)
    ]
    _assert_equal({"page_no": 0, "width": 1700, "height": 2200, "boxes": boxes})

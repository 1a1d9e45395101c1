"""The fast island-pre-pass segmenter must match the single-pass reference
implementation block-for-block (the reference function is the executable
spec; the fast one is what ships)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from paddle_spark.kernels.classify import classify_payload
from paddle_spark.kernels.html import segment_blocks, segment_blocks_reference
from paddle_spark.sources.synth import gen_page_row


def as_tuples(blocks):
    return [
        (b.block_id, b.tag, b.text, b.n_chars, b.n_link_chars, b.kept, b.drop_reason)
        for b in blocks
    ]


def test_equal_on_corpus_sample():
    n = diffs = 0
    for i in range(0, 3000, 3):
        payload = gen_page_row(i, 42)[2]
        if classify_payload(payload) != "html":
            continue
        n += 1
        if as_tuples(segment_blocks(payload)) != as_tuples(
            segment_blocks_reference(payload)
        ):
            diffs += 1
    assert n > 500 and diffs == 0


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                "<p>some reasonably long paragraph text for scoring</p>",
                "<nav><a href='/x'>one</a> two three</nav>",
                "<div><h2>Head</h2>",
                "</div>",
                "<footer>contact legal</footer>",
                "<script>var x = '<p>trap</p>';</script>",
                "<!-- a comment with <p>markup</p> inside -->",
                "<aside><a href='/ad'>ad text here</a></aside>",
                "plain top-level text run that is long enough to keep",
                "<br>",
                "<img src='x.jpg'>",
                "<a href='/l'>inline link text</a>",
                "<head><title>t</title><style>p{}</style></head>",
            ]
        ),
        max_size=12,
    )
)
def test_equal_on_generated_fragments(parts):
    payload = ("<html><body>" + "".join(parts) + "</body></html>").encode()
    assert as_tuples(segment_blocks(payload)) == as_tuples(
        segment_blocks_reference(payload)
    )


def test_adversarial_marker_tags_cannot_collide():
    """Wild pages containing literal marker-lookalike tags (<xdropped0/>,
    the historical marker name) or the private-use sentinel itself must not
    crash the fast path or diverge from the reference segmenter."""
    cases = [
        b"<html><body><p>before</p><xdropped0/><p>afterwards text that is long enough</p></body></html>",
        b"<html><body><xdropped999/><nav>boiler</nav><p>main content paragraph long enough</p></body></html>",
        b"<html><body><p>a \xee\x80\x80 sentinel in text run long enough to keep</p></body></html>",
        b"<html><body><\xee\x80\x8012/><p>fake sentinel tag plus long enough text</p></body></html>",
        b"<html><body><xdroppedfoo><p>unparseable index long enough paragraph</p></body></html>",
    ]
    for payload in cases:
        fast = as_tuples(segment_blocks(payload))
        ref = as_tuples(segment_blocks_reference(payload))
        assert fast == ref, payload

"""Robustness fuzz: extract_document never raises and is deterministic on
arbitrary byte soup (T5 fault isolation at the kernel boundary)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from paddle_spark.kernels.extract import extract_document


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_never_raises_and_deterministic(payload):
    a = extract_document(payload)
    b = extract_document(payload)
    assert (a.text, a.text_sha256, a.parse_ok, a.branch) == (
        b.text, b.text_sha256, b.parse_ok, b.branch,
    )
    assert isinstance(a.text, str)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=2048))
def test_htmlish_text_never_raises(body):
    payload = f"<html><body><p>{body}</p></body></html>".encode(
        "utf-8", errors="ignore"
    )
    a = extract_document(payload)
    assert a.parse_ok and a.branch == "html"


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=1, max_size=512))
def test_pdf_magic_garbage_is_isolated(tail):
    r = extract_document(b"%PDF" + tail)
    assert r.branch == "layout"
    # either parsed (synthetic sentinel present) or isolated as a failure
    if not r.parse_ok:
        assert r.error

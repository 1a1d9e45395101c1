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


# ---------------------------------------------------------------------------
# Round-4 codec fuzz: encoder-knob matrices round-trip, decoders never raise
# ---------------------------------------------------------------------------

@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 30), st.integers(1, 30), st.integers(0, 2**32 - 1),
    st.booleans(), st.integers(0, 6), st.booleans(),
)
def test_webp_roundtrip_knob_matrix(h, w, seed, subgreen, cache, palette):
    import numpy as np

    from paddle_spark.kernels.webp import decode_webp_pixels
    from paddle_spark.sources.synth import make_webp

    rng = np.random.RandomState(seed)
    if palette:
        ncol = int(rng.randint(1, 17))
        pal = rng.randint(0, 256, (ncol, 3), dtype=np.uint8)
        img = pal[rng.randint(0, ncol, (h, w))]
        out = decode_webp_pixels(make_webp(img, palette=True))
    else:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_webp_pixels(
            make_webp(img, subtract_green=subgreen, cache_bits=cache)
        )
    assert out is not None and (out == img).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 5))
def test_apng_roundtrip_fuzz(seed, nf):
    import numpy as np

    from paddle_spark.kernels.pixels import decode_apng_composited
    from paddle_spark.sources.synth import make_apng

    rng = np.random.RandomState(seed)
    h, w = int(rng.randint(2, 20)), int(rng.randint(2, 20))
    frames = [rng.randint(0, 256, (h, w, 3), dtype=np.uint8)]
    rects = [(0, 0)]
    for _ in range(nf - 1):
        fh, fw = int(rng.randint(1, h + 1)), int(rng.randint(1, w + 1))
        frames.append(rng.randint(0, 256, (fh, fw, 3), dtype=np.uint8))
        rects.append((int(rng.randint(0, w - fw + 1)), int(rng.randint(0, h - fh + 1))))
    p = make_apng(frames, rects=rects)
    # source-blend reference composition
    canvas = frames[0].copy()
    for k in range(1, nf):
        fx, fy = rects[k]
        fh, fw = frames[k].shape[:2]
        canvas[fy : fy + fh, fx : fx + fw] = frames[k]
        out = decode_apng_composited(p, k)
        assert out is not None and (out[:, :, :3] == canvas).all()


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_new_decoders_never_raise_on_soup(payload):
    from paddle_spark.kernels.pixels import (
        decode_apng_composited,
        decode_gif_composited,
        decode_tiff_pixels,
    )
    from paddle_spark.kernels.webp import decode_webp_pixels

    decode_webp_pixels(payload)
    decode_apng_composited(payload)
    decode_gif_composited(payload)
    decode_tiff_pixels(payload, ifd=1)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_webp_bitflip_never_raises(seed):
    import numpy as np

    from paddle_spark.kernels.webp import decode_webp_pixels
    from paddle_spark.sources.synth import make_webp

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (6, 7, 3), dtype=np.uint8)
    p = bytearray(make_webp(img, cache_bits=int(rng.randint(0, 5))))
    pos = int(rng.randint(12, len(p)))
    p[pos] ^= 1 << int(rng.randint(0, 8))
    decode_webp_pixels(bytes(p))  # any result, no exception


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_ocr_page_arbitrary_ink_never_raises(seed):
    import numpy as np

    from paddle_spark.kernels.scan import ocr_page

    rng = np.random.RandomState(seed)
    h, w = int(rng.randint(1, 60)), int(rng.randint(1, 60))
    img = rng.randint(0, 256, (h, w), dtype=np.uint8)
    r = ocr_page(img)
    assert r.text is not None


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048), st.sampled_from([b"WAVE", b"AVI ", b"WEBP", b"ACON"]))
def test_riff_soup_never_raises(tail, form):
    """RIFF-prefixed byte soup through the full extract entry and the a/v
    kernels: never an exception, always deterministic (the round-5 RIFF
    classify split + riffav walkers at the T5 boundary)."""
    from paddle_spark.kernels.riffav import audio_features, avi_frames, avi_meta

    payload = b"RIFF" + len(tail).to_bytes(4, "little") + form + tail
    a = extract_document(payload)
    b = extract_document(payload)
    assert (a.parse_ok, a.branch, a.error) == (b.parse_ok, b.branch, b.error)
    audio_features(payload)      # any return, no raise
    avi_meta(payload)
    assert isinstance(avi_frames(payload), list)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=1024))
def test_table_cells_soup_never_raises(noise):
    """Malformed 'cells' payloads through the table-assembly path: the
    layout chain isolates them per document (extract_document contract),
    and well-formed-but-weird cell geometry never raises."""
    import json

    from paddle_spark.kernels.table import render_table

    rng_vals = list(noise[:40])
    cells = [
        {"x1": float(v), "y1": float(rng_vals[(i + 1) % max(1, len(rng_vals))] if rng_vals else 0),
         "x2": float(v) + 1.0 + (v % 7), "y2": 2.0 + float(v % 11), "text": chr(65 + v % 26) * (v % 5)}
        for i, v in enumerate(rng_vals)
    ]
    out = render_table(cells, markdown=bool(noise and noise[0] % 2))
    assert isinstance(out, str)

"""Baseline JPEG decode (kernels/jpeg.py) vs an independently-written
spec-twin encoder (sources/synth.make_jpeg). JPEG is lossy, so
roundtrips compare within quantization error — except grayscale solid
blocks at quant=8, whose DC path is exactly lossless by construction.
"""

import numpy as np
import pytest

from paddle_spark.kernels.jpeg import ZIGZAG, decode_jpeg_pixels, dct2, idct2
from paddle_spark.sources.synth import make_jpeg


def _rand(shape, seed):
    return np.random.RandomState(seed).randint(0, 256, shape, dtype=np.uint8)


def test_zigzag_is_the_standard_order():
    assert ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert ZIGZAG[-1] == (7, 7) and len(set(ZIGZAG)) == 64


def test_dct_idct_inverse_pair():
    rng = np.random.RandomState(3)
    for _ in range(20):
        x = rng.uniform(-128, 127, (8, 8))
        assert np.allclose(idct2(dct2(x)), x, atol=1e-9)


def test_gray_solid_exact():
    """quant=8 makes solid gray DC-lossless: decode must be EXACT."""
    for c in (0, 1, 73, 128, 200, 255):
        img = np.full((24, 17), c, dtype=np.uint8)
        got = decode_jpeg_pixels(make_jpeg(img))
        assert got is not None and got.shape == (24, 17, 1)
        assert np.all(got == c), c


def test_gray_roundtrip_within_quantization_error():
    img = _rand((40, 56), seed=5)
    got = decode_jpeg_pixels(make_jpeg(img, quant=1))[:, :, 0].astype(int)
    # quant=1: error is DCT rounding only — tight
    assert np.max(np.abs(got - img.astype(int))) <= 2
    got8 = decode_jpeg_pixels(make_jpeg(img, quant=8))[:, :, 0].astype(int)
    assert np.mean(np.abs(got8 - img.astype(int))) < 8


def test_color_solid_near_exact():
    for color in ((255, 0, 0), (0, 255, 0), (12, 200, 99), (128, 128, 128)):
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        img[:] = color
        got = decode_jpeg_pixels(make_jpeg(img, quant=1)).astype(int)
        assert np.max(np.abs(got - np.array(color))) <= 2, color


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_color_subsampling_roundtrip(sub):
    """Smooth image (subsampling-friendly) roundtrips closely under all
    three common sampling layouts; odd dims exercise MCU padding."""
    h, w = 37, 45
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 255 / w).astype(np.uint8),
            (yy * 255 / h).astype(np.uint8),
            ((xx + yy) * 255 / (w + h)).astype(np.uint8),
        ],
        axis=2,
    )
    got = decode_jpeg_pixels(make_jpeg(img, subsample=sub, quant=1)).astype(int)
    assert got.shape == (h, w, 3)
    err = np.abs(got - img.astype(int))
    assert np.mean(err) < 3 and np.max(err) <= 24, (sub, np.max(err))


def test_restart_intervals():
    img = _rand((33, 50), seed=9)
    plain = decode_jpeg_pixels(make_jpeg(img, quant=1))
    with_rst = decode_jpeg_pixels(make_jpeg(img, quant=1, restart=3))
    assert np.array_equal(plain, with_rst)


def test_out_of_scope_and_malformed_degrade():
    img = _rand((16, 16), seed=11)
    base = make_jpeg(img)
    # progressive marker (SOF2) -> None
    prog = base.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg_pixels(prog) is None
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg_pixels(b"not a jpeg") is None
    # truncated scans degrade to a partial (or None), never raise
    out = decode_jpeg_pixels(base[: len(base) // 2])
    assert out is None or out.shape == (16, 16, 1)


def test_jpeg_fuzz_never_raises():
    import random

    base = make_jpeg(_rand((24, 24, 3), seed=13), subsample="420")
    rng = random.Random(17)
    for _ in range(150):
        b = bytearray(base)
        for _ in range(rng.randint(1, 10)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        out = decode_jpeg_pixels(bytes(b))
        assert out is None or isinstance(out, np.ndarray)


def test_dispatch_and_pixel_stats_integration():
    from paddle_spark.kernels.pixels import decode_pixels, to_3ch

    img = np.full((10, 12), 90, dtype=np.uint8)
    got = decode_pixels(make_jpeg(img))
    assert got is not None and got.shape == (10, 12, 1)
    assert np.all(to_3ch(got) == 90)


@pytest.mark.parametrize("path", [
    "/usr/share/doc/nodejs/thin-white-stripe.jpg",
    "/usr/share/doc/nodejs/full-white-stripe.jpg",
])
def test_wild_progressive_jpegs_degrade(path):
    """The system's wild JPEGs happen to be progressive (SOF2): header
    dims still parse (raster.py) and pixel decode degrades to None —
    exactly the declared scope boundary."""
    import os

    from paddle_spark.kernels.raster import decode_image_header

    if not os.path.exists(path):
        pytest.skip("system jpegs not present")
    p = open(path, "rb").read()
    assert decode_image_header(p)["width"] == 493
    assert decode_jpeg_pixels(p) is None

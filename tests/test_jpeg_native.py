"""jpeg_native (libjpeg entropy decode + pure reconstruction) pins.

The arm's design makes pixels byte-identical to kernels/jpeg.py BY
CONSTRUCTION (same NumPy reconstruction over the same integer
coefficients); these tests pin that claim over the whole encoder
surface — gray/color, 444/422/420, restart intervals, odd dims,
progressive scans, real-world progressive files — plus fuzz safety and
the no-library fallback.
"""

import os

import numpy as np
import pytest

from paddle_spark.kernels import jpeg_native as JN
from paddle_spark.kernels.jpeg import decode_jpeg_pixels
from paddle_spark.sources.synth import make_jpeg

pytestmark = pytest.mark.skipif(
    not JN.have_native_jpeg(), reason="no gcc/libjpeg on this host"
)


def _identical(payload):
    a = decode_jpeg_pixels(payload)
    b = JN.decode_jpeg_native(payload)
    if a is None or b is None:
        return a is None and b is None
    return a.shape == b.shape and np.array_equal(a, b)


def test_baseline_byte_identity_sweep():
    rng = np.random.RandomState(0)
    for t in range(24):
        h, w = 9 + t * 5, 13 + t * 7
        gray = t % 2 == 0
        arr = rng.randint(
            0, 256, (h, w) if gray else (h, w, 3), dtype=np.uint8
        )
        sub = "444" if gray else ["444", "422", "420"][t % 3]
        enc = make_jpeg(
            arr, subsample=sub, quant=2 + t % 12, restart=t % 4
        )
        assert _identical(enc), (t, gray, sub)


def test_solid_color_dc_exact():
    for c in (0, 7, 128, 255):
        enc = make_jpeg(np.full((24, 40), c, dtype=np.uint8), quant=8)
        out = JN.decode_jpeg_native(enc)
        assert out is not None and np.all(out == c)
        assert _identical(enc)


def test_progressive_byte_identity():
    from tests.test_jpeg import _make_progressive

    rng = np.random.RandomState(3)
    for t in range(8):
        h, w = 15 + t * 4, 21 + t * 3
        gray = t % 2 == 0
        arr = rng.randint(
            0, 256, (h, w) if gray else (h, w, 3), dtype=np.uint8
        )
        sub = "444" if gray else ["444", "422", "420"][t % 3]
        enc = bytes(_make_progressive(arr, subsample=sub, quant=5 + t % 8))
        assert _identical(enc), t


@pytest.mark.parametrize("path", [
    "/usr/share/doc/nodejs/thin-white-stripe.jpg",
    "/usr/share/doc/nodejs/full-white-stripe.jpg",
])
def test_wild_progressive_identity(path):
    if not os.path.exists(path):
        pytest.skip("system jpegs not present")
    assert _identical(open(path, "rb").read())


def test_fuzz_never_crashes():
    rng = np.random.RandomState(4)
    base = make_jpeg(rng.randint(0, 256, (33, 47), dtype=np.uint8))
    for i in range(200):
        if i < 80:
            p = base[: rng.randint(2, len(base))]
        elif i < 160:
            b = bytearray(base)
            b[rng.randint(0, len(b))] ^= 1 << rng.randint(0, 8)
            p = bytes(b)
        else:
            p = b"\xff\xd8\xff" + bytes(rng.randint(0, 256, 64, dtype=np.uint8))
        JN.decode_jpeg_native(p)  # must return (array|None), never raise


def test_domain_guards_match_pure():
    # non-JPEG / empty inputs -> None, like the pure decoder
    assert JN.decode_jpeg_native(None) is None
    assert JN.decode_jpeg_native(b"") is None
    assert JN.decode_jpeg_native(b"\x89PNG\r\n\x1a\n") is None


def test_system_dispatch_uses_native_arm():
    from paddle_spark.kernels.pixels import decoder_for

    dec = decoder_for("system")
    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, (40, 56), dtype=np.uint8)
    enc = make_jpeg(arr)
    out = dec(enc)
    pure = decode_jpeg_pixels(enc)
    assert out is not None and np.array_equal(out, pure)

"""WEBP lossless (VP8L) decode (kernels/webp.py) against the spec-twin
encoder (sources/synth.make_webp): round-trips across the feature matrix
(simple vs full prefix codes, code-length repeats, subtract-green, LZ77
back-references, alpha), container/header behavior, and graceful
degradation on malformed bytes."""

import numpy as np
import pytest

from paddle_spark.kernels.pixels import decode_pixels
from paddle_spark.kernels.raster import decode_image_header
from paddle_spark.kernels.webp import decode_webp_pixels
from paddle_spark.sources.synth import make_webp


def _noise(h, w, c=3, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, c), dtype=np.uint8)


class TestRoundTrip:
    def test_two_tone_simple_codes(self):
        img = np.zeros((5, 7, 3), np.uint8)
        img[:, :3] = (10, 200, 30)
        img[:, 3:] = (250, 60, 90)
        out = decode_webp_pixels(make_webp(img))
        assert out is not None and (out == img).all()

    def test_solid_single_symbol_codes(self):
        img = np.full((4, 6, 3), (7, 77, 177), np.uint8)
        out = decode_webp_pixels(make_webp(img))
        assert (out == img).all()

    def test_noise_full_codes(self):
        img = _noise(16, 23)
        out = decode_webp_pixels(make_webp(img))
        assert (out == img).all()

    def test_subtract_green_transform(self):
        img = _noise(9, 11, seed=3)
        out = decode_webp_pixels(make_webp(img, subtract_green=True))
        assert (out == img).all()

    def test_lz77_row_copy_backrefs(self):
        img = _noise(9, 11, seed=5)
        out = decode_webp_pixels(make_webp(img, lz77_row_copy=True))
        # rows 1.. are coded as distance-W references to row 0
        assert (out == np.tile(img[:1], (9, 1, 1))).all()

    def test_alpha_channel(self):
        img = _noise(6, 8, c=4, seed=7)
        out = decode_webp_pixels(make_webp(img))
        assert out.shape == (6, 8, 4) and (out == img).all()

    def test_1x1_and_wide(self):
        one = np.full((1, 1, 3), (1, 2, 3), np.uint8)
        assert (decode_webp_pixels(make_webp(one)) == one).all()
        wide = _noise(1, 300, seed=9)
        assert (decode_webp_pixels(make_webp(wide)) == wide).all()

    @pytest.mark.parametrize("seed", range(5))
    def test_fuzz_matrix(self, seed):
        rng = np.random.RandomState(100 + seed)
        h, w = int(rng.randint(1, 40)), int(rng.randint(1, 40))
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        sg = bool(rng.randint(2))
        out = decode_webp_pixels(make_webp(img, subtract_green=sg))
        assert (out == img).all()


class TestContainerAndDegradation:
    def test_header_dims_via_raster(self):
        img = _noise(13, 29)
        meta = decode_image_header(make_webp(img))
        assert meta == {"format": "webp", "width": 29, "height": 13, "n_frames": 1}

    def test_decode_pixels_dispatch(self):
        img = _noise(5, 6)
        out = decode_pixels(make_webp(img))
        assert out is not None and (out == img).all()

    def test_truncated_returns_none(self):
        p = make_webp(_noise(8, 8))
        # cuts into live entropy data (a cut that only drops the final
        # padding byte can still decode — leniency, not an error)
        for cut in (10, 20, len(p) // 2, len(p) - 8):
            assert decode_webp_pixels(p[:cut]) is None

    def test_bitflips_never_raise(self):
        p = bytearray(make_webp(_noise(8, 8, seed=11)))
        for pos in range(20, min(len(p), 80)):
            q = bytearray(p)
            q[pos] ^= 0xFF
            decode_webp_pixels(bytes(q))  # any return ok, no exception

    def test_lossy_vp8_stays_seam(self):
        # a VP8 (lossy) chunk: header parses, pixels decline
        body = b"\x00" * 20
        chunk = b"VP8 " + len(body).to_bytes(4, "little") + body
        riff = b"WEBP" + chunk
        p = b"RIFF" + len(riff).to_bytes(4, "little") + riff
        assert decode_webp_pixels(p) is None

    def test_oversize_dims_capped(self):
        # forge a VP8L header claiming 16384 x 16384 (> 2^26 px)
        from paddle_spark.sources.synth import _VP8LBits

        bw = _VP8LBits()
        bw.write(0x2F, 8)
        bw.write(16383, 14)
        bw.write(16383, 14)
        bw.write(0, 1)
        bw.write(0, 3)
        body = bw.bytes() + b"\x00" * 8
        chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
        riff = b"WEBP" + chunk
        assert decode_webp_pixels(b"RIFF" + len(riff).to_bytes(4, "little") + riff) is None

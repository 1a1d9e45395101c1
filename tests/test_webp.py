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

    def test_garbage_lossy_vp8_degrades(self):
        # a VP8 (lossy) chunk of zero bytes: header walk survives, decode
        # declines (libwebp rejects the invalid frame; without libwebp the
        # arm is a declared seam) — never raises either way
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


class TestCacheAndPalette:
    def test_color_cache_hits(self):
        rng = np.random.RandomState(2)
        tiles = rng.randint(0, 256, (4, 3), dtype=np.uint8)
        img = tiles[rng.randint(0, 4, (12, 15))]
        out = decode_webp_pixels(make_webp(img, cache_bits=4))
        assert (out == img).all()

    @pytest.mark.parametrize("ncol", [2, 4, 9, 30])
    def test_color_indexing_all_packing_widths(self, ncol):
        rng = np.random.RandomState(ncol)
        pal = rng.randint(0, 256, (ncol, 3), dtype=np.uint8)
        img = pal[rng.randint(0, ncol, (8, 11))]
        out = decode_webp_pixels(make_webp(img, palette=True))
        assert (out == img).all()


class TestHandCraftedTransforms:
    """Predictor and color transforms are decoder-side paths the
    spec-twin encoder does not emit — pin them with hand-built streams
    whose residuals are computed independently here."""

    def _container(self, body):
        chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
        if len(body) & 1:
            chunk += b"\x00"
        riff = b"WEBP" + chunk
        return b"RIFF" + len(riff).to_bytes(4, "little") + riff

    def _header(self, bw, w, h):
        bw.write(0x2F, 8)
        bw.write(w - 1, 14)
        bw.write(h - 1, 14)
        bw.write(0, 1)
        bw.write(0, 3)

    def test_predictor_transform_mode_top(self):
        from paddle_spark.sources.synth import _VP8LBits, _vp8l_encode_image

        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (6, 5, 3), dtype=np.uint8)
        argb = np.zeros((6, 5, 4), np.uint8)
        argb[:, :, 0] = 255
        argb[:, :, 1:] = img
        # residuals under the spec border rules with all blocks mode 2 (T)
        res = np.zeros_like(argb)
        for y in range(6):
            for x in range(5):
                if x == 0 and y == 0:
                    pred = np.array([255, 0, 0, 0], np.uint8)
                elif y == 0:
                    pred = argb[0, x - 1]
                elif x == 0:
                    pred = argb[y - 1, 0]
                else:
                    pred = argb[y - 1, x]  # mode 2: top
                res[y, x] = (argb[y, x].astype(np.int16) - pred) % 256
        bw = _VP8LBits()
        self._header(bw, 5, 6)
        bw.write(1, 1)   # a transform
        bw.write(0, 2)   # predictor
        bw.write(2, 3)   # size_bits = 4 -> one 2x2 block grid
        sub = np.zeros((2, 2, 4), np.uint8)
        sub[:, :, 0] = 255
        sub[:, :, 2] = 2  # mode 2 in the green channel
        _vp8l_encode_image(bw, sub, is_sub=True)
        bw.write(0, 1)   # no more transforms
        _vp8l_encode_image(bw, res)
        out = decode_webp_pixels(self._container(bw.bytes()))
        assert out is not None and (out == img).all()

    def test_color_transform(self):
        from paddle_spark.sources.synth import _VP8LBits, _vp8l_encode_image

        def delta(t, c):
            ts = ((int(t) + 128) % 256) - 128
            cs = ((int(c) + 128) % 256) - 128
            return (ts * cs) >> 5

        rng = np.random.RandomState(9)
        img = rng.randint(0, 256, (4, 4, 3), dtype=np.uint8)
        g2r, g2b, r2b = 40, 200, 17
        argb = np.zeros((4, 4, 4), np.uint8)
        argb[:, :, 0] = 255
        argb[:, :, 1:] = img
        res = argb.copy()
        for y in range(4):
            for x in range(4):
                r, g, b = (int(v) for v in img[y, x])
                res[y, x, 1] = (r - delta(g2r, g)) % 256
                res[y, x, 3] = (b - delta(g2b, g) - delta(r2b, r)) % 256
        bw = _VP8LBits()
        self._header(bw, 4, 4)
        bw.write(1, 1)
        bw.write(1, 2)   # color transform
        bw.write(2, 3)   # block size 16: one element covers the image
        elem = np.zeros((1, 1, 4), np.uint8)
        elem[0, 0] = (255, r2b, g2b, g2r)  # [A, R, G, B] channel mapping
        _vp8l_encode_image(bw, elem, is_sub=True)
        bw.write(0, 1)
        _vp8l_encode_image(bw, res)
        out = decode_webp_pixels(self._container(bw.bytes()))
        assert out is not None and (out == img).all()


def _encode_lossy_rgb(arr, quality=90.0):
    """Test-only lossy VP8 encoder via the system libwebp (ctypes) — an
    INDEPENDENT producer for the decode path under test."""
    import ctypes

    lib = ctypes.CDLL("libwebp.so.7")
    out = ctypes.POINTER(ctypes.c_uint8)()
    h, w = arr.shape[:2]
    data = np.ascontiguousarray(arr).tobytes()
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    n = lib.WebPEncodeRGB(
        data, ctypes.c_int(w), ctypes.c_int(h), ctypes.c_int(3 * w),
        ctypes.c_float(quality), ctypes.byref(out),
    )
    if n == 0:
        return None
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))


class TestNativeLossyArm:
    """Lossy VP8 through the system-libwebp arm (kernels/webp_native.py),
    gated on the library being present — which it is on ordinary Linux
    images. The VP8L parity test doubles as an independent third-party
    cross-check of the from-scratch lossless decoder."""

    @pytest.fixture(autouse=True)
    def _need_lib(self):
        from paddle_spark.kernels.webp_native import have_native_webp

        if not have_native_webp():
            pytest.skip("no system libwebp")

    def test_lossy_roundtrip_dims_and_fidelity(self):
        rng = np.random.RandomState(5)
        # smooth gradient + low noise: lossy codec must stay close
        y = np.linspace(40, 200, 24)[:, None]
        x = np.linspace(0, 55, 31)[None, :]
        arr = np.clip(y + x + rng.randint(0, 3, (24, 31)), 0, 255)
        arr = np.repeat(arr[:, :, None], 3, axis=2).astype(np.uint8)
        p = _encode_lossy_rgb(arr, quality=95.0)
        assert p is not None and p[12:16] == b"VP8 "
        got = decode_webp_pixels(p)
        assert got is not None and got.shape == (24, 31, 3)
        assert float(np.mean(np.abs(got.astype(int) - arr.astype(int)))) < 8.0
        # header dims agree with the pure-Python container parser
        meta = decode_image_header(p)
        assert (meta["width"], meta["height"]) == (31, 24)
        # and the magic dispatch reaches it
        assert decode_pixels(p).shape == (24, 31, 3)

    def test_vp8l_pure_decoder_matches_libwebp(self):
        """Byte-identical VP8L pixels: from-scratch decoder vs the real
        third-party implementation, across the spec-twin feature matrix."""
        from paddle_spark.kernels.webp_native import decode_webp_native

        rng = np.random.RandomState(11)
        fixtures = [
            make_webp(rng.randint(0, 256, (13, 9, 3), dtype=np.uint8)),
            make_webp(rng.randint(0, 256, (8, 21, 3), dtype=np.uint8),
                      subtract_green=True),
            make_webp(np.tile(rng.randint(0, 256, (1, 7, 3), dtype=np.uint8),
                              (11, 3, 1))),  # LZ77-friendly rows
        ]
        for p in fixtures:
            pure = decode_webp_pixels(p)
            nat = decode_webp_native(p, rgba=True)
            assert pure is not None and nat is not None
            if pure.shape[2] == 3:
                assert (nat[:, :, 3] == 255).all()
                nat = nat[:, :, :3]
            assert np.array_equal(pure, nat)

    def test_system_route_sends_lossless_webp_through_libwebp(self):
        """decoder_for('system') routes VP8L through libwebp (not the
        pure decoder) and the output stays byte-identical — the round-5d
        routing change that took the mixed-corpus system rate from 86 to
        234 imgs/s/core (BENCH/BASELINE.md)."""
        from paddle_spark.kernels.pixels import decode_pixels, decoder_for
        from paddle_spark.kernels.webp_native import have_native_webp

        if not have_native_webp():
            pytest.skip("no system libwebp")
        dec = decoder_for("system")
        rng = np.random.RandomState(12)
        for sg in (False, True):
            p = make_webp(rng.randint(0, 256, (19, 23, 3), dtype=np.uint8),
                          subtract_green=sg)
            assert np.array_equal(dec(p), decode_pixels(p))

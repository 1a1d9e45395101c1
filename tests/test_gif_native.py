"""System-giflib arm (kernels/gif_native.py): third-party byte-identity
pin for the from-scratch GIF decoder + the `system` codec route.

GIF's LZW and palette lookup are exact, so on any frame both decoders
accept the outputs must agree byte-for-byte — the same cross-validation
role libpng plays for the PNG decoder and libwebp for VP8L. Gated on
the library being present (skips cleanly without libgif 5.x).
"""

import glob

import numpy as np
import pytest

from paddle_spark.kernels.gif_native import decode_gif_native, have_native_gif
from paddle_spark.kernels.pixels import decode_gif_pixels, decoder_for
from paddle_spark.sources.synth import make_gif

pytestmark = pytest.mark.skipif(
    not have_native_gif(), reason="no system giflib on this host"
)


class TestSynthParity:
    def test_single_frame_plain_and_interlaced(self):
        rng = np.random.default_rng(9)
        pal = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
        idx = rng.integers(0, 32, size=(23, 17), dtype=np.uint8)
        for interlace in (False, True):
            p = make_gif(idx, pal, interlace=interlace)
            a = decode_gif_pixels(p)
            b = decode_gif_native(p)
            assert a is not None and b is not None
            assert a.shape == (23, 17, 3) == b.shape
            assert np.array_equal(a, b), interlace
            assert np.array_equal(a, pal[idx])  # closed form

    def test_animation_frames_rects_disposal_transparency(self):
        rng = np.random.default_rng(9)
        pal = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
        frames = [
            rng.integers(0, 32, size=(11, 13), dtype=np.uint8)
            for _ in range(3)
        ]
        p = make_gif(
            frames, pal, rects=[(0, 0), (2, 3), (1, 1)],
            disposals=[0, 2, 1], transparent=[5, 5, 5],
        )
        for k in range(3):
            a = decode_gif_pixels(p, frame=k)
            b = decode_gif_native(p, frame=k)
            assert a is not None and b is not None
            assert np.array_equal(a, b), k
        # out-of-range frame: both refuse
        assert decode_gif_pixels(p, frame=3) is None
        assert decode_gif_native(p, frame=3) is None

    def test_garbage_truncation_none(self):
        assert decode_gif_native(None) is None
        assert decode_gif_native(b"") is None
        assert decode_gif_native(b"GIF89a\x00") is None
        assert decode_gif_native(b"not a gif at all") is None
        rng = np.random.default_rng(2)
        pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
        p = make_gif(rng.integers(0, 8, size=(9, 9), dtype=np.uint8), pal)
        assert decode_gif_native(p[: len(p) // 2]) is None


class TestFuzz:
    def test_fuzz_never_crashes_worker(self):
        """giflib reports malformed data via GIF_ERROR return codes, so
        a mutated payload can never take down the executor's python
        worker — decode returns an array or None, nothing else."""
        import random

        rng = random.Random(29)
        pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
        base = bytearray(
            make_gif(
                np.arange(64, dtype=np.uint8).reshape(8, 8) % 16, pal,
                interlace=True,
            )
        )
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randint(1, 10)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            out = decode_gif_native(bytes(b))
            assert out is None or isinstance(out, np.ndarray)


class TestWildFiles:
    def test_wild_corpus_byte_identity(self):
        files = sorted(glob.glob("/usr/share/**/*.gif", recursive=True))
        if not files:
            pytest.skip("no wild GIFs on this host")
        both = match = 0
        for f in files[:300]:
            try:
                p = open(f, "rb").read()
            except OSError:
                continue
            a = decode_gif_pixels(p)
            b = decode_gif_native(p)
            if a is not None and b is not None:
                both += 1
                match += a.shape == b.shape and np.array_equal(a, b)
        assert match == both
        assert both > 0  # the corpus scan found at least one decodable GIF


class TestSystemCodecRoute:
    def test_decoder_for_system_routes_gif(self):
        dec = decoder_for("system")
        rng = np.random.default_rng(4)
        pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, size=(7, 9), dtype=np.uint8)
        out = dec(make_gif(idx, pal))
        assert out is not None and np.array_equal(out, pal[idx])

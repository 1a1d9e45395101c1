"""System-libpng arm (kernels/png_native.py): third-party byte-identity
pin for the from-scratch PNG decoder + the `system` codec route.

PNG is lossless, so wherever both decoders accept a file their outputs
must agree byte-for-byte — the same cross-validation role the libwebp
binding plays for the pure VP8L decoder (tests/test_webp.py). Gated on
the library being present (skips cleanly on hosts without libpng16).
"""

import glob
import random
import struct
import zlib

import numpy as np
import pytest

from paddle_spark.kernels.png_native import decode_png_native, have_native_png
from paddle_spark.kernels.pixels import decode_png_pixels, decoder_for
from paddle_spark.sources.synth import make_png

pytestmark = pytest.mark.skipif(
    not have_native_png(), reason="no system libpng16 on this host"
)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def make_palette_png(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """Minimal color-type-3 PNG (8-bit indices, filter 0 rows)."""
    h, w = idx.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


class TestSynthParity:
    def test_gray_rgb_rgba_all_filters_byte_identical(self):
        rng = np.random.default_rng(7)
        for shape in [(13, 9), (13, 9, 3), (13, 9, 4), (1, 1, 3), (64, 64, 3)]:
            arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
            p = make_png(arr, filter_types=[0, 1, 2, 3, 4] * 20)
            a = decode_png_pixels(p)
            b = decode_png_native(p)
            assert a is not None and b is not None
            assert a.shape == b.shape and np.array_equal(a, b), shape

    def test_palette_expands_identically(self):
        rng = np.random.default_rng(11)
        idx = rng.integers(0, 16, size=(21, 17), dtype=np.uint8)
        pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
        p = make_palette_png(idx, pal)
        a = decode_png_pixels(p)
        b = decode_png_native(p)
        assert a is not None and b is not None
        assert a.shape == (21, 17, 3) == b.shape
        assert np.array_equal(a, b)
        assert np.array_equal(a, pal[idx])  # both equal the closed form

    def test_garbage_and_truncation_return_none(self):
        assert decode_png_native(b"") is None
        assert decode_png_native(b"\x89PNG\r\n\x1a\nnonsense") is None
        arr = np.zeros((8, 8, 3), dtype=np.uint8)
        p = make_png(arr)
        assert decode_png_native(p[: len(p) // 2]) is None

    def test_fuzz_never_crashes_worker(self):
        """The whole point of the simplified API: libpng errors come
        back as return codes (setjmp stays inside the library), so a
        mutated payload can NEVER take down the executor's python
        worker — decode returns an array or None, nothing else."""
        rng = random.Random(23)
        base = bytearray(
            make_png(
                np.arange(192, dtype=np.uint8).reshape(8, 8, 3),
                filter_types=[0, 1, 2, 3, 4],
            )
        )
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randint(1, 10)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            out = decode_png_native(bytes(b))
            assert out is None or isinstance(out, np.ndarray)

    def test_hostile_dimension_guard(self):
        # a forged 40000x40000 header must be refused BEFORE allocation,
        # mirroring decode_png_pixels' guard
        ihdr = struct.pack(">IIBBBBB", 40000, 40000, 8, 2, 0, 0, 0)
        p = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + _chunk(b"IEND", b"")
        )
        assert decode_png_native(p) is None


class TestWildFiles:
    def test_wild_corpus_byte_identity(self):
        """Every /usr/share PNG both decoders accept must match exactly
        (sampled deterministically; an empty corpus skips)."""
        files = sorted(glob.glob("/usr/share/**/*.png", recursive=True))
        if not files:
            pytest.skip("no wild PNGs on this host")
        rng = random.Random(1)
        sample = rng.sample(files, min(150, len(files)))
        both = match = nat = 0
        for f in sample:
            try:
                p = open(f, "rb").read()
            except OSError:
                continue
            a = decode_png_pixels(p)
            b = decode_png_native(p)
            nat += b is not None
            if a is not None and b is not None:
                both += 1
                match += a.shape == b.shape and np.array_equal(a, b)
        # libpng should take (essentially) everything; identity must be
        # perfect on the shared domain and the comparison non-trivial
        assert nat >= len(sample) * 9 // 10
        assert both >= 50
        assert match == both

    def test_native_superset_16bit(self):
        """The system arm accepts what the pure decoder degrades on
        (16-bit; libpng treats those as linear light and sRGB-encodes —
        an interpretation the pure decoder deliberately does not
        replicate) — find any such wild file and confirm."""
        files = sorted(glob.glob("/usr/share/**/*.png", recursive=True))
        extra = 0
        for f in files[:2000]:
            try:
                p = open(f, "rb").read()
            except OSError:
                continue
            if len(p) > 29 and p[24] == 16:
                if decode_png_native(p) is not None:
                    assert decode_png_pixels(p) is None
                    extra += 1
            if extra >= 3:
                break
        # corpus-dependent: nothing to assert if the host has none

    def test_wild_interlaced_parity(self):
        """8-bit Adam7 wild files: pure decoder (round-5c interlace
        support) must agree byte-for-byte with libpng."""
        files = sorted(glob.glob("/usr/share/**/*.png", recursive=True))
        seen = 0
        for f in files:
            try:
                p = open(f, "rb").read()
            except OSError:
                continue
            if len(p) > 29 and p[28] == 1 and p[24] == 8:
                a = decode_png_pixels(p)
                b = decode_png_native(p)
                if a is not None and b is not None:
                    assert a.shape == b.shape and np.array_equal(a, b), f
                    seen += 1
            if seen >= 10:
                break
        # corpus-dependent; any found must have matched exactly

    def test_synth_interlaced_parity(self):
        rng = np.random.default_rng(5)
        for shape in [(13, 9), (13, 9, 3), (13, 9, 4), (1, 1, 3),
                      (7, 1, 3), (1, 7, 3), (9, 9, 2), (64, 33, 3)]:
            arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
            p = make_png(arr, filter_types=[0, 1, 2, 3, 4] * 30,
                         interlace=True)
            a = decode_png_pixels(p)
            b = decode_png_native(p)
            assert a is not None and b is not None
            assert np.array_equal(a, np.atleast_3d(arr))  # round-trip
            assert np.array_equal(a, b), shape  # third-party pin


class TestSystemCodecRoute:
    def test_decoder_for_system_routes_png_and_falls_back(self):
        dec = decoder_for("system")
        arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        png = make_png(arr)
        out = dec(png)
        assert out is not None and np.array_equal(out, arr)
        # non-PNG payloads fall back to the pure dispatch (BMP here)
        from paddle_spark.sources.synth import make_bmp

        bmp = make_bmp(arr)
        out2 = dec(bmp)
        assert out2 is not None and np.array_equal(out2, arr)
        assert dec(None) is None
        assert dec(b"garbage") is None

"""System-libtiff arm (kernels/tiff_native.py): third-party parity pin
for the from-scratch TIFF decoder + the `system` codec route.

TIFF strip data is lossless, so on the domain both decoders accept the
outputs must agree channel-for-channel after `to_3ch` normalization
(libtiff's RGBA-image API emits RGBA; the pure decoder emits gray/RGB) —
the same cross-validation role libpng plays for the PNG decoder, giflib
for GIF, and libwebp for VP8L. Gated on the library being present
(skips cleanly without libtiff 4.x/5.x/6.x).
"""

import glob

import numpy as np
import pytest

from paddle_spark.kernels.pixels import (
    decode_tiff_pixels,
    decoder_for,
    to_3ch,
)
from paddle_spark.kernels.tiff_native import (
    decode_tiff_native,
    have_native_tiff,
)
from paddle_spark.sources.synth import make_tiff, make_tiff_multi

pytestmark = pytest.mark.skipif(
    not have_native_tiff(), reason="no system libtiff on this host"
)


def _assert_3ch_identical(payload: bytes) -> None:
    pure = decode_tiff_pixels(payload)
    nat = decode_tiff_native(payload)
    assert pure is not None and nat is not None
    p3, n3 = to_3ch(pure), to_3ch(nat)
    assert p3.shape == n3.shape
    assert np.array_equal(p3, n3)


class TestSynthParity:
    def test_rgb_every_compression_and_predictor(self):
        rng = np.random.default_rng(11)
        arr = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        for comp, pred, rps in (
            ("none", 1, None),
            ("lzw", 1, 8),
            ("lzw", 2, 8),
            ("packbits", 1, 5),
        ):
            _assert_3ch_identical(
                make_tiff(arr, compression=comp, predictor=pred,
                          rows_per_strip=rps)
            )

    def test_gray_both_photometrics(self):
        rng = np.random.default_rng(12)
        g = rng.integers(0, 256, (33, 47), dtype=np.uint8)
        _assert_3ch_identical(make_tiff(g))  # black-is-zero
        _assert_3ch_identical(make_tiff(g, photometric=0))  # white-is-zero

    def test_palette(self):
        rng = np.random.default_rng(13)
        pal = (np.arange(256, dtype=np.uint16)
               .reshape(-1, 1).repeat(3, 1) * 257)
        idx = rng.integers(0, 256, (20, 30), dtype=np.uint8)
        _assert_3ch_identical(make_tiff(idx, palette=pal))

    def test_big_endian(self):
        # make_tiff emits little-endian; flip to MM via the pure
        # decoder's accepted wild files instead — covered by
        # TestWildFiles when the host carries one. Here: assert the
        # magic gate refuses non-TIFF quietly.
        assert decode_tiff_native(b"II+\x00" + b"\x00" * 64) is None

    def test_multi_page_first_ifd_matches(self):
        """The native arm is first-page-only (documented); that page
        must equal the pure decoder's ifd=0 walk."""
        rng = np.random.default_rng(14)
        frames = [rng.integers(0, 256, (9, 12), dtype=np.uint8)
                  for _ in range(3)]
        p = make_tiff_multi(frames)
        nat = decode_tiff_native(p)
        pure = decode_tiff_pixels(p, ifd=0)
        assert nat is not None and pure is not None
        assert np.array_equal(to_3ch(nat), to_3ch(pure))
        assert np.array_equal(to_3ch(pure)[:, :, 0], frames[0])

    def test_opaque_alpha_dropped_to_rgb(self):
        rng = np.random.default_rng(15)
        arr = rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
        out = decode_tiff_native(make_tiff(arr))
        assert out is not None and out.shape == (8, 9, 3)
        assert np.array_equal(out, arr)


class TestGarbage:
    def test_garbage_truncation_none(self):
        assert decode_tiff_native(None) is None
        assert decode_tiff_native(b"") is None
        assert decode_tiff_native(b"II*\x00") is None
        assert decode_tiff_native(b"not a tiff") is None
        rng = np.random.default_rng(2)
        p = make_tiff(rng.integers(0, 256, (9, 9), dtype=np.uint8))
        assert decode_tiff_native(p[: len(p) // 2]) is None

    def test_dimension_bomb_refused(self):
        """A header claiming > 64 Mpx is refused before allocation —
        same guard as the pure decoder family."""
        import struct

        # minimal IFD claiming 100000 x 100000
        hdr = bytearray(b"II*\x00\x08\x00\x00\x00")
        entries = [
            (256, 3, 1, 100_000),  # width
            (257, 3, 1, 100_000),  # height
        ]
        hdr += struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            hdr += struct.pack("<HHII", tag, typ, cnt, val)
        hdr += b"\x00\x00\x00\x00"
        assert decode_tiff_native(bytes(hdr)) is None


class TestFuzz:
    def test_fuzz_never_crashes_worker(self):
        """libtiff reports malformed data via return codes
        (stopOnError=0), so a mutated payload can never take down the
        executor's python worker — decode returns an array or None."""
        import random

        rng = random.Random(31)
        base = bytearray(
            make_tiff(
                (np.arange(300, dtype=np.uint8).reshape(10, 30) * 7) % 256,
                compression="lzw",
                predictor=2,
                rows_per_strip=4,
            )
        )
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randint(1, 10)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            out = decode_tiff_native(bytes(b))
            assert out is None or isinstance(out, np.ndarray)


class TestWildFiles:
    def test_wild_corpus_parity(self):
        """Wild TIFFs from independent producers (python stdlib test
        data ships one per interpreter on this box): wherever BOTH
        decoders accept, channels must agree; the native arm must
        accept at least as many files as the pure one."""
        pats = ["/usr/share/**/*.tif*", "/root/.pyenv/**/test/**/*.tif*"]
        files = sorted({f for pat in pats
                        for f in glob.glob(pat, recursive=True)})
        if not files:
            pytest.skip("no wild TIFFs on this host")
        nat_ok = pure_ok = both = match = 0
        for f in files[:300]:
            try:
                p = open(f, "rb").read()
            except OSError:
                continue
            a = decode_tiff_pixels(p)
            b = decode_tiff_native(p)
            pure_ok += a is not None
            nat_ok += b is not None
            if a is not None and b is not None:
                both += 1
                match += (to_3ch(a).shape == to_3ch(b).shape
                          and np.array_equal(to_3ch(a), to_3ch(b)))
        assert nat_ok > 0
        assert nat_ok >= pure_ok  # superset domain
        assert match == both


class TestSystemCodecRoute:
    def test_decoder_for_system_routes_tiff(self):
        dec = decoder_for("system")
        rng = np.random.default_rng(4)
        arr = rng.integers(0, 256, (7, 9, 3), dtype=np.uint8)
        out = dec(make_tiff(arr, compression="lzw"))
        assert out is not None and np.array_equal(out, arr)

    def test_system_route_falls_back_to_pure_on_native_refusal(self):
        """A payload the native arm refuses but the pure decoder
        accepts must still decode through the route (defense in
        depth — and vice versa the route tries native first)."""
        dec = decoder_for("system")
        assert dec(b"garbage") is None

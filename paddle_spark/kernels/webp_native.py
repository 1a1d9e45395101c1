"""ctypes binding to the system libwebp decoder — the lossy-VP8 arm.

The VP8L (lossless) bitstream decodes from scratch in kernels/webp.py;
lossy VP8 frames additionally need RFC 6386's ~1k normative
default-probability constants, which cannot be re-derived from first
principles in this offline sandbox — only transcribed. The system codec
library (libwebp, BSD license, shipped on ordinary cluster images) fills
exactly that arm through ctypes, the same dependency class as the
stdlib ``zlib`` module backing the PNG/Flate paths. Import-gated: when
no libwebp is present the lossy arm degrades to None exactly as before
(container/header dims still parse in pure Python, kernels/raster.py).

The binding doubles as an INDEPENDENT cross-check for the from-scratch
VP8L decoder: tests assert byte-identical pixels between the pure
decoder and libwebp on the spec-twin lossless fixtures (see
tests/test_webp.py) — parity against a real third-party implementation,
not just our own encoder twin.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np


def _load() -> ctypes.CDLL | None:
    candidates = ["libwebp.so.7", "libwebp.so", "libwebp.7.dylib", "libwebp.dylib"]
    found = ctypes.util.find_library("webp")
    if found:
        candidates.append(found)
    for name in candidates:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            for sym in ("WebPGetInfo", "WebPDecodeRGBA", "WebPDecodeRGB", "WebPFree"):
                getattr(lib, sym)
        except AttributeError:
            continue
        u8p = ctypes.POINTER(ctypes.c_uint8)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.WebPDecodeRGBA.restype = u8p
        lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ip, ip]
        lib.WebPDecodeRGB.restype = u8p
        lib.WebPDecodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ip, ip]
        lib.WebPGetInfo.restype = ctypes.c_int
        lib.WebPGetInfo.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ip, ip]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        return lib
    return None


_LIB = _load()


def have_native_webp() -> bool:
    """True when a system libwebp was found (the lossy-VP8 arm is live)."""
    return _LIB is not None


def decode_webp_native(p: bytes, rgba: bool = True) -> np.ndarray | None:
    """Decode a complete WebP payload (any container: bare VP8/VP8L or
    VP8X with ALPH) via the system libwebp. Returns (H, W, 4) RGBA when
    ``rgba`` else (H, W, 3) RGB; None on failure or without the library.
    The decoded buffer is copied into NumPy ownership and freed with
    WebPFree immediately (never free() — allocator mismatch)."""
    if _LIB is None or not p:
        return None
    w, h = ctypes.c_int(0), ctypes.c_int(0)
    fn = _LIB.WebPDecodeRGBA if rgba else _LIB.WebPDecodeRGB
    buf = fn(p, len(p), ctypes.byref(w), ctypes.byref(h))
    if not buf:
        return None
    try:
        nch = 4 if rgba else 3
        arr = np.ctypeslib.as_array(buf, shape=(h.value, w.value, nch)).copy()
    finally:
        _LIB.WebPFree(ctypes.cast(buf, ctypes.c_void_p))
    return arr

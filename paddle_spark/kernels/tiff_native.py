"""ctypes binding to the system libtiff — the fast TIFF arm.

TIFF decodes from scratch in kernels/pixels.py (strips, LZW/PackBits,
horizontal-differencing predictor, gray/RGB/palette/white-is-zero —
tested). This module binds libtiff 4's RGBA-image API
(``TIFFClientOpen`` over an in-memory byte buffer +
``TIFFReadRGBAImageOriented``), which — unlike classic libjpeg — has a
plain return-code error contract (no setjmp crossing the FFI boundary;
``stopOnError=0`` turns corrupt data into a 0 return, never an abort).
Same dependency class as the stdlib ``zlib`` module backing the Flate
paths and the libwebp/libpng/giflib arms. Import-gated: without a
libtiff the caller falls back to the pure decoder.

Two jobs:

* **Throughput arm**: ``decoder_for('system')`` (kernels/pixels.py)
  routes TIFF through this binding for bulk jobs — measured 145x the
  pure decoder on a 256x256 LZW+predictor fixture (BENCH/BASELINE.md).
* **Independent cross-check**: TIFF strips are lossless, so on the
  domain the pure decoder accepts the two must agree channel-for-channel
  after ``to_3ch`` normalization (libtiff emits RGBA; the pure decoder
  emits gray/RGB) — a third-party parity pin for
  ``pixels.decode_tiff_pixels`` (tests/test_tiff_native.py), the same
  role libpng/libwebp play for the PNG/VP8L decoders.

Scope notes: the RGBA-image API additionally handles tiled layouts,
planar-separate, 16-bit samples, YCbCr/JPEG-in-TIFF and CCITT fax
compressions — the system arm accepts MORE than the pure decoder (which
degrades those to None). First directory (page) only; multi-page frame
sampling stays on the pure decoder's IFD walk
(``decode_tiff_pixels(p, ifd=n)``). Output: ``(H, W, 3)`` uint8 when the
alpha plane is fully opaque (the common case, matching the pure arm's
layout after ``to_3ch``), else ``(H, W, 4)``.

Reference parity target: the reference accepts any PIL-openable image
(model.py:339-368 ``_iterate_image_frames``); PIL's TIFF plugin is
itself libtiff-backed, so this arm reproduces the reference's decode
domain for TIFF.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

# TIFF tag ids (TIFF 6.0 spec / tiff.h)
_TAG_IMAGEWIDTH = 256
_TAG_IMAGELENGTH = 257

_ORIENTATION_TOPLEFT = 1

# 64 Mpx guard — same bound the pure decoder family uses against
# decompression bombs (a 4-byte dimension field can claim anything).
_MAX_PIXELS = 64_000_000

# libtiff 4.x client-IO callback signatures (tiffio.h):
#   tmsize_t (*TIFFReadWriteProc)(thandle_t, void*, tmsize_t)
#   toff_t   (*TIFFSeekProc)(thandle_t, toff_t, int)
#   int      (*TIFFCloseProc)(thandle_t)
#   toff_t   (*TIFFSizeProc)(thandle_t)
#   int      (*TIFFMapFileProc)(thandle_t, void**, toff_t*)
#   void     (*TIFFUnmapFileProc)(thandle_t, void*, toff_t)
_ReadWriteProc = ctypes.CFUNCTYPE(
    ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64
)
_SeekProc = ctypes.CFUNCTYPE(
    ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int
)
_CloseProc = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p)
_SizeProc = ctypes.CFUNCTYPE(ctypes.c_uint64, ctypes.c_void_p)
_MapProc = ctypes.CFUNCTYPE(
    ctypes.c_int,
    ctypes.c_void_p,
    ctypes.POINTER(ctypes.c_void_p),
    ctypes.POINTER(ctypes.c_uint64),
)
_UnmapProc = ctypes.CFUNCTYPE(
    None, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64
)


def _load() -> ctypes.CDLL | None:
    candidates = ["libtiff.so.6", "libtiff.so.5", "libtiff.so", "libtiff.dylib"]
    found = ctypes.util.find_library("tiff")
    if found:
        candidates.append(found)
    for name in candidates:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            for sym in (
                "TIFFClientOpen",
                "TIFFClose",
                "TIFFGetField",
                "TIFFReadRGBAImageOriented",
                "TIFFSetErrorHandler",
                "TIFFSetWarningHandler",
            ):
                getattr(lib, sym)
        except AttributeError:
            continue
        # Silence libtiff's default stderr chatter on malformed input —
        # garbage payloads are an expected input class, isolated per row.
        lib.TIFFSetErrorHandler.restype = ctypes.c_void_p
        lib.TIFFSetErrorHandler.argtypes = [ctypes.c_void_p]
        lib.TIFFSetWarningHandler.restype = ctypes.c_void_p
        lib.TIFFSetWarningHandler.argtypes = [ctypes.c_void_p]
        lib.TIFFSetErrorHandler(None)
        lib.TIFFSetWarningHandler(None)
        lib.TIFFClientOpen.restype = ctypes.c_void_p
        lib.TIFFClientOpen.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_void_p,
            _ReadWriteProc,
            _ReadWriteProc,
            _SeekProc,
            _CloseProc,
            _SizeProc,
            _MapProc,
            _UnmapProc,
        ]
        lib.TIFFClose.restype = None
        lib.TIFFClose.argtypes = [ctypes.c_void_p]
        # TIFFGetField is VARIADIC: declare the fixed prefix so the TIFF*
        # handle rides as a full 64-bit pointer (ctypes' default int
        # conversion truncates to 32 bits -> segfault).
        lib.TIFFGetField.restype = ctypes.c_int
        lib.TIFFGetField.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        lib.TIFFReadRGBAImageOriented.restype = ctypes.c_int
        lib.TIFFReadRGBAImageOriented.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint32,
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
            ctypes.c_int,
        ]
        return lib
    return None


_LIB = _load()


def have_native_tiff() -> bool:
    """True when a usable system libtiff is bound."""
    return _LIB is not None


def decode_tiff_native(p: bytes | None) -> np.ndarray | None:
    """First-page TIFF -> (H, W, 3|4) uint8 via system libtiff, or None
    (no library / not a TIFF / decode error / over the pixel guard).
    Alpha is dropped when fully opaque so the common case matches the
    pure decoder's layout under ``to_3ch``."""
    if _LIB is None or not p or len(p) < 8:
        return None
    if p[:4] not in (b"II*\x00", b"MM\x00*"):
        return None
    lib = _LIB
    state = {"pos": 0}
    data = p

    def _read(_h, dst, n):
        pos = state["pos"]
        chunk = data[pos : pos + n]
        if chunk:
            ctypes.memmove(dst, chunk, len(chunk))
        state["pos"] = pos + len(chunk)
        return len(chunk)

    def _write(_h, _src, _n):
        return 0

    def _seek(_h, off, whence):
        # toff_t is unsigned, so a negative SEEK_CUR/SEEK_END offset from
        # libtiff arrives wrapped — reinterpret as signed 64-bit before
        # applying, and clamp the result into [0, len(data)] so a bogus
        # offset degrades to a failed read instead of a huge position
        if off >= 1 << 63:
            off -= 1 << 64
        if whence == 0:
            pos = off
        elif whence == 1:
            pos = state["pos"] + off
        else:
            pos = len(data) + off
        state["pos"] = min(max(pos, 0), len(data))
        return state["pos"]

    # Callback objects must outlive the TIFF* — hold them in a local
    # tuple for the whole call ("m" mode disables mmap so the map/unmap
    # procs are never invoked, but libtiff requires non-NULL slots).
    cbs = (
        _ReadWriteProc(_read),
        _ReadWriteProc(_write),
        _SeekProc(_seek),
        _CloseProc(lambda _h: 0),
        _SizeProc(lambda _h: len(data)),
        _MapProc(lambda _h, _b, _s: 0),
        _UnmapProc(lambda _h, _b, _s: None),
    )
    tif = lib.TIFFClientOpen(b"mem", b"rm", None, *cbs)
    if not tif:
        return None
    try:
        w = ctypes.c_uint32(0)
        h = ctypes.c_uint32(0)
        if not lib.TIFFGetField(tif, _TAG_IMAGEWIDTH, ctypes.byref(w)):
            return None
        if not lib.TIFFGetField(tif, _TAG_IMAGELENGTH, ctypes.byref(h)):
            return None
        width, height = int(w.value), int(h.value)
        if not width or not height or width * height > _MAX_PIXELS:
            return None
        raster = np.empty(height * width, dtype=np.uint32)
        ok = lib.TIFFReadRGBAImageOriented(
            tif,
            width,
            height,
            raster.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            _ORIENTATION_TOPLEFT,
            0,  # stopOnError=0: partial/corrupt data -> return 0, no abort
        )
        if not ok:
            return None
    except Exception:
        return None
    finally:
        lib.TIFFClose(tif)
    # Packed ABGR words: little-endian uint32 view yields R,G,B,A byte
    # order (TIFFGetR(v) == v & 0xff). Big-endian hosts would need a
    # byteswap; Spark executors in scope are little-endian.
    rgba = raster.view(np.uint8).reshape(height, width, 4)
    if rgba[:, :, 3].min() == 255:
        return np.ascontiguousarray(rgba[:, :, :3])
    return rgba

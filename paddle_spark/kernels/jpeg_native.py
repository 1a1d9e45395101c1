"""System-libjpeg JPEG arm: C-speed entropy decode, pure reconstruction.

JPEG decodes from scratch in kernels/jpeg.py (baseline + progressive,
bit-exact, tested). That decoder's cost is ~entirely the Python
bit-by-bit Huffman loop; its NumPy reconstruction (dequantize -> IDCT ->
upsample -> color) is already vectorized. This module therefore splits
the work at the coefficient boundary:

* the system libjpeg(-turbo) performs ONLY the bitstream/entropy decode
  (``jpeg_read_coefficients`` — no IDCT, no color conversion, no
  upsampling happens in C);
* the quantized coefficient grids are handed to the SAME
  ``kernels.jpeg._reconstruct`` the pure decoder uses.

Pixels are therefore **byte-identical to the pure decoder by
construction** — both paths run the identical NumPy reconstruction over
identical integer coefficients (entropy decoding is exact; pinned by
tests/test_jpeg_native.py on noise/solid/subsampled/restart/progressive
fixtures). That sidesteps the IDCT/rounding divergence a full libjpeg
decode would introduce, while removing the Python Huffman loop that
made JPEG the slowest format in the system mix.

Why a compiled shim instead of plain ctypes like the other arms: classic
libjpeg's error contract is ``error_exit`` MUST NOT return (the default
calls ``exit()``), and the standard recovery is a ``setjmp``/``longjmp``
pair — which cannot cross a ctypes boundary safely. The 90-line C shim
below owns that jump buffer entirely inside C, so a malformed payload
surfaces as an error code, never a worker exit (fuzz-pinned). The shim
compiles once per host into a shared cache dir (flock-guarded, atomic
rename) using the system gcc + libjpeg headers; hosts without gcc or
libjpeg simply report ``have_native_jpeg() == False`` and the caller
falls back to the pure decoder.

Domain: mirrors the pure decoder's guards exactly (8-bit precision,
1 or 3 components, sampling factors <= 2, Huffman coding, <= 2^25 px) so
'system' and 'python' accept the same inputs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stddef.h>
#include <stdio.h>
#include <string.h>
#include <setjmp.h>
#include <jpeglib.h>

struct pj_err {
  struct jpeg_error_mgr pub;
  jmp_buf jb;
};

static void pj_error_exit(j_common_ptr cinfo) {
  struct pj_err *e = (struct pj_err *)cinfo->err;
  longjmp(e->jb, 1);
}
static void pj_output_message(j_common_ptr cinfo) { (void)cinfo; }
static void pj_emit_message(j_common_ptr cinfo, int lvl) {
  (void)cinfo; (void)lvl;
}

static long pj_round_up(long a, long b) { return ((a + b - 1) / b) * b; }

/* Decode every DCT coefficient of an in-memory JPEG.
 *
 * Two-phase: when out_cap is smaller than required, stops after the
 * header (cheap), fills dims/meta and the required element count into
 * *out_used, and returns 2. With a large enough buffer performs the full
 * entropy decode once and returns 0.
 *
 * comp_meta: per component 5 ints (h_samp, v_samp, quant_tbl_no,
 * padded width_in_blocks, padded height_in_blocks) — padding to the MCU
 * grid, matching the pure decoder's (mcux*h, mcuy*v) block layout.
 * qtbl/qt_present: up to 4 quant tables, NATURAL order, 64 u16 each.
 * out: per component, row-major blocks of 64 shorts in NATURAL order.
 *
 * Returns 0 ok, 1 decode error, 2 buffer too small, 3 unsupported. */
int pj_decode_coefs(const unsigned char *buf, unsigned long len,
                    int *width, int *height, int *ncomp, int *flags,
                    int *comp_meta, unsigned short *qtbl, int *qt_present,
                    short *out, long out_cap, long *out_used) {
  struct jpeg_decompress_struct cinfo;
  struct pj_err jerr;
  jvirt_barray_ptr *coef_arrays;
  long need = 0, pos = 0;
  int ci, t;

  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = pj_error_exit;
  jerr.pub.output_message = pj_output_message;
  jerr.pub.emit_message = pj_emit_message;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, (unsigned char *)buf, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  *width = (int)cinfo.image_width;
  *height = (int)cinfo.image_height;
  *ncomp = (int)cinfo.num_components;
  *flags = (cinfo.arith_code ? 1 : 0) |
           ((cinfo.data_precision != 8) ? 2 : 0) |
           (cinfo.progressive_mode ? 4 : 0);
  if (cinfo.num_components < 1 || cinfo.num_components > 4) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  for (ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *c = cinfo.comp_info + ci;
    long wib = pj_round_up((long)c->width_in_blocks, c->h_samp_factor);
    long hib = pj_round_up((long)c->height_in_blocks, c->v_samp_factor);
    comp_meta[ci * 5 + 0] = c->h_samp_factor;
    comp_meta[ci * 5 + 1] = c->v_samp_factor;
    comp_meta[ci * 5 + 2] = c->quant_tbl_no;
    comp_meta[ci * 5 + 3] = (int)wib;
    comp_meta[ci * 5 + 4] = (int)hib;
    need += wib * hib * DCTSIZE2;
  }
  *out_used = need;
  if (out_cap < need) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  coef_arrays = jpeg_read_coefficients(&cinfo);
  if (coef_arrays == NULL) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  for (t = 0; t < 4; t++) {
    qt_present[t] = (cinfo.quant_tbl_ptrs[t] != NULL);
    if (qt_present[t])
      memcpy(qtbl + t * DCTSIZE2, cinfo.quant_tbl_ptrs[t]->quantval,
             DCTSIZE2 * sizeof(unsigned short));
  }
  for (ci = 0; ci < cinfo.num_components; ci++) {
    long wib = comp_meta[ci * 5 + 3], hib = comp_meta[ci * 5 + 4];
    long row;
    for (row = 0; row < hib; row++) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
          (j_common_ptr)&cinfo, coef_arrays[ci], (JDIMENSION)row, 1, FALSE);
      memcpy(out + pos, rows[0], (size_t)wib * DCTSIZE2 * sizeof(JCOEF));
      pos += wib * DCTSIZE2;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}
"""

# Per-uid, 0o700 cache dir: the shim is dlopen()ed into every worker, so
# the cache must never be writable (or plantable) by another local user —
# _secure_dir refuses symlinks, foreign owners and group/world access.
_CACHE_DIR = os.path.join(
    tempfile.gettempdir(), f"paddle_spark_jpeg_shim_v1_uid{os.getuid()}"
)
_LIB = None
_TRIED = False

# natural-order index of zigzag position k (ZIGZAG[k] = (row, col)):
# reorders libjpeg's natural-order blocks/tables into the zigzag layout
# kernels.jpeg stores
_NAT_OF_ZIG: np.ndarray | None = None


def _secure_dir(path: str) -> None:
    """Create/validate the cache dir: must be a non-symlink directory
    owned by this uid with no group/world access. Raises otherwise."""
    import stat

    os.makedirs(path, mode=0o700, exist_ok=True)
    st = os.lstat(path)
    if (
        not stat.S_ISDIR(st.st_mode)
        or stat.S_ISLNK(st.st_mode)
        or st.st_uid != os.getuid()
        or (st.st_mode & 0o077)
    ):
        raise RuntimeError(f"unsafe shim cache dir: {path}")


def _safe_so(path: str) -> bool:
    """Only load a shim owned by this uid and writable by no one else."""
    import stat

    try:
        st = os.lstat(path)
    except OSError:
        return False
    return (
        stat.S_ISREG(st.st_mode)
        and st.st_uid == os.getuid()
        and not (st.st_mode & 0o022)
    )


def _build_shim() -> str | None:
    """Compile the shim once per host (flock-guarded, atomic rename).
    Returns the .so path or None when gcc / libjpeg dev files are absent.
    A persistent .build_failed marker stops every later process on the
    host from re-spawning gcc for a compile that cannot succeed."""
    so = os.path.join(_CACHE_DIR, "pjshim.so")
    try:
        _secure_dir(_CACHE_DIR)
        if os.path.exists(so):
            return so if _safe_so(so) else None
        failed = os.path.join(_CACHE_DIR, ".build_failed")
        if os.path.exists(failed):
            return None
        import fcntl

        with open(os.path.join(_CACHE_DIR, ".lock"), "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            if os.path.exists(so):  # another worker won the race
                return so if _safe_so(so) else None
            if os.path.exists(failed):
                return None
            csrc = os.path.join(_CACHE_DIR, "pjshim.c")
            with open(csrc, "w") as f:
                f.write(_C_SRC)
            tmp = so + f".tmp{os.getpid()}"
            r = subprocess.run(
                ["gcc", "-O2", "-fPIC", "-shared", "-o", tmp, csrc,
                 "-ljpeg"],
                capture_output=True, timeout=120,
            )
            if r.returncode != 0:
                with open(failed, "w") as f:
                    f.write(r.stderr.decode("utf-8", "replace")[:2000])
                return None
            os.rename(tmp, so)  # atomic: readers only ever see a full .so
            return so
    except Exception:
        return None


def _load():
    global _LIB, _TRIED, _NAT_OF_ZIG
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _build_shim()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        fn = lib.pj_decode_coefs
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_char_p, ctypes.c_ulong,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int16), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
        ]
        from paddle_spark.kernels.jpeg import ZIGZAG

        _NAT_OF_ZIG = np.array([r * 8 + c for r, c in ZIGZAG], dtype=np.int64)
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def have_native_jpeg() -> bool:
    """True when the libjpeg shim compiled and loaded (fast JPEG arm live)."""
    return _load() is not None


def _call(lib, p: bytes, out: np.ndarray | None):
    w = ctypes.c_int()
    h = ctypes.c_int()
    nc = ctypes.c_int()
    flags = ctypes.c_int()
    meta = (ctypes.c_int * 20)()
    qt = (ctypes.c_uint16 * 256)()
    qtp = (ctypes.c_int * 4)()
    used = ctypes.c_long()
    cap = 0 if out is None else out.size
    buf = None if out is None else out.ctypes.data_as(
        ctypes.POINTER(ctypes.c_int16)
    )
    rc = lib.pj_decode_coefs(
        p, len(p), ctypes.byref(w), ctypes.byref(h), ctypes.byref(nc),
        ctypes.byref(flags), meta, qt, qtp, buf, cap, ctypes.byref(used),
    )
    return rc, w.value, h.value, nc.value, flags.value, meta, qt, qtp, used.value


def decode_jpeg_native(p: bytes | None) -> np.ndarray | None:
    """Decode a JPEG via libjpeg entropy decode + the pure decoder's own
    NumPy reconstruction. Returns exactly what
    kernels.jpeg.decode_jpeg_pixels returns — (H, W, 3) RGB or (H, W, 1)
    gray uint8 — or None on failure / out-of-domain / missing shim."""
    lib = _load()
    if lib is None or not p or p[:3] != b"\xff\xd8\xff":
        return None
    try:
        rc, w, h, nc, flags, meta, _, _, need = _call(lib, p, None)
        if rc != 2:  # header-only probe must come back "buffer too small"
            return None
        # mirror the pure decoder's domain guards exactly
        if flags & 1 or flags & 2:  # arithmetic coding / non-8-bit
            return None
        if nc not in (1, 3) or w == 0 or h == 0 or w * h > 1 << 25:
            return None
        comps = []
        for ci in range(nc):
            ch, cv, tq, wib, hib = meta[ci * 5 : ci * 5 + 5]
            comps.append({"id": ci, "h": ch, "v": cv, "tq": tq,
                          "wib": wib, "hib": hib})
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
            return None
        out = np.empty(need, dtype=np.int16)
        rc, _w2, _h2, _nc2, _fl2, _m2, qtbuf, qtp, _used = _call(lib, p, out)
        if rc != 0:
            return None
        from paddle_spark.kernels.jpeg import _reconstruct

        coeffs = []
        pos = 0
        for c in comps:
            nblk = c["hib"] * c["wib"] * 64
            grid = out[pos : pos + nblk].reshape(c["hib"], c["wib"], 64)
            pos += nblk
            # natural -> zigzag: the pure decoder stores coefficient
            # vectors (and quant tables) in zigzag order
            coeffs.append(grid[:, :, _NAT_OF_ZIG].astype(np.int32))
        qt = {}
        qts = np.ctypeslib.as_array(qtbuf).reshape(4, 64)
        for t in range(4):
            if qtp[t]:
                qt[t] = qts[t].astype(np.float64)[_NAT_OF_ZIG]
        frame = {"w": w, "h": h, "comps": comps, "hmax": hmax, "vmax": vmax}
        return _reconstruct(frame, coeffs, qt)
    except Exception:
        return None

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
    # flipping SOF0 -> SOF2 leaves a valid full-band progressive frame:
    # must decode IDENTICALLY (shared coefficient path)
    prog = base.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert np.array_equal(decode_jpeg_pixels(prog), decode_jpeg_pixels(base))
    # lossless (SOF3) stays out of scope
    assert decode_jpeg_pixels(base.replace(b"\xff\xc0", b"\xff\xc3", 1)) is None
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


@pytest.mark.parametrize("path,min_white", [
    ("/usr/share/doc/nodejs/thin-white-stripe.jpg", 0.80),
    ("/usr/share/doc/nodejs/full-white-stripe.jpg", 0.95),
])
def test_wild_progressive_jpegs_decode(path, min_white):
    """The system's wild JPEGs are PROGRESSIVE (SOF2) from a real-world
    encoder — independent validation of the multi-scan path: dims match
    the header walk, and the pixel content matches the filenames (the
    'white stripe' images are overwhelmingly white)."""
    import os

    from paddle_spark.kernels.raster import decode_image_header

    if not os.path.exists(path):
        pytest.skip("system jpegs not present")
    p = open(path, "rb").read()
    meta = decode_image_header(p)
    img = decode_jpeg_pixels(p)
    assert img is not None
    assert img.shape == (meta["height"], meta["width"], 3) == (img.shape[0], 493, 3)
    assert float((img > 240).mean()) > min_white


# ---------------------------------------------------------------------------
# progressive equivalence: re-encode the SAME quantized coefficients as
# progressive scans (spectral selection + successive approximation); the
# decoder must reproduce the baseline pixels bit-for-bit.
# ---------------------------------------------------------------------------

def _components_and_coeffs(img, subsample, quant):
    """Replicate make_jpeg's deterministic coefficient computation."""
    from paddle_spark.kernels.jpeg import dct2

    a = np.asarray(img, dtype=np.float64)
    gray = a.ndim == 2
    if gray:
        comps = [(1, 1)]
        planes = [a]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = {"444": [(1, 1), (1, 1), (1, 1)],
                 "422": [(2, 1), (1, 1), (1, 1)],
                 "420": [(2, 2), (1, 1), (1, 1)]}[subsample]
        planes = [y, cb, cr]
    h, w = a.shape[:2]
    hmax = max(c[0] for c in comps)
    vmax = max(c[1] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    out = []
    for (ch, cv), plane in zip(comps, planes):
        fy, fx = vmax // cv, hmax // ch
        if fx > 1 or fy > 1:
            ph, pw = plane.shape
            pad = np.pad(plane, ((0, ph % fy), (0, pw % fx)), mode="edge")
            plane = pad.reshape(
                pad.shape[0] // fy, fy, pad.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        th, tw = mcuy * cv * 8, mcux * ch * 8
        plane = np.pad(
            plane, ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        by, bx = th // 8, tw // 8
        co = np.zeros((by, bx, 64), dtype=int)
        from paddle_spark.kernels.jpeg import ZIGZAG as ZZ
        for yb in range(by):
            for xb in range(bx):
                block = plane[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8] - 128.0
                c2 = np.rint(dct2(block) / quant).astype(int)
                co[yb, xb] = [c2[r_, c_] for r_, c_ in ZZ]
        out.append(((ch, cv), co))
    return out, (w, h, hmax, vmax, mcux, mcuy)


class _PW:
    """Bit writer with 0xFF stuffing + flat 9-bit canonical tables."""

    DC = list(range(12))
    AC = sorted({0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)})

    def __init__(self):
        self.out = bytearray()
        self.cur = self.bits = 0
        self.dc_code = {s: i for i, s in enumerate(self.DC)}
        self.ac_code = {s: i for i, s in enumerate(self.AC)}

    def put(self, code, width):
        for i in range(width - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> i) & 1)
            self.bits += 1
            if self.bits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)
                self.cur = self.bits = 0

    def sym_dc(self, s):
        self.put(self.dc_code[s], 9)

    def sym_ac(self, s):
        self.put(self.ac_code[s], 9)

    def val(self, v, t):
        if t:
            self.put(v if v >= 0 else v + (1 << t) - 1, t)

    def flush(self):
        if self.bits:
            self.cur = (self.cur << (8 - self.bits)) | ((1 << (8 - self.bits)) - 1)
            self.out.append(self.cur)
            if self.cur == 0xFF:
                self.out.append(0x00)
            self.cur = self.bits = 0


def _make_progressive(img, subsample="444", quant=8):
    """Progressive JPEG carrying the SAME coefficients as make_jpeg:
    DC first (Al=1) -> DC refine -> per-component AC bands (Al=1) ->
    per-component AC refinements (Ah=1, Al=0)."""
    import struct

    comps, (w, h, hmax, vmax, mcux, mcuy) = _components_and_coeffs(
        img, subsample, quant
    )
    nc = len(comps)
    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(marker + struct.pack(">H", len(payload) + 2) + payload)

    seg(b"\xff\xdb", b"\x00" + bytes(quant for _ in range(64)))
    seg(b"\xff\xdb", b"\x01" + bytes(quant for _ in range(64)))
    sof = bytearray(b"\x08" + struct.pack(">HH", h, w) + bytes([nc]))
    for k, ((ch, cv), _) in enumerate(comps):
        sof += bytes([k + 1, (ch << 4) | cv, 0 if k == 0 else 1])
    seg(b"\xff\xc2", bytes(sof))
    counts = [0] * 16
    counts[8] = len(_PW.DC)
    seg(b"\xff\xc4", bytes([0x00] + counts) + bytes(_PW.DC))
    counts = [0] * 16
    counts[8] = len(_PW.AC)
    seg(b"\xff\xc4", bytes([0x10] + counts) + bytes(_PW.AC))

    def sos(comp_ids, ss, se, ah, al, body):
        payload = bytearray([len(comp_ids)])
        for cid in comp_ids:
            payload += bytes([cid, 0x00])
        payload += bytes([ss, se, (ah << 4) | al])
        seg(b"\xff\xda", bytes(payload))
        out.extend(body)

    def cat(v):
        return int(abs(v)).bit_length()

    # scan 1: DC first, interleaved, Al=1
    wtr = _PW()
    pred = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, ((ch, cv), co) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        dc = int(co[my * cv + by, mx * ch + bx, 0]) >> 1
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        t = cat(diff)
                        wtr.sym_dc(t)
                        wtr.val(diff, t)
    wtr.flush()
    sos(list(range(1, nc + 1)), 0, 0, 0, 1, wtr.out)

    # scan 2: DC refinement (raw bits, no huffman)
    wtr = _PW()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, ((ch, cv), co) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        wtr.put(int(co[my * cv + by, mx * ch + bx, 0]) & 1, 1)
    wtr.flush()
    sos(list(range(1, nc + 1)), 0, 0, 1, 0, wtr.out)

    # per component: AC first scans (two spectral bands, Al=1)
    for ci, ((ch, cv), co) in enumerate(comps):
        bw = -(-(-(-w * ch // hmax)) // 8)
        bh = -(-(-(-h * cv // vmax)) // 8)
        for (ss, se) in ((1, 5), (6, 63)):
            wtr = _PW()
            for by in range(bh):
                for bx in range(bw):
                    zz = co[by, bx]
                    run = 0
                    coded = [
                        (k, (abs(int(zz[k])) >> 1) * (1 if zz[k] >= 0 else -1))
                        for k in range(ss, se + 1)
                    ]
                    last = 0
                    for j, (k, v) in enumerate(coded):
                        if v:
                            last = j + 1
                    for j, (k, v) in enumerate(coded[:last]):
                        if v == 0:
                            run += 1
                            continue
                        while run >= 16:
                            wtr.sym_ac(0xF0)
                            run -= 16
                        s = cat(v)
                        wtr.sym_ac((run << 4) | s)
                        wtr.val(v, s)
                        run = 0
                    if last < len(coded):
                        wtr.sym_ac(0x00)  # EOBRUN = 1
            wtr.flush()
            sos([ci + 1], ss, se, 0, 1, wtr.out)

    # per component: AC refinement scans (Ah=1, Al=0)
    for ci, ((ch, cv), co) in enumerate(comps):
        bw = -(-(-(-w * ch // hmax)) // 8)
        bh = -(-(-(-h * cv // vmax)) // 8)
        for (ss, se) in ((1, 5), (6, 63)):
            wtr = _PW()
            for by in range(bh):
                for bx in range(bw):
                    zz = co[by, bx]
                    run = 0
                    pending = []
                    for k in range(ss, se + 1):
                        a = abs(int(zz[k]))
                        hist = a >> 1
                        if hist:
                            pending.append(a & 1)
                            continue
                        if a == 0:
                            run += 1
                            continue
                        while run >= 16:
                            wtr.sym_ac(0xF0)
                            for b in pending:
                                wtr.put(b, 1)
                            pending = []
                            run -= 16
                        wtr.sym_ac((run << 4) | 1)
                        wtr.put(1 if zz[k] > 0 else 0, 1)
                        for b in pending:
                            wtr.put(b, 1)
                        pending = []
                        run = 0
                    if run or pending:
                        wtr.sym_ac(0x00)
                        for b in pending:
                            wtr.put(b, 1)
            wtr.flush()
            sos([ci + 1], ss, se, 1, 0, wtr.out)

    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("gray", [False, True])
def test_progressive_equals_baseline_exactly(sub, gray):
    """The same quantized coefficients, carried as progressive scans
    (DC successive approximation + spectral bands + AC refinement with
    EOB runs), must reconstruct pixels IDENTICAL to the baseline frame."""
    if gray and sub != "444":
        pytest.skip("gray has no subsampling")
    shape = (29, 43) if gray else (29, 43, 3)
    img = _rand(shape, seed=77)
    base = decode_jpeg_pixels(make_jpeg(img, subsample=sub, quant=4))
    prog = decode_jpeg_pixels(_make_progressive(img, subsample=sub, quant=4))
    assert prog is not None
    assert np.array_equal(base, prog)


def test_progressive_smooth_image_equivalence():
    yy, xx = np.mgrid[0:40, 0:64]
    img = np.stack([(xx * 4) % 256, (yy * 6) % 256, ((xx + yy) * 3) % 256],
                   axis=2).astype(np.uint8)
    base = decode_jpeg_pixels(make_jpeg(img, quant=2))
    prog = decode_jpeg_pixels(_make_progressive(img, quant=2))
    assert np.array_equal(base, prog)


def test_fill_bytes_before_markers():
    """Repeated 0xFF padding before a marker (T.81 B.1.1.2) is legal and
    must be skipped, not parsed as a segment."""
    img = _rand((12, 9), seed=91)
    base = make_jpeg(img)
    padded = base[:2] + b"\xff" * 3 + base[2:]  # fill before first DQT
    assert np.array_equal(decode_jpeg_pixels(padded), decode_jpeg_pixels(base))

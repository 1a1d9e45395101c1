"""Baseline JPEG decode (ITU-T T.81 / ISO 10918-1) — pure Python/NumPy.

Closes the last pixel-decode seam for the mainstream web formats:
sequential baseline DCT (SOF0), grayscale or YCbCr, 4:4:4 / 4:2:2 /
4:2:0 sampling, restart intervals, 8-bit quantization tables. Decoding
is spec-faithful but NOT speed-tuned — per-bit Huffman walks in Python
are fine for test corpora and metadata/stats paths; a throughput
cluster should still swap in a native codec behind
operators/multimodal.decode_real for bulk image work.

Out of scope (returns None, callers degrade): progressive (SOF2),
arithmetic coding, 12-bit precision, 4-component CMYK/Adobe transforms.

Validation strategy (tests/test_jpeg.py): a forward encoder written
independently against the same spec (DCT -> quantize -> canonical
Huffman) roundtrips within quantization error; solid-color images with
q=8 tables reconstruct EXACTLY (DC quantizes losslessly); hand-checked
DC-only cases; fuzz never raises.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: zz[k] = (row, col) of the k-th coefficient
def _zigzag() -> list[tuple[int, int]]:
    # odd diagonals run top-right -> bottom-left (r ascending), even ones
    # the reverse — T.81 figure 5
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )
    return order


ZIGZAG = _zigzag()

# orthonormal DCT-II basis: spatial = A.T @ coeff @ A
_A = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * u * np.pi / 16)
            for n in range(8)
        ]
        for u in range(8)
    ]
)


def idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


class _Huff:
    """Canonical Huffman table from DHT counts+symbols (T.81 C.2)."""

    def __init__(self, counts: list[int], symbols: bytes) -> None:
        self.map: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.map[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first entropy-coded segment reader with 0xFF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.pos = pos
        self.buf = 0
        self.bits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        while self.bits <= 24:
            if self.pos >= len(self.d):
                return self.bits > 0
            b = self.d[self.pos]
            if b == 0xFF:
                nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) else None
                if nxt == 0x00:
                    self.pos += 2
                elif nxt is None:
                    return self.bits > 0
                else:
                    self.marker = nxt
                    return self.bits > 0
            else:
                self.pos += 1
            self.buf = (self.buf << 8) | b
            self.bits += 8
        return True

    def read_bit(self) -> int | None:
        if self.bits == 0 and not self._fill():
            return None
        if self.bits == 0:
            return None
        self.bits -= 1
        return (self.buf >> self.bits) & 1

    def receive(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def decode(self, table: _Huff) -> int | None:
        code = 0
        for length in range(1, 17):
            b = self.read_bit()
            if b is None:
                return None
            code = (code << 1) | b
            sym = table.map.get((length, code))
            if sym is not None:
                return sym
        return None

    def sync_restart(self) -> bool:
        """Align to the next RSTn marker (after DRI MCU groups)."""
        self.buf = 0
        self.bits = 0
        d, n = self.d, len(self.d)
        while self.pos + 1 < n:
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                self.marker = None
                return True
            self.pos += 1
        return False


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_pixels(p: bytes) -> np.ndarray | None:
    """Baseline JPEG -> (H, W, 3) RGB or (H, W, 1) grayscale uint8,
    or None when malformed / out of scope."""
    if len(p) < 4 or p[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    dri = 0
    i = 2
    n = len(p)
    try:
        while i + 4 <= n:
            if p[i] != 0xFF:
                return None
            marker = p[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                i += 2
                continue
            if marker == 0xD9:  # EOI before scan
                return None
            seglen = struct.unpack(">H", p[i + 2 : i + 4])[0]
            seg = p[i + 4 : i + 2 + seglen]
            if marker == 0xDB:  # DQT
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 0x0F
                    j += 1
                    if pq == 0:
                        vals = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(
                            np.float64
                        )
                        j += 64
                    else:  # 16-bit precision
                        vals = np.frombuffer(
                            seg[j : j + 128], dtype=">u2"
                        ).astype(np.float64)
                        j += 128
                    if vals.size != 64:
                        return None
                    tab = np.zeros((8, 8))
                    for k, (r, c) in enumerate(ZIGZAG):
                        tab[r, c] = vals[k]
                    qt[tq] = tab
            elif marker == 0xC4:  # DHT
                j = 0
                while j + 17 <= len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 0x0F
                    counts = list(seg[j + 1 : j + 17])
                    total = sum(counts)
                    symbols = seg[j + 17 : j + 17 + total]
                    if len(symbols) != total:
                        return None
                    (huff_dc if tc == 0 else huff_ac)[th] = _Huff(counts, symbols)
                    j += 17 + total
            elif marker == 0xC0:  # SOF0 baseline
                prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
                if prec != 8 or nc not in (1, 3) or w == 0 or h == 0:
                    return None
                if w * h > 1 << 26:
                    return None
                comps = []
                for k in range(nc):
                    cid, hv, tq = seg[6 + 3 * k : 9 + 3 * k]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                    )
                frame = {"w": w, "h": h, "comps": comps}
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline frame types: out of scope
            elif marker == 0xDD:  # DRI
                dri = struct.unpack(">H", seg[:2])[0]
            elif marker == 0xDA:  # SOS -> entropy-coded data follows
                if frame is None:
                    return None
                ns = seg[0]
                scan = {}
                for k in range(ns):
                    cs, tt = seg[1 + 2 * k : 3 + 2 * k]
                    scan[cs] = (tt >> 4, tt & 0x0F)
                return _decode_scan(
                    p, i + 2 + seglen, frame, scan, qt, huff_dc, huff_ac, dri
                )
            i += 2 + seglen
        return None
    except Exception:
        return None


def _decode_scan(p, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        if c["id"] not in scan or c["tq"] not in qt:
            return None
        td, ta = scan[c["id"]]
        if td not in huff_dc or ta not in huff_ac:
            return None
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    reader = _BitReader(p, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                if not reader.sync_restart():
                    return _finish(planes, comps, w, h, hmax, vmax)
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _decode_block(
                            reader, huff_dc[td], huff_ac[ta], pred, ci
                        )
                        if block is None:
                            return _finish(planes, comps, w, h, hmax, vmax)
                        spatial = idct2(block * q)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1
    return _finish(planes, comps, w, h, hmax, vmax)


def _decode_block(reader, hdc, hac, pred, ci):
    t = reader.decode(hdc)
    if t is None or t > 11:
        return None
    diff = 0
    if t:
        v = reader.receive(t)
        if v is None:
            return None
        diff = _extend(v, t)
    pred[ci] += diff
    coeff = np.zeros((8, 8))
    coeff[0, 0] = pred[ci]
    k = 1
    while k < 64:
        sym = reader.decode(hac)
        if sym is None:
            return None
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            return None
        v = reader.receive(s)
        if v is None:
            return None
        rr, cc = ZIGZAG[k]
        coeff[rr, cc] = _extend(v, s)
        k += 1
    return coeff


def _finish(planes, comps, w, h, hmax, vmax):
    out = []
    for ci, c in enumerate(comps):
        plane = planes[ci] + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:  # chroma upsample by sample replication
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        g = np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
        return g[:, :, None]
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)

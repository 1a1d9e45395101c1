"""WEBP lossless (VP8L) pixel decode — pure Python/NumPy.

Closes the WEBP half of the image seam (kernels/pixels.py names it):
VP8L is a fully public bitstream (the "WebP Lossless Bitstream
Specification") built from LSB-first bit packing, canonical prefix
codes (deflate-style code-length coding), an LZ77 back-reference plane
over ARGB pixels, an optional color cache, and four invertible
transforms (predictor, color, subtract-green, color-indexing). All of
that decodes here. Lossy VP8 (boolean arithmetic coder + DCT) is NOT
re-implemented — honestly: VP8 decode REQUIRES ~1k bytes of normative
default probability-table constants (RFC 6386 §13) that cannot be
re-derived from first principles offline, and a decoder with invented
tables would be a lookalike no real encoder interoperates with. Lossy
frames instead route to the system libwebp through a ctypes binding
(kernels/webp_native.py — the same dependency class as the stdlib zlib
module backing PNG/Flate); hosts without the library degrade to None.
The binding also cross-checks THIS module: tests pin byte-identical
VP8L output between the pure decoder and libwebp.

Scope:
- VP8L streams inside a RIFF WEBP container ('VP8L' chunk, or 'VP8X'
  extended container wrapping a VP8L chunk).
- every prefix-code form (simple 1/2-symbol and full code-length
  coding incl. repeats 16/17/18 and the max_symbol short-circuit);
- LZ77 refs with the 120-entry 2D distance map; color cache; meta
  prefix-code (entropy) images;
- all four transforms, applied in reverse order, incl. packed
  (sub-byte) color-index pixels.

Like the sibling codecs, failures degrade to None (callers emit
decode_ok=false) — never an exception escaping decode.
"""

from __future__ import annotations

import numpy as np

# code-length code symbol order (spec §"Prefix code lengths")
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 2D distance map: codes 1..120 address a small neighborhood (x in
# [-7, 8], y in [0, 7]), in the NORMATIVE order of the spec's table
# (§"Decoding the distance") — the tie order matters for compatibility
# with real encoders, so the table is written out, not derived.
# fmt: off
_DIST_MAP: list[tuple[int, int]] = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]
# fmt: on
assert len(_DIST_MAP) == 120


class _Bits:
    """LSB-first reader with a draining accumulator (bounded — consumed
    bits are shifted out, so no bignum growth) and a 15-bit peek for the
    prefix-code lookup tables."""

    __slots__ = ("d", "byte_pos", "acc", "nacc")

    def __init__(self, d: bytes) -> None:
        self.d = d
        self.byte_pos = 0
        self.acc = 0
        self.nacc = 0

    def _fill_to(self, k: int) -> None:
        d = self.d
        n = len(d)
        while self.nacc < k and self.byte_pos < n:
            self.acc |= d[self.byte_pos] << self.nacc
            self.nacc += 8
            self.byte_pos += 1

    def read(self, k: int) -> int:
        if self.nacc < k:
            self._fill_to(k)
            if self.nacc < k:
                raise ValueError("bitstream overrun")
        v = self.acc & ((1 << k) - 1)
        self.acc >>= k
        self.nacc -= k
        return v

    def peek15(self) -> int:
        """Next <=15 bits without consuming (high side zero-padded near
        the stream end)."""
        if self.nacc < 15:
            self._fill_to(15)
        return self.acc & 0x7FFF

    def drop(self, k: int) -> None:
        self.acc >>= k
        self.nacc -= k


class _Huff:
    """Canonical prefix code (deflate-style assignment), decoded by
    walking bits MSB-of-code-first from the LSB-first stream — via a
    15-bit reversed-prefix lookup table (codes are <= 15 bits by spec):
    entry i maps the stream's next bits, read LSB-first, to the unique
    code they start with."""

    __slots__ = ("table", "single", "lut_sym", "lut_len")

    def __init__(self, lengths: list[int]) -> None:
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 0:
            raise ValueError("empty code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            return
        self.single = None
        # kraft check (complete code required by the spec)
        if abs(sum(2.0 ** -l for l, _ in nz) - 1.0) > 1e-9:
            raise ValueError("incomplete prefix code")
        max_len = max(l for l, _ in nz)
        if max_len > 15:
            raise ValueError("code too long")
        bl_count = [0] * (max_len + 1)
        for l, _ in nz:
            bl_count[l] += 1
        code = 0
        next_code = [0] * (max_len + 1)
        for l in range(1, max_len + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        table: dict[tuple[int, int], int] = {}
        self.lut_sym = np.zeros(1 << 15, dtype=np.int32)
        self.lut_len = np.zeros(1 << 15, dtype=np.uint8)
        for s, l in enumerate(lengths):
            if l > 0:
                c = next_code[l]
                table[(l, c)] = s
                next_code[l] += 1
                # stream order = code bits MSB-first; as an LSB-first int
                # that is the bit-reversal of c over l bits
                rev = int(f"{c:0{l}b}"[::-1], 2)
                self.lut_sym[rev :: 1 << l] = s
                self.lut_len[rev :: 1 << l] = l
        self.table = table

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        idx = br.peek15()
        length = int(self.lut_len[idx])
        if 0 < length <= br.nacc:
            br.drop(length)
            return int(self.lut_sym[idx])
        # stream tail shorter than the matched code, or no code matches
        # (incomplete codes are rejected at build time, so this is a
        # truncated stream): walk bit-by-bit for the exact old error
        code = 0
        length = 0
        t = self.table
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            s = t.get((length, code))
            if s is not None:
                return s
            if length > 15:
                raise ValueError("bad prefix code")


def _read_code(br: _Bits, alphabet_size: int) -> _Huff:
    """One prefix code: simple (1-2 symbols) or code-length-coded."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol in 8 bits
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[s0] = 1  # treated as 0-bit via _Huff.single
            return _Huff(lengths)
        s1 = br.read(8)
        lengths[s0] = 1
        lengths[s1] = 1
        if s0 == s1:
            raise ValueError("duplicate simple symbol")
        return _Huff(lengths)
    # normal: code lengths are themselves prefix-coded
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_huff = _Huff(cl_lengths)
    if br.read(1):  # limited symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl_huff.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s != 0:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _Huff(lengths)


def _lz77_value(br: _Bits, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_image(br: _Bits, w: int, h: int, allow_meta: bool) -> np.ndarray:
    """Entropy-coded ARGB image (spec §"Decoding of the image data").
    Returns (h, w, 4) uint8 [A, R, G, B]."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("bad cache bits")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw, mh = _subsample_size(w, meta_bits), _subsample_size(h, meta_bits)
        meta = _decode_image(br, mw, mh, False)
        # meta code index = (red << 8) | green
        meta_idx = (meta[:, :, 1].astype(np.int64) << 8) | meta[:, :, 2]
        n_groups = int(meta_idx.max()) + 1
        meta = meta_idx
    groups = []
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    for _ in range(n_groups):
        groups.append(
            (
                _read_code(br, green_alpha),
                _read_code(br, 256),   # red
                _read_code(br, 256),   # blue
                _read_code(br, 256),   # alpha
                _read_code(br, 40),    # distance
            )
        )

    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    total = w * h

    def cache_insert(argb: int) -> None:
        cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb

    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:  # literal
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = argb
            pos += 1
            if cache is not None:
                cache_insert(argb)
        elif s < 280:  # LZ77 backward reference
            length = _lz77_value(br, s - 256)
            dist_code = _lz77_value(br, g[4].read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > total:
                raise ValueError("bad backref")
            for _ in range(length):
                argb = int(out[pos - dist])
                out[pos] = argb
                pos += 1
                if cache is not None:
                    cache_insert(argb)
        else:  # color cache hit
            if cache is None:
                raise ValueError("cache hit without cache")
            out[pos] = cache[s - 280]
            pos += 1

    img = np.zeros((h, w, 4), dtype=np.uint8)
    flat = out.reshape(h, w)
    img[:, :, 0] = (flat >> 24) & 0xFF  # A
    img[:, :, 1] = (flat >> 16) & 0xFF  # R
    img[:, :, 2] = (flat >> 8) & 0xFF   # G
    img[:, :, 3] = flat & 0xFF          # B
    return img


def _avg2(a, b):
    return (a.astype(np.uint16) + b) >> 1


def _predict(mode: int, left, top, top_left, top_right):
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return top_right
    if mode == 4:
        return top_left
    if mode == 5:
        return _avg2(_avg2(left, top_right), top).astype(np.uint8)
    if mode == 6:
        return _avg2(left, top_left).astype(np.uint8)
    if mode == 7:
        return _avg2(left, top).astype(np.uint8)
    if mode == 8:
        return _avg2(top_left, top).astype(np.uint8)
    if mode == 9:
        return _avg2(top, top_right).astype(np.uint8)
    if mode == 10:
        return _avg2(_avg2(left, top_left), _avg2(top, top_right)).astype(np.uint8)
    if mode == 11:  # select
        l = left.astype(np.int32)
        t = top.astype(np.int32)
        tl = top_left.astype(np.int32)
        p_l = np.abs(t - tl).sum()
        p_t = np.abs(l - tl).sum()
        return left if p_l < p_t else top
    if mode == 12:  # clamp-add-subtract-full
        v = left.astype(np.int32) + top - top_left
        return np.clip(v, 0, 255).astype(np.uint8)
    if mode == 13:  # clamp-add-subtract-half
        a = _avg2(left, top).astype(np.int32)
        d = a - top_left.astype(np.int32)
        # C-style TRUNCATING halve (the spec's (a - b) / 2), not >> 1
        half = np.sign(d) * (np.abs(d) >> 1)
        return np.clip(a + half, 0, 255).astype(np.uint8)
    # mode 0: black
    return np.array([255, 0, 0, 0], dtype=np.uint8)


def _inv_predictor(img: np.ndarray, modes: np.ndarray, bits: int) -> None:
    h, w = img.shape[:2]
    black = np.array([255, 0, 0, 0], dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = black
            elif y == 0:
                pred = img[0, x - 1]
            elif x == 0:
                pred = img[y - 1, 0]
            else:
                mode = int(modes[y >> bits, x >> bits, 2])
                # right edge: top-right wraps to the CURRENT row's first
                # pixel (row-major index pos - w + 1), matching the spec
                tr = img[y - 1, x + 1] if x + 1 < w else img[y, 0]
                pred = _predict(
                    mode, img[y, x - 1], img[y - 1, x], img[y - 1, x - 1], tr
                )
            img[y, x] = (img[y, x].astype(np.uint16) + pred) & 0xFF


def _delta(t: int, c: np.ndarray) -> np.ndarray:
    # int8 reinterpretation via arithmetic (np.int8(200) is deprecated)
    ts = ((int(t) + 128) % 256) - 128
    cs = ((c.astype(np.int32) + 128) % 256) - 128
    return (ts * cs) >> 5


def _inv_color_transform(img: np.ndarray, elems: np.ndarray, bits: int) -> None:
    h, w = img.shape[:2]
    for y in range(h):
        ey = elems[y >> bits]
        for x in range(w):
            e = ey[x >> bits]
            g2r, g2b, r2b = int(e[3]), int(e[2]), int(e[1])  # B,G,R bytes
            g = img[y, x, 2].astype(np.int32)
            r = (img[y, x, 1] + _delta(g2r, np.array(g))) & 0xFF
            b = (img[y, x, 3] + _delta(g2b, np.array(g)) + _delta(r2b, np.array(r))) & 0xFF
            img[y, x, 1] = r
            img[y, x, 3] = b


def decode_vp8l(data: bytes) -> np.ndarray | None:
    """Decode a raw VP8L stream (chunk payload) to (H, W, 3|4) uint8 RGB(A)."""
    try:
        br = _Bits(data)
        if br.read(8) != 0x2F:
            return None
        w = br.read(14) + 1
        h = br.read(14) + 1
        has_alpha = br.read(1)
        if br.read(3) != 0:
            return None
        if w * h > (1 << 26):  # same bounded-memory cap as the siblings
            return None
        transforms = []  # applied forward order; invert in reverse
        seen = set()
        xsize = w
        while br.read(1):
            t = br.read(2)
            if t in seen:
                raise ValueError("duplicate transform")
            seen.add(t)
            if t == 0:  # predictor
                bits = br.read(3) + 2
                sub = _decode_image(
                    br, _subsample_size(xsize, bits), _subsample_size(h, bits), False
                )
                transforms.append(("pred", bits, sub))
            elif t == 1:  # color transform
                bits = br.read(3) + 2
                sub = _decode_image(
                    br, _subsample_size(xsize, bits), _subsample_size(h, bits), False
                )
                transforms.append(("color", bits, sub))
            elif t == 2:
                transforms.append(("subgreen", 0, None))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal_img = _decode_image(br, n_colors, 1, False)
                # palette entries are delta-coded component-wise
                pal = np.cumsum(pal_img[0].astype(np.int64), axis=0).astype(np.uint8)
                if n_colors <= 2:
                    pk = 3
                elif n_colors <= 4:
                    pk = 2
                elif n_colors <= 16:
                    pk = 1
                else:
                    pk = 0
                transforms.append(("index", pk, pal))
                xsize = _subsample_size(xsize, pk)
        img = _decode_image(br, xsize, h, True)
        for kind, bits, aux in reversed(transforms):
            if kind == "index":
                if bits:  # unpack sub-byte indices from the green channel
                    per = 1 << bits
                    ibits = 8 >> bits
                    mask = (1 << ibits) - 1
                    idx = np.zeros((h, w), dtype=np.uint8)
                    packed = img[:, :, 2]
                    for x in range(w):
                        b = packed[:, x // per]
                        idx[:, x] = (b >> ((x % per) * ibits)) & mask
                else:
                    idx = img[:, :, 2]
                if int(idx.max()) >= aux.shape[0]:
                    raise ValueError("palette index out of range")
                img = aux[idx]  # (h, w, 4) ARGB rows from palette
            elif kind == "subgreen":
                g = img[:, :, 2]
                img[:, :, 1] = (img[:, :, 1].astype(np.uint16) + g) & 0xFF
                img[:, :, 3] = (img[:, :, 3].astype(np.uint16) + g) & 0xFF
            elif kind == "pred":
                _inv_predictor(img, aux, bits)
            elif kind == "color":
                _inv_color_transform(img, aux, bits)
        rgb = img[:, :, [1, 2, 3]]
        if has_alpha:
            return np.ascontiguousarray(
                np.concatenate([rgb, img[:, :, :1]], axis=2)
            )
        return np.ascontiguousarray(rgb)
    except Exception:
        return None


def decode_webp_pixels(p: bytes) -> np.ndarray | None:
    """RIFF walk: find the image chunk (bare or inside a VP8X extended
    container). VP8L (lossless) decodes from scratch here; lossy 'VP8 '
    frames route to the system libwebp through kernels/webp_native.py
    (the RFC 6386 default-probability tables cannot be re-derived
    offline; the BSD system codec fills that arm the way stdlib zlib
    backs the PNG path). Without a libwebp on the host, lossy chunks
    degrade to None as before (header dims still parse)."""
    if len(p) < 20 or p[:4] != b"RIFF" or p[8:12] != b"WEBP":
        return None
    off = 12
    try:
        while off + 8 <= len(p):
            tag = p[off : off + 4]
            size = int.from_bytes(p[off + 4 : off + 8], "little")
            body = p[off + 8 : off + 8 + size]
            if tag == b"VP8L":
                return decode_vp8l(body)
            if tag == b"VP8 ":
                from paddle_spark.kernels.webp_native import decode_webp_native

                # the library takes the WHOLE container (it composes the
                # ALPH chunk of a VP8X file itself); RGB for the common
                # alpha-less case, RGBA when the container declares alpha
                has_alpha = p[12:16] == b"VP8X" and len(p) > 20 and bool(p[20] & 0x10)
                return decode_webp_native(p, rgba=has_alpha)
            off += 8 + size + (size & 1)
    except Exception:
        return None
    return None

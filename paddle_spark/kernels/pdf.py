"""Born-digital PDF text-layer extraction (S3) — pure Python + zlib.

The reference ingests PDFs by rasterizing pages with PyMuPDF and running a
neural layout pipeline (/root/reference/server/model_repo/layout-parsing/1/
model.py:300-337). This runtime has no raster stack and no neural detector,
but born-digital PDFs carry their text in content streams — so this module
parses the PDF object graph directly (xref-free scan, FlateDecode via
stdlib zlib) and replays the text-positioning operators to recover
positioned text runs, which then flow through the SAME geometry chain
(reading order, assembly) as detector boxes. A scanned/image-only PDF
yields zero runs (parse_ok stays true, text empty); the rasterize+detect
stage remains the declared swap point for those.

Scope (documented constraints, each -> graceful degradation, never a task
failure):
- Filters: FlateDecode, LZWDecode (MSB packing + EarlyChange), ASCIIHex,
  ASCII85, RunLength, and chains thereof ([/ASCII85Decode /FlateDecode]).
  Image filters (DCTDecode, JBIG2, ...) and /DecodeParms predictors are
  skipped (their text, if any, is lost, not erred).
- Encodings: 1-byte (Latin-1 superset) by default. Fonts carrying a
  /ToUnicode CMap (ISO 32000-1 §9.10.3 bfchar/bfrange) decode through it;
  /Type0 composite fonts read 2-byte codes (Identity-H, the dominant CID
  layout). A Type0 font WITHOUT ToUnicode still degrades to
  code-point-as-char garbage-in-garbage-out rather than raising.
- Geometry: translation components of Tm/Td only (no rotation) — the
  overwhelmingly common case for born-digital text.
- Page order: true /Root -> /Pages -> /Kids tree order (what a renderer
  shows); object-number order is the fallback when the tree is absent or
  unparseable.

Operator semantics follow the public PDF 1.7 spec (ISO 32000-1 §9.4):
BT/ET, Tf, TL, Td, TD, Tm, T*, Tj, TJ, ', ".
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)\bendobj", re.DOTALL)
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_FILTER_RE = re.compile(rb"/Filter\s*(?:/(\w+)|\[([^\]]*)\])")
_FILTER_NAME_RE = re.compile(rb"/(\w+)")
_EARLY_RE = re.compile(rb"/EarlyChange\s+(\d)")
# (?!\d) pins the full number so backtracking can't shorten '/Length 50
# 0 R' into a direct length of 5 before the indirect-ref lookahead runs
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
_EOL_ENDSTREAM_RE = re.compile(rb"(\r\n|\r|\n)?endstream")
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_CONTENTS_REF_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[([^\]]*)\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([0-9.+-]+)\s+([0-9.+-]+)\s+([0-9.+-]+)\s+([0-9.+-]+)"
)
_PARENT_RE = re.compile(rb"/Parent\s+(\d+)\s+\d+\s+R")
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_CATALOG_RE = re.compile(rb"/Type\s*/Catalog\b")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_TYPE0_RE = re.compile(rb"/Subtype\s*/Type0\b")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_FONT_REF_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_CMAP_TOK_RE = re.compile(rb"<[0-9A-Fa-f]+>|\[|\]")

# content-stream tokens: string | hex string | name | number | operator
_CS_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"          # simple string (nesting handled below)
    rb"|<[0-9A-Fa-f\s]*>"             # hex string
    rb"|/[^\s/<>\[\]()]+"             # name
    rb"|[-+]?[0-9]*\.?[0-9]+"         # number
    rb"|\[|\]"
    rb"|[A-Za-z'\"*]{1,3}"            # operator
)

_STR_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    """Decode a (...) string body (backslash escapes, octal) as latin-1."""
    if b"\\" not in raw:
        # fast path: the overwhelmingly common escape-free string is a
        # straight latin-1 decode (the loop below reduces to exactly
        # this when no backslash is present)
        return raw.decode("latin-1")
    out: list[str] = []
    i, n = 0, len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1 : i + 2]
            if nxt in _STR_ESCAPES:
                out.append(_STR_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal \ddd (1-3 digits)
                j = i + 1
                while j < min(i + 4, n) and raw[j : j + 1].isdigit():
                    j += 1
                out.append(chr(int(raw[i + 1 : j], 8) & 0xFF))
                i = j
                continue
            if nxt == b"\n":  # line continuation
                i += 2
                continue
            out.append(nxt.decode("latin-1"))
            i += 2
            continue
        out.append(c.decode("latin-1"))
        i += 1
    return "".join(out)


def _objects(data: bytes) -> dict[int, bytes]:
    """All indirect objects by number (linear scan; no xref needed —
    robust to the stale/absent xref tables common in the wild). Object
    streams (/Type /ObjStm, PDF 1.5+) are expanded: their compressed
    members — where modern writers put the page tree — are sliced out by
    the (objnum, offset) header pairs and added to the map."""
    objs = {int(m[1]): m[2] for m in _OBJ_RE.finditer(data)}
    for body in list(objs.values()):
        if b"/ObjStm" not in body:
            continue
        s = _stream_bytes(body)
        if s is None:
            continue
        n_m = re.search(rb"/N\s+(\d+)", body)
        first_m = re.search(rb"/First\s+(\d+)", body)
        if not n_m or not first_m:
            continue
        n, first = int(n_m[1]), int(first_m[1])
        header = s[:first].split()
        if len(header) < 2 * n:
            continue
        pairs = [(int(header[2 * k]), int(header[2 * k + 1])) for k in range(n)]
        for k, (num, off) in enumerate(pairs):
            end = pairs[k + 1][1] if k + 1 < n else len(s) - first
            objs.setdefault(num, s[first + off : first + end])
    return objs


def _raw_stream(body: bytes) -> bytes | None:
    """The stream payload WITHOUT filter application (e.g. the embedded
    JPEG file of a /DCTDecode image XObject)."""
    m = _STREAM_START_RE.search(body)
    if not m:
        return None
    start = m.end()
    raw = None
    # prefer the exact /Length slice: scanning for 'endstream' and
    # stripping arbitrary whitespace corrupts binary (Flate) streams whose
    # final bytes happen to be whitespace-valued (0x20/0x0a/0x0d)
    lm = _LENGTH_RE.search(body[: m.start()])
    if lm:
        n = int(lm[1])
        cand = body[start : start + n]
        if len(cand) == n and _EOL_ENDSTREAM_RE.match(body[start + n : start + n + 11]):
            raw = cand
    if raw is None:  # indirect/absent/wrong /Length: fall back to the scan
        end = body.find(b"endstream", start)
        if end < 0:
            return None
        raw = body[start:end]
        # ISO 32000-1 §7.3.8.1: ONE end-of-line marker precedes endstream
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            raw = raw[:-1]
    return raw


def _stream_bytes(body: bytes) -> bytes | None:
    raw = _raw_stream(body)
    if raw is None:
        return None
    m = _STREAM_START_RE.search(body)
    head = body[: m.start()]
    if b"/Filter" in head:
        try:
            return _apply_filters(raw, head)
        except Exception:
            return None
    return raw


def _asciihex(data: bytes) -> bytes:
    """ASCIIHexDecode (ISO 32000-1 §7.4.2): hex pairs, whitespace
    ignored, '>' EOD, odd trailing digit padded with 0."""
    hexpart = data.split(b">", 1)[0]
    clean = re.sub(rb"\s", b"", hexpart)
    if re.search(rb"[^0-9A-Fa-f]", clean):
        raise ValueError("bad hex digit")
    if len(clean) % 2:
        clean += b"0"
    return bytes.fromhex(clean.decode("ascii"))


def _ascii85(data: bytes) -> bytes:
    """ASCII85Decode (§7.4.3) via the stdlib's Adobe-mode decoder."""
    import base64

    body = data.split(b"~>", 1)[0]
    return base64.a85decode(re.sub(rb"\s", b"", body))


def _runlength(data: bytes) -> bytes:
    """RunLengthDecode (§7.4.5): L<128 copy L+1 literals; L>128 repeat
    next byte 257-L times; 128 = EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ln = data[i]
        if ln == 128:
            break
        if ln < 128:
            out.extend(data[i + 1 : i + 2 + ln])
            i += 2 + ln
        else:
            if i + 1 >= n:
                break
            out.extend(data[i + 1 : i + 2] * (257 - ln))
            i += 2
    return bytes(out)


def _lzw_pdf(data: bytes, early: int = 1) -> bytes | None:
    """LZWDecode (§7.4.4): 8-bit symbols, CLEAR=256 EOD=257, codes packed
    MSB-first, width 9..12 growing EarlyChange codes before the table
    fills (default 1). Returns None on corrupt framing."""
    CLEAR, EOD = 256, 257
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    out: list[bytes] = []
    buf = bits = 0
    prev: bytes | None = None
    total = 0
    for byte in data:
        buf = (buf << 8) | byte
        bits += 8
        while bits >= width:
            code = (buf >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            # trim consumed high bits: without this the accumulator grows
            # into an arbitrary-precision int and every per-byte shift
            # costs O(stream) — quadratic on long strips
            buf &= (1 << bits) - 1
            if code == CLEAR:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == EOD:
                return b"".join(out)
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out.append(entry)
            total += len(entry)
            if total > 1 << 26:
                return None  # decompression-bomb guard
            prev = entry
            # EarlyChange: the width of the NEXT code grows one entry
            # before the table fills (T.81-era convention; libtiff/PDF
            # default early=1 -> grow when the table reaches 2^w - 1)
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    return b"".join(out)


def _apply_filters(raw: bytes, head: bytes) -> bytes | None:
    """Apply the /Filter chain in order (name or array form). Unsupported
    image filters (DCTDecode, JBIG2Decode, ...) -> None so callers skip
    the stream rather than fail the document."""
    m = _FILTER_RE.search(head)
    if not m:
        return raw
    names = [m[1]] if m[1] else _FILTER_NAME_RE.findall(m[2])
    for name in names:
        if name in (b"FlateDecode", b"Fl"):
            d = zlib.decompressobj()  # tolerates an unstripped EOL tail
            raw = d.decompress(raw) + d.flush()
        elif name in (b"ASCIIHexDecode", b"AHx"):
            raw = _asciihex(raw)
        elif name in (b"ASCII85Decode", b"A85"):
            raw = _ascii85(raw)
        elif name in (b"RunLengthDecode", b"RL"):
            raw = _runlength(raw)
        elif name in (b"LZWDecode", b"LZW"):
            em = _EARLY_RE.search(head)
            raw = _lzw_pdf(raw, int(em[1]) if em else 1)
        else:
            return None  # DCTDecode etc: unsupported, skip stream
        if raw is None:
            return None
    return raw


def _content_streams(page_body: bytes, objs: dict[int, bytes]) -> bytes:
    refs: list[int] = []
    arr = _CONTENTS_ARR_RE.search(page_body)
    if arr:
        refs = [int(m[1]) for m in _REF_RE.finditer(arr[1])]
    else:
        one = _CONTENTS_REF_RE.search(page_body)
        if one:
            refs = [int(one[1])]
    parts = []
    for r in refs:
        if r in objs:
            s = _stream_bytes(objs[r])
            if s is not None:
                parts.append(s)
    return b"\n".join(parts)


def _page_order(objs: dict[int, bytes], data: bytes) -> list[int] | None:
    """Page object numbers in true document order: walk /Root (trailer ref
    or any /Type /Catalog) -> /Pages -> /Kids depth-first. Returns None
    when the tree is absent/unparseable — callers fall back to
    object-number order. Cycle- and depth-guarded (fuzzed input)."""
    root = None
    m = _ROOT_RE.search(data)
    if m and int(m[1]) in objs:
        root = int(m[1])
    else:
        for num in sorted(objs):
            if _CATALOG_RE.search(objs[num]):
                root = num
                break
    if root is None:
        return None
    m = _PAGES_REF_RE.search(objs[root])
    if not m or int(m[1]) not in objs:
        return None
    order: list[int] = []
    seen: set[int] = set()

    def walk(num: int, depth: int) -> None:
        if num in seen or depth > 64 or num not in objs:
            return
        seen.add(num)
        body = objs[num]
        kids = _KIDS_RE.search(body)
        if kids and not _PAGE_RE.search(body):  # intermediate /Pages node
            for km in _REF_RE.finditer(kids[1]):
                walk(int(km[1]), depth + 1)
        elif _PAGE_RE.search(body):
            order.append(num)

    walk(int(m[1]), 0)
    return order or None


def _dict_region(body: bytes, at: int) -> bytes | None:
    """The balanced ``<< ... >>`` region starting at the first ``<<`` at or
    after ``at``. Literal ``(...)`` strings are skipped while counting
    (a string value like ``(a>>b)`` must not close the dict early); hex
    strings can't contain ``<<``, so depth stays exact."""
    start = body.find(b"<<", at)
    if start < 0:
        return None
    depth, i, n = 0, start, len(body)
    while i < n:
        c = body[i]
        if c == 0x28:  # '(' — skip the literal string, honoring escapes
            pdepth = 1
            i += 1
            while i < n and pdepth:
                if body[i] == 0x5C:  # backslash escape
                    i += 2
                    continue
                if body[i] == 0x28:
                    pdepth += 1
                elif body[i] == 0x29:
                    pdepth -= 1
                i += 1
            continue
        two = body[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return body[start:i]
        else:
            i += 1
    return None


def _resolve_dict(body: bytes, key: bytes, objs: dict[int, bytes]) -> bytes | None:
    """Value of dict key ``key`` (e.g. b"/Font"): inline ``<< >>`` or an
    indirect reference resolved through ``objs``."""
    m = re.search(re.escape(key) + rb"(?![A-Za-z])\s*<<", body)
    if m:
        return _dict_region(body, m.end() - 2)
    m = re.search(re.escape(key) + rb"(?![A-Za-z])\s+(\d+)\s+\d+\s+R", body)
    if m and int(m[1]) in objs:
        return objs[int(m[1])]
    return None


def _parse_tounicode(data: bytes) -> dict[int, str]:
    """/ToUnicode CMap -> {char code: unicode string} (ISO 32000-1
    §9.10.3). Handles beginbfchar pairs and beginbfrange with either a
    destination start code (low 16 bits increment) or an explicit array.
    Bounded: ranges clamp to 64k codes, total entries to 256k."""
    cmap: dict[int, str] = {}

    def u16(h: bytes) -> str:
        b = bytes.fromhex(h.decode("ascii"))
        if len(b) % 2:
            b = b"\x00" + b
        return b.decode("utf-16-be", errors="replace")

    for m in _BFCHAR_RE.finditer(data):
        toks = _CMAP_TOK_RE.findall(m[1])
        for i in range(0, len(toks) - 1, 2):
            a, b = toks[i], toks[i + 1]
            if a[:1] == b"<" and b[:1] == b"<":
                cmap[int(a[1:-1], 16)] = u16(b[1:-1])
    for m in _BFRANGE_RE.finditer(data):
        toks = _CMAP_TOK_RE.findall(m[1])
        i = 0
        while i + 3 <= len(toks):
            if toks[i][:1] != b"<" or toks[i + 1][:1] != b"<":
                i += 1
                continue
            lo, hi = int(toks[i][1:-1], 16), int(toks[i + 1][1:-1], 16)
            hi = min(hi, lo + 0xFFFF)
            if toks[i + 2] == b"[":
                j, code = i + 3, lo
                while j < len(toks) and toks[j] != b"]":
                    if code <= hi and toks[j][:1] == b"<":
                        cmap[code] = u16(toks[j][1:-1])
                        code += 1
                    j += 1
                i = j + 1
            else:
                dst = bytes.fromhex(toks[i + 2][1:-1].decode("ascii"))
                if len(dst) % 2:
                    dst = b"\x00" + dst
                prefix, last = dst[:-2], int.from_bytes(dst[-2:], "big")
                for k in range(hi - lo + 1):
                    cmap[lo + k] = (
                        prefix + ((last + k) & 0xFFFF).to_bytes(2, "big")
                    ).decode("utf-16-be", errors="replace")
                i += 3
            if len(cmap) > 1 << 18:
                return cmap
    return cmap


def _page_fonts(
    page_body: bytes, objs: dict[int, bytes]
) -> dict[bytes, tuple[int, dict[int, str] | None]]:
    """Per-page font map {b"/F1": (code_bytes, cmap|None)} from /Resources
    (inline or ref, inherited via /Parent). Only fonts needing non-default
    decoding are returned: /Type0 composites (2-byte codes) and simple
    fonts that carry a /ToUnicode CMap."""
    body = page_body
    res = None
    for _ in range(4):
        res = _resolve_dict(body, b"/Resources", objs)
        if res is not None:
            break
        p = _PARENT_RE.search(body)
        if not p or int(p[1]) not in objs:
            break
        body = objs[int(p[1])]
    if res is None:
        return {}
    fdict = _resolve_dict(res, b"/Font", objs)
    if fdict is None:
        return {}
    fonts: dict[bytes, tuple[int, dict[int, str] | None]] = {}
    for m in _FONT_REF_RE.finditer(fdict):
        num = int(m[2])
        if num not in objs:
            continue
        fbody = objs[num]
        nbytes = 2 if _TYPE0_RE.search(fbody) else 1
        cmap = None
        tm = _TOUNICODE_RE.search(fbody)
        if tm and int(tm[1]) in objs:
            s = _stream_bytes(objs[int(tm[1])])
            if s:
                cmap = _parse_tounicode(s) or None
        if nbytes == 2 or cmap:
            fonts[b"/" + m[1]] = (nbytes, cmap)
    return fonts


def _decode_with_font(
    s: str, font: tuple[int, dict[int, str] | None] | None
) -> str:
    """Re-decode a latin-1-tokenized string through the current font:
    2-byte code split for /Type0, then the ToUnicode CMap when present.
    Unmapped codes degrade to chr(code) — never an exception."""
    if font is None:
        return s
    nbytes, cmap = font
    raw = s.encode("latin-1")
    out: list[str] = []
    if nbytes == 2:
        for i in range(0, len(raw) - 1, 2):
            code = (raw[i] << 8) | raw[i + 1]
            out.append(cmap[code] if cmap and code in cmap else chr(code))
        if len(raw) % 2:
            out.append(chr(raw[-1]))
    else:
        for b in raw:
            out.append(cmap[b] if cmap and b in cmap else chr(b))
    return "".join(out)


def _media_box(page_body: bytes, objs: dict[int, bytes]) -> tuple[float, float]:
    body = page_body
    for _ in range(4):  # follow /Parent a few hops for inherited MediaBox
        m = _MEDIABOX_RE.search(body)
        if m:
            x0, y0, x1, y1 = (float(m[i]) for i in range(1, 5))
            return max(x1 - x0, 1.0), max(y1 - y0, 1.0)
        p = _PARENT_RE.search(body)
        if not p or int(p[1]) not in objs:
            break
        body = objs[int(p[1])]
    return 612.0, 792.0  # US Letter default


def _runs_from_content(
    cs: bytes,
    fonts: dict[bytes, tuple[int, dict[int, str] | None]] | None = None,
) -> list[tuple[str, float, float, float]]:
    """Replay text operators -> [(text, x, y, font_size)] in PDF user
    space (origin bottom-left). Width advance is the standard 0.5 em/char
    estimate — enough to order runs and to place space-vs-abut joins.
    ``fonts`` (from _page_fonts) re-decodes strings through the font
    selected by Tf (Type0 2-byte codes, ToUnicode CMaps)."""
    runs: list[tuple[str, float, float, float]] = []
    # text state: effective size = Tf size x |Tm d-scale|
    tf_size = 12.0
    scale = 1.0
    size = 12.0
    leading = 0.0
    lx = ly = 0.0   # text-line origin
    x = y = 0.0     # current point
    stack: list = []
    cur_font: tuple[int, dict[int, str] | None] | None = None

    def emit(s: str) -> None:
        nonlocal x
        s = _decode_with_font(s, cur_font)
        if s:
            runs.append((s, x, y, size))
            x += 0.5 * size * len(s)

    def newline() -> None:
        nonlocal lx, ly, x, y
        ly -= leading
        x, y = lx, ly

    i = 0
    data = cs
    n = len(data)
    while i < n:
        m = _CS_TOKEN_RE.search(data, i)
        if not m:
            break
        tok = m[0]
        i = m.end()
        if tok.startswith(b"("):
            # handle nested parens the simple regex can't: extend match.
            # depth counts must ignore ESCAPED parens (\( \)) — strip
            # escape pairs before counting, else '(a\()' reads as open.
            def _depth(t: bytes) -> int:
                bare = re.sub(rb"\\.", b"", t)
                return bare.count(b"(") - bare.count(b")")

            depth = _depth(tok)
            while depth > 0 and i < n:
                ext = _CS_TOKEN_RE.search(data, i)
                if not ext or not ext[0].startswith(b"("):
                    break
                tok += data[i : ext.end()]
                depth = _depth(tok)
                i = ext.end()
            stack.append(("str", _decode_pdf_string(tok[1:-1])))
        elif tok.startswith(b"<"):
            hexbody = re.sub(rb"\s", b"", tok[1:-1])
            if len(hexbody) % 2:
                hexbody += b"0"
            stack.append(("str", bytes.fromhex(hexbody.decode("ascii")).decode("latin-1")))
        elif tok.startswith(b"/"):
            stack.append(("name", tok))
        elif tok in (b"[", b"]"):
            stack.append(("delim", tok))
        elif tok[:1].isdigit() or tok[:1] in (b"-", b"+", b"."):
            stack.append(("num", float(tok)))
        else:  # operator
            op = tok
            if op == b"Tf" and len(stack) >= 1 and stack[-1][0] == "num":
                tf_size = float(stack[-1][1])
                size = tf_size * scale
                if fonts and len(stack) >= 2 and stack[-2][0] == "name":
                    cur_font = fonts.get(stack[-2][1])
            elif op == b"TL" and stack and stack[-1][0] == "num":
                leading = float(stack[-1][1])
            elif op == b"Td" and len(stack) >= 2:
                tx, ty = float(stack[-2][1]), float(stack[-1][1])
                lx, ly = lx + tx, ly + ty
                x, y = lx, ly
            elif op == b"TD" and len(stack) >= 2:
                tx, ty = float(stack[-2][1]), float(stack[-1][1])
                leading = -ty
                lx, ly = lx + tx, ly + ty
                x, y = lx, ly
            elif op == b"Tm" and len(stack) >= 6:
                d = float(stack[-3][1])
                e, f = float(stack[-2][1]), float(stack[-1][1])
                if d:
                    scale = abs(d)
                    size = tf_size * scale
                lx, ly = e, f
                x, y = lx, ly
            elif op == b"T*":
                newline()
            elif op == b"Tj" and stack and stack[-1][0] == "str":
                emit(stack[-1][1])
            elif op in (b"'", b'"'):
                # ' = T* + Tj ; " = aw ac (string) " — string is on top
                if stack and stack[-1][0] == "str":
                    newline()
                    emit(stack[-1][1])
            elif op == b"TJ":
                # consume back to the matching [ : strings and kern numbers
                j = len(stack) - 1
                items = []
                while j >= 0 and stack[j] != ("delim", b"["):
                    items.append(stack[j])
                    j -= 1
                for kind, val in reversed(items):
                    if kind == "str":
                        emit(val)
                    elif kind == "num":
                        x -= float(val) / 1000.0 * size
            # operands always immediately precede their operator — clear
            # after every op (also bounds memory on ops we don't model)
            stack.clear()
            if op == b"BT":
                lx = ly = x = y = 0.0
    return runs


def _runs_to_boxes(
    runs: list[tuple[str, float, float, float]], page_w: float, page_h: float
) -> list[dict]:
    """Group runs into y-lines, order top-down/left-right, and emit box
    dicts in the synthetic-detector shape (label text, score 1.0) so the
    standard geometry chain takes over."""
    if not runs:
        return []
    # line key: runs whose baselines agree within half the font size
    lines: list[list[tuple[str, float, float, float]]] = []
    for run in sorted(runs, key=lambda r: (-r[2], r[1])):
        for line in lines:
            if abs(line[0][2] - run[2]) <= 0.5 * max(line[0][3], run[3]):
                line.append(run)
                break
        else:
            lines.append([run])
    boxes = []
    for bid, line in enumerate(lines):
        line.sort(key=lambda r: r[1])
        parts: list[str] = []
        prev_end = None
        for s, rx, _, rsize in line:
            if prev_end is not None and rx - prev_end > 0.2 * rsize:
                parts.append(" ")
            parts.append(s)
            prev_end = rx + 0.5 * rsize * len(s)
        text = "".join(parts).strip()
        if not text:
            continue
        xs = [r[1] for r in line]
        ends = [r[1] + 0.5 * r[3] * len(r[0]) for r in line]
        ybase = line[0][2]
        sz = max(r[3] for r in line)
        boxes.append(
            {
                "box_id": bid,
                "label": "text",
                "label_id": 0,
                "x1": float(min(xs)),
                "y1": float(max(page_h - ybase - sz, 0.0)),
                "x2": float(min(max(ends), page_w)),
                "y2": float(min(page_h - ybase + 0.25 * sz, page_h)),
                "score": 1.0,
                "text": text,
            }
        )
    return boxes


_IMG_SUBTYPE_RE = re.compile(rb"/Subtype\s*/Image\b")
_WIDTH_NUM_RE = re.compile(rb"/Width\s+(\d+)")
_HEIGHT_NUM_RE = re.compile(rb"/Height\s+(\d+)")
_BPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)")
_DCT_RE = re.compile(rb"/DCTDecode\b")
_DEVRGB_RE = re.compile(rb"/ColorSpace\s*/DeviceRGB\b")


def _decode_image_xobject(body: bytes):
    """Decode one /Subtype /Image XObject to an ndarray (gray (H,W) or
    RGB (H,W,3) uint8), or None when out of scope. Supported sample
    layouts: 8-bpc DeviceGray/DeviceRGB behind the standard filter chain
    (Flate/LZW/AHx/A85/RL), and /DCTDecode whose raw stream IS a JPEG
    file (kernels/jpeg.py decodes it). The reference's scanned inputs
    are exactly these (scanner output = JPEG-in-PDF)."""
    import numpy as np

    if not _IMG_SUBTYPE_RE.search(body):
        return None
    wm = _WIDTH_NUM_RE.search(body)
    hm = _HEIGHT_NUM_RE.search(body)
    if not (wm and hm):
        return None
    w, h = int(wm[1]), int(hm[1])
    if w <= 0 or h <= 0 or w * h > 1 << 26:  # bounded-memory guard
        return None
    sm = _STREAM_START_RE.search(body)
    if not sm:
        return None
    head = body[: sm.start()]
    raw = _raw_stream(body)
    if raw is None:
        return None
    if _DCT_RE.search(head):
        from paddle_spark.kernels.jpeg import decode_jpeg_pixels

        return decode_jpeg_pixels(raw)
    bm = _BPC_RE.search(body)
    if bm and int(bm[1]) != 8:
        return None
    try:
        data = _apply_filters(raw, head) if b"/Filter" in head else raw
    except Exception:
        return None
    if data is None:
        return None
    nch = 3 if _DEVRGB_RE.search(body) else 1
    if len(data) < w * h * nch:
        return None
    arr = np.frombuffer(data[: w * h * nch], dtype=np.uint8)
    return arr.reshape(h, w, 3) if nch == 3 else arr.reshape(h, w)


def _page_images(page_body: bytes, objs: dict[int, bytes]) -> list:
    """Decoded image XObjects referenced by a page's /Resources."""
    res = _resolve_dict(page_body, b"/Resources", objs)
    if res is None:
        return []
    xo = _resolve_dict(res, b"/XObject", objs)
    if xo is None:
        return []
    images = []
    for m in _FONT_REF_RE.finditer(xo):
        ref = int(m[2])
        if ref in objs:
            img = _decode_image_xobject(objs[ref])
            if img is not None:
                images.append(img)
    return images


def pdf_to_pages(payload: bytes, max_pages: int | None = None) -> list[dict]:
    """Parse a real ``%PDF`` payload into the synthetic-detector page shape
    ``[{page_no, width, height, boxes}]``. Raises ValueError when the file
    has no parseable page tree (caller maps to parse_ok=false, T5).

    ``max_pages`` caps BEFORE content-stream replay (the expensive part),
    mirroring the reference's cap-before-render (model.py:311-316, W4).

    Pages come in true /Root -> /Pages -> /Kids tree order (what the
    reference renders, model.py:300-311); the object-number scan is the
    fallback for PDFs whose tree is absent or unparseable, and also
    rescues pages a malformed tree misses (appended in number order)."""
    objs = _objects(payload)
    scanned = [num for num, body in sorted(objs.items()) if _PAGE_RE.search(body)]
    if not scanned:
        raise ValueError("no /Type /Page objects found")
    tree = _page_order(objs, payload)
    if tree:
        page_nums = tree + [n for n in scanned if n not in set(tree)]
    else:
        page_nums = scanned
    if max_pages is not None:
        page_nums = page_nums[:max_pages]
    pages = []
    for idx, num in enumerate(page_nums):
        body = objs[num]
        w, h = _media_box(body, objs)
        cs = _content_streams(body, objs)
        boxes = (
            _runs_to_boxes(_runs_from_content(cs, _page_fonts(body, objs)), w, h)
            if cs
            else []
        )
        page = {"page_no": idx, "width": w, "height": h, "boxes": boxes}
        if not boxes:
            # text-layer-less page: a SCANNED page (the reference's core
            # input, model.py:300-337). Decode its embedded image
            # XObjects so the OCR fallback (kernels/scan.py via
            # layout.extract_layout) can run; decoded lazily only for
            # boxless pages, so born-digital docs pay nothing.
            imgs = _page_images(body, objs)
            if imgs:
                page["images"] = imgs
        pages.append(page)
    return pages

"""EBML / Matroska (WebM, MKV) header metadata.

WebM is the other dominant web video container next to ISO-BMFF; like
kernels/bmff.py this parses the public container structure (RFC 8794
EBML framing + the Matroska element registry) for what a pipeline
filters on — doctype, duration, track count, video dimensions, codec
ids — while full VP8/VP9/AV1/Opus payload decode stays a documented
swap point (the reference's PIL/codec analog, model.py:339-368 accepts
only images; a/v containers are "beyond the reference" mandate ops).

EBML varints: the count of leading zero bits in the first byte gives
the total length. Element IDs keep the length-marker bit (so 0x1A45DFA3
is the 4-byte ID as written); element SIZES strip it. An all-ones size
payload means "unknown size" (streamed Segments) — treated as
extends-to-end-of-buffer, children parsed until exhaustion.

Failures degrade to None, same policy as the sibling decoders.
"""

from __future__ import annotations

import struct

EBML_MAGIC = b"\x1a\x45\xdf\xa3"

# element ids (as written in the stream, marker bit kept)
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQ = 0xB5
_CHANNELS = 0x9F


def _vint(p: bytes, off: int, keep_marker: bool) -> tuple[int, int] | None:
    """(value, next_off) for the EBML varint at off; None if malformed.
    keep_marker=True for element IDs, False for sizes. A size whose
    value bits are all ones decodes to -1 (unknown size)."""
    if off >= len(p):
        return None
    first = p[off]
    if first == 0:
        return None
    n = 1
    mask = 0x80
    while not (first & mask):
        n += 1
        mask >>= 1
    if off + n > len(p):
        return None
    if keep_marker:
        v = int.from_bytes(p[off : off + n], "big")
    else:
        v = first & (mask - 1)
        for i in range(1, n):
            v = (v << 8) | p[off + i]
        if v == (1 << (7 * n)) - 1:  # all value bits set: unknown size
            v = -1
    return v, off + n


def _elements(p: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) for siblings in [start,end)."""
    off = start
    while off < end:
        r = _vint(p, off, keep_marker=True)
        if r is None:
            return
        eid, off = r
        r = _vint(p, off, keep_marker=False)
        if r is None:
            return
        size, off = r
        body_end = end if size < 0 else off + size
        if body_end > end:
            return
        yield eid, off, body_end
        off = body_end


def _uint(p: bytes, a: int, b: int) -> int:
    return int.from_bytes(p[a:b], "big")


def _float(p: bytes, a: int, b: int) -> float | None:
    n = b - a
    if n == 4:
        return struct.unpack(">f", p[a:b])[0]
    if n == 8:
        return struct.unpack(">d", p[a:b])[0]
    return None


def webm_meta(p: bytes | None) -> dict | None:
    """{"format", "brand", "duration_ms", "n_tracks", "width", "height",
    "codecs"} for an EBML/Matroska payload, else None. "format" is
    'webm' or 'matroska' (the DocType); "brand" mirrors bmff.mp4_meta's
    field and carries the DocType too so the two containers share one
    downstream schema."""
    if not p or p[:4] != EBML_MAGIC:
        return None
    doctype = "matroska"  # spec default when DocType is absent
    duration_ticks = None
    timestamp_scale = 1_000_000  # ns per tick, spec default
    n_tracks = 0
    width = height = None
    codecs: list[str] = []

    for eid, a, b in _elements(p, 0, len(p)):
        if eid == _EBML:
            for cid, ca, cb in _elements(p, a, b):
                if cid == _DOCTYPE:
                    doctype = p[ca:cb].split(b"\x00")[0].decode("latin-1")
        elif eid == _SEGMENT:
            for cid, ca, cb in _elements(p, a, b):
                if cid == _INFO:
                    for gid, ga, gb in _elements(p, ca, cb):
                        if gid == _TIMESTAMP_SCALE:
                            timestamp_scale = _uint(p, ga, gb)
                        elif gid == _DURATION:
                            duration_ticks = _float(p, ga, gb)
                elif cid == _TRACKS:
                    for gid, ga, gb in _elements(p, ca, cb):
                        if gid != _TRACK_ENTRY:
                            continue
                        n_tracks += 1
                        for tid, ta, tb in _elements(p, ga, gb):
                            if tid == _CODEC_ID:
                                codecs.append(
                                    p[ta:tb].split(b"\x00")[0].decode("latin-1")
                                )
                            elif tid == _VIDEO:
                                for vid, va, vb in _elements(p, ta, tb):
                                    if vid == _PIXEL_WIDTH:
                                        width = _uint(p, va, vb)
                                    elif vid == _PIXEL_HEIGHT:
                                        height = _uint(p, va, vb)
    if n_tracks == 0 and duration_ticks is None:
        return None  # EBML magic but no Matroska movie structure
    duration_ms = (
        None
        if duration_ticks is None
        else duration_ticks * timestamp_scale / 1_000_000.0
    )
    return {
        "format": doctype,
        "brand": doctype,
        "duration_ms": duration_ms,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "codecs": codecs,
    }

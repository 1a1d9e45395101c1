"""ISO Base Media File Format (MP4/MOV/M4A) header metadata.

MP4 is the dominant web video container; full codec decode (H.264 etc.)
is out of scope like every neural/codec swap point, but the box
structure is a simple public format (ISO/IEC 14496-12) and the movie
header carries what a pipeline filters on: duration, track count, video
track dimensions, and brand. This is the video analog of
kernels/audiometa.py (headers, not samples).

Box walk: 4-byte big-endian size + fourcc (size 1 = 64-bit largesize,
size 0 = to-end-of-file); containers (moov/trak/mdia/minf/stbl) nest.
- mvhd: version 0 (u32 timescale, u32 duration) or 1 (u32 timescale,
  u64 duration) -> duration_ms.
- tkhd: width/height as 16.16 fixed point at the end of the box — the
  first non-zero pair is reported (the video track; audio tracks carry
  zeros).
Failures degrade to None, same policy as the sibling decoders.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(p: bytes, start: int, end: int):
    off = start
    while off + 8 <= end:
        (size,) = struct.unpack(">I", p[off : off + 4])
        tag = p[off + 4 : off + 8]
        body = off + 8
        if size == 1:
            if off + 16 > end:
                return
            (size,) = struct.unpack(">Q", p[off + 8 : off + 16])
            body = off + 16
        elif size == 0:
            size = end - off
        if size < 8 or off + size > end:
            return
        yield tag, body, off + size
        off += size


def mp4_meta(p: bytes | None) -> dict | None:
    """{"format", "brand", "duration_ms", "n_tracks", "width", "height"}
    for an ISO-BMFF payload (ftyp box first), else None."""
    if not p or len(p) < 12 or p[4:8] != b"ftyp":
        return None
    brand = p[8:12].decode("latin-1").strip()
    duration_ms = None
    n_tracks = 0
    width = height = None

    def walk(start: int, end: int) -> None:
        nonlocal duration_ms, n_tracks, width, height
        for tag, body, box_end in _boxes(p, start, end):
            if tag in _CONTAINERS:
                if tag == b"trak":
                    n_tracks += 1
                walk(body, box_end)
            elif tag == b"mvhd" and box_end - body >= 20:
                ver = p[body]
                if ver == 1 and box_end - body >= 28:
                    (ts,) = struct.unpack(">I", p[body + 20 : body + 24])
                    (dur,) = struct.unpack(">Q", p[body + 24 : body + 32])
                else:
                    (ts,) = struct.unpack(">I", p[body + 12 : body + 16])
                    (dur,) = struct.unpack(">I", p[body + 16 : body + 20])
                if ts:
                    duration_ms = round(1000.0 * dur / ts, 3)
            elif tag == b"tkhd" and box_end - body >= 8 and width is None:
                w, h = struct.unpack(">II", p[box_end - 8 : box_end])
                if w and h:
                    width, height = w >> 16, h >> 16

    walk(0, len(p))
    if duration_ms is None and n_tracks == 0:
        return None  # ftyp alone is not a movie
    return {
        "format": "mp4",
        "brand": brand,
        "duration_ms": duration_ms,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
    }

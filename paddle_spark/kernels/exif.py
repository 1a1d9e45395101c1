"""EXIF metadata parsing — JPEG APP1 (``Exif\\0\\0`` + embedded TIFF) and
bare TIFF payloads, from the public EXIF 2.32 / TIFF 6.0 specs.

Reuses the IFD-walk discipline of kernels/raster._tiff / pixels.
decode_tiff_pixels (bounds-checked entry scan, explicit endianness, cycle
caps). The reference pipeline's PIL path exposes ``Image.getexif()``
implicitly (reference model.py accepts any PIL-openable image); this is
the from-scratch analog, feeding curation with the fields a training-data
pipeline actually uses:

  * ``orientation`` — quarter-turn/mirror code 1..8; rendering and the
    scanned-OCR branch need it to normalize pixels before hashing,
  * capture time + camera make/model — dedup/provenance signals,
  * GPS latitude/longitude — a PII-audit signal (operators/safety.py's
    redaction family; embedded location data is exactly the kind of
    thing a published corpus must strip).

Parsing is defensive: any structural violation (truncated IFD, value
pointer out of bounds, zero denominators) degrades to missing fields or
``None``, never an exception — per-item isolation is the caller's batch
contract (operators/multimodal.py).
"""

from __future__ import annotations

import struct

# IFD0 tags
_TAG_MAKE = 271
_TAG_MODEL = 272
_TAG_ORIENTATION = 274
_TAG_SOFTWARE = 305
_TAG_DATETIME = 306
_TAG_EXIF_IFD = 34665
_TAG_GPS_IFD = 34853
# Exif sub-IFD tags
_TAG_EXPOSURE = 33434
_TAG_FNUMBER = 33437
_TAG_ISO = 34855
_TAG_DT_ORIGINAL = 36867
_TAG_FOCAL = 37386
_TAG_PIX_X = 40962
_TAG_PIX_Y = 40963
# GPS IFD tags
_TAG_GPS_LAT_REF = 1
_TAG_GPS_LAT = 2
_TAG_GPS_LON_REF = 3
_TAG_GPS_LON = 4

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_MAX_ENTRIES = 512


def _read_values(p: bytes, en: str, typ: int, cnt: int, entry_off: int):
    """Decode one IFD entry's value list (or None on any bounds/type
    violation). ``entry_off`` points at the 4-byte value/offset field."""
    size = _TYPE_SIZES.get(typ)
    if size is None or cnt <= 0 or cnt > 65536:
        return None
    total = size * cnt
    if total <= 4:
        off = entry_off
    else:
        if entry_off + 4 > len(p):
            return None
        (off,) = struct.unpack(en + "I", p[entry_off : entry_off + 4])
    if off + total > len(p):
        return None
    raw = p[off : off + total]
    if typ == 2:  # ASCII, NUL-terminated
        try:
            return [raw.split(b"\x00", 1)[0].decode("ascii", "replace")]
        except Exception:
            return None
    if typ in (1, 6, 7):
        return list(raw)
    if typ == 3:
        return list(struct.unpack(en + "H" * cnt, raw))
    if typ == 8:
        return list(struct.unpack(en + "h" * cnt, raw))
    if typ == 4:
        return list(struct.unpack(en + "I" * cnt, raw))
    if typ == 9:
        return list(struct.unpack(en + "i" * cnt, raw))
    # RATIONAL / SRATIONAL: (num, den) pairs
    fmt = "I" if typ == 5 else "i"
    flat = struct.unpack(en + fmt * (2 * cnt), raw)
    return [(flat[2 * i], flat[2 * i + 1]) for i in range(cnt)]


def _parse_ifd(p: bytes, en: str, off: int, wanted: set[int]) -> dict:
    """One IFD -> {tag: values} for the requested tags."""
    out: dict[int, list] = {}
    if off < 0 or off + 2 > len(p):
        return out
    (count,) = struct.unpack(en + "H", p[off : off + 2])
    for k in range(min(count, _MAX_ENTRIES)):
        e = off + 2 + 12 * k
        if e + 12 > len(p):
            break
        tag, typ = struct.unpack(en + "HH", p[e : e + 4])
        if tag not in wanted:
            continue
        (cnt,) = struct.unpack(en + "I", p[e + 4 : e + 8])
        vals = _read_values(p, en, typ, cnt, e + 8)
        if vals:
            out[tag] = vals
    return out


def _ratio(v) -> float | None:
    if not isinstance(v, tuple) or v[1] == 0:
        return None
    return v[0] / v[1]


def _gps_degrees(vals, ref: str | None) -> float | None:
    """[(d),(m),(s)] rationals + hemisphere ref -> signed decimal degrees."""
    if not vals or len(vals) < 3:
        return None
    parts = [_ratio(v) for v in vals[:3]]
    if any(x is None for x in parts):
        return None
    dd = parts[0] + parts[1] / 60.0 + parts[2] / 3600.0
    if ref and ref.strip().upper() in ("S", "W"):
        dd = -dd
    return dd


def _find_tiff(payload: bytes) -> bytes | None:
    """Locate the TIFF body: bare TIFF passes through; JPEG walks the
    segment chain to the first APP1 whose body starts ``Exif\\0\\0``."""
    if len(payload) < 8:
        return None
    if payload[:2] in (b"II", b"MM") and payload[2:4] in (b"*\x00", b"\x00*"):
        return payload
    if payload[:2] != b"\xff\xd8":
        return None
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xDA:  # start of scan: no APP1 before image data
            return None
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        if seglen < 2:
            return None
        body = payload[i + 4 : i + 2 + seglen]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            return body[6:]
        i += 2 + seglen
    return None


def parse_exif(payload: bytes | None) -> dict | None:
    """EXIF fields from a JPEG or TIFF payload, or None when absent.

    Returns {orientation, make, model, software, datetime,
    datetime_original, exif_width, exif_height, iso, f_number,
    exposure_time, focal_length, gps_lat, gps_lon} — every field
    individually optional (None when the tag is missing or malformed).
    """
    if not payload:
        return None
    p = _find_tiff(payload)
    if p is None or len(p) < 8:
        return None
    if p[:2] == b"II":
        en = "<"
    elif p[:2] == b"MM":
        en = ">"
    else:
        return None
    try:
        (ifd0_off,) = struct.unpack(en + "I", p[4:8])
        ifd0 = _parse_ifd(
            p, en, ifd0_off,
            {_TAG_MAKE, _TAG_MODEL, _TAG_ORIENTATION, _TAG_SOFTWARE,
             _TAG_DATETIME, _TAG_EXIF_IFD, _TAG_GPS_IFD},
        )
        sub = {}
        if _TAG_EXIF_IFD in ifd0:
            sub = _parse_ifd(
                p, en, int(ifd0[_TAG_EXIF_IFD][0]),
                {_TAG_EXPOSURE, _TAG_FNUMBER, _TAG_ISO, _TAG_DT_ORIGINAL,
                 _TAG_FOCAL, _TAG_PIX_X, _TAG_PIX_Y},
            )
        gps = {}
        if _TAG_GPS_IFD in ifd0:
            gps = _parse_ifd(
                p, en, int(ifd0[_TAG_GPS_IFD][0]),
                {_TAG_GPS_LAT_REF, _TAG_GPS_LAT, _TAG_GPS_LON_REF,
                 _TAG_GPS_LON},
            )
    except (struct.error, ValueError, IndexError):
        return None

    def first(d, tag):
        v = d.get(tag)
        return v[0] if v else None

    lat_ref = first(gps, _TAG_GPS_LAT_REF)
    lon_ref = first(gps, _TAG_GPS_LON_REF)
    out = {
        "orientation": first(ifd0, _TAG_ORIENTATION),
        "make": first(ifd0, _TAG_MAKE),
        "model": first(ifd0, _TAG_MODEL),
        "software": first(ifd0, _TAG_SOFTWARE),
        "datetime": first(ifd0, _TAG_DATETIME),
        "datetime_original": first(sub, _TAG_DT_ORIGINAL),
        "exif_width": first(sub, _TAG_PIX_X),
        "exif_height": first(sub, _TAG_PIX_Y),
        "iso": first(sub, _TAG_ISO),
        "f_number": _ratio(first(sub, _TAG_FNUMBER)),
        "exposure_time": _ratio(first(sub, _TAG_EXPOSURE)),
        "focal_length": _ratio(first(sub, _TAG_FOCAL)),
        "gps_lat": _gps_degrees(gps.get(_TAG_GPS_LAT), lat_ref),
        "gps_lon": _gps_degrees(gps.get(_TAG_GPS_LON), lon_ref),
    }
    if all(v is None for v in out.values()):
        return None
    return out

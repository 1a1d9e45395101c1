"""Image header decode (kernels/raster.py, S4/X8 metadata path) and the
image extraction branch: kind=image rows are no longer automatic failures."""

import struct
import zlib

from paddle_spark.kernels.extract import extract_document
from paddle_spark.kernels.raster import decode_image_header


def _png(w, h):
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def _gif(w, h, n_frames):
    out = b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"  # no GCT
    for _ in range(n_frames):
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE: 4 data bytes + term
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"  # descr
        out += b"\x02\x02\x44\x01\x00"  # LZW min + one 2-byte sub-block + term
    return out + b"\x3b"


def _jpeg(w, h):
    return (
        b"\xff\xd8"
        + b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", h, w) + b"\x03" + b"\x01\x11\x00" * 3
        + b"\xff\xd9"
    )


def _bmp(w, h, dib=40):
    return (b"BM" + b"\x00" * 12 + struct.pack("<I", dib)
            + struct.pack("<ii", w, h) + b"\x00" * 8)


def _tiff(w, h):
    # little-endian, one IFD with tags 256/257 (SHORT)
    def entry(tag, val):
        return struct.pack("<HHI", tag, 3, 1) + struct.pack("<HH", val, 0)

    ifd = struct.pack("<H", 2) + entry(256, w) + entry(257, h) + struct.pack("<I", 0)
    return b"II*\x00" + struct.pack("<I", 8) + ifd


def test_png():
    assert decode_image_header(_png(640, 480)) == {
        "format": "png", "width": 640, "height": 480, "n_frames": 1}


def test_gif_frames():
    m = decode_image_header(_gif(64, 32, 3))
    assert m["format"] == "gif" and (m["width"], m["height"]) == (64, 32)
    assert m["n_frames"] == 3


def test_jpeg():
    m = decode_image_header(_jpeg(800, 600))
    assert m == {"format": "jpeg", "width": 800, "height": 600, "n_frames": 1}


def test_bmp_and_tiff():
    assert decode_image_header(_bmp(31, 17))["width"] == 31
    t = decode_image_header(_tiff(100, 50))
    assert (t["width"], t["height"], t["n_frames"]) == (100, 50, 1)


def test_bmp_validation():
    # top-down BMP (negative height) is valid; height reported positive
    m = decode_image_header(_bmp(31, -17))
    assert (m["width"], m["height"]) == (31, 17)
    # BITMAPCOREHEADER (dib=12) uses 16-bit unsigned dims
    core = b"BM" + b"\x00" * 12 + struct.pack("<I", 12) + struct.pack("<HH", 9, 7) + b"\x00" * 8
    assert decode_image_header(core) == {
        "format": "bmp", "width": 9, "height": 7, "n_frames": 1}
    # text starting 'BM' is NOT a bitmap: bogus DIB size / dims rejected
    assert decode_image_header(b"BMW is a carmaker, not a bitmap.") is None
    assert decode_image_header(_bmp(31, 17, dib=99)) is None
    assert decode_image_header(_bmp(-31, 17)) is None   # negative width
    assert decode_image_header(_bmp(0, 0)) is None


def test_malformed_total():
    for p in [None, b"", b"\x89PNG", b"GIF89a\x01", b"\xff\xd8\xff\x00",
              b"II*\x00\xff\xff\xff\xff", b"random bytes here"]:
        assert decode_image_header(p) in (None,) or isinstance(
            decode_image_header(p), dict
        )  # never raises


def test_image_branch_success():
    r = extract_document(_png(64, 64))
    assert r.parse_ok and r.branch == "layout" and r.text == "" and not r.error
    r2 = extract_document(_gif(10, 10, 2))
    assert r2.parse_ok


def test_image_branch_bad_header_isolated():
    r = extract_document(b"\x89PNG\r\n\x1a\n")  # magic only, no IHDR
    assert not r.parse_ok and r.error


def test_decode_media_uses_real_header(spark):
    from paddle_spark.operators.multimodal import decode_media

    df = spark.createDataFrame(
        [(1, _png(320, 200)), (2, _gif(12, 34, 4)), (3, b"not an image")],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in decode_media(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_frames"]) == (320, 200, 1)
    assert (got[2]["width"], got[2]["height"], got[2]["n_frames"]) == (12, 34, 4)
    assert got[3]["decode_ok"] and got[3]["width"] >= 64  # digest fallback

"""Multimodal plumbing tests (decode is a declared deterministic stub)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from paddle_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, b"\x89PNG\r\n\x1a\n" + b"fakepng" * 10),
        (1, b"\xff\xd8\xff" + b"fakejpg" * 20),
        (2, b"GIF89a" + b"fakegif" * 5),
        (3, b"%PDF-1.4\nnot an image"),
        (4, None),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_binary_meta(media):
    out = {r["media_id"]: r for r in MM.binary_meta(media).collect()}
    assert out[0]["kind"] == "image"
    assert out[1]["kind"] == "image"
    assert out[3]["kind"] == "pdf"
    payload = b"\x89PNG\r\n\x1a\n" + b"fakepng" * 10
    assert out[0]["n_bytes"] == len(payload)
    assert out[0]["sha256"] == hashlib.sha256(payload).hexdigest()


def test_decode_stub_schema_and_determinism(media):
    out = MM.decode_media(media)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "width", "height", "n_frames", "feature", "decode_ok",
    ]
    rows1 = {r["media_id"]: r.asDict() for r in out.collect()}
    rows2 = {r["media_id"]: r.asDict() for r in MM.decode_media(media).collect()}
    assert rows1 == rows2
    r0 = rows1[0]
    assert r0["decode_ok"] and 64 <= r0["width"] <= 255 and len(r0["feature"]) == 8
    # deterministic fake matches the single-process function
    w, h, nf, feat = MM.decode_fake(b"\x89PNG\r\n\x1a\n" + b"fakepng" * 10)
    assert (r0["width"], r0["height"], r0["n_frames"]) == (w, h, nf)


def test_decode_real_is_declared_stub():
    with pytest.raises(NotImplementedError):
        MM.decode_real(b"anything")


def test_pixel_stats_real_decode_and_isolation(spark):
    """pixel_stats decodes real PNG/BMP pixels distributed; garbage and
    seam formats (JPEG entropy data) become decode_ok=false rows, never
    task failures."""
    import numpy as np

    from paddle_spark.sources.synth import make_bmp, make_png

    arr = np.zeros((10, 20, 3), dtype=np.uint8)
    arr[:, :, 0] = 200          # solid-ish: r=200, g=0, b=0
    rows = [
        (0, bytearray(make_png(arr, filter_types=[4]))),
        (1, bytearray(make_bmp(arr))),
        (2, bytearray(b"\xff\xd8\xff\xe0 not decodable jpeg")),
        (3, bytearray(b"random garbage")),
        (4, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in MM.pixel_stats(media).collect()}
    for mid in (0, 1):
        r = out[mid]
        assert r["decode_ok"] and (r["width"], r["height"]) == (20, 10)
        assert (r["out_width"], r["out_height"]) == (20, 10)  # under cap
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (200.0, 0.0, 0.0)
    for mid in (2, 3, 4):
        assert not out[mid]["decode_ok"]
    # resize cap engages distributed too
    big = np.full((300, 400, 3), 10, dtype=np.uint8)
    media2 = spark.createDataFrame(
        [(9, bytearray(make_png(big)))], "media_id long, payload binary"
    )
    r = MM.pixel_stats(media2, max_dim=128).collect()[0]
    assert (r["out_width"], r["out_height"]) == (128, 96)
    assert r["mean_r"] == 10.0


def test_frame_sample_fanout_and_isolation(spark):
    import numpy as np

    from paddle_spark.sources.synth import make_gif, make_png

    pal = [[10, 20, 30], [200, 100, 50], [1, 2, 3]]
    frames = [np.full((6, 9), f, dtype=np.uint8) for f in range(3)]
    rows = [
        (0, bytearray(make_gif(frames, pal))),            # 3 frames -> 0, 2
        (1, bytearray(make_png(np.full((4, 5, 3), 7, dtype=np.uint8)))),
        (2, bytearray(b"junk")),                          # no rows
        (3, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = MM.frame_sample(media, every_k=2, max_frames=8).collect()
    got = {(r["media_id"], r["frame_no"]): r for r in out}
    assert set(got) == {(0, 0), (0, 2), (1, 0)}
    assert (got[(0, 0)]["mean_r"], got[(0, 0)]["mean_g"]) == (10.0, 20.0)
    assert got[(0, 2)]["mean_b"] == 3.0
    assert got[(1, 0)]["mean_r"] == 7.0 and got[(1, 0)]["width"] == 5


def test_frame_sample_grayscale_payloads(spark):
    """1-channel decodes (gray PNG/JPEG) report means too — they repeat
    to 3 channels instead of being silently dropped."""
    import numpy as np

    from paddle_spark.sources.synth import make_jpeg, make_png

    g = np.full((8, 10), 77, dtype=np.uint8)
    rows = [(0, bytearray(make_png(g))), (1, bytearray(make_jpeg(g)))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in MM.frame_sample(media).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (77.0, 77.0, 77.0)

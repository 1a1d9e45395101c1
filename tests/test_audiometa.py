"""Compressed-audio header metadata (kernels/audiometa.py): MP3 / Ogg
Vorbis / Ogg Opus / FLAC, with hand-built spec fixtures, a wild-file
check, and the classify/extract wiring."""

import struct

import numpy as np
import pytest

from paddle_spark.kernels.audiometa import (
    audio_container_meta,
    flac_meta,
    mp3_meta,
    ogg_meta,
)

WILD_MP3 = "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"


def _mp3_frame(version=3, br_idx=9, sr_idx=0, mono=False) -> bytes:
    """One valid MPEG Layer-III frame header + silence payload of the
    exact spec frame length (144 * bitrate / rate + padding)."""
    b1 = 0xE0 | (version << 3) | (1 << 1) | 1   # sync low bits, layer III
    b2 = (br_idx << 4) | (sr_idx << 2)
    b3 = 0xC0 if mono else 0x00
    rates = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000]}[version]
    kbps = ([0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
            if version == 3 else
            [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160])[br_idx]
    n = (144000 * kbps) // rates[sr_idx]
    return (bytes([0xFF, b1, b2, b3]) + b"\x00" * (n - 4))


def _ogg_page(body: bytes, granule: int = 0, serial: int = 7) -> bytes:
    nseg = (len(body) + 254) // 255 or 1
    segs = []
    rest = len(body)
    for _ in range(nseg):
        segs.append(min(rest, 255))
        rest -= segs[-1]
    return (b"OggS" + b"\x00\x02" + struct.pack("<q", granule)
            + struct.pack("<III", serial, 0, 0) + bytes([nseg]) + bytes(segs)
            + body)


class TestMp3:
    def test_cbr_estimate_and_id3_skip(self):
        frames = b"".join(_mp3_frame() for _ in range(40))  # 128kbps 44.1k
        tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"x" * 20
        for payload in (frames, tag + frames):
            m = mp3_meta(payload)
            assert m["format"] == "mp3"
            assert (m["sample_rate"], m["bitrate_kbps"], m["channels"]) == (44100, 128, 2)
            assert m["est_duration_ms"] == round(len(frames) * 8.0 / 128, 3)

    def test_mpeg2_mono(self):
        m = mp3_meta(_mp3_frame(version=2, br_idx=5, sr_idx=0, mono=True) * 3)
        assert (m["sample_rate"], m["bitrate_kbps"], m["channels"]) == (22050, 40, 1)

    def test_wild_mp3(self):
        import os

        if not os.path.exists(WILD_MP3):
            pytest.skip("no wild mp3")
        m = audio_container_meta(open(WILD_MP3, "rb").read())
        assert m["format"] == "mp3" and m["sample_rate"] in (44100, 48000, 32000,
                                                             22050, 24000, 16000,
                                                             11025, 12000, 8000)
        assert 0 < m["est_duration_ms"] < 60_000

    def test_garbage_declines(self):
        assert mp3_meta(b"\x00" * 100) is None
        assert mp3_meta(b"ID3\x04\x00\x00\x00\x00\x00\x02xx" + b"\x00" * 50) is None


class TestOgg:
    def test_vorbis_id_and_granule(self):
        ident = b"\x01vorbis" + bytes([0, 0, 0, 0, 2]) + struct.pack("<I", 44100) + b"\x00" * 16
        p = _ogg_page(ident) + _ogg_page(b"\x05data", granule=88200)
        m = ogg_meta(p)
        assert m["format"] == "ogg-vorbis"
        assert (m["sample_rate"], m["channels"]) == (44100, 2)
        assert m["est_duration_ms"] == 2000.0

    def test_opus_head_pre_skip(self):
        head = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 312)
                + struct.pack("<I", 48000) + b"\x00\x00\x00")
        p = _ogg_page(head) + _ogg_page(b"x", granule=48000 + 312)
        m = ogg_meta(p)
        assert m["format"] == "ogg-opus"
        assert (m["sample_rate"], m["channels"]) == (48000, 1)
        assert m["est_duration_ms"] == 1000.0

    def test_non_audio_ogg_declines(self):
        assert ogg_meta(_ogg_page(b"\x80theora" + b"\x00" * 20)) is None


class TestFlac:
    def _streaminfo(self, rate, channels, total):
        v = (rate << 44) | ((channels - 1) << 41) | (20 << 36) | total
        si = b"\x10\x00\x10\x00" + b"\x00\x00\x00" + b"\x00\x00\x00" + v.to_bytes(8, "big") + b"\x00" * 16
        return b"fLaC" + b"\x00" + len(si).to_bytes(3, "big") + si

    def test_streaminfo(self):
        m = flac_meta(self._streaminfo(96000, 2, 960000))
        assert (m["format"], m["sample_rate"], m["channels"]) == ("flac", 96000, 2)
        assert m["est_duration_ms"] == 10000.0

    def test_wrong_first_block_declines(self):
        p = bytearray(self._streaminfo(44100, 2, 1))
        p[4] = 0x04  # VORBIS_COMMENT first: invalid stream
        assert flac_meta(bytes(p)) is None


def test_classify_and_extract_wiring(spark):
    """Compressed-audio magics classify audio (kernel + Column twin) and
    extract_document treats parseable containers as zero-block successes."""
    from pyspark.sql import functions as F

    from paddle_spark.functions import payload_kind_col
    from paddle_spark.kernels.classify import classify_payload
    from paddle_spark.kernels.extract import extract_document

    frames = b"".join(_mp3_frame() for _ in range(3))
    ogg = _ogg_page(b"\x01vorbis" + bytes([0, 0, 0, 0, 1]) + struct.pack("<I", 8000) + b"\x00" * 16)
    flac = TestFlac()._streaminfo(8000, 1, 8000)
    payloads = [b"ID3\x04\x00\x00\x00\x00\x00\x00" + frames, ogg, flac]
    for p in payloads:
        assert classify_payload(p) == "audio", p[:8]
        r = extract_document(p)
        assert r.parse_ok and r.branch == "audio", p[:8]
    # bare-sync mp3 (no ID3): documented classify compromise -> garbage
    assert classify_payload(frames) == "garbage"
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads + [frames])],
        "i int, html binary",
    )
    got = {r["i"]: r["k"] for r in df.select(
        "i", payload_kind_col(F.col("html")).alias("k")).collect()}
    for i, p in enumerate(payloads + [frames]):
        assert got[i] == classify_payload(p), i


class TestMp4:
    """ISO-BMFF header walk (kernels/bmff.py) — hand-built box fixtures."""

    @staticmethod
    def _box(tag, body):
        return struct.pack(">I", 8 + len(body)) + tag + body

    def _movie(self, ver=0, ts=1000, dur=5000, w=640, h=360):
        b = self._box
        if ver == 0:
            mvhd = b(b"mvhd", bytes(4) + bytes(8) + struct.pack(">II", ts, dur) + bytes(80))
        else:
            mvhd = b(b"mvhd", bytes([1, 0, 0, 0]) + bytes(16)
                     + struct.pack(">I", ts) + struct.pack(">Q", dur) + bytes(80))
        tkhd_v = b(b"tkhd", bytes(76) + struct.pack(">II", w << 16, h << 16))
        tkhd_a = b(b"tkhd", bytes(76) + struct.pack(">II", 0, 0))
        moov = b(b"moov", mvhd + b(b"trak", tkhd_a) + b(b"trak", tkhd_v))
        return b(b"ftyp", b"isomiso2") + moov + b(b"mdat", b"\x00" * 32)

    def test_version0_and_tracks(self):
        from paddle_spark.kernels.bmff import mp4_meta

        m = mp4_meta(self._movie())
        assert m == {"format": "mp4", "brand": "isom", "duration_ms": 5000.0,
                     "n_tracks": 2, "width": 640, "height": 360}

    def test_version1_64bit_duration(self):
        from paddle_spark.kernels.bmff import mp4_meta

        m = mp4_meta(self._movie(ver=1, ts=90000, dur=90000 * 7, w=1920, h=1080))
        assert m["duration_ms"] == 7000.0 and (m["width"], m["height"]) == (1920, 1080)

    def test_degrades(self):
        from paddle_spark.kernels.bmff import mp4_meta

        assert mp4_meta(b"\x00\x00\x00\x08free") is None
        assert mp4_meta(self._box(b"ftyp", b"isomiso2")) is None  # no moov
        trunc = self._movie()[:40]
        assert mp4_meta(trunc) is None or isinstance(mp4_meta(trunc), dict)

    def test_classify_and_extract(self, spark):
        from pyspark.sql import functions as F

        from paddle_spark.functions import payload_kind_col
        from paddle_spark.kernels.classify import classify_payload
        from paddle_spark.kernels.extract import extract_document

        p = self._movie()
        assert classify_payload(p) == "video"
        r = extract_document(p)
        assert r.parse_ok and r.branch == "video"
        df = spark.createDataFrame([(0, bytearray(p))], "i int, html binary")
        assert df.select(payload_kind_col(F.col("html")).alias("k")).first()["k"] == "video"


class TestWebm:
    """EBML/Matroska header walk (kernels/ebml.py) vs the spec-twin
    encoder (synth.make_webm) plus hand-mangled framing cases."""

    def test_video_and_audio_tracks(self):
        from paddle_spark.kernels.ebml import webm_meta
        from paddle_spark.sources.synth import make_webm

        m = webm_meta(make_webm(7.5, 640, 360, audio_hz=48000))
        assert m == {"format": "webm", "brand": "webm", "duration_ms": 7500.0,
                     "n_tracks": 2, "width": 640, "height": 360,
                     "codecs": ["V_VP8", "A_OPUS"]}

    def test_audio_only_matroska_nondefault_scale(self):
        from paddle_spark.kernels.ebml import webm_meta
        from paddle_spark.sources.synth import make_webm

        m = webm_meta(make_webm(3.0, audio_hz=8000, doctype="matroska",
                                timestamp_scale=500_000))
        assert m["format"] == "matroska" and m["duration_ms"] == 3000.0
        assert m["n_tracks"] == 1 and m["width"] is None

    def test_unknown_size_segment(self):
        from paddle_spark.kernels.ebml import webm_meta
        from paddle_spark.sources.synth import make_webm

        p = make_webm(7.5, 640, 360, audio_hz=48000)
        seg = (0x18538067).to_bytes(4, "big")
        i = p.index(seg) + 4
        first = p[i]
        n, mask = 1, 0x80
        while not (first & mask):
            n += 1
            mask >>= 1
        # re-frame the Segment with the 1-byte unknown-size marker 0xFF
        p2 = p[:i] + b"\xff" + p[i + n:]
        assert webm_meta(p2) == webm_meta(p)

    def test_degrades(self):
        from paddle_spark.kernels.ebml import webm_meta

        assert webm_meta(None) is None
        assert webm_meta(b"nope") is None
        assert webm_meta(b"\x1a\x45\xdf\xa3" + b"junk" * 4) is None
        from paddle_spark.sources.synth import make_webm
        trunc = make_webm(7.5, 640, 360)[:20]
        assert trunc[:4] == b"\x1a\x45\xdf\xa3"
        m = webm_meta(trunc)
        assert m is None or isinstance(m, dict)

    def test_classify_and_extract(self, spark):
        from pyspark.sql import functions as F

        from paddle_spark.functions import payload_kind_col
        from paddle_spark.kernels.classify import classify_payload
        from paddle_spark.kernels.extract import extract_document
        from paddle_spark.sources.synth import make_webm

        p = make_webm(2.0, 320, 240)
        assert classify_payload(p) == "video"
        r = extract_document(p)
        assert r.parse_ok and r.branch == "video" and r.text == ""
        df = spark.createDataFrame([(0, bytearray(p))], "i int, html binary")
        got = df.select(payload_kind_col(F.col("html")).alias("k")).collect()
        assert got[0]["k"] == "video"


class TestContainerMeta:
    """container_meta operator: one shared schema over MP4 + WebM + AVI
    with per-item garbage isolation."""

    def test_three_containers_and_garbage(self, spark):
        import numpy as np

        from paddle_spark.operators.multimodal import container_meta
        from paddle_spark.sources.synth import make_avi_raw, make_mp4, make_webm

        payloads = [
            (0, make_mp4(1000, 4000, 640, 360)),
            (1, make_webm(2.0, 320, 240, audio_hz=48000)),
            (2, make_avi_raw([np.zeros((24, 32, 3), np.uint8)] * 3, fps=25)),
            (3, b"garbage bytes"),
        ]
        df = spark.createDataFrame(
            [(i, bytearray(p)) for i, p in payloads],
            "media_id long, payload binary",
        )
        rows = {r.media_id: r for r in container_meta(df).collect()}
        assert (rows[0].format, rows[0].duration_ms, rows[0].n_tracks,
                rows[0].width, rows[0].height) == ("mp4", 4000.0, 2, 640, 360)
        assert (rows[1].format, rows[1].duration_ms, rows[1].n_tracks,
                rows[1].width, rows[1].height) == ("webm", 2000.0, 2, 320, 240)
        assert (rows[2].format, rows[2].duration_ms, rows[2].n_tracks,
                rows[2].width, rows[2].height) == ("avi", 120.0, 1, 32, 24)
        assert rows[3].format == "unknown" and not rows[3].decode_ok
        assert all(rows[i].decode_ok for i in (0, 1, 2))

"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schemas, Arrow batch shape, mapInPandas signatures,
partitioning) is real and tested. Since round 3, PIXEL-LEVEL decode is
real for PNG, BMP, GIF (per-frame LZW + animation composition), JPEG
(baseline + progressive), TIFF, and lossless WEBP (kernels/pixels.py +
kernels/jpeg.py + kernels/webp.py — pure zlib/NumPy) and feeds
``pixel_stats`` / ``frame_sample`` with the reference's channel
preprocessing (gray -> 3ch, alpha drop, downscale cap, RGB -> BGR).
Lossy WEBP decodes through the system-libwebp ctypes arm
(kernels/webp_native.py); only audio/video remain the declared seam. There is
ONE codec switch for the whole package — ``kernels/pixels.decoder_for``:
every pixel operator (including ``decode_media``) takes a ``codec`` knob
resolved there at plan construction ('python' = the pure codecs here,
'native' = mode-normalized PIL for bulk throughput on a real cluster,
'off' = refuse). Feature vectors
are PIXEL-DERIVED since round 4 (``visual_features``: dhash + channel
histograms); ``decode_fake``'s digest feature remains only as the
plumbing stand-in for NEURAL embeddings.

Reference analog: the blip-caption backend's batched execute loop
(/root/reference/server/model_repo/blip-caption/1/model.py:226-292 —
iterate requests -> decode image -> infer -> encode), which is exactly an
``Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]`` mapInPandas body; the
frame preprocessing (layout-parsing model.py:328-334, :355-364); and the
image postprocess resize cap (model.py:96-119, <= 2000^2).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def binary_meta(media: DataFrame, id_col: str = "media_id",
                payload_col: str = "payload") -> DataFrame:
    """Typed metadata over opaque binary — pure Column ops, no Python."""
    from paddle_spark.functions import payload_kind_col

    return media.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
        payload_kind_col(F.col(payload_col)).alias("kind"),
    )


def decode_fake(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in decode: dims/frames/feature derived from the
    payload digest. Keeps the batch shape, schema and partitioning honest
    so the pipeline around the codec is fully testable.

    When the payload is a recognizable image container, width/height/
    n_frames come from the REAL header (kernels/raster.py — PNG/GIF/JPEG/
    TIFF/BMP/WEBP); only the feature vector stays digest-derived (the
    neural-embedding swap point — real pixel stats live in
    ``pixel_stats``)."""
    from paddle_spark.kernels.raster import decode_image_header

    d = hashlib.sha256(payload or b"").digest()
    feature = [round(b / 255.0, 6) for b in d[:8]]
    meta = decode_image_header(payload)
    if meta is not None:
        return int(meta["width"]), int(meta["height"]), int(meta["n_frames"]), feature
    width = 64 + d[0] % 192          # 64..255
    height = 64 + d[1] % 192
    n_frames = 1 + d[2] % 4
    return width, height, n_frames, feature


def decode_media(media: DataFrame, id_col: str = "media_id",
                 payload_col: str = "payload", codec: str = "fake") -> DataFrame:
    """Batched 'decode' over Arrow batches (mapInPandas, U3 analog).

    ``codec='fake'`` (default) keeps the deterministic digest stand-in
    for neural embeddings — header-true dims, digest feature (the oracled
    plumbing path). Any other value routes through the package's single
    codec switch, ``kernels/pixels.decoder_for`` ('python' pure codecs or
    'native' mode-normalized PIL), resolved HERE at plan construction;
    the feature becomes the real per-channel pixel means (0..1)."""
    src = media.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(payload_col).alias("payload")
    )
    if codec == "fake":
        decode_one = decode_fake
    else:
        from paddle_spark.kernels.pixels import decoder_for, to_3ch
        from paddle_spark.kernels.raster import decode_image_header

        decode = decoder_for(codec)  # validates / gates at plan construction

        def decode_one(payload):
            img = decode(payload)
            if img is None:
                raise ValueError("undecodable payload")
            h, w = img.shape[:2]
            meta = decode_image_header(payload)
            nf = int(meta["n_frames"]) if meta is not None else 1
            means = to_3ch(img).reshape(-1, 3).mean(axis=0) / 255.0
            return int(w), int(h), nf, [round(float(m), 6) for m in means]

    def decode_batch(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, nf, feat = decode_one(payload)
                    rows.append((int(mid), w, h, nf, feat, True))
                except Exception:  # per-item isolation (T5)
                    rows.append((int(mid), 0, 0, 0, [], False))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_frames", "feature", "decode_ok"],
            )

    return src.mapInPandas(decode_batch, schema=DECODED_SCHEMA)


VISUAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def visual_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    bins: int = 4,
    hash_size: int = 8,
    codec: str = "auto",
) -> DataFrame:
    """DETERMINISTIC visual features from REAL decoded pixels — the
    pixel-derived replacement for decode_fake's digest stand-in, feeding
    the ANN/dedup chain with meaningful vectors short of neural
    embeddings:

    - ``dhash``: difference hash — channel-mean grayscale, bilinear
      resize to (hash_size+1, hash_size), bit r*hash_size+c set when
      px[r,c] < px[r,c+1]. Near-duplicate images agree on most bits
      (Hamming distance), exact duplicates agree on all 64.
    - ``feature``: per-channel ``bins``-bin intensity histogram
      (fractions of pixels, rounded to 6 decimals), concatenated
      R|G|B — a 3*bins-dim embedding for cosine ANN.

    Arrow-batched mapInPandas, map-only plan, per-item isolation (T5).
    """
    import numpy as np

    from paddle_spark.kernels.pixels import (
        decoder_for,
        resize_bilinear,
        to_3ch,
    )

    decode = decoder_for(codec)

    src = media.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )
    width = 256 // bins

    def batch(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    img = decode(
                        bytes(payload) if payload is not None else None
                    )
                    if img is None:
                        rows.append((int(mid), None, None, False))
                        continue
                    img3 = to_3ch(img)
                    gray = img3.mean(axis=2, dtype=np.float64)
                    small = resize_bilinear(
                        gray[:, :, None], hash_size + 1, hash_size
                    )[:, :, 0]
                    diff = small[:, :-1] < small[:, 1:]
                    weights = np.int64(1) << np.arange(
                        hash_size * hash_size, dtype=np.int64
                    )
                    dhash = int((diff.reshape(-1) * weights).sum())
                    n_px = img3.shape[0] * img3.shape[1]
                    feat = []
                    for ch in range(3):
                        counts = np.bincount(
                            (img3[:, :, ch] // width).reshape(-1),
                            minlength=bins,
                        )[:bins]
                        feat.extend(
                            round(float(c) / n_px, 6) for c in counts
                        )
                    rows.append((int(mid), dhash, feat, True))
                except Exception:  # per-item isolation
                    rows.append((int(mid), None, None, False))
            yield pd.DataFrame(
                rows, columns=["media_id", "dhash", "feature", "decode_ok"]
            )

    return src.mapInPandas(batch, schema=VISUAL_SCHEMA)


def visual_near_dups(
    media: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    id_col: str = "media_id",
    payload_col: str = "payload",
    codec: str = "auto",
) -> DataFrame:
    """Near-duplicate IMAGE pairs at scale: banded Hamming join over the
    pixel dhash (visual_features). The 64-bit hash splits into
    ``n_bands`` chunks; candidate pairs share at least one identical
    chunk (an equi-join per band — never an all-pairs comparison), then
    the exact Hamming distance filters JVM-side (xor + bit_count).

    Pigeonhole completeness: a pair within Hamming distance d must agree
    on some chunk whenever d < n_bands, so the default (3 < 4) returns
    EXACTLY the pairs with distance <= max_hamming. Raising max_hamming
    to >= n_bands makes the result a recall-documented candidate subset
    — same trade-off as the simhash text banding (operators/dedup.py).
    """
    if not 64 % n_bands == 0:
        raise ValueError("n_bands must divide 64")
    width = 64 // n_bands
    vf = visual_features(media, id_col=id_col, payload_col=payload_col,
                         codec=codec).filter(F.col("decode_ok"))
    vf = vf.select("media_id", "dhash")
    chunks = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned("dhash", b * width)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("chunk"),
        )
        for b in range(n_bands)
    ])
    banded = vf.select("media_id", "dhash", F.explode(chunks).alias("bc")).select(
        "media_id", "dhash", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk")
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.bit_count(
                F.col("a.dhash").bitwiseXOR(F.col("b.dhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def pixel_stats(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_dim: int = 6000,
    codec: str = "auto",
) -> DataFrame:
    """REAL pixel decode (PNG/BMP/GIF/JPEG/TIFF, kernels/pixels.py +
    kernels/jpeg.py) through the reference's frame preprocessing —
    3-channel normalize, largest-dim downscale cap, RGB->BGR
    (model.py:328-334, :355-364) — then per-channel means of the
    processed frame. Arrow-batched mapInPandas with per-item isolation
    (T5): undecodable payloads (out-of-scope variants, lossy WEBP on a
    host without libwebp, or garbage) yield decode_ok=false rows, never task
    failures. ``codec`` gates the decode path (kernels/pixels.decoder_for):
    'off' refuses at plan construction, 'native' demands PIL — a bulk job
    must opt into the pure-Python codecs deliberately."""
    from paddle_spark.kernels.pixels import decoder_for, preprocess_frame

    decode = decoder_for(codec)
    src = media.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def batch(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    img = decode(
                        bytes(payload) if payload is not None else None
                    )
                    if img is None:
                        rows.append(
                            (int(mid), 0, 0, 0, 0, 0, None, None, None, False)
                        )
                        continue
                    h, w = img.shape[:2]
                    nch = img.shape[2] if img.ndim == 3 else 1
                    bgr, ow, oh = preprocess_frame(img, max_dim)
                    means = bgr.reshape(-1, 3).mean(axis=0)  # b, g, r
                    rows.append(
                        (
                            int(mid), int(w), int(h), int(ow), int(oh),
                            int(nch),
                            round(float(means[2]), 6),
                            round(float(means[1]), 6),
                            round(float(means[0]), 6),
                            True,
                        )
                    )
                except Exception:  # per-item isolation
                    rows.append(
                        (int(mid), 0, 0, 0, 0, 0, None, None, None, False)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "out_width", "out_height",
                    "n_channels", "mean_r", "mean_g", "mean_b", "decode_ok",
                ],
            )

    return src.mapInPandas(batch, schema=PIXEL_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


def frame_sample(
    media: DataFrame,
    every_k: int = 2,
    max_frames: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
    codec: str = "auto",
) -> DataFrame:
    """Frame sampling over animated payloads (U5-style fan-out: 1 media
    row -> N sampled-frame rows). Frame count comes from the header walk
    (kernels/raster.py); every ``every_k``-th frame up to ``max_frames``
    decodes for real (GIF LZW and APNG fdAT per-frame, fully composited;
    multi-page TIFF by IFD chain; still PNG/BMP/... = frame 0) and reports
    dims + channel means. The cap mirrors the reference's
    max-frames-per-request bound (model.py:344-351); non-animated or
    undecodable payloads simply emit fewer (or zero) rows — per-item
    isolation, never task failure."""
    from paddle_spark.kernels.pixels import (
        decode_apng_composited,
        decode_gif_composited,
        decode_tiff_pixels,
        decoder_for,
    )
    from paddle_spark.kernels.raster import decode_image_header

    decode = decoder_for(codec)  # validates / gates at plan construction
    if codec == "native":  # pragma: no cover - PIL absent in this runtime
        def decode_frame(p, fno):
            import io

            import numpy as np
            from PIL import Image

            im = Image.open(io.BytesIO(p))
            im.seek(fno)
            return np.asarray(im.convert("RGB"))
    else:
        def decode_frame(p, fno):
            # COMPOSITED frames: placement + transparency + disposal
            # replayed on the canvas, so a sampled frame of an optimized
            # animation is the image a viewer would show
            if p[:6] in (b"GIF87a", b"GIF89a"):
                return decode_gif_composited(p, frame=fno)
            if p[:8] == b"\x89PNG\r\n\x1a\n" and b"acTL" in p:
                apng = decode_apng_composited(p, frame=fno)
                if apng is not None:
                    return apng
            if p[:4] in (b"II*\x00", b"MM\x00*"):
                # multi-page TIFF: pages are independent IFDs (no
                # composition semantics), one decode per sampled page
                return decode_tiff_pixels(p, ifd=fno)
            return decode(p) if fno == 0 else None

    src = media.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def batch(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    p = bytes(payload) if payload is not None else None
                    if not p:
                        continue
                    meta = decode_image_header(p)
                    n = int(meta["n_frames"]) if meta else 1
                    for fno in list(range(0, n, every_k))[:max_frames]:
                        img = decode_frame(p, fno)
                        if img is None:
                            continue
                        h, w = img.shape[:2]
                        # gray / gray+alpha frames normalize to 3 channels
                        # first, so 1-channel decodes report means too
                        from paddle_spark.kernels.pixels import to_3ch

                        m = to_3ch(img).reshape(-1, 3).mean(axis=0)
                        rows.append(
                            (
                                int(mid), int(fno), int(w), int(h),
                                round(float(m[0]), 6),
                                round(float(m[1]), 6),
                                round(float(m[2]), 6),
                            )
                        )
                except Exception:  # per-item isolation
                    continue
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_no", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return src.mapInPandas(batch, schema=FRAME_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("bits", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("duration_ms", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("peak", T.DoubleType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def audio_stats(media: DataFrame, id_col: str = "media_id",
                payload_col: str = "payload") -> DataFrame:
    """Audio feature extraction over WAV binary columns — the audio
    analog of pixel_stats: decode PCM (kernels/riffav.decode_wav),
    report rate/channels/bits/sample count plus duration, RMS and peak
    of the normalized signal. Arrow-batched mapInPandas, map-only plan,
    per-item isolation (T5: non-WAV/garbage -> decode_ok=false rows).
    Neural audio embeddings remain the documented swap point, exactly
    like the image feature vectors."""
    from paddle_spark.kernels.riffav import audio_features

    src = media.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def batch(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    p = bytes(payload) if payload is not None else None
                    f = audio_features(p)
                except Exception:  # per-item isolation
                    f = None
                if f is None:
                    rows.append((int(mid), 0, 0, 0, 0, 0.0, 0.0, 0.0, False))
                else:
                    rows.append((
                        int(mid), f["sample_rate"], f["channels"], f["bits"],
                        f["n_samples"], f["duration_ms"], f["rms"], f["peak"],
                        True,
                    ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "sample_rate", "channels", "bits", "n_samples",
                "duration_ms", "rms", "peak", "decode_ok",
            ])

    return src.mapInPandas(batch, schema=AUDIO_SCHEMA)


CONTAINER_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("format", T.StringType(), False),
    T.StructField("duration_ms", T.DoubleType(), True),
    T.StructField("n_tracks", T.LongType(), False),
    T.StructField("width", T.LongType(), True),
    T.StructField("height", T.LongType(), True),
    T.StructField("decode_ok", T.BooleanType(), False),
])


def container_meta(media: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload") -> DataFrame:
    """Container-level a/v metadata over binary columns: tries the AVI
    walk (kernels/riffav.avi_meta), ISO-BMFF (kernels/bmff.mp4_meta) and
    EBML/Matroska (kernels/ebml.webm_meta) in magic order and reports
    the shared (format, duration_ms, n_tracks, width, height) schema —
    what a crawl pipeline filters on before deciding to ship a payload
    to a codec fleet. Arrow-batched mapInPandas, map-only plan,
    per-item isolation (garbage -> decode_ok=false)."""
    from paddle_spark.kernels.bmff import mp4_meta
    from paddle_spark.kernels.ebml import webm_meta
    from paddle_spark.kernels.riffav import avi_meta

    src = media.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def _avi(p):
        m = avi_meta(p)
        if m is None:
            return None
        return {"format": "avi",
                "duration_ms": m["n_frames"] * m["us_per_frame"] / 1000.0,
                "n_tracks": 1,  # the minimal walk reports the vids stream
                "width": m["width"], "height": m["height"]}

    def batch(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = None
                try:
                    p = bytes(payload) if payload is not None else None
                    meta = _avi(p) or mp4_meta(p) or webm_meta(p)
                except Exception:  # per-item isolation
                    meta = None
                if meta is None:
                    rows.append((int(mid), "unknown", None, 0, None, None, False))
                else:
                    rows.append((
                        int(mid), meta["format"],
                        None if meta["duration_ms"] is None
                        else float(meta["duration_ms"]),
                        int(meta["n_tracks"]),
                        meta["width"], meta["height"], True,
                    ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "format", "duration_ms", "n_tracks",
                "width", "height", "decode_ok",
            ])

    return src.mapInPandas(batch, schema=CONTAINER_SCHEMA)


def video_frames(
    media: DataFrame,
    every_k: int = 1,
    max_frames: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
    codec: str = "auto",
) -> DataFrame:
    """Video frame sampling over AVI/MJPEG binary columns — the video
    side of frame_sample's fan-out (1 media row -> N sampled frames):
    walk the movi chunk list (kernels/riffav.avi_frames), decode every
    ``every_k``-th frame payload through the SAME pixel codec switch the
    image path uses (MJPEG frames are complete JPEGs ->
    kernels/jpeg.py under codec='python'), report dims + channel means.
    ``codec`` resolves at plan construction; same cap semantics and
    per-item isolation as frame_sample. Frame payloads sniff their own
    codec: JPEG SOI -> the pixel codec switch (MJPEG), else BI_RGB raw
    DIB frames decode directly (uncompressed AVI)."""
    from paddle_spark.kernels.pixels import decoder_for, to_3ch
    from paddle_spark.kernels.riffav import (
        avi_frames,
        avi_video_format,
        decode_dib_frame,
    )

    decode = decoder_for(codec)  # validates / gates at plan construction
    src = media.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def batch(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    p = bytes(payload) if payload is not None else None
                    frames = avi_frames(p)
                    vf = avi_video_format(p) if frames else None
                    raw_ok = vf is not None and vf["compression"] == 0
                    for fno in list(range(0, len(frames), every_k))[:max_frames]:
                        fb = frames[fno]
                        if fb[:3] == b"\xff\xd8\xff":
                            img = decode(fb)
                        elif raw_ok:
                            img = decode_dib_frame(
                                fb, vf["width"], vf["height"], vf["bpp"]
                            )
                        else:
                            img = decode(fb)
                        if img is None:
                            continue
                        h, w = img.shape[:2]
                        m = to_3ch(img).reshape(-1, 3).mean(axis=0)
                        rows.append((
                            int(mid), int(fno), int(w), int(h),
                            round(float(m[0]), 6),
                            round(float(m[1]), 6),
                            round(float(m[2]), 6),
                        ))
                except Exception:  # per-item isolation
                    continue
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_no", "width", "height",
                "mean_r", "mean_g", "mean_b",
            ])

    return src.mapInPandas(batch, schema=FRAME_SCHEMA)


EXIF_SCHEMA = (
    "media_id long, has_exif boolean, orientation long, make string, "
    "model string, datetime string, exif_width long, exif_height long, "
    "iso long, f_number double, exposure_time double, "
    "gps_lat double, gps_lon double"
)


def exif_meta(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """EXIF metadata extraction over JPEG/TIFF payloads (kernels/exif.py —
    APP1 walk + IFD chain, public EXIF 2.32/TIFF 6.0). Map-only
    Arrow-batched mapInPandas with per-item isolation (T5): payloads
    without EXIF (or garbage) yield has_exif=false rows with null fields,
    never task failures. The GPS columns double as a PII-audit signal for
    the safety family — embedded capture locations are exactly what a
    published corpus must strip. Orientation feeds the same
    quarter-turn normalization the scanned-OCR branch applies."""
    from paddle_spark.kernels.exif import parse_exif

    src = media.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def batch(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    r = parse_exif(
                        bytes(payload) if payload is not None else None
                    )
                except Exception:
                    r = None
                if r is None:
                    rows.append((int(mid), False) + (None,) * 11)
                    continue
                rows.append((
                    int(mid), True,
                    int(r["orientation"]) if r["orientation"] is not None else None,
                    r["make"], r["model"], r["datetime"],
                    int(r["exif_width"]) if r["exif_width"] is not None else None,
                    int(r["exif_height"]) if r["exif_height"] is not None else None,
                    int(r["iso"]) if r["iso"] is not None else None,
                    r["f_number"], r["exposure_time"],
                    r["gps_lat"], r["gps_lon"],
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "has_exif", "orientation", "make", "model",
                "datetime", "exif_width", "exif_height", "iso",
                "f_number", "exposure_time", "gps_lat", "gps_lon",
            ])

    return src.mapInPandas(batch, schema=EXIF_SCHEMA)

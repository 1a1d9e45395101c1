"""RIFF-family audio/video containers: WAV (PCM) and AVI (MJPEG) — pure
Python/NumPy, Spark-free like every kernel.

Closes the audio/video half of the multimodal surface with REAL
containers instead of digest stubs: a WAV decoder for PCM samples
(audio feature extraction — RMS/peak/duration) and an AVI walker that
yields per-frame payloads (MJPEG frames decode through the from-scratch
JPEG decoder, kernels/jpeg.py — so video frame-sampling reuses the same
pixel path as images). The reference has no audio path; this is part of
the training-data-pipeline mandate (multimodal columns with typed
metadata + real Spark plumbing). Neural audio embeddings remain the
documented swap point, exactly like image embeddings.

Scope (graceful degradation, never an exception escaping the decoders):
- WAV: RIFF/WAVE, 'fmt ' PCM (format tag 1), 8-bit unsigned or 16-bit
  signed LE, any channel count; samples normalize to float64 in
  [-1, 1) as frames x channels.
- AVI: RIFF/'AVI ', LIST walk ('hdrl' avih for frame count/dims/rate,
  'movi' for '##db'/'##dc' frame chunks). Codec-agnostic at this layer:
  frame payloads return as bytes; MJPEG frames start with the JPEG SOI
  marker and decode via kernels/pixels.decode_pixels.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_SAMPLES = 1 << 26  # bounded-memory cap, same policy as the pixel codecs


def _riff_chunks(p: bytes, start: int, end: int):
    """Yield (fourcc, body_offset, body_size) over a RIFF chunk run."""
    off = start
    while off + 8 <= end:
        tag = p[off : off + 4]
        (size,) = struct.unpack("<I", p[off + 4 : off + 8])
        if off + 8 + size > end:
            return
        yield tag, off + 8, size
        off += 8 + size + (size & 1)


def decode_wav(p: bytes | None) -> dict | None:
    """Parse a PCM WAV payload.

    Returns ``{"sample_rate", "channels", "bits", "n_samples",
    "samples"}`` where ``samples`` is (n_frames, channels) float64 in
    [-1, 1) — 8-bit unsigned as (v-128)/128, 16/24/32-bit signed LE as
    v / 2^(bits-1) — or None for non-WAV / non-PCM / malformed payloads.
    """
    if not p or len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    fmt = None
    data = None
    for tag, off, size in _riff_chunks(p, 12, min(len(p), 12 + 8 + struct.unpack("<I", p[4:8])[0])):
        if tag == b"fmt " and size >= 16:
            fmt = struct.unpack("<HHIIHH", p[off : off + 16])
        elif tag == b"data":
            data = p[off : off + size]
    if fmt is None or data is None:
        return None
    audio_format, channels, rate, _brate, _balign, bits = fmt
    g711 = {7: ulaw_to_float, 6: alaw_to_float}.get(audio_format)
    if g711 is not None:
        bits = 8
    elif audio_format != 1:
        return None
    if channels == 0 or rate == 0 or bits not in (8, 16, 24, 32):
        return None
    bytes_per_frame = channels * bits // 8
    n_frames = len(data) // bytes_per_frame
    if n_frames == 0 or n_frames * channels > MAX_SAMPLES:
        return None
    data = data[: n_frames * bytes_per_frame]
    if g711 is not None:
        raw = g711(np.frombuffer(data, dtype=np.uint8))
    elif bits == 16:
        raw = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 24:
        # sign-extend packed 3-byte little-endian into int32
        b3 = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
        v = np.where(v & 0x800000, v - (1 << 24), v)
        raw = v.astype(np.float64) / float(1 << 23)
    elif bits == 32:
        raw = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(1 << 31)
    else:
        raw = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "bits": int(bits),
        "n_samples": int(n_frames),
        "samples": raw.reshape(n_frames, channels),
    }


def _pcm_to_float(data: bytes, bits: int, signed: bool, big: bool) -> np.ndarray | None:
    """Normalize integer PCM bytes to float64 in [-1, 1)."""
    if bits == 8:
        v = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
        return (v - 128.0) / 128.0 if not signed else (
            np.frombuffer(data, dtype=np.int8).astype(np.float64) / 128.0
        )
    if bits == 16:
        return np.frombuffer(data, dtype=">i2" if big else "<i2").astype(np.float64) / 32768.0
    if bits == 24:
        b3 = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        if big:
            v = (b3[:, 0] << 16) | (b3[:, 1] << 8) | b3[:, 2]
        else:
            v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
        v = np.where(v & 0x800000, v - (1 << 24), v)
        return v.astype(np.float64) / float(1 << 23)
    if bits == 32:
        return np.frombuffer(data, dtype=">i4" if big else "<i4").astype(np.float64) / float(1 << 31)
    return None


def ulaw_to_float(b: np.ndarray) -> np.ndarray:
    """G.711 mu-law expansion (the public algorithmic formula, validated
    code-for-code against CPython's audioop.ulaw2lin): byte -> linear
    16-bit -> float64 / 32768."""
    u = (~b) & 0xFF
    sign = u & 0x80
    mant = (u & 0x0F).astype(np.int32)
    x = (((mant << 3) + 0x84) << ((u >> 4) & 0x07)) - 0x84
    return np.where(sign, -x, x).astype(np.float64) / 32768.0


def alaw_to_float(b: np.ndarray) -> np.ndarray:
    """G.711 A-law expansion (public formula, audioop.alaw2lin parity)."""
    a = b ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = (a & 0x0F).astype(np.int32)
    x = np.where(exp == 0, (mant << 4) + 8,
                 ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(sign, x, -x).astype(np.float64) / 32768.0


def decode_au(p: bytes | None) -> dict | None:
    """Sun AU (.snd): 24-byte big-endian header (magic, data offset,
    data size, encoding, rate, channels) + samples. Linear PCM encodings
    2/3/4/5 (8-bit SIGNED / 16 / 24 / 32-bit BE) and the G.711 codecs
    (1 = mu-law, 27 = A-law) decode; float encodings return None."""
    if not p or len(p) < 24 or p[:4] != b".snd":
        return None
    off, size, enc, rate, channels = struct.unpack(">IIIII", p[4:24])
    g711 = {1: ulaw_to_float, 27: alaw_to_float}.get(enc)
    bits = {1: 8, 2: 8, 3: 16, 4: 24, 5: 32, 27: 8}.get(enc)
    if bits is None or channels == 0 or rate == 0 or off < 24 or off > len(p):
        return None
    data = p[off:] if size in (0xFFFFFFFF, 0) else p[off : off + size]
    bpf = channels * bits // 8
    n_frames = len(data) // bpf
    if n_frames == 0 or n_frames * channels > MAX_SAMPLES:
        return None
    data = data[: n_frames * bpf]
    if g711 is not None:
        raw = g711(np.frombuffer(data, dtype=np.uint8))
    else:
        raw = _pcm_to_float(data, bits, signed=True, big=True)
    return {
        "sample_rate": int(rate), "channels": int(channels),
        "bits": bits, "n_samples": int(n_frames),
        "samples": raw.reshape(n_frames, channels),
    }


def _f80(b: bytes) -> float:
    """80-bit IEEE 754 extended float (AIFF sample rate), big-endian."""
    if len(b) < 10:
        return 0.0
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    sign = -1.0 if se & 0x8000 else 1.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def decode_aiff(p: bytes | None) -> dict | None:
    """AIFF (FORM/AIFF big-endian IFF): COMM (channels, frames, bits,
    80-bit-float rate) + SSND (offset/block header then PCM, signed BE
    at every bit depth incl. 8-bit). AIFC compressed variants return
    None (only 'NONE' AIFC passes)."""
    if not p or len(p) < 12 or p[:4] != b"FORM" or p[8:12] not in (b"AIFF", b"AIFC"):
        return None
    is_aifc = p[8:12] == b"AIFC"
    comm = ssnd = None
    off = 12
    n = len(p)
    while off + 8 <= n:  # IFF chunks: big-endian sizes, even padding
        tag = p[off : off + 4]
        (size,) = struct.unpack(">I", p[off + 4 : off + 8])
        body = p[off + 8 : off + 8 + size]
        if tag == b"COMM":
            comm = body
        elif tag == b"SSND":
            ssnd = body
        off += 8 + size + (size & 1)
    if comm is None or ssnd is None or len(comm) < 18 or len(ssnd) < 8:
        return None
    channels, n_frames, bits = struct.unpack(">HIH", comm[:8])
    rate = _f80(comm[8:18])
    comp = comm[18:22] if is_aifc and len(comm) >= 22 else b"NONE"
    g711 = {b"ulaw": ulaw_to_float, b"ULAW": ulaw_to_float,
            b"alaw": alaw_to_float, b"ALAW": alaw_to_float}.get(comp)
    if comp not in (b"NONE", b"sowt") and g711 is None:
        return None  # float/other compressed AIFC: out of scope
    little = comp == b"sowt"
    if g711 is not None:
        bits = 8  # stored width; COMM says 16 for the decoded width
    if channels == 0 or rate <= 0 or bits not in (8, 16, 24, 32):
        return None
    (data_off,) = struct.unpack(">I", ssnd[:4])
    data = ssnd[8 + data_off :]
    bpf = channels * bits // 8
    nf = min(n_frames, len(data) // bpf)
    if nf == 0 or nf * channels > MAX_SAMPLES:
        return None
    data = data[: nf * bpf]
    if g711 is not None:
        raw = g711(np.frombuffer(data, dtype=np.uint8))
    else:
        raw = _pcm_to_float(data, bits, signed=True, big=not little)
    return {
        "sample_rate": int(round(rate)), "channels": int(channels),
        "bits": int(bits), "n_samples": int(nf),
        "samples": raw.reshape(nf, channels),
    }


def decode_audio(p: bytes | None) -> dict | None:
    """Container dispatch: WAV (RIFF/WAVE), Sun AU (.snd), AIFF/AIFC."""
    if not p or len(p) < 12:
        return None
    if p[:4] == b"RIFF":
        return decode_wav(p)
    if p[:4] == b".snd":
        return decode_au(p)
    if p[:4] == b"FORM":
        return decode_aiff(p)
    return None


def audio_features(p: bytes | None) -> dict | None:
    """Deterministic audio features from decoded PCM: duration (ms,
    float), RMS and peak of the normalized signal across all channels —
    the audio analog of pixel_stats' channel means (the neural-embedding
    swap point stays a swap point). Dispatches WAV / AU / AIFF."""
    wav = decode_audio(p)
    if wav is None:
        return None
    s = wav["samples"]
    return {
        "sample_rate": wav["sample_rate"],
        "channels": wav["channels"],
        "bits": wav["bits"],
        "n_samples": wav["n_samples"],
        "duration_ms": 1000.0 * wav["n_samples"] / wav["sample_rate"],
        "rms": float(np.sqrt(np.mean(s * s))),
        "peak": float(np.max(np.abs(s))),
    }


def avi_meta(p: bytes | None) -> dict | None:
    """Main AVI header: {"n_frames", "width", "height", "us_per_frame"}
    from the 'avih' chunk inside LIST hdrl; None for non-AVI payloads."""
    if not p or len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        return None
    for tag, off, size in _riff_chunks(p, 12, len(p)):
        if tag == b"LIST" and p[off : off + 4] == b"hdrl":
            for t2, o2, s2 in _riff_chunks(p, off + 4, off + size):
                if t2 == b"avih" and s2 >= 40:
                    us, _mbps, _pad, _flags, total, _init, _streams, _buf, w, h = (
                        struct.unpack("<10I", p[o2 : o2 + 40])
                    )
                    return {
                        "n_frames": int(total),
                        "width": int(w),
                        "height": int(h),
                        "us_per_frame": int(us),
                    }
    return None


def avi_video_format(p: bytes | None) -> dict | None:
    """The first 'vids' stream's strf BITMAPINFOHEADER:
    ``{"width", "height", "bpp", "compression"}`` (compression 0 =
    BI_RGB raw DIB frames; b'MJPG' = motion JPEG). None when the AVI
    carries no parseable video stream header."""
    if not p or len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        return None
    for tag, off, size in _riff_chunks(p, 12, len(p)):
        if tag == b"LIST" and p[off : off + 4] == b"hdrl":
            for t2, o2, s2 in _riff_chunks(p, off + 4, off + size):
                if t2 == b"LIST" and p[o2 : o2 + 4] == b"strl":
                    is_vids = False
                    for t3, o3, s3 in _riff_chunks(p, o2 + 4, o2 + s2):
                        if t3 == b"strh" and s3 >= 8:
                            is_vids = p[o3 : o3 + 4] == b"vids"
                        elif t3 == b"strf" and s3 >= 20 and is_vids:
                            _sz, w, h, _planes, bpp = struct.unpack(
                                "<IiiHH", p[o3 : o3 + 16]
                            )
                            comp = p[o3 + 16 : o3 + 20]
                            return {
                                "width": int(w),
                                "height": int(h),
                                "bpp": int(bpp),
                                "compression": (
                                    0 if comp == b"\x00\x00\x00\x00" else comp
                                ),
                            }
    return None


def decode_dib_frame(
    data: bytes, width: int, height: int, bpp: int = 24
) -> np.ndarray | None:
    """One uncompressed BI_RGB frame ('00db' chunk payload) -> (H, W, 3)
    RGB: bottom-up rows, BGR byte order, stride padded to 4 bytes —
    the same layout the BMP decoder handles, minus the file header."""
    if bpp != 24 or width <= 0 or height <= 0 or width * height > MAX_SAMPLES:
        return None
    stride = (width * 3 + 3) & ~3
    if len(data) < stride * height:
        return None
    rows = np.frombuffer(data[: stride * height], dtype=np.uint8).reshape(
        height, stride
    )
    bgr = rows[::-1, : width * 3].reshape(height, width, 3)
    return np.ascontiguousarray(bgr[:, :, ::-1])


def avi_frames(p: bytes | None) -> list[bytes]:
    """All frame payloads ('##db' raw / '##dc' compressed chunks of the
    LIST movi), in stream order. MJPEG frames are complete JPEGs."""
    if not p or len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        return []
    out: list[bytes] = []
    for tag, off, size in _riff_chunks(p, 12, len(p)):
        if tag == b"LIST" and p[off : off + 4] == b"movi":
            for t2, o2, s2 in _riff_chunks(p, off + 4, off + size):
                if t2[2:4] in (b"db", b"dc") and t2[:2].isdigit():
                    out.append(p[o2 : o2 + s2])
    return out


def avi_frame(p: bytes | None, k: int) -> bytes | None:
    frames = avi_frames(p)
    return frames[k] if 0 <= k < len(frames) else None

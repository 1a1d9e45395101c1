"""Compressed-audio container metadata: MP3 / Ogg / FLAC headers.

Web crawls carry compressed audio (MP3, Ogg Vorbis/Opus, FLAC) far more
often than PCM; full psychoacoustic decode is out of scope (the neural/
codec swap point, like lossy VP8 before libwebp), but the HEADERS are
simple public structures and give a pipeline what it actually filters
on: format, sample rate, channel count, and a duration estimate. This is
the audio analog of kernels/raster.py (image header decode without
pixels).

- MP3: optional ID3v2 tag skip (syncsafe size), first MPEG audio frame
  header (11-bit sync, version/layer bits, the public Layer-III bitrate
  and sample-rate tables from ISO 11172-3/13818-3), CBR duration
  estimate = audio bytes * 8 / bitrate.
- Ogg: 'OggS' page walk; the first packet identifies Vorbis
  ('\\x01vorbis': channels u8, rate u32le) or Opus ('OpusHead'); exact
  duration from the LAST page's granule position (PCM samples for
  Vorbis; 48 kHz ticks minus pre-skip for Opus).
- FLAC: 'fLaC' + STREAMINFO (sample rate 20 bits, channels 3 bits + 1,
  total samples 36 bits) — exact duration.

Failures degrade to None, same policy as every sibling decoder.
"""

from __future__ import annotations

import struct

# ISO 11172-3 / 13818-3 Layer III bitrate tables (kbps; index 1..14)
_BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_BITRATE_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_RATES_V1 = [44100, 48000, 32000]
_RATES_V2 = [22050, 24000, 16000]
_RATES_V25 = [11025, 12000, 8000]


def _id3v2_size(p: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe 28-bit size)."""
    if len(p) < 10 or p[:3] != b"ID3":
        return 0
    sz = (p[6] << 21) | (p[7] << 14) | (p[8] << 7) | p[9]
    return 10 + sz


def mp3_meta(p: bytes | None) -> dict | None:
    """First MPEG Layer-III frame header after any ID3v2 tag."""
    if not p or len(p) < 4:
        return None
    i = _id3v2_size(p)
    end = min(len(p) - 4, i + 4096)  # sync must appear near the tag end
    while i <= end:
        if p[i] == 0xFF and (p[i + 1] & 0xE0) == 0xE0:
            b1, b2, b3 = p[i + 1], p[i + 2], p[i + 3]
            version = (b1 >> 3) & 0x03   # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
            layer = (b1 >> 1) & 0x03     # 1 = Layer III
            br_idx = (b2 >> 4) & 0x0F
            sr_idx = (b2 >> 2) & 0x03
            if version != 1 and layer == 1 and 0 < br_idx < 15 and sr_idx < 3:
                if version == 3:
                    rate = _RATES_V1[sr_idx]
                    kbps = _BITRATE_V1_L3[br_idx]
                elif version == 2:
                    rate = _RATES_V2[sr_idx]
                    kbps = _BITRATE_V2_L3[br_idx]
                else:
                    rate = _RATES_V25[sr_idx]
                    kbps = _BITRATE_V2_L3[br_idx]
                channels = 1 if ((b3 >> 6) & 0x03) == 3 else 2
                audio_bytes = len(p) - i
                return {
                    "format": "mp3",
                    "sample_rate": rate,
                    "channels": channels,
                    "bitrate_kbps": kbps,
                    "est_duration_ms": round(audio_bytes * 8.0 / kbps, 3),
                }
        i += 1
    return None


def ogg_meta(p: bytes | None) -> dict | None:
    """Ogg Vorbis / Opus identification header + last-page granule."""
    if not p or len(p) < 28 or p[:4] != b"OggS":
        return None
    nseg = p[26]
    body = p[27 + nseg : 27 + nseg + 64]
    if body[:7] == b"\x01vorbis" and len(body) >= 16:
        channels = body[11]
        (rate,) = struct.unpack("<I", body[12:16])
        fmt, tick_rate, pre_skip = "ogg-vorbis", rate, 0
    elif body[:8] == b"OpusHead" and len(body) >= 14:
        channels = body[9]
        (pre_skip,) = struct.unpack("<H", body[10:12])
        (rate,) = struct.unpack("<I", body[12:16])
        fmt, tick_rate = "ogg-opus", 48000  # granule is always 48 kHz
    else:
        return None
    if channels == 0 or rate == 0:
        return None
    # exact duration: granule position of the LAST page
    last = p.rfind(b"OggS")
    dur_ms = None
    if last >= 0 and last + 14 <= len(p):
        (granule,) = struct.unpack("<q", p[last + 6 : last + 14])
        if granule > 0:
            ticks = granule - (pre_skip if fmt == "ogg-opus" else 0)
            dur_ms = round(1000.0 * max(ticks, 0) / tick_rate, 3)
    return {
        "format": fmt,
        "sample_rate": int(rate),
        "channels": int(channels),
        "bitrate_kbps": None,
        "est_duration_ms": dur_ms,
    }


def flac_meta(p: bytes | None) -> dict | None:
    """FLAC STREAMINFO (always the first metadata block)."""
    if not p or len(p) < 42 or p[:4] != b"fLaC":
        return None
    if (p[4] & 0x7F) != 0:  # first block must be STREAMINFO (type 0)
        return None
    si = p[8:42]
    v = int.from_bytes(si[10:18], "big")
    rate = v >> 44
    channels = ((v >> 41) & 0x07) + 1
    total = v & ((1 << 36) - 1)
    if rate == 0:
        return None
    return {
        "format": "flac",
        "sample_rate": int(rate),
        "channels": int(channels),
        "bitrate_kbps": None,
        "est_duration_ms": round(1000.0 * total / rate, 3) if total else None,
    }


def audio_container_meta(p: bytes | None) -> dict | None:
    """Dispatch over the compressed-audio magics (the PCM containers go
    through kernels/riffav.decode_audio instead)."""
    if not p or len(p) < 4:
        return None
    if p[:4] == b"OggS":
        return ogg_meta(p)
    if p[:4] == b"fLaC":
        return flac_meta(p)
    if p[:3] == b"ID3" or (p[0] == 0xFF and (p[1] & 0xE0) == 0xE0):
        return mp3_meta(p)
    return None

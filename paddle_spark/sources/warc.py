"""WARC ingestion: Common Crawl's native container format -> pages rows.

The input table (url, warc_ts, html, text, lang) is Common-Crawl-shaped
(SURVEY §1.2); this source produces it straight from WARC files — the
actual distribution format of Common Crawl — with nothing but the stdlib:

- WARC/1.0+ records (warcinfo/request/response/...), header block +
  ``Content-Length``-delimited payload, CRLF framing (ISO 28500).
- ``.warc.gz`` per-record gzip members (the CC layout: each record its
  own member, so any byte range is independently decompressible) via
  ``zlib`` streaming with multi-member restart.
- response records carry an HTTP/1.1 envelope; we split status+headers
  from the body (the page bytes that feed extraction).

Scale shape: one WARC file is one task unit — ``spark.read.format
("binaryFile")`` lists the files, ``mapInPandas`` parses each file's
bytes into N page rows (UDTF-style fan-out, U5). CC WARCs are ~1 GB;
on a real cluster feed paths through ``warc_paths_to_pages`` instead so
workers stream from storage rather than shipping whole files through the
row — both entry points share the same parser.
"""

from __future__ import annotations

import io
import zlib
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress all gzip members (CC stores one record per member)."""
    out = []
    d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
    buf = data
    while buf:
        out.append(d.decompress(buf))
        if d.eof:
            buf = d.unused_data.lstrip(b"\x00")
            d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        else:
            break
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # first line = version / status
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    return headers


def _warc_ts(value: str | None):
    if not value:
        return None
    try:
        return (
            datetime.strptime(value, "%Y-%m-%dT%H:%M:%SZ")
            .replace(tzinfo=timezone.utc)
            .replace(tzinfo=None)
        )
    except ValueError:
        return None


def iter_warc_records(data: bytes):
    """Yield (headers: dict, payload: bytes) per WARC record. Total
    function over malformed input — stops at the first unparseable
    boundary instead of raising (partial files happen in the wild)."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = _gunzip_members(data)
        except zlib.error:
            return
    stream = io.BytesIO(data)
    while True:
        # skip inter-record CRLFs
        line = stream.readline()
        while line in (b"\r\n", b"\n"):
            line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            return  # lost framing: stop, don't guess
        header_lines = [line]
        while True:
            line = stream.readline()
            if not line:
                return
            if line in (b"\r\n", b"\n"):
                break
            header_lines.append(line)
        headers = _parse_headers(b"".join(header_lines))
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        payload = stream.read(length)
        if len(payload) < length:
            return  # truncated file: drop the partial record
        yield headers, payload


def _http_body(payload: bytes) -> bytes:
    """Split the HTTP/1.1 response envelope off a response payload."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4 :]
    return payload


def warc_records_to_rows(data: bytes) -> list[tuple]:
    """(url, warc_ts, html, text, lang) rows from one WARC/WET file's
    bytes. ``response`` records (WARC: raw page behind an HTTP envelope)
    fill ``html``; ``conversion`` records (WET: Common Crawl's
    pre-extracted UTF-8 text) fill ``text`` instead — the same table shape
    serves both distribution formats."""
    rows = []
    for headers, payload in iter_warc_records(data):
        wtype = headers.get("warc-type")
        url = headers.get("warc-target-uri")
        ts = _warc_ts(headers.get("warc-date"))
        if wtype == "response":
            rows.append((url, ts, _http_body(payload), None, None))
        elif wtype == "conversion":  # WET text record
            rows.append(
                (url, ts, None, payload.decode("utf-8", errors="replace"), None)
            )
    return rows


def read_warc_pages(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC files -> pages DataFrame via binaryFile + mapInPandas fan-out.

    Ships each file's bytes through one row — fine for test/moderate
    files; for 1 GB CC archives prefer ``warc_paths_to_pages``.
    """
    files = spark.read.format("binaryFile").load(path_glob).select("content")

    def fan_out(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for data in pdf["content"]:
                try:
                    rows.extend(warc_records_to_rows(bytes(data)))
                except Exception:  # per-file isolation (T5)
                    continue
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return files.mapInPandas(fan_out, schema=PAGES_SCHEMA)


def warc_paths_to_pages(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Path-per-row variant: workers open files themselves (streaming from
    local/posix storage), so a 1 GB archive never rides through a row."""
    src = spark.createDataFrame([(p,) for p in paths], "path string")

    def fan_out(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for p in pdf["path"]:
                try:
                    with open(p, "rb") as f:
                        rows.extend(warc_records_to_rows(f.read()))
                except Exception:  # per-file isolation
                    continue
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return src.repartition(max(len(paths), 1)).mapInPandas(
        fan_out, schema=PAGES_SCHEMA
    )

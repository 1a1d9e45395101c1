from paddle_spark.kernels.classify import classify_payload


def test_magic_bytes():
    assert classify_payload(b"%PDF-1.4\nxx") == "pdf"
    assert classify_payload(b"<!DOCTYPE html><html>") == "html"
    assert classify_payload(b"  \n\t <html>") == "html"
    assert classify_payload(b"\x89PNG\r\n\x1a\nrest") == "image"
    assert classify_payload(b"\xff\xd8\xffdata") == "image"
    assert classify_payload(b"GIF89aabc") == "image"
    assert classify_payload(b"II*\x00tiff") == "image"
    # BMP: 'BM' + valid DIB header size at offset 14 -> image; 'BM' with
    # text after it (no NUL-bearing size field) must stay garbage
    from paddle_spark.sources.synth import make_bmp
    import numpy as np

    assert classify_payload(
        make_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
    ) == "image"
    assert classify_payload(b"BMW dealers near me, plain text") == "garbage"
    assert classify_payload(b"BM\x00\x00") == "garbage"  # truncated
    assert classify_payload(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "image"
    assert classify_payload(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "audio"
    assert classify_payload(b"RIFF\x00\x00\x00\x00AVI LIST") == "video"
    assert classify_payload(b"RIFF\x00\x00\x00\x00ACONanih") == "garbage"
    assert classify_payload(b"RIFF\x00\x00") == "garbage"  # truncated form
    assert classify_payload(b".sndxxxxxxxxxxxx") == "audio"
    assert classify_payload(b"FORM\x00\x00\x00\x00AIFF") == "audio"
    assert classify_payload(b"FORM\x00\x00\x00\x00AIFC") == "audio"
    assert classify_payload(b"FORM\x00\x00\x00\x00ILBM") == "garbage"
    assert classify_payload(b"\x00\x01binary") == "garbage"
    assert classify_payload(b"") == "garbage"
    assert classify_payload(None) == "garbage"


def test_column_twin_parity(spark):
    """payload_kind_col must agree with the Python kernel — including
    payloads whose first byte is \\n/\\t before <!DOCTYPE (ltrim-vs-lstrip
    divergence fixed per round-1 advice)."""
    from paddle_spark.functions import payload_kind_col
    from pyspark.sql import functions as F

    payloads = [
        b"%PDF-1.4\nxx", b"<!DOCTYPE html><html>", b"  \n\t <html>",
        b"\n<!DOCTYPE html><body>x</body>", b"\t\r\n<html>", b"\x0b\x0c<html>",
        b"\x89PNG\r\n\x1a\nrest", b"\xff\xd8\xffdata", b"GIF89aabc",
        b"II*\x00tiff", b"\x00\x01binary", b"", b"plain text not html",
        b"BM" + bytes(12) + (40).to_bytes(4, "little") + bytes(8),
        b"BMW dealers near me, plain text", b"BM\x00\x00",
        b"RIFF\x00\x00\x00\x00WEBPVP8 ", b"RIFF\x00\x00\x00\x00WAVEfmt ",
        b"RIFF\x00\x00\x00\x00AVI LIST", b"RIFF\x00\x00\x00\x00ACONanih",
        b"RIFF\x00\x00",
        b".sndxxxxxxxxxxxx", b"FORM\x00\x00\x00\x00AIFF",
        b"FORM\x00\x00\x00\x00AIFC", b"FORM\x00\x00\x00\x00ILBM", b"FORM\x00",
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i int, html binary"
    )
    got = {r["i"]: r["k"] for r in df.select("i", payload_kind_col(F.col("html")).alias("k")).collect()}
    for i, p in enumerate(payloads):
        assert got[i] == classify_payload(p), (i, p)


def test_column_twin_never_raises_on_binary_soup(spark):
    """payload_kind_col on arbitrary invalid-UTF-8 binary must classify,
    not raise (the prefix decode is latin-1, not UTF-8 — a UTF-8 decode
    raises under ANSI mode and would fail a whole job on one soup row)."""
    import random

    from pyspark.sql import functions as F

    from paddle_spark.functions import payload_kind_col

    rng = random.Random(9)
    payloads = [bytes(rng.randrange(256) for _ in range(40)) for _ in range(64)]
    payloads += [b"\xff\xfe\xfd<html>", b"\x80\x81<", b"\xc3("]  # invalid utf-8
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i int, html binary"
    )
    got = {r["i"]: r["k"] for r in df.select(
        "i", payload_kind_col(F.col("html")).alias("k")).collect()}
    for i, p in enumerate(payloads):
        assert got[i] == classify_payload(p), (i, p[:8])

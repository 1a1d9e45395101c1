from paddle_spark.kernels.classify import classify_payload


def test_magic_bytes():
    assert classify_payload(b"%PDF-1.4\nxx") == "pdf"
    assert classify_payload(b"<!DOCTYPE html><html>") == "html"
    assert classify_payload(b"  \n\t <html>") == "html"
    assert classify_payload(b"\x89PNG\r\n\x1a\nrest") == "image"
    assert classify_payload(b"\xff\xd8\xffdata") == "image"
    assert classify_payload(b"GIF89aabc") == "image"
    assert classify_payload(b"II*\x00tiff") == "image"
    assert classify_payload(b"\x00\x01binary") == "garbage"
    assert classify_payload(b"") == "garbage"
    assert classify_payload(None) == "garbage"

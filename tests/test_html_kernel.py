"""HTML branch unit tests: density scoring, drop regions, normalization."""

from paddle_spark.config import ExtractConfig
from paddle_spark.kernels.html import extract_html, normalize_text, segment_blocks

LONG = "This paragraph definitely has enough characters to clear the keep threshold."


def doc(body: str) -> bytes:
    # empty head: head subtrees are drop regions and would add a dropped
    # block if they contained text (covered by test_article_kept_nav_dropped)
    return f"<html><head></head><body>{body}</body></html>".encode()


def test_article_kept_nav_dropped():
    text, kept, dropped = extract_html(
        doc(
            '<nav><a href="/a">one</a> <a href="/b">two</a> link farm here</nav>'
            f"<article><p>{LONG}</p></article>"
            "<footer>contact us legal privacy terms</footer>"
        )
    )
    assert text == LONG
    assert kept == 1
    assert dropped == 2  # nav subtree + footer subtree


def test_link_density_drop():
    # block that is mostly links -> dropped
    links = " ".join(f'<a href="/{i}">linktext{i} more words</a>' for i in range(6))
    text, kept, dropped = extract_html(
        doc(f"<p>{links}</p><p>{LONG}</p>")
    )
    assert text == LONG
    assert kept == 1 and dropped == 1


def test_inline_link_kept():
    body = f"{LONG} See <a href='/x'>here</a> for details and context."
    text, kept, _ = extract_html(doc(f"<p>{body}</p>"))
    assert "See here for details" in text
    assert kept == 1


def test_short_block_dropped():
    text, kept, dropped = extract_html(doc(f"<p>tiny</p><p>{LONG}</p>"))
    assert text == LONG
    assert dropped == 1


def test_heading_kept_short():
    text, kept, _ = extract_html(doc(f"<h1>Title Here</h1><p>{LONG}</p>"))
    assert text == f"Title Here\n{LONG}"
    assert kept == 2


def test_entities_and_whitespace():
    text, _, _ = extract_html(
        doc(f"<p>{LONG} A &amp; B &lt;tag&gt;   spaced&nbsp;out</p>")
    )
    assert "A & B <tag> spaced\xa0out" in text or "A & B <tag> spaced out" in text


def test_img_figures_ignored():
    text, kept, _ = extract_html(
        doc(f'<div><img src="x.jpg"></div><p>{LONG}</p><div><img src="y.jpg"/></div>')
    )
    assert text == LONG


def test_script_style_stripped():
    text, _, _ = extract_html(
        doc(
            "<script>var x = '<p>fake</p>';</script>"
            "<style>p { color: red }</style>"
            f"<p>{LONG}</p>"
        )
    )
    assert text == LONG
    assert "fake" not in text and "color" not in text


def test_nested_divs_segment():
    text, kept, _ = extract_html(
        doc(f"<div><div><p>{LONG}</p></div><div><p>{LONG} Second one.</p></div></div>")
    )
    assert text.count("\n") == 1
    assert kept == 2


def test_normalize_text():
    assert normalize_text("  a \n\t b  ") == "a b"
    assert normalize_text("x &amp; y") == "x & y"


def test_config_thresholds():
    cfg = ExtractConfig(min_block_chars=1000)
    text, kept, dropped = extract_html(doc(f"<p>{LONG}</p>"), cfg)
    assert text == "" and kept == 0 and dropped == 1


def test_determinism():
    payload = doc(f"<p>{LONG}</p><h2>Head</h2><p>{LONG} more.</p>")
    a = extract_html(payload)
    b = extract_html(payload)
    assert a == b


def test_malformed_html_no_crash():
    # unclosed tags, stray brackets, bad utf-8
    payload = b"<html><body><p>" + LONG.encode() + b" \xff\xfe <div><p>unclosed"
    text, kept, dropped = extract_html(payload)
    assert LONG.split()[0] in text


def test_charset_sniffing():
    from paddle_spark.kernels.html import decode_html, sniff_charset

    latin = (
        '<html><head><meta charset="ISO-8859-1"></head><body>'
        f"<p>{LONG} Café señor</p></body></html>"
    ).encode("latin-1")
    assert sniff_charset(latin) == "latin-1"
    assert "Café señor" in decode_html(latin)
    text, _, _ = extract_html(latin)
    assert "Café señor" in text

    # http-equiv variant
    httpeq = (
        "<html><head><meta http-equiv=\"Content-Type\" "
        "content=\"text/html; charset=windows-1252\"></head><body>"
        f"<p>{LONG} quote \x93x\x94</p></body></html>"
    ).encode("latin-1")
    assert sniff_charset(httpeq) == "cp1252"
    text, _, _ = extract_html(httpeq)
    assert "“x”" in text  # cp1252 smart quotes decoded

    # undeclared invalid utf-8 falls back to latin-1 (never lost)
    raw = b"<html><body><p>" + LONG.encode() + b" caf\xe9</p></body></html>"
    text, _, _ = extract_html(raw)
    assert "caf\xe9" in text

    # unknown charset name is ignored gracefully
    bogus = (
        '<html><head><meta charset="not-a-real-charset"></head><body>'
        f"<p>{LONG}</p></body></html>"
    ).encode()
    assert sniff_charset(bogus) is None
    assert extract_html(bogus)[0] == LONG


def test_blocks_have_monotonic_ids():
    blocks = segment_blocks(doc(f"<p>{LONG}</p><p>{LONG}</p><nav>x y z w</nav>"))
    ids = [b.block_id for b in blocks]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)

"""HTML branch: main-content extraction via block density scoring.

A from-scratch Readability/trafilatura-class boilerplate stripper:

1. Tokenize the HTML byte stream with one compiled regex (comments,
   script/style islands, tags, text runs).
2. Segment into *blocks* at block-level element boundaries, tracking
   (a) the drop-region stack (nav/footer/aside/... subtrees are
   boilerplate wholesale — the HTML analog of the reference label filter,
   /root/reference/server/model_repo/layout-parsing/1/layout_captioning.py:240-241),
   (b) the number of characters inside ``<a>`` links per block.
3. Score each block: keep when it clears a minimum length and its
   link-density (link chars / chars) stays under a threshold — the HTML
   analog of the reference's per-class score thresholds
   (/root/reference/server/pipeline_config.yaml:84-104).
4. Normalize text (entity unescape, whitespace collapse, trim) — the exact
   shape of the reference's strip chain
   (/root/reference/imageCaptioningExperiments/bbox_text_matcher.py:127-146:
   strip tags, collapse whitespace, trim).
5. Assemble kept blocks in document order joined by ``"\\n"`` — the HTML
   analog of the per-page block concat
   (/root/reference/client/testScript.py:144-150).

Deliberately dependency-free: ``lxml`` is not guaranteed in the runtime, and
byte-identity across the single-process golden generator and Spark workers
requires one implementation. If lxml ever becomes available it can be slotted
in behind ``_HAVE_LXML`` as a faster tokenizer with identical semantics.
"""

from __future__ import annotations

import html as _htmlmod
import re
from dataclasses import dataclass

from paddle_spark.config import DEFAULT_CONFIG, ExtractConfig

try:  # pragma: no cover - optional fast path, absent in this runtime
    import lxml  # noqa: F401

    _HAVE_LXML = True
except ImportError:  # pragma: no cover
    _HAVE_LXML = False


# One token per match: comment | script island | style island | tag | text.
# The payload is decoded ONCE (utf-8, errors=replace) and tokenized as str:
# per-token byte decodes were ~25 % of kernel time.
_TOKEN_RE = re.compile(
    r"<!--.*?-->"
    r"|<script\b[^>]*>.*?</script\s*>"
    r"|<style\b[^>]*>.*?</style\s*>"
    r"|<[^>]*>"
    r"|[^<]+",
    re.DOTALL | re.IGNORECASE,
)

_TAG_NAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)")
_WS_RE = re.compile(r"\s+")

# Island-marker sentinel: a private-use codepoint that decode_html scrubs
# from every input, so a marker tag like "< 12/>" cannot be forged by
# wild/adversarial pages (it is also unmatchable by _TAG_NAME_RE, which only
# admits ASCII-letter tag names).
_MARK = "\ue000"

# Elements whose entire subtree is boilerplate or non-text.
DROP_TAGS = frozenset(
    {
        "script", "style", "noscript", "template", "svg", "iframe",
        "head", "nav", "aside", "footer", "header", "form", "button",
        "select", "datalist", "canvas", "object", "embed",
    }
)

# Elements that open/close a text block.
BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "body",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "ul", "ol", "li", "dl", "dt", "dd",
        "table", "thead", "tbody", "tr", "td", "th",
        "blockquote", "pre", "figure", "figcaption", "br", "hr",
    }
)

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Void elements never get pushed on the drop stack.
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "meta", "link", "input", "area", "base",
     "col", "embed", "source", "track", "wbr"}
)


@dataclass
class Block:
    """One segmented candidate block."""

    block_id: int
    tag: str            # block tag that opened it ("" for top-level text)
    text: str           # normalized text
    n_chars: int
    n_link_chars: int
    kept: bool
    drop_reason: str    # "", "drop_region", "short", "link_density"

    @property
    def link_density(self) -> float:
        return self.n_link_chars / self.n_chars if self.n_chars else 0.0


def normalize_text(raw: str) -> str:
    """Entity unescape + whitespace collapse + trim (strip-chain parity,
    bbox_text_matcher.py:137-146). unescape() is the identity on text
    without '&', so the guard changes nothing but the cost."""
    if "&" in raw:
        raw = _htmlmod.unescape(raw)
    # " ".join(split()) ≡ _WS_RE.sub(" ", raw).strip() — str.split() and
    # re's \s both use Py_UNICODE_ISSPACE, and the join re-inserts one
    # space per gap; measured ~4x faster (this is the hottest line of the
    # HTML branch), fuzz-pinned equivalent incl. \x1c-\x1f and NBSP.
    return " ".join(raw.split())


# Charset sniffing: Common-Crawl payloads are NOT all utf-8. We honor the
# in-document declaration (meta charset= / http-equiv content-type) from
# the first 1024 bytes, normalize aliases, and fall back utf-8 -> latin-1
# (latin-1 never fails, so no document is lost to decoding).
_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)
_CHARSET_ALIASES = {
    "utf8": "utf-8",
    "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "latin1": "latin-1",
    "windows-1252": "cp1252",
    "win-1252": "cp1252",
    "ascii": "utf-8",       # ascii is a utf-8 subset
    "us-ascii": "utf-8",
}


def sniff_charset(payload: bytes) -> str | None:
    """Declared charset from the document head, normalized; None if absent
    or unknown to Python's codec registry."""
    m = _CHARSET_RE.search(payload[:1024])
    if not m:
        return None
    name = m[1].decode("ascii", errors="replace").lower()
    name = _CHARSET_ALIASES.get(name, name)
    try:
        b"x".decode(name)
    except (LookupError, UnicodeDecodeError):
        return None
    return name


def decode_html(payload: bytes) -> str:
    """Decode page bytes: declared charset first, then utf-8, then latin-1
    (total function — never raises).

    The private-use sentinel ``_MARK`` is scrubbed from the decoded text so
    the fast path's island markers (``<\\ue000N/>``) can never collide with
    wild/adversarial input. Both ``segment_blocks`` and
    ``segment_blocks_reference`` decode through here, so the scrub cannot
    break fast-vs-reference equivalence.
    """
    charset = sniff_charset(payload)
    if charset:
        try:
            return payload.decode(charset).replace(_MARK, "")
        except UnicodeDecodeError:
            pass
    try:
        return payload.decode("utf-8").replace(_MARK, "")
    except UnicodeDecodeError:
        return payload.decode("latin-1").replace(_MARK, "")


# Fast-path island pre-removal: comments and script/style vanish silently
# (exactly the reference path's behavior); each boilerplate subtree
# (head/nav/footer/...) is replaced by a numbered sentinel marker so the
# main loop can emit its drop-block at the right position with the right
# char count. One C-level regex pass removes ~half the tokens the Python
# loop would otherwise touch. Same-tag nesting inside an island (a <form>
# in a <form>) ends the island early — the leftover close tag then flows
# through the stack logic below, so unbalanced documents stay safe.
_DROP_ISLAND_TAGS = (
    "head|nav|aside|footer|header|form|svg|iframe|noscript|template|button"
    "|select|datalist|canvas|object|embed"
)
_DROP_ISLAND_RE = re.compile(
    rf"<({_DROP_ISLAND_TAGS})\b[^>]*>.*?</\1\s*>",
    re.DOTALL | re.IGNORECASE,
)
_SILENT_ISLAND_RE = re.compile(
    r"<!--.*?-->|<(script|style)\b[^>]*>.*?</\1\s*>", re.DOTALL | re.IGNORECASE
)


def _island_text_chars(island: str) -> int:
    """Non-whitespace text-run chars inside an island. Comments and
    script/style content were already removed by the global silent pass
    (parity with the token-loop counting, which skips those tokens)."""
    n = 0
    for part in island.split("<"):
        t = part.partition(">")[2]
        if t and not t.isspace():
            n += len(t)
    return n


def segment_blocks(payload: bytes, cfg: ExtractConfig = DEFAULT_CONFIG) -> list[Block]:
    """Tokenize + segment + score. Returns blocks in document order.

    Equivalent to ``segment_blocks_reference`` (cross-checked in tests) but
    ~1.5-2x faster via the island pre-pass above.
    """
    doc = decode_html(payload)

    # pass 1 (C-level, no callback): comments + script/style vanish with
    # NO separator — exactly how the reference loop skips those tokens
    # leaving neighbors adjacent. Removing them globally FIRST also means
    # a comment/script that straddles a drop-island boundary (e.g. a
    # '</nav>' inside a script string) can no longer truncate the island —
    # tightening fast-vs-reference equivalence on adversarial nesting.
    doc = _SILENT_ISLAND_RE.sub("", doc)

    islands: list[tuple[str, int]] = []

    def _replace(m: re.Match) -> str:
        # drop islands always produce a marker: entering a boilerplate
        # subtree must end the open block even when the subtree is empty
        islands.append((m[1].lower(), _island_text_chars(m[0])))
        return f"<{_MARK}{len(islands) - 1}/>"

    # pass 2: boilerplate subtrees -> numbered markers
    doc = _DROP_ISLAND_RE.sub(_replace, doc)
    blocks: list[Block] = []
    drop_depth = 0          # nesting depth inside DROP_TAGS subtrees
    link_depth = 0          # nesting depth inside <a>
    cur_parts: list[str] = []
    cur_link_chars = 0
    cur_tag = ""
    block_id = 0
    drop_chars = 0          # text chars seen inside the current drop subtree
    drop_tag = ""

    def flush(next_tag: str) -> None:
        nonlocal cur_parts, cur_link_chars, cur_tag, block_id
        if cur_parts:
            raw = "".join(cur_parts)
            text = normalize_text(raw)
            if text:
                n = len(text)
                # Link chars were counted pre-normalization; clamp so the
                # density ratio stays in [0, 1] after collapse.
                nl = min(cur_link_chars, n)
                blk = _score_block(block_id, cur_tag, text, n, nl, cfg)
                blocks.append(blk)
                block_id += 1
        cur_parts = []
        cur_link_chars = 0
        cur_tag = next_tag

    for m in _TOKEN_RE.finditer(doc):
        tok = m[0]
        if tok[0] != "<":
            # text run
            if drop_depth == 0:
                if not tok.isspace():
                    cur_parts.append(tok)
                    if link_depth > 0:
                        cur_link_chars += len(normalize_text(tok))
                else:
                    cur_parts.append(" ")
            elif not tok.isspace():
                drop_chars += len(tok)
            continue
        if tok[:4] == "<!--":
            continue
        lower4 = tok[:4].lower()
        if lower4 == "<scr" or lower4 == "<sty":
            # whole script/style island consumed by the tokenizer
            continue
        if tok[1:2] == _MARK:
            # pre-removed boilerplate island: ends any open block and emits
            # the drop-block at its document position (no block if empty).
            # _MARK cannot occur in input (decode_html scrubs it), so the
            # index is always ours — the parse is still guarded for safety.
            if drop_depth == 0:
                flush("")
                try:
                    tag, n = islands[int(tok[2:-2])]
                except (ValueError, IndexError):  # pragma: no cover
                    continue
                if n > 0:
                    blocks.append(
                        Block(block_id, tag, "", n, 0, False, "drop_region")
                    )
                    block_id += 1
            continue

        nm = _TAG_NAME_RE.match(tok)
        if nm is None:  # doctype, malformed
            continue
        name = nm[1].lower()
        closing = tok[1] == "/"
        self_closing = tok.rstrip()[-2:-1] == "/" or name in _VOID_TAGS

        if name == "a":
            if closing:
                link_depth = max(0, link_depth - 1)
            elif not self_closing:
                link_depth += 1
            continue

        if name in DROP_TAGS:
            if closing:
                drop_depth = max(0, drop_depth - 1)
                if drop_depth == 0 and drop_chars > 0:
                    # record the boilerplate subtree as one dropped block
                    blocks.append(
                        Block(block_id, drop_tag, "", drop_chars, 0, False,
                              "drop_region")
                    )
                    block_id += 1
                    drop_chars = 0
            elif not self_closing:
                # entering a boilerplate subtree ends any open block
                if drop_depth == 0:
                    flush("")
                    drop_tag = name
                drop_depth += 1
            continue

        if name in BLOCK_TAGS and drop_depth == 0:
            if closing or name in ("br", "hr"):
                flush("")
            else:
                flush(name)
    flush("")
    return blocks


def segment_blocks_reference(
    payload: bytes, cfg: ExtractConfig = DEFAULT_CONFIG
) -> list[Block]:
    """Single-pass token-loop implementation (no island pre-pass).

    Kept as the executable spec for ``segment_blocks``: tests assert both
    produce identical blocks over the synthetic corpus and crafted cases.
    Known divergence (fast path documented above): same-tag nesting inside
    a boilerplate island, and text chars of islands nested in unbalanced
    drop regions — both outside the corpus and the scored-output contract.
    """
    doc = decode_html(payload)
    blocks: list[Block] = []
    drop_depth = 0
    link_depth = 0
    cur_parts: list[str] = []
    cur_link_chars = 0
    cur_tag = ""
    block_id = 0
    drop_chars = 0
    drop_tag = ""

    def flush(next_tag: str) -> None:
        nonlocal cur_parts, cur_link_chars, cur_tag, block_id
        if cur_parts:
            text = normalize_text("".join(cur_parts))
            if text:
                n = len(text)
                nl = min(cur_link_chars, n)
                blocks.append(_score_block(block_id, cur_tag, text, n, nl, cfg))
                block_id += 1
        cur_parts = []
        cur_link_chars = 0
        cur_tag = next_tag

    for m in _TOKEN_RE.finditer(doc):
        tok = m[0]
        if tok[0] != "<":
            if drop_depth == 0:
                if not tok.isspace():
                    cur_parts.append(tok)
                    if link_depth > 0:
                        cur_link_chars += len(normalize_text(tok))
                else:
                    cur_parts.append(" ")
            elif not tok.isspace():
                drop_chars += len(tok)
            continue
        if tok[:4] == "<!--":
            continue
        lower4 = tok[:4].lower()
        if lower4 == "<scr" or lower4 == "<sty":
            continue
        nm = _TAG_NAME_RE.match(tok)
        if nm is None:
            continue
        name = nm[1].lower()
        closing = tok[1] == "/"
        self_closing = tok.rstrip()[-2:-1] == "/" or name in _VOID_TAGS

        if name == "a":
            if closing:
                link_depth = max(0, link_depth - 1)
            elif not self_closing:
                link_depth += 1
            continue

        if name in DROP_TAGS:
            if closing:
                drop_depth = max(0, drop_depth - 1)
                if drop_depth == 0 and drop_chars > 0:
                    blocks.append(
                        Block(block_id, drop_tag, "", drop_chars, 0, False,
                              "drop_region")
                    )
                    block_id += 1
                    drop_chars = 0
            elif not self_closing:
                if drop_depth == 0:
                    flush("")
                    drop_tag = name
                drop_depth += 1
            continue

        if name in BLOCK_TAGS and drop_depth == 0:
            if closing or name in ("br", "hr"):
                flush("")
            else:
                flush(name)
    flush("")
    return blocks


def _score_block(
    block_id: int, tag: str, text: str, n: int, n_link: int, cfg: ExtractConfig
) -> Block:
    density = n_link / n if n else 0.0
    if tag in HEADING_TAGS:
        if n < cfg.min_heading_chars:
            return Block(block_id, tag, text, n, n_link, False, "short")
        if density > cfg.max_heading_link_density:
            return Block(block_id, tag, text, n, n_link, False, "link_density")
        return Block(block_id, tag, text, n, n_link, True, "")
    if n < cfg.min_block_chars:
        return Block(block_id, tag, text, n, n_link, False, "short")
    if density > cfg.max_link_density:
        return Block(block_id, tag, text, n, n_link, False, "link_density")
    return Block(block_id, tag, text, n, n_link, True, "")


def extract_html(
    payload: bytes, cfg: ExtractConfig = DEFAULT_CONFIG
) -> tuple[str, int, int]:
    """Extract main text from an HTML payload.

    Returns ``(text, n_blocks_kept, n_blocks_dropped)``. Kept blocks are
    joined with a single newline in document order (A2 analog,
    testScript.py:144-150 — one content line per block).
    """
    blocks = segment_blocks(payload, cfg)
    kept = [b.text for b in blocks if b.kept]
    n_kept = len(kept)
    n_dropped = len(blocks) - n_kept
    return "\n".join(kept), n_kept, n_dropped


# --- HTML table recognition (the table-pipeline analog for the HTML
# modality; the PDF/layout modality's counterpart is kernels/table.py,
# whose markdown contract — header row, | --- | separator, \| escaping —
# this renderer reproduces exactly) ---

_TABLE_RE = re.compile(r"(?is)<table\b[^>]*>(.*?)</table\s*>")
_TR_RE = re.compile(r"(?is)<tr\b[^>]*>(.*?)</tr\s*>")
_CELL_RE = re.compile(r"(?is)<t([dh])\b[^>]*>(.*?)</t[dh]\s*>")
_ANY_TAG_RE = re.compile(r"(?s)<[^>]*>")


def html_tables(payload: bytes) -> list[str]:
    """GitHub pipe-table markdown for every ``<table>`` in the document,
    in document order.

    Scope (documented): explicit ``</td>``/``</tr>`` closers (the
    overwhelmingly common machine-generated case); nested tables degrade
    to the inner table's rows inside the outer cell text; colspan/rowspan
    attributes are ignored (cells land in source order, rows pad to the
    widest). Script/style/comment islands are removed before matching so
    a ``</table>`` inside a script string cannot truncate a table.
    Ragged rows right-pad with empty cells; a table with no cells yields
    nothing.
    """
    doc = decode_html(payload)
    doc = _SILENT_ISLAND_RE.sub("", doc)
    out: list[str] = []
    for tm in _TABLE_RE.finditer(doc):
        grid: list[list[str]] = []
        for rm in _TR_RE.finditer(tm[1]):
            cells = _CELL_RE.findall(rm[1])
            if not cells:
                continue
            grid.append(
                [normalize_text(_ANY_TAG_RE.sub(" ", c)) for _, c in cells]
            )
        if not grid:
            continue
        width = max(len(r) for r in grid)
        esc = [
            [t.replace("|", "\\|") for t in r] + [""] * (width - len(r))
            for r in grid
        ]
        lines = ["| " + " | ".join(esc[0]) + " |"]
        lines.append("| " + " | ".join(["---"] * width) + " |")
        for row in esc[1:]:
            lines.append("| " + " | ".join(row) + " |")
        out.append("\n".join(lines))
    return out

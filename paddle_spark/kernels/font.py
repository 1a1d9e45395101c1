"""Deterministic 5x7 bitmap font: the "glyph model" for the scanned-page
branch.

The reference's scanned-document dataflow is image -> detector boxes ->
ordered text (model.py:300-337: render, detect, sort, concat). Its
detector and recognizer are neural; this module is the deterministic
stand-in that lets the SAME geometry chain (connected components ->
line grouping -> reading order -> per-line decode) run end-to-end from
raw pixels with a closed-form oracle: pages are rendered from this font,
and "OCR" is exact template matching against it.

Design constraints (all pinned by tests/test_scan.py):
- every glyph's ink is ONE 8-connected component, so one detector
  component == one glyph;
- all tight glyph patterns are pairwise distinct, so template matching
  is unambiguous;
- glyphs are drawn on a fixed advance grid (CELL_W x CELL_H), so word
  spacing is exactly recoverable from component geometry.

Charset: A-Z 0-9 '.' '-' ',' and space (space renders no ink; the
decoder reconstructs it from the advance gap).
"""

from __future__ import annotations

import numpy as np

GLYPH_W = 5
GLYPH_H = 7
CELL_W = GLYPH_W + 1   # 1 px advance gap keeps neighboring glyphs apart
CELL_H = GLYPH_H + 1
LINE_PITCH = CELL_H + 2  # blank rows between lines: lines never y-overlap

# fmt: off
FONT: dict[str, tuple[str, ...]] = {
    "A": (".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "B": ("####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."),
    "C": (".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."),
    "D": ("####.", "#...#", "#...#", "#...#", "#...#", "#...#", "####."),
    "E": ("#####", "#....", "#....", "####.", "#....", "#....", "#####"),
    "F": ("#####", "#....", "#....", "####.", "#....", "#....", "#...."),
    "G": (".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".###."),
    "H": ("#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "I": (".###.", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "J": ("..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."),
    "K": ("#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"),
    "L": ("#....", "#....", "#....", "#....", "#....", "#....", "#####"),
    "M": ("#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"),
    "N": ("#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"),
    "O": (".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "P": ("####.", "#...#", "#...#", "####.", "#....", "#....", "#...."),
    "Q": (".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"),
    "R": ("####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"),
    "S": (".####", "#....", "#....", ".###.", "....#", "....#", "####."),
    "T": ("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
    "U": ("#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "V": ("#...#", "#...#", "#...#", "#...#", "#...#", ".#.#.", "..#.."),
    "W": ("#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"),
    "X": ("#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"),
    "Y": ("#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."),
    "Z": ("#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"),
    "0": (".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
    "1": ("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "2": (".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"),
    "3": (".###.", "#...#", "....#", "..##.", "....#", "#...#", ".###."),
    "4": ("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
    "5": ("#####", "#....", "####.", "....#", "....#", "#...#", ".###."),
    "6": (".###.", "#....", "#....", "####.", "#...#", "#...#", ".###."),
    "7": ("#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."),
    "8": (".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
    "9": (".###.", "#...#", "#...#", ".####", "....#", "....#", ".###."),
    ".": (".....", ".....", ".....", ".....", ".....", ".##..", ".##.."),
    "-": (".....", ".....", ".....", ".###.", ".....", ".....", "....."),
    ",": (".....", ".....", ".....", ".....", "..#..", "..#..", ".#..."),
}
# fmt: on


def glyph_array(ch: str) -> np.ndarray:
    """(GLYPH_H, GLYPH_W) bool ink mask for a charset glyph."""
    rows = FONT[ch]
    return np.array([[c == "#" for c in r] for r in rows], dtype=bool)


def _tight(mask: np.ndarray) -> tuple[bytes, int, int, int, int]:
    """(pattern bytes, h, w, top offset, left offset) of the tight crop."""
    ys, xs = np.nonzero(mask)
    y0, y1 = int(ys.min()), int(ys.max()) + 1
    x0, x1 = int(xs.min()), int(xs.max()) + 1
    sub = np.ascontiguousarray(mask[y0:y1, x0:x1])
    return sub.tobytes(), y1 - y0, x1 - x0, y0, x0


def _build_lut() -> dict[tuple[bytes, int, int], tuple[str, int, int]]:
    lut: dict[tuple[bytes, int, int], tuple[str, int, int]] = {}
    for ch in FONT:
        pat, h, w, top, left = _tight(glyph_array(ch))
        key = (pat, h, w)
        if key in lut:  # pragma: no cover - pinned distinct by tests
            raise ValueError(f"duplicate glyph pattern: {ch} vs {lut[key][0]}")
        lut[key] = (ch, top, left)
    return lut


# tight-pattern -> (char, top offset, left offset in the cell)
GLYPH_LUT = _build_lut()


def render_page(
    lines: list[str], margin: int = 4, ink: int = 0, bg: int = 255
) -> np.ndarray:
    """Render text lines onto a grayscale page (uint8, bg background, ink
    glyphs) on the fixed advance grid: char k of line j has its cell
    origin at (margin + j*LINE_PITCH, margin + k*CELL_W)."""
    n_lines = len(lines)
    widest = max((len(ln) for ln in lines), default=0)
    h = 2 * margin + max(1, n_lines * LINE_PITCH)
    w = 2 * margin + max(1, widest * CELL_W)
    img = np.full((h, w), bg, dtype=np.uint8)
    for j, ln in enumerate(lines):
        y0 = margin + j * LINE_PITCH
        for k, ch in enumerate(ln):
            if ch == " ":
                continue
            g = glyph_array(ch)
            x0 = margin + k * CELL_W
            img[y0 : y0 + GLYPH_H, x0 : x0 + GLYPH_W][g] = ink
    return img


def match_glyph(mask: np.ndarray) -> tuple[str, int, int] | None:
    """Exact template match of a component's tight ink mask. Returns
    (char, cell_y_origin_offset, cell_x_origin_offset) — subtract the
    offsets from the component's bbox origin to recover the cell origin —
    or None for ink that is not a known glyph."""
    m = np.ascontiguousarray(mask.astype(bool))
    h, w = m.shape
    hit = GLYPH_LUT.get((m.tobytes(), h, w))
    if hit is None:
        return None
    ch, top, left = hit
    return ch, top, left

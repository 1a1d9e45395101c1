"""Scanned-page branch: raw pixels -> detector boxes -> ordered text.

This closes the reference's core dataflow end-to-end from pixels
(model.py:300-337: render page -> layout/OCR detection -> box sort ->
text concat) with a deterministic detector in place of the neural one:

    decode_pixels -> binarize -> 8-connected components (run-based
    union-find) -> speck filter (detection threshold) -> glyph boxes
    -> group_lines (W2, the SAME kernel the PDF layout branch uses)
    -> reading_order (W1) over line boxes -> exact template-match
    "OCR" against kernels/font.py -> per-line text -> "\n" concat (A2).

Pure NumPy + pure Python, Spark-free — the Spark layer
(operators/scanned.py) only batches pages through mapInPandas, which is
what keeps the per-url output invariant under any partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from paddle_spark.config import DEFAULT_CONFIG, ExtractConfig
from paddle_spark.kernels.font import CELL_W, match_glyph
from paddle_spark.kernels.geometry import group_lines, reading_order

# Components with fewer ink pixels than this are detection noise (specks);
# the smallest real glyphs ('-' and ',') carry exactly 3 px.
MIN_INK_PX = 3


def connected_components(
    binary: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """8-connected components of a bool ink mask via horizontal-run
    union-find: runs are extracted per row vectorized, and two runs in
    adjacent rows union when their column ranges touch within 1 px
    (covers diagonal adjacency). O(rows + runs α(runs)) — the run count
    is ~#glyph strokes, far below the pixel count.

    Returns (labels, boxes, counts): an (H, W) int32 label map (-1 =
    background, else component id), an (N, 4) float64 array of
    [x1, y1, x2, y2) half-open bboxes, and an (N,) int64 ink-pixel count
    per component. Component ids are ordered by first appearance
    (row-major), deterministically.
    """
    h, w = binary.shape
    # Run extraction across ALL rows with one np.diff: zero-pad a column
    # on both sides so no run crosses a row boundary, flatten, diff once.
    # (VERDICT r4: the previous per-row Python loop was ~2200 iterations
    # at reference page size; this is three vector ops.)
    stride = w + 2
    padded = np.zeros((h, stride), dtype=np.int8)
    padded[:, 1:-1] = binary
    d = np.diff(padded.ravel())
    starts_f = np.flatnonzero(d == 1) + 1    # flat index of first ink px
    ends_f = np.flatnonzero(d == -1) + 1     # flat index one past last
    run_row = (starts_f // stride).astype(np.int64)
    run_lo = starts_f % stride - 1           # row coords, inclusive
    run_hi = ends_f % stride - 1             # row coords, exclusive
    n = len(run_row)
    if n == 0:
        return (
            np.full((h, w), -1, dtype=np.int32),
            np.empty((0, 4), dtype=np.float64),
            np.empty((0,), dtype=np.int64),
        )

    # Adjacent-row touching pairs, vectorized: runs are globally sorted by
    # (row, lo), so row-composite keys row*stride+coord are monotone and
    # two searchsorted calls find, for every run i in row y, the
    # contiguous range [a_i, b_i) of row y-1 runs with
    # run_hi[k] >= lo_i (8-adjacency: touch within 1 px) and
    # run_lo[k] <= hi_i. Rows y-1 with no runs yield empty ranges.
    key_hi = run_row * stride + run_hi
    key_lo = run_row * stride + run_lo
    a = np.searchsorted(key_hi, (run_row - 1) * stride + run_lo, side="left")
    b = np.searchsorted(key_lo, (run_row - 1) * stride + run_hi, side="right")
    cnt = np.maximum(b - a, 0)
    total = int(cnt.sum())
    pair_i = np.repeat(np.arange(n), cnt)
    pair_k = np.repeat(a, cnt) + (
        np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    )

    # Union-find over the touching pairs — the only per-item Python loop
    # left, and it is O(pairs α) with pairs ~ #glyph strokes, far below
    # the pixel count.
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, k in zip(pair_i.tolist(), pair_k.tolist()):
        ri, rk = find(i), find(k)
        if ri != rk:
            # root at the smaller index keeps first-appearance order
            if ri < rk:
                parent[rk] = ri
            else:
                parent[ri] = rk

    # Resolve every run's root by pointer jumping (vectorized; depth
    # halves per pass), then number components by first appearance:
    # roots are the smallest run index of each component and runs are
    # row-major, so sorting the unique roots IS first-appearance order.
    par = np.asarray(parent, dtype=np.int64)
    while True:
        nxt = par[par]
        if np.array_equal(nxt, par):
            break
        par = nxt
    roots, comp = np.unique(par, return_inverse=True)
    n_comp = len(roots)

    lens = run_hi - run_lo
    counts = np.bincount(comp, weights=lens, minlength=n_comp).astype(np.int64)
    x1 = np.full(n_comp, np.inf)
    y1 = np.full(n_comp, np.inf)
    x2 = np.full(n_comp, -np.inf)
    y2 = np.full(n_comp, -np.inf)
    np.minimum.at(x1, comp, run_lo)
    np.minimum.at(y1, comp, run_row)
    np.maximum.at(x2, comp, run_hi)
    np.maximum.at(y2, comp, run_row + 1)
    boxes = np.stack([x1, y1, x2, y2], axis=1).astype(np.float64)

    # Label map: one fancy assignment over all ink pixels (flat index =
    # row*w + col, cols expanded per run with the same repeat trick).
    flat = np.full(h * w, -1, dtype=np.int32)
    px_cols = np.repeat(run_lo, lens) + (
        np.arange(int(lens.sum())) - np.repeat(np.cumsum(lens) - lens, lens)
    )
    flat[np.repeat(run_row, lens) * w + px_cols] = np.repeat(
        comp.astype(np.int32), lens
    )
    return flat.reshape(h, w), boxes, counts


@dataclass(frozen=True)
class ScanResult:
    text: str | None
    n_glyphs: int
    n_lines: int
    n_dropped: int
    parse_ok: bool
    error: str | None = None
    # (x1, y1, x2, y2) per emitted text line, aligned with
    # text.split("\n") — the detector boxes for diagnostic fan-out
    line_boxes: tuple = ()


def _decode_line(
    members: np.ndarray,
    boxes: np.ndarray,
    labels: np.ndarray,
) -> tuple[str, int]:
    """Decode one text line: members sorted by x, exact template match per
    component, spaces recovered from the advance grid. Returns
    (line text, n unmatched components)."""
    order = members[np.lexsort((boxes[members, 1], boxes[members, 0]))]
    out: list[str] = []
    prev_cell_x: float | None = None
    unmatched = 0
    for ci in order:
        x1, y1, x2, y2 = boxes[ci]
        mask = labels[int(y1) : int(y2), int(x1) : int(x2)] == ci
        m = match_glyph(mask)
        if m is None:
            unmatched += 1
            continue
        ch, _top, left = m
        cell_x = x1 - left
        if prev_cell_x is not None:
            gap = int(round((cell_x - prev_cell_x) / CELL_W)) - 1
            if gap > 0:
                out.append(" " * gap)
        out.append(ch)
        prev_cell_x = cell_x
    return "".join(out), unmatched


def ocr_page_oriented(
    img: np.ndarray, cfg: ExtractConfig = DEFAULT_CONFIG, ink_threshold: int = 128
) -> tuple[int, ScanResult]:
    """Deterministic 0/90/180/270 orientation classify + OCR — the analog
    of the reference's doc_image_orientation module that runs before OCR
    (pipeline_config.yaml:264-272 ``use_doc_orientation_classify``, with
    PP-LCNet class labels 0/90/180/270): score all four quarter-turn
    candidates by recognized-glyph count from the SAME template-match
    chain and keep the argmax, ties to the smallest rotation (an upright
    page therefore reproduces plain ``ocr_page`` exactly — rotated
    variants of real glyphs don't match the upright templates, so the
    true orientation scores strictly highest on any page with asymmetric
    glyphs). Returns ``(k, result)`` where ``np.rot90(img, k)`` is the
    upright frame whose chain output is ``result``."""
    if img is None:
        return 0, ScanResult(None, 0, 0, 0, False, "no pixels")
    if img.ndim == 3:
        img = img[:, :, 0]
    best_k, best = 0, None
    for k in range(4):
        r = ocr_page(np.rot90(img, k) if k else img, cfg, ink_threshold)
        if best is None or r.n_glyphs > best.n_glyphs:
            best_k, best = k, r
    return best_k, best


def ocr_page(
    img: np.ndarray, cfg: ExtractConfig = DEFAULT_CONFIG, ink_threshold: int = 128
) -> ScanResult:
    """Full scanned-page chain over a decoded grayscale/RGB frame."""
    if img is None:
        return ScanResult(None, 0, 0, 0, False, "no pixels")
    if img.ndim == 3:  # luminance-free collapse: synth pages are gray
        img = img[:, :, 0]
    binary = img < ink_threshold
    labels, boxes, counts = connected_components(binary)
    keep = counts >= MIN_INK_PX
    n_dropped = int((~keep).sum())
    kept_idx = np.flatnonzero(keep)
    if len(kept_idx) == 0:
        return ScanResult("", 0, 0, n_dropped, True)
    kboxes = boxes[kept_idx]
    line_ids = group_lines(kboxes, cfg.line_overlap_threshold)
    n_lines = int(line_ids.max()) + 1
    # one bbox per line, ordered by the SAME reading-order kernel the PDF
    # layout branch uses (single-column pages degenerate to y-order)
    line_boxes = np.empty((n_lines, 4), dtype=np.float64)
    for li in range(n_lines):
        m = kboxes[line_ids == li]
        line_boxes[li] = [m[:, 0].min(), m[:, 1].min(), m[:, 2].max(), m[:, 3].max()]
    perm = reading_order(line_boxes, float(img.shape[1]), cfg)
    texts: list[str] = []
    out_boxes: list[tuple] = []
    unmatched = 0
    for li in perm:
        members = kept_idx[line_ids == li]
        t, u = _decode_line(members, boxes, labels)
        texts.append(t)
        out_boxes.append(tuple(float(v) for v in line_boxes[li]))
        unmatched += u
    return ScanResult(
        "\n".join(texts),
        int(len(kept_idx)) - unmatched,
        n_lines,
        n_dropped,
        unmatched == 0,
        None if unmatched == 0 else f"{unmatched} unrecognized components",
        tuple(out_boxes),
    )

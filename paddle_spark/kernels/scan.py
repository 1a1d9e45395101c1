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
    run_row: list[int] = []
    run_lo: list[int] = []
    run_hi: list[int] = []  # exclusive
    rows_runs: list[tuple[int, int]] = []  # (first run idx, n runs) per row
    b8 = binary.astype(np.int8)
    for y in range(h):
        d = np.diff(np.concatenate((np.zeros(1, np.int8), b8[y], np.zeros(1, np.int8))))
        starts = np.flatnonzero(d == 1)
        ends = np.flatnonzero(d == -1)
        rows_runs.append((len(run_row), len(starts)))
        run_row.extend([y] * len(starts))
        run_lo.extend(starts.tolist())
        run_hi.extend(ends.tolist())

    n = len(run_row)
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # root at the smaller index keeps first-appearance order
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    for y in range(1, h):
        s0, c0 = rows_runs[y - 1]
        s1, c1 = rows_runs[y]
        if c0 == 0 or c1 == 0:
            continue
        j = s0
        for i in range(s1, s1 + c1):
            lo, hi = run_lo[i], run_hi[i]
            # advance past prev-row runs that end before this run starts
            while j < s0 + c0 and run_hi[j] + 1 <= lo:
                j += 1
            k = j
            while k < s0 + c0 and run_lo[k] <= hi:  # touches within 1 px
                union(i, k)
                k += 1
            if k > j:
                k -= 1  # last touching run may also touch the next run
            j = k

    labels = np.full((h, w), -1, dtype=np.int32)
    comp_of_root: dict[int, int] = {}
    boxes: list[list[float]] = []
    counts: list[int] = []
    for i in range(n):
        r = find(i)
        c = comp_of_root.get(r)
        if c is None:
            c = len(boxes)
            comp_of_root[r] = c
            boxes.append([float(run_lo[i]), float(run_row[i]), float(run_hi[i]), float(run_row[i] + 1)])
            counts.append(0)
        b = boxes[c]
        b[0] = min(b[0], run_lo[i])
        b[1] = min(b[1], run_row[i])
        b[2] = max(b[2], run_hi[i])
        b[3] = max(b[3], run_row[i] + 1)
        counts[c] += run_hi[i] - run_lo[i]
        labels[run_row[i], run_lo[i] : run_hi[i]] = c
    return (
        labels,
        np.array(boxes, dtype=np.float64).reshape(-1, 4),
        np.array(counts, dtype=np.int64),
    )


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

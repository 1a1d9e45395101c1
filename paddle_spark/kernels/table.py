"""Table-structure assembly: detected cell boxes -> markdown/plain grid.

Reference analog: the SLANet table-structure module emits per-table HTML
that the markdown output carries as structured blocks
(/root/reference/server/pipeline_config.yaml:611-935
``use_table_recognition`` + SLANet_plus; the client's complete_document2.md
renders those blocks). Neural structure recognition is out of scope per
the north rule; this module re-expresses the deterministic ASSEMBLY step:
given a table block's detected cell boxes + cell texts, recover the
row/column grid — rows via the SAME y-overlap clustering the line grouper
uses (W2, kernels/geometry.group_lines) and columns via the x-interval
clustering the reading-order kernel uses (kernels/geometry._cluster_columns)
— and render a GitHub-style markdown table (first grid row = header), or a
tab-separated flatten for the plain-text output path.

Pure NumPy, Spark-free, same as every other kernel.
"""

from __future__ import annotations

import numpy as np

from paddle_spark.config import DEFAULT_CONFIG, ExtractConfig
from paddle_spark.kernels import geometry as G


def table_grid(
    cell_boxes: np.ndarray, cfg: ExtractConfig = DEFAULT_CONFIG
) -> tuple[np.ndarray, np.ndarray]:
    """Row and column ids for each cell box.

    Rows are y-overlap clusters (top-to-bottom ids), columns are
    x-interval clusters over ALL cells at once (left-to-right ids) so the
    columns of every row align even when some rows have missing cells —
    the "column x-interval clustering" grid detection.
    """
    rows = G.group_lines(cell_boxes, cfg.line_overlap_threshold)
    cols = G._cluster_columns(cell_boxes, cfg.column_overlap_threshold)
    return rows, cols


def _grid_texts(
    cell_boxes: np.ndarray, cell_texts: list[str], cfg: ExtractConfig
) -> list[list[str]]:
    rows, cols = table_grid(cell_boxes, cfg)
    n_rows = int(rows.max()) + 1
    n_cols = int(cols.max()) + 1
    grid: list[list[str]] = [["" for _ in range(n_cols)] for _ in range(n_rows)]
    # deterministic fill order: row, then column, then x within the slot
    order = np.lexsort((cell_boxes[:, 0], cols, rows))
    for i in order:
        r, c = int(rows[i]), int(cols[i])
        t = (cell_texts[i] or "").strip()
        grid[r][c] = f"{grid[r][c]} {t}".strip() if grid[r][c] else t
    return grid


def render_table(
    cells: list[dict],
    cfg: ExtractConfig = DEFAULT_CONFIG,
    markdown: bool = False,
) -> str:
    """Render a table block's detected cells.

    ``markdown=True``: GitHub-style pipe table — first grid row is the
    header, then the ``| --- |`` separator, then data rows; ``|`` inside
    cell text is escaped. ``markdown=False``: tab-separated rows (the
    plain-text flatten the ``=== PAGE n ===`` output path carries).
    Empty cells (missing detections in a grid slot) render as empty
    strings in both forms. Returns "" for a cell-less table.
    """
    if not cells:
        return ""
    boxes = np.array(
        [[c["x1"], c["y1"], c["x2"], c["y2"]] for c in cells], dtype=np.float64
    )
    texts = [c.get("text", "") or "" for c in cells]
    grid = _grid_texts(boxes, texts, cfg)
    if not markdown:
        return "\n".join("\t".join(row) for row in grid)
    esc = [[t.replace("|", "\\|") for t in row] for row in grid]
    lines = ["| " + " | ".join(esc[0]) + " |"]
    lines.append("| " + " | ".join(["---"] * len(esc[0])) + " |")
    for row in esc[1:]:
        lines.append("| " + " | ".join(row) + " |")
    return "\n".join(lines)

"""Table-structure assembly (kernels/table.py — SLANet analog: cell
boxes -> row/col grid -> markdown/plain rendering)."""

import numpy as np

from paddle_spark.kernels.table import render_table, table_grid


def _cell(x1, y1, text, w=100.0, h=30.0):
    return {"x1": x1, "y1": y1, "x2": x1 + w, "y2": y1 + h, "text": text}


def _grid_cells(rows, cols, jitter=0):
    cells = []
    for r in range(rows):
        for c in range(cols):
            cells.append(_cell(100 + c * 120 + (jitter * (r + c)) % 3,
                               400 + r * 40, f"r{r}c{c}"))
    return cells


def test_full_grid_markdown_and_plain():
    cells = _grid_cells(3, 2)
    md = render_table(cells, markdown=True)
    assert md == ("| r0c0 | r0c1 |\n| --- | --- |\n"
                  "| r1c0 | r1c1 |\n| r2c0 | r2c1 |")
    assert render_table(cells) == "r0c0\tr0c1\nr1c0\tr1c1\nr2c0\tr2c1"


def test_column_alignment_survives_jitter_and_shuffle():
    """Cells arrive in detector order (arbitrary) with a few px of box
    jitter; the global x-interval clustering must still align columns."""
    cells = _grid_cells(4, 3, jitter=1)
    rng = np.random.RandomState(7)
    shuffled = [cells[k] for k in rng.permutation(len(cells))]
    assert render_table(shuffled) == render_table(cells)
    boxes = np.array([[c["x1"], c["y1"], c["x2"], c["y2"]] for c in cells])
    rows, cols = table_grid(boxes)
    assert int(rows.max()) == 3 and int(cols.max()) == 2


def test_missing_cell_renders_empty_slot():
    cells = _grid_cells(2, 3)
    del cells[4]  # r1c1 missing
    assert render_table(cells) == "r0c0\tr0c1\tr0c2\nr1c0\t\tr1c2"
    md = render_table(cells, markdown=True)
    assert "| r1c0 |  | r1c2 |" in md


def test_two_detections_in_one_slot_join_left_to_right():
    cells = _grid_cells(1, 2)
    cells.append(_cell(100 + 40, 400, "extra", w=30.0))  # overlaps col 0
    assert render_table(cells).startswith("r0c0 extra\t")


def test_pipe_escaped_in_markdown_only():
    cells = [_cell(100, 400, "a|b"), _cell(220, 400, "c")]
    assert "a\\|b" in render_table(cells, markdown=True)
    assert render_table(cells) == "a|b\tc"


def test_empty_and_none_text():
    assert render_table([]) == ""
    cells = [_cell(100, 400, None), _cell(220, 400, "x")]
    assert render_table(cells) == "\tx"


def test_extract_layout_table_block_both_modes():
    """End-to-end through the layout chain: the table box's cells render
    per output mode; boxes without cells are untouched."""
    from paddle_spark.kernels.layout import extract_layout
    from paddle_spark.sources.synth import make_table_pdf

    md, kept, dropped = extract_layout(make_table_pdf(3), markdown=True)
    assert kept == 4 and dropped == 0  # title + table + text + image
    assert "## Table doc 3\n\n" in md
    assert "| C00 21 | C01 26 | C02 31 |\n| --- | --- | --- |\n" in md
    txt, _, _ = extract_layout(make_table_pdf(3))
    assert "C00 21\tC01 26\tC02 31\n" in txt and "|" not in txt
    assert "![](imgs/img_in_image_box_100_800_500_1100.jpg)\n" in md


def test_markdown_formula_and_image_renderings():
    """Markdown block renderings beyond title/table: formula blocks wrap
    as display math; image blocks emit the reference bbox filename
    convention; plain mode leaves both as raw text lines."""
    import json

    from paddle_spark.kernels.layout import extract_layout

    pages = [{"page_no": 0, "width": 1700, "height": 2200, "boxes": [
        {"box_id": 0, "label": "formula", "label_id": 6,
         "x1": 100.0, "y1": 100.0, "x2": 500.0, "y2": 160.0,
         "score": 0.9, "text": "E = mc^2"},
        {"box_id": 1, "label": "image", "label_id": 2,
         "x1": 100.0, "y1": 300.0, "x2": 400.0, "y2": 500.0,
         "score": 0.9, "text": ""},
    ]}]
    p = (b"%PDF-1.4\n%paddle-spark-synthetic\n"
         + json.dumps({"pages": pages}).encode())
    md = extract_layout(p, markdown=True)[0]
    assert "$$E = mc^2$$\n\n" in md
    assert "![](imgs/img_in_image_box_100_300_400_500.jpg)\n" in md
    txt = extract_layout(p)[0]
    assert "E = mc^2\n" in txt and "$$" not in txt and "![](" not in txt

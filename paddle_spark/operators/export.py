"""Export sinks (S7/S10) + debug-column gating (F9).

The reference's client writes per-document markdown + image files
(/root/reference/client/client.py:32-45, testScript.py:163-208) and its
experiments dump CSVs (blip_conditional_caption_e2e.py:249-252). Our
engine's exports are DataFrame writes:

- ``export_text``: url + extracted text (the markdown-file analog; one
  row per document instead of one file per document — at 10^12 docs a
  file-per-doc sink is an anti-pattern, a table IS the export).
- CSV variant quotes/escapes multiline text (S10, diagnostics only).
- ``debug=True`` adds the extraction diagnostics columns — the analog of
  the reference's visualize flag gating debug images (model.py:395,
  :515-535 — F9): unused columns never reach the scan when the flag is
  off (column pruning does the gating for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_DEBUG_COLS = ["n_blocks_kept", "n_blocks_dropped", "parse_ok", "branch", "error"]


def select_export(extracted: DataFrame, debug: bool = False) -> DataFrame:
    """The export projection. With ``debug=False`` only (url, text)
    survive — Catalyst prunes every other column out of the scan."""
    cols = ["url", "text"] + (_DEBUG_COLS if debug else [])
    have = set(extracted.columns)
    return extracted.select(*[c for c in cols if c in have])


def export_text(
    extracted: DataFrame,
    path: str,
    fmt: str = "parquet",
    debug: bool = False,
) -> None:
    """Write the export. ``fmt``: parquet (default) | csv (S10 —
    multiline text quoted+escaped) | json."""
    out = select_export(extracted, debug=debug)
    w = out.write.mode("overwrite")
    if fmt == "csv":
        (
            w.option("header", True)
            .option("quoteAll", True)
            .option("escape", '"')
            # the writer TRIMS field whitespace by default — extracted
            # text is byte-exact content, never trim it
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            .csv(path)
        )
    elif fmt == "json":
        w.json(path)
    else:
        w.parquet(path)

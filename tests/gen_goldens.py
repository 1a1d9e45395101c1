"""Regenerate the committed golden digests (run manually, outputs are
committed):

    python tests/gen_goldens.py

Goldens are produced by the single-process kernel implementation — the
same code the Spark job runs inside mapInPandas — over the deterministic
tiny corpus (seed 42, 200 rows). The pytest suite and the driver's smoke
check both compare against this file (FIXTURES.md §3).
"""

from __future__ import annotations

import json
import pathlib

from paddle_spark.kernels.extract import extract_document
from paddle_spark.sources.synth import gen_pages_pdf

TINY_ROWS = 200
SEED = 42
OUT = pathlib.Path(__file__).parent / "goldens" / "tiny_digests.json"


def main() -> None:
    pdf = gen_pages_pdf(TINY_ROWS, seed=SEED)
    goldens = {}
    for _, row in pdf.iterrows():
        r = extract_document(row["html"])
        goldens[row["url"]] = {
            "text_sha256": r.text_sha256,
            "n_blocks_kept": r.n_blocks_kept,
            "n_blocks_dropped": r.n_blocks_dropped,
            "parse_ok": r.parse_ok,
            "branch": r.branch,
        }
    OUT.parent.mkdir(exist_ok=True)
    OUT.write_text(json.dumps(goldens, indent=0, sort_keys=True))
    ok = sum(1 for g in goldens.values() if g["parse_ok"])
    print(f"wrote {len(goldens)} goldens ({ok} parse_ok) -> {OUT}")


if __name__ == "__main__":
    main()

"""Unicode text normalization for web-corpus pipelines.

Two layers, mirroring what CCNet / Dolma / C4-class cleaners do before
any downstream filter or dedup stage:

- ``clean_text_col`` — codepoint hygiene as a pure Column chain
  (whole-stage codegen, exact DuckDB twin): drop zero-width characters
  and BOMs, map the Unicode space zoo onto ASCII space, strip C0/C1
  control characters (keeping ``\\n`` and ``\\t``), collapse horizontal
  whitespace runs. Everything a crawler's HTML-to-text step leaks into
  the corpus.
- ``nfc_col`` / ``strip_accents_col`` — NFC canonical composition and
  accent stripping. Spark has no built-in Unicode normalizer, so these
  are Arrow-batched pandas UDFs over ``unicodedata`` (the documented
  vectorized-UDF seam; never row-at-a-time ``udf()``). DuckDB's
  ``nfc_normalize`` / ``strip_accents`` are the oracle twins.

``hash_key_normalize`` composes both layers into the CCNet-style dedup
key: NFC -> strip accents -> lowercase -> drop non-alphanumerics ->
collapse whitespace. After accent stripping the text is ASCII, so JVM
``lower`` and DuckDB ``lower`` agree byte-for-byte.

Scale notes: the Column chain is map-only codegen; the pandas UDFs are
map-only Arrow batches. No shuffle anywhere — at 10^12 rows this stage
is scan-bound, exactly as it should be.

Reference parity: the reference pipeline normalizes extracted text
before emitting markdown (paddle model.py postprocessing); this module
is the corpus-side generalization of that cleanup.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# The character classes below use \x{...} codepoint escapes, which Java
# regex (Spark) and RE2 (DuckDB) parse identically — ONE ASCII pattern
# string drives both engines, so the twin cannot drift.

# Dropped outright: zero-widths, word joiner, BOM/ZWNBSP, soft hyphen.
_ZERO_WIDTH = r"[\x{200B}\x{200C}\x{200D}\x{2060}\x{FEFF}\x{00AD}]"
# Unicode horizontal spaces mapped to ASCII space (NBSP, ogham space,
# en/em quads and friends, narrow NBSP, math space, ideographic space).
_UNI_SPACES = r"[\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]"
# C0 controls except tab/newline (NUL..BS, VT, FF, SO..US), DEL, C1 block.
_CONTROLS = r"[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}\x{80}-\x{9F}]"
_HSPACE_RUN = r"[ \x{09}]+"
_NEWLINE_HUG = r" ?\x{0A} ?"


def clean_text_col(text: Column) -> Column:
    """Codepoint-hygiene chain, JVM-side only. Newlines survive;
    horizontal whitespace collapses to single spaces."""
    c = F.regexp_replace(text, _ZERO_WIDTH, "")
    c = F.regexp_replace(c, _UNI_SPACES, " ")
    c = F.regexp_replace(c, _CONTROLS, "")
    c = F.regexp_replace(c, _HSPACE_RUN, " ")
    # trim spaces hugging newlines, then the ends
    c = F.regexp_replace(c, _NEWLINE_HUG, "\n")
    return F.trim(c)


def clean_text_sql(expr: str) -> str:
    """DuckDB twin of ``clean_text_col`` applied to SQL expression
    *expr* — the SAME pattern strings, RE2 reading the x-brace escapes."""
    c = f"regexp_replace({expr}, '{_ZERO_WIDTH}', '', 'g')"
    c = f"regexp_replace({c}, '{_UNI_SPACES}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_CONTROLS}', '', 'g')"
    c = f"regexp_replace({c}, '{_HSPACE_RUN}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_NEWLINE_HUG}', chr(10), 'g')"
    return f"trim({c})"


@pandas_udf(StringType())
def nfc_col(s: pd.Series) -> pd.Series:
    """NFC canonical composition (Arrow-batched). DuckDB twin:
    ``nfc_normalize``."""
    return s.map(
        lambda t: unicodedata.normalize("NFC", t) if t is not None else None
    )


@pandas_udf(StringType())
def strip_accents_col(s: pd.Series) -> pd.Series:
    """Accent stripping: NFD, drop combining marks (category Mn),
    recompose. DuckDB twin: ``strip_accents`` (parity pinned on the
    planted fixture characters by tests)."""

    def _strip(t):
        if t is None:
            return None
        d = unicodedata.normalize("NFD", t)
        return unicodedata.normalize(
            "NFC", "".join(ch for ch in d if unicodedata.category(ch) != "Mn")
        )

    return s.map(_strip)


def clean_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """doc_id, clean_text (hygiene chain + NFC), n_removed (codepoints
    dropped by cleaning — a cheap corruption signal per document)."""
    raw = F.col(text_col)
    cleaned = nfc_col(clean_text_col(raw))
    return df.select(
        F.col(id_col),
        cleaned.alias("clean_text"),
        (F.length(raw) - F.length(cleaned)).cast("long").alias("n_removed"),
    )


def norm_key_col(text: Column) -> Column:
    """The CCNet-style dedup-key expression: clean -> NFC -> strip
    accents -> lower -> alphanumerics only -> collapse whitespace."""
    base = strip_accents_col(nfc_col(clean_text_col(text)))
    k = F.lower(base)
    # intersection form of [^a-z0-9\s]: identical set, ~9x faster under
    # java.util.regex (see textstats.fingerprint_norm_col)
    k = F.regexp_replace(k, r"[\S&&[^a-z0-9]]", " ")
    return F.trim(F.regexp_replace(k, r"\s+", " "))


def hash_key_normalize(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """doc_id, norm_key, norm_xx64 — the 64-bit group key real dedup
    shuffles on (never the raw text)."""
    k = norm_key_col(F.col(text_col))
    return df.select(
        F.col(id_col),
        k.alias("norm_key"),
        F.xxhash64(k).alias("norm_xx64"),
    )


def hash_key_normalize_sql(expr: str) -> str:
    """DuckDB twin of the ``norm_key`` column in ``hash_key_normalize``."""
    base = f"strip_accents(nfc_normalize({clean_text_sql(expr)}))"
    k = f"lower({base})"
    k = f"regexp_replace({k}, '[^a-z0-9\\s]', ' ', 'g')"
    return f"trim(regexp_replace({k}, '\\s+', ' ', 'g'))"

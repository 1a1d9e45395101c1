"""Unicode normalization: golden expectations, idempotence, and
Spark <-> DuckDB twin parity on the planted noise characters."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from paddle_spark.operators import normalize as N

# (raw, expected clean_text-without-NFC, expected norm_key)
GOLDENS = [
    # NBSP + ZWSP + combining acute
    ("caf\u00e9\u200b \u00a0 du monde", "caf\u00e9 du monde", "cafe du monde"),
    # BOM + C0 controls stripped
    ("\ufeffBOM start\u0007bell\u001b", "BOM startbell", "bom startbell"),
    # em space + ideographic space collapse; combining acute composes
    ("e\u0301clair \u2003 \u3000 wide", "\u00e9clair wide", "eclair wide"),
    # soft hyphen dropped
    ("na\u00efve\u00adr\u00e9sum\u00e9", "na\u00efver\u00e9sum\u00e9",
     "naiveresume"),
    # horizontal whitespace collapses, newlines survive bare
    ("tabs\t\t and   spaces \n  next line ", "tabs and spaces\nnext line",
     "tabs and spaces next line"),
    ("", "", ""),
]


def _clean_rows(spark, raws):
    df = spark.createDataFrame([(i, r) for i, r in enumerate(raws)], "id long, text string")
    out = (
        df.select(
            "id",
            N.nfc_col(N.clean_text_col(F.col("text"))).alias("clean"),
            N.norm_key_col(F.col("text")).alias("key"),
        )
        .orderBy("id")
        .collect()
    )
    return [(r["clean"], r["key"]) for r in out]


def test_goldens(spark):
    import unicodedata

    got = _clean_rows(spark, [g[0] for g in GOLDENS])
    for (raw, want_clean, want_key), (clean, key) in zip(GOLDENS, got):
        assert clean == unicodedata.normalize("NFC", want_clean), raw
        assert key == want_key, raw


def test_clean_idempotent(spark):
    cleaned = [c for c, _ in _clean_rows(spark, [g[0] for g in GOLDENS])]
    again = [c for c, _ in _clean_rows(spark, cleaned)]
    assert again == cleaned


def test_duckdb_twin_parity(spark):
    """The SAME pattern strings drive Java regex and RE2; nfc_normalize /
    strip_accents are the UDF twins. Byte equality on every golden."""
    con = duckdb.connect()
    spark_rows = _clean_rows(spark, [g[0] for g in GOLDENS])
    for (raw, _, _), (s_clean, s_key) in zip(GOLDENS, spark_rows):
        sql = (
            "SELECT nfc_normalize(" + N.clean_text_sql("?") + ") AS c, "
            + N.hash_key_normalize_sql("?") + " AS k"
        )
        d_clean, d_key = con.execute(sql, [raw, raw]).fetchone()
        assert s_clean == d_clean, raw
        assert s_key == d_key, raw


def test_newline_preserved_spaces_hugging_trimmed(spark):
    raws = ["a  \n\n  b", "  lead\ntrail  "]
    got = [c for c, _ in _clean_rows(spark, raws)]
    assert got == ["a\n\nb", "lead\ntrail"]

"""Corpus-safety operators for training-data pipelines: PII redaction and
benchmark decontamination.

These are the two curation stages every large-scale webtext pipeline runs
after extraction + dedup (the reference stops at extraction —
/root/reference/server/model.py emits text only — so these are mandate
ops "beyond the reference", like the dedup/ANN family):

- **PII redaction**: replace emails / IPv4 addresses / long phone-like
  digit runs with typed placeholder tokens, keeping per-doc counts for
  audit. Pure Column regexp ops (whole-stage codegen, no UDF); the
  patterns are written in the Java-regex ∩ RE2 common subset so the
  exact same pattern strings run in the DuckDB oracle.

- **Decontamination**: flag corpus documents sharing any n-gram
  (default 13, the public eval-decontam convention) with a benchmark
  table. Shape: explode docs to n-gram hashes, broadcast the (small)
  benchmark gram set, inner-join, per-doc distinct-hit count. The join
  key is md5(gram) so at 100 TB the shuffle carries 32-byte keys instead
  of 13-word strings; the benchmark side is broadcast so the corpus side
  never shuffles at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex ∩ RE2 common subset (no lookarounds, no backrefs) so Spark and
# the DuckDB oracle run literally identical pattern strings.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b(\d{1,3}\.){3}\d{1,3}\b"
#: +CC followed by 7-14 more digits with optional single separators —
#: intentionally conservative (international format only) to keep the
#: false-positive rate near zero on prose.
PHONE_PATTERN = r"\+\d{1,3}([ .-]?\d){7,14}\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category PII match counts (audit columns)."""
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_PATTERN)),
        "n_ipv4": F.regexp_count(text, F.lit(IPV4_PATTERN)),
        "n_phones": F.regexp_count(text, F.lit(PHONE_PATTERN)),
    }


def redact_col(text: Column) -> Column:
    """Redacted text: emails, then IPv4, then phones. Order matters only
    for overlapping matches (an email never contains an IP-shaped host
    once replaced); fixed order keeps the output deterministic."""
    out = F.regexp_replace(text, EMAIL_PATTERN, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_PATTERN, IPV4_TOKEN)
    return F.regexp_replace(out, PHONE_PATTERN, PHONE_TOKEN)


def pii_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """doc_id, redacted text, per-category counts. Map-only: no shuffle,
    scales linearly with the corpus."""
    text = F.col(text_col)
    counts = pii_counts(text)
    return df.select(
        F.col(id_col),
        redact_col(text).alias("redacted"),
        *[c.cast("long").alias(n) for n, c in counts.items()],
    )


def ngram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gram_hash) rows: lowercase, whitespace-normalize, split, build
    every n-word shingle, md5 it. distinct() per doc is applied by the
    caller only where needed (corpus side keeps duplicates out of the
    join via the benchmark side being distinct)."""
    words = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    # F.sequence(1, 0) yields a DESCENDING [1, 0], not [] — guard short docs.
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.md5(F.array_join(F.slice(words, i, n), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col).alias("id"), F.explode(grams).alias("gram_hash")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing >= 1 n-gram with any
    benchmark row, with the distinct-gram hit count per doc.

    Plan shape at scale: the benchmark gram set is distinct'd then
    BROADCAST (eval benchmarks are ~MBs against a ~100 TB corpus), so the
    corpus side is scan -> generate -> broadcast-hash-join -> partial
    agg -> one shuffle on doc id for the final count. Returns
    (doc_id, n_gram_hits) for contaminated docs only — the caller
    anti-joins this against the corpus to drop or audit them.
    """
    corpus_grams = ngram_hashes(corpus, id_col, text_col, n)
    bench_grams = (
        ngram_hashes(
            benchmark.select(F.lit(0).alias("_bid"), bench_text_col),
            "_bid",
            bench_text_col,
            n,
        )
        .select("gram_hash")
        .distinct()
    )
    hits = corpus_grams.join(F.broadcast(bench_grams), "gram_hash")
    return hits.groupBy(F.col("id").alias(id_col)).agg(
        F.count_distinct("gram_hash").cast("long").alias("n_gram_hits")
    )

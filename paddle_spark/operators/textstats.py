"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure Column expressions (whole-stage codegen);
each has an exact ANSI-SQL twin in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from paddle_spark.operators.dedup import words_col

# Tiny deterministic stopword lists for the n-gram/stopword language
# heuristic. Real pipelines use fastText-style models; the heuristic is the
# Spark-shaped part (set-membership counting per row, no UDF).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "für"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "hi": ["का", "के", "में", "है", "और", "से", "को", "पर", "यह", "हो"],
}


def token_count_col(text: Column) -> Column:
    return F.size(words_col(text))


def stopword_hits_col(text: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of `lang` (duplicates count)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words_col(text), lambda w: F.array_contains(sw, F.lower(w))))


def langid(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hit counts;
    'und' (undetermined) when no stopwords match at all."""
    hits = {lang: stopword_hits_col(F.col(text_col), lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    guess = F.lit("und")
    # deterministic tie-break: first lang in fixed order wins
    for lang in reversed(list(STOPWORDS)):
        guess = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(guess)
    return df.select(
        F.col(id_col),
        *[hits[lang].alias(f"hits_{lang}") for lang in STOPWORDS],
        guess.alias("lang_guess"),
    )


def quality_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Quality-scoring features: length, token count, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio + composite score.

    The composite mirrors the shape of C4/Gopher-style quality filters:
    reward stopword presence and sane word lengths, punish extreme
    punctuation/shortness.
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = token_count_col(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[\.,;:!\?]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    sw_en = stopword_hits_col(text, "en")
    mean_wlen = F.round(
        (F.length(F.regexp_replace(text, r"\s+", "")) / F.greatest(toks, F.lit(1))), 4
    )
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4)
    upper_ratio = F.round(n_upper / F.greatest(n_chars, F.lit(1)), 4)
    stop_ratio = F.round(sw_en / F.greatest(toks, F.lit(1)), 4)
    score = F.round(
        F.when(toks < 5, 0.0).otherwise(
            F.greatest(
                F.lit(0.0),
                F.least(
                    F.lit(1.0),
                    F.lit(0.4)
                    + F.lit(2.0) * stop_ratio
                    - F.lit(2.0) * punct_ratio
                    - F.lit(1.0) * upper_ratio
                    + F.when((mean_wlen >= 3) & (mean_wlen <= 10), 0.2).otherwise(-0.2),
                ),
            )
        ),
        4,
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        toks.cast("long").alias("n_tokens"),
        mean_wlen.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        upper_ratio.alias("upper_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Document fingerprint: sha256 over the normalized text (lowercase,
    punctuation stripped, whitespace collapsed) + a fast 64-bit rolling
    hash (xxhash64) for cheap equality checks."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    return df.select(
        F.col(id_col),
        F.sha2(norm, 256).alias("fp_sha256"),
        F.xxhash64(norm).alias("fp_xx64"),
    )

"""Count-based n-gram language-model perplexity scoring — the CCNet-style
quality signal (Wenzek et al. 2020: score every document under an LM trained
on a trusted reference corpus, then keep the low-perplexity "head").

Real CCNet uses a 5-gram KenLM trained on Wikipedia; the Spark-shaped parts
— and everything this module implements — are:

  * TRAIN: n-gram count tables built from a reference corpus with plain
    ``explode -> groupBy`` aggregations (map-side partial agg absorbs token
    skew; the count table is vocabulary-bounded, NOT corpus-bounded, so at
    10^12 documents it is still only |V|^2-capped rows and usually fits a
    broadcast).
  * SCORE: every document's bigrams left-join the count tables; add-one
    smoothing over the vocabulary closes unseen pairs. The corpus side is
    exploded once and joined on the (w1, w2) pair key — when the count
    table broadcasts this is map-only over the corpus; otherwise it is one
    shuffle on bounded-cardinality keys.
  * BUCKET: CCNet's head/middle/tail split. The exact form here uses an
    ntile window (fine at driver-test scale and exactly SQL-replayable);
    the 10^12-row path is ``ppl_gate`` below — two approximate quantile
    thresholds from one tiny aggregate, then a map-only filter, so the
    corpus is never globally sorted.

Everything is pure Column ops (whole-stage codegen, no UDF). Determinism
across engines: counts and vocabulary size are exact integers; each
per-bigram log-probability is one ln() of an exact integer ratio; the
per-document mean is rounded AFTER the sum, to 3 decimals, the same
discipline as the repo's revenue oracles (documented float-boundary risk
~1e-9 per document).

Reference parity note: the reference repo (xynehq/paddle) is an OCR
serving pipeline and has no LM scorer; this operator is part of the
task-mandated training-data curation family (like operators/safety.py and
operators/sampling.py), modeled on the public CCNet pipeline description.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from paddle_spark.operators.dedup import words_col


def _bigrams_col(text: Column) -> Column:
    """array<struct<w1,w2>> of adjacent lowercase token pairs.

    Built as arrays_zip(slice(ws,1,n-1), slice(ws,2,n-1)) rather than a
    transform over element_at: the zip evaluates the tokenization O(1)
    times per row instead of per element (Generate inlines the full
    split/filter expression — with element_at that re-evaluation is per
    pair, quadratic on long documents)."""
    ws = words_col(F.lower(text))
    n1 = F.size(ws) - 1
    return F.when(
        n1 >= 1,
        F.arrays_zip(
            F.slice(ws, 1, n1).alias("w1"),
            F.slice(ws, 2, n1).alias("w2"),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def train_bigram_lm(
    ref: DataFrame, text_col: str = "text", cache: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the count tables of an add-one-smoothed bigram LM from a
    reference corpus.

    Returns ``(bigram_counts, history_counts, vocab)`` where

      * ``bigram_counts``  = (w1, w2, c12)   — adjacent-pair counts,
      * ``history_counts`` = (w1, c1)        — c1 = Σ_w2 c12, the MLE
        conditioning denominator (how often w1 appears as a history),
      * ``vocab``          = single row (v)  — distinct successor count,
        kept as a 1-row DataFrame so scoring can fold it in with the
        scalar-subquery crossJoin(broadcast(...)) pattern (no collect).

    The reference corpus is scanned and exploded exactly ONCE: the
    history table and the vocabulary both derive from the bigram counts
    (vocabulary-bounded aggregates, independent of corpus row count), so
    training costs one corpus shuffle, not three. With history counts as
    the denominator, P(·|w1) sums to (c1 + V·a)/(c1 + V·a) = 1 under
    add-one — the usual unigram-occurrence denominator leaks mass at
    document-final tokens.
    """
    bi = (
        ref.select(F.explode(_bigrams_col(F.col(text_col))).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    if cache:
        # the history table, the vocabulary scalar, and the scoring join
        # all consume bi: persisting it keeps "one corpus scan" literally
        # true (otherwise each broadcast job re-derives the subtree).
        # Callers owning long-lived sessions can bi.unpersist() when done.
        bi = bi.persist()
    uni = bi.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = bi.agg(F.countDistinct("w2").alias("v"))
    return bi, uni, vocab


def lm_score(
    docs: DataFrame,
    bigram_counts: DataFrame,
    unigram_counts: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_counts: bool = True,
) -> DataFrame:
    """Mean bigram log-probability per document under the trained LM.

    P(w2 | w1) = (c12 + 1) / (c1 + V)   (add-one over the vocabulary;
    unseen histories degrade to 1 / V-ish mass, never zero).

    Output: (id, n_bigrams, avg_logprob) with avg_logprob rounded to 3
    decimals; documents with fewer than two tokens are dropped (they have
    no bigram evidence — callers route them through length filters
    instead). Plan shape: corpus explode -> two equi-joins against
    vocabulary-bounded tables (broadcast them when they fit) -> one
    groupBy(id) whose partial aggregation runs map-side.
    """
    pairs = (
        docs.select(F.col(id_col), F.explode(_bigrams_col(F.col(text_col))).alias("bg"))
        .select(id_col, "bg.w1", "bg.w2")
    )
    bc = F.broadcast if broadcast_counts else (lambda d: d)
    joined = (
        pairs.join(bc(bigram_counts), ["w1", "w2"], "left")
        .join(bc(unigram_counts), ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    lp = F.log(
        (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1)).cast("double")
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast("double")
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum(lp) / F.count("*"), 3).alias("avg_logprob"),
        )
    )


def ppl_buckets_exact(
    scored: DataFrame, id_col: str = "doc_id", n_buckets: int = 3
) -> DataFrame:
    """CCNet head/middle/tail split, EXACT form: ntile over the full
    ordering by (avg_logprob DESC, id) — higher mean log-prob = lower
    perplexity = head. The single ORDER BY window is a global sort and is
    therefore the test-scale / oracle form; use ``ppl_gate`` at corpus
    scale."""
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("avg_logprob").desc(), F.col(id_col))
    names = F.array(F.lit("head"), F.lit("middle"), F.lit("tail"))
    tile = F.ntile(n_buckets).over(w)
    return scored.select(
        id_col,
        "n_bigrams",
        "avg_logprob",
        F.element_at(names, F.least(tile, F.lit(3))).alias("ppl_bucket"),
    )


def ppl_gate(
    scored: DataFrame,
    keep_frac: float = 1.0 / 3.0,
    id_col: str = "doc_id",
    rel_err: float = 0.001,
) -> DataFrame:
    """Scale-path head gate: one approx-quantile aggregate gives the
    avg_logprob threshold for the best ``keep_frac`` of documents; the
    gate itself is a map-only filter (threshold folded in via a broadcast
    1-row crossJoin — the corpus is never sorted or re-shuffled)."""
    thr = scored.agg(
        F.percentile_approx(
            "avg_logprob", F.lit(1.0 - keep_frac), F.lit(int(1.0 / rel_err))
        ).alias("thr")
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .filter(F.col("avg_logprob") >= F.col("thr"))
        .drop("thr")
    )

"""Bigram-LM perplexity scoring (operators/lm.py).

Contract: counts are exact integers; avg_logprob is round(sum(ln((c12+1)/
(c1+V)))/n, 3) — replayed here token-by-token in plain Python with
math.log, so Spark's Column math must agree to the rounded digit.
"""

import math

import pytest
from pyspark.sql import functions as F

from paddle_spark.operators.lm import (
    lm_score,
    ppl_buckets_exact,
    ppl_gate,
    train_bigram_lm,
)


def _python_lm(ref_texts):
    """History counts c1 = Σ_w2 c12; vocabulary = distinct successors."""
    uni, bi = {}, {}
    for t in ref_texts:
        ws = t.lower().split()
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            uni[a] = uni.get(a, 0) + 1
    return uni, bi, len({b for _, b in bi})


def _python_score(text, uni, bi, v):
    ws = text.lower().split()
    pairs = list(zip(ws, ws[1:]))
    if not pairs:
        return None
    s = sum(
        math.log((bi.get(p, 0) + 1) / (uni.get(p[0], 0) + v)) for p in pairs
    )
    return len(pairs), round(s / len(pairs), 3)


REF = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "the cat ate the fish",
]
DOCS = [
    (0, "the cat sat on the mat"),        # pure training text: high prob
    (1, "the dog ate the fish"),          # seen words, mixed pairs
    (2, "quantum flux capacitor overload"),  # all-unseen: smoothing floor
    (3, "word"),                          # single token: dropped
]


@pytest.fixture(scope="module")
def trained(spark):
    ref = spark.createDataFrame([(t,) for t in REF], "text string")
    return train_bigram_lm(ref)


def test_train_counts_exact(spark, trained):
    bi, uni, vocab = trained
    uni_got = {r["w1"]: r["c1"] for r in uni.collect()}
    bi_got = {(r["w1"], r["w2"]): r["c12"] for r in bi.collect()}
    p_uni, p_bi, v = _python_lm(REF)
    assert uni_got == p_uni
    assert bi_got == p_bi
    assert vocab.collect()[0]["v"] == v


def test_score_matches_python_replay(spark, trained):
    bi, uni, vocab = trained
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in lm_score(docs, bi, uni, vocab).collect()
    }
    p_uni, p_bi, v = _python_lm(REF)
    expected = {
        i: _python_score(t, p_uni, p_bi, v)
        for i, t in DOCS
        if _python_score(t, p_uni, p_bi, v) is not None
    }
    assert got == expected
    # in-domain text must outscore the unseen-vocabulary doc
    assert got[0][1] > got[2][1]


def test_buckets_exact_order(spark, trained):
    bi, uni, vocab = trained
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    scored = lm_score(docs, bi, uni, vocab)
    rows = {r["doc_id"]: r["ppl_bucket"] for r in ppl_buckets_exact(scored).collect()}
    # 3 scored docs -> one per bucket; best score = head, worst = tail
    assert rows[0] == "head" and rows[2] == "tail"
    assert sorted(rows.values()) == ["head", "middle", "tail"]


def test_ppl_gate_keeps_head(spark, trained):
    bi, uni, vocab = trained
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    scored = lm_score(docs, bi, uni, vocab)
    kept = {r["doc_id"] for r in ppl_gate(scored, keep_frac=0.4).collect()}
    assert 0 in kept            # best doc always survives
    assert 2 not in kept        # unseen-vocab doc gated out
    # gate is monotone in score: every kept score >= every dropped score
    s = {r["doc_id"]: r["avg_logprob"] for r in scored.collect()}
    assert min(s[i] for i in kept) >= max(
        s[i] for i in s if i not in kept
    )


def test_score_partitioning_invariant(spark, trained):
    bi, uni, vocab = trained
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = {
        tuple(r)
        for r in lm_score(docs.repartition(1), bi, uni, vocab).collect()
    }
    b = {
        tuple(r)
        for r in lm_score(docs.repartition(7, "doc_id"), bi, uni, vocab).collect()
    }
    assert a == b


def test_no_udf_in_plan(spark, trained):
    bi, uni, vocab = trained
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = lm_score(docs, bi, uni, vocab)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan

"""PII redaction + benchmark decontamination (operators/safety.py).

Redaction is cross-checked token-by-token against Python re (same
pattern strings); decontamination against a closed-form planted overlap
plus a brute-force Python n-gram set intersection.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from paddle_spark.operators.safety import (
    EMAIL_PATTERN,
    EMAIL_TOKEN,
    IPV4_PATTERN,
    IPV4_TOKEN,
    PHONE_PATTERN,
    PHONE_TOKEN,
    decontaminate,
    ngram_hashes,
    pii_redact,
)

PII_TEXTS = [
    "write to alice.smith+spam@mail.example.co.uk or bob@ex.io today",
    "server at 10.0.200.7 and backup at 192.168.1.254 replied",
    "call +1 415-555-0199 or +44 20 7946 0958 now",
    "mixed: a@b.de from 8.8.8.8 dial +91 98765 43210 end",
    "clean text with no pii at all, just words and 42 numbers",
    "not-an-ip 999.999 and half@ email and +12 short",
    "",
]


def _py_redact(t: str) -> str:
    t = re.sub(EMAIL_PATTERN, EMAIL_TOKEN, t)
    t = re.sub(IPV4_PATTERN, IPV4_TOKEN, t)
    return re.sub(PHONE_PATTERN, PHONE_TOKEN, t)


class TestPiiRedact:
    def test_matches_python_re(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(PII_TEXTS)], "doc_id long, text string"
        )
        rows = {r.doc_id: r for r in pii_redact(df).collect()}
        for i, t in enumerate(PII_TEXTS):
            assert rows[i].redacted == _py_redact(t), t
            assert rows[i].n_emails == len(re.findall(EMAIL_PATTERN, t))
            assert rows[i].n_ipv4 == len(re.findall(IPV4_PATTERN, t))
            assert rows[i].n_phones == len(re.findall(PHONE_PATTERN, t))

    def test_redacts_planted_pii_everywhere(self, spark, documents):
        d = documents.limit(50).select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" u"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com from 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".9"),
            ).alias("text"),
        )
        out = pii_redact(d)
        assert out.filter((F.col("n_emails") < 1) | (F.col("n_ipv4") < 1)).count() == 0
        assert (
            out.filter(
                F.col("redacted").rlike(EMAIL_PATTERN)
                | F.col("redacted").rlike(IPV4_PATTERN)
            ).count()
            == 0
        )


class TestDecontaminate:
    def test_planted_overlap_found(self, spark):
        # benchmark = 2 docs; corpus = 1 verbatim copy, 1 doc embedding a
        # benchmark 13-gram mid-text, 2 clean docs, 1 short doc.
        bench_a = " ".join(f"b{i}" for i in range(20))
        bench_b = " ".join(f"c{i}" for i in range(13))
        clean = " ".join(f"x{i}" for i in range(30))
        corpus = [
            (0, bench_a),                                  # verbatim copy
            (1, "intro words " + bench_b + " outro words"),  # embedded gram
            (2, clean),
            (3, clean.upper()),                            # lowercases to doc 2's grams — still clean
            (4, "too short"),
        ]
        bench = spark.createDataFrame(
            [(bench_a,), (bench_b,)], "text string"
        )
        cdf = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {
            r.doc_id: r.n_gram_hits
            for r in decontaminate(cdf, bench, n=13).collect()
        }
        # doc 0 has 20-13+1 = 8 grams, all from bench_a
        # doc 1 contains bench_b's single 13-gram
        assert got == {0: 8, 1: 1}

    def test_matches_bruteforce(self, spark, documents):
        n = 5
        docs = documents.limit(40).select("doc_id", "text")
        bench = documents.filter(
            (F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 40)
        ).select("text")

        def grams(t: str) -> set[str]:
            w = re.sub(r"\s+", " ", t.strip().lower()).split(" ")
            return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

        bset = set()
        for r in bench.collect():
            bset |= grams(r.text)
        expect = {}
        for r in docs.collect():
            hits = len(grams(r.text) & bset)
            if hits:
                expect[r.doc_id] = hits
        got = {
            r.doc_id: r.n_gram_hits
            for r in decontaminate(docs, bench, n=n).collect()
        }
        assert got == expect
        assert expect  # the planted benchmark docs must self-hit

    def test_short_doc_yields_no_grams(self, spark):
        df = spark.createDataFrame(
            [(0, "only four words here"), (1, "")], "doc_id long, text string"
        )
        assert ngram_hashes(df, "doc_id", "text", 13).count() == 0

    def test_broadcast_plan(self, spark, documents):
        docs = documents.limit(40).select("doc_id", "text")
        bench = documents.limit(3).select("text")
        plan = decontaminate(docs, bench, n=5)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan

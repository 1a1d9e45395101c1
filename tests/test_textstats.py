"""Text-analysis operator tests."""

import pytest
from pyspark.sql import functions as F

from paddle_spark.operators import textstats as TS


@pytest.fixture(scope="module")
def crafted(spark):
    return spark.createDataFrame(
        [
            (1, "the cat and the dog sat on a mat in the sun for fun"),
            (2, "der hund und die katze ist nicht ein tier zu haus"),
            (3, "el perro y la casa de que es un buen lugar por fin"),
            (4, "zzz qqq xxx www"),
            (5, ""),
            (6, "WHAT!!! A??? LOUD,,, SENTENCE;;; FULL: OF. PUNCT!"),
        ],
        "doc_id long, text string",
    )


def test_token_count(crafted):
    out = crafted.select("doc_id", TS.token_count_col(F.col("text")).alias("n")).collect()
    n = {r["doc_id"]: r["n"] for r in out}
    assert n[1] == 14
    assert n[4] == 4
    assert n[5] == 0


def test_langid(crafted):
    out = {r["doc_id"]: r["lang_guess"] for r in TS.langid(crafted).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"
    assert out[4] == "und"
    assert out[5] == "und"


def test_quality_features(crafted):
    rows = {r["doc_id"]: r for r in TS.quality_features(crafted).collect()}
    # fluent english scores high, punct-bomb scores low, empty is 0
    assert rows[1]["quality_score"] > 0.6
    assert rows[6]["quality_score"] < rows[1]["quality_score"]
    assert rows[5]["quality_score"] == 0.0
    assert rows[1]["stopword_ratio"] > 0.3
    assert rows[6]["punct_ratio"] > 0.2


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello,  World!"),
            (2, "hello world"),
            (3, "HELLO   world."),
            (4, "different entirely"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in TS.fingerprint(df).collect()}
    assert out[1]["fp_sha256"] == out[2]["fp_sha256"] == out[3]["fp_sha256"]
    assert out[1]["fp_xx64"] == out[2]["fp_xx64"]
    assert out[4]["fp_sha256"] != out[1]["fp_sha256"]


def test_fingerprint_class_intersection_form(spark):
    """The r6 fast regex ([\\S&&[^a-z0-9]]) strips exactly the same
    characters as the naive complemented union ([^a-z0-9\\s]) — pinned
    over adversarial inputs: controls, whitespace family, unicode,
    surrogates, full ASCII sweep."""
    import random

    rng = random.Random(7)
    samples = [
        "", "abc 123", "ABC!@# \t\n\x0b\x0c\rxyz", "áé日本語🙂",
        "".join(chr(i) for i in range(1, 128)),
        "".join(chr(rng.randrange(1, 0x2FFF)) for _ in range(500)),
        "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 🙂🙃 a0 z9",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, s string"
    )
    naive = F.regexp_replace(F.col("s"), r"[^a-z0-9\s]", "")
    fast = F.regexp_replace(F.col("s"), r"[\S&&[^a-z0-9]]", "")
    assert (
        df.select(naive.alias("a"), fast.alias("b"))
        .filter("a != b")
        .count()
        == 0
    )


def test_text_stats_frame_matches_joined_form(documents):
    """text_stats_frame (one select) == quality ⋈ fingerprint ⋈ bpe (the
    r5 three-frame join) row for row."""
    joined = (
        TS.quality_features(documents)
        .join(TS.fingerprint(documents).select("doc_id", "fp_sha256"), "doc_id")
        .join(
            documents.select(
                "doc_id",
                TS.bpe_token_count_col(F.col("text"))
                .cast("long")
                .alias("n_bpe_tokens"),
            ),
            "doc_id",
        )
    )
    one = TS.text_stats_frame(documents)
    assert one.columns == joined.columns
    a = sorted(map(tuple, one.collect()))
    b = sorted(map(tuple, joined.collect()))
    assert a == b


def test_on_documents_table(documents):
    q = TS.quality_features(documents)
    rows = q.collect()
    assert len(rows) == documents.count()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    lid = TS.langid(documents)
    assert lid.filter(F.col("lang_guess") == "und").count() < documents.count()


def test_all_jvm_side(documents):
    for df in (
        TS.quality_features(documents),
        TS.langid(documents),
        TS.fingerprint(documents),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_features(spark):
    from paddle_spark.operators.textstats import repetition_features

    docs = spark.createDataFrame(
        [
            (1, "buy now\nbuy now\nbuy now\nunique line"),
            (2, "all words here are entirely distinct tokens"),
            (3, "spam spam spam spam spam"),
            (4, ""),
            (5, "one"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_features(docs).collect()}
    assert got[1]["dup_line_frac"] == 0.5  # 4 lines, 2 distinct
    assert got[2]["dup_word_frac"] == 0.0
    assert got[3]["dup_word_frac"] == 0.8          # 5 words, 1 distinct
    assert got[3]["top_bigram_frac"] == 1.0        # all bigrams identical
    assert got[4]["dup_line_frac"] == 0.0 and got[4]["top_bigram_frac"] == 0.0
    assert got[5]["top_bigram_frac"] == 0.0        # no bigrams


def test_canonical_url_edge_cases(spark):
    from pyspark.sql import functions as F

    from paddle_spark.functions import canonical_url_col, host_col

    cases = {
        "HTTPS://WWW.Example.COM:443/Path/A?utm_source=x&q=1#frag":
            ("https://www.example.com/Path/A?q=1", "example.com"),
        "http://Host.org:80/a?b=2&utm_campaign=z&c=3":
            ("http://host.org/a?b=2&c=3", "host.org"),
        "https://site.net:8443/x?fbclid=abc":         # non-default port kept
            ("https://site.net:8443/x", "site.net"),
        "http://host:8080/p?gclid=1&x=2":
            ("http://host:8080/p?x=2", "host"),
        "https://a.b/?utm_medium=m": ("https://a.b/", "a.b"),
        # non-absolute inputs pass through unchanged (no '://' mangling)
        "/relative/path?utm_source=x": ("/relative/path?utm_source=x", ""),
        "//cdn.example.com/x.js": ("//cdn.example.com/x.js", ""),
        "mailto:a@b.c": ("mailto:a@b.c", ""),
        "example.com/Page#f": ("example.com/Page#f", ""),
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: (r["c"], r["h"])
        for r in df.select(
            "url",
            canonical_url_col(F.col("url")).alias("c"),
            host_col(F.col("url")).alias("h"),
        ).collect()
    }
    for u, expected in cases.items():
        assert got[u] == expected, u


def test_bpe_token_count(spark):
    """BPE-ish counter: space-prefixed letter/digit/punct runs, the
    GPT-2 pre-tokenizer shape without lookahead (identical pattern runs
    under Java regex and RE2)."""
    from paddle_spark.operators.textstats import bpe_token_count_col

    cases = {
        "hello world": 2,            # "hello", " world"
        "hello, world!": 4,          # "hello", ",", " world", "!"
        "a1b2": 4,                   # "a", "1", "b", "2"
        "price: 1,234.56": 7,        # price, :, " 1", ",", 234, ., 56
        "  double  spaces": 2,
        "": 0,
        "...": 1,
        "don't": 3,                  # don, ', t
    }
    df = spark.createDataFrame([(t,) for t in cases], "t string")
    got = {
        r["t"]: r["n"]
        for r in df.select(
            "t", bpe_token_count_col(F.col("t")).alias("n")
        ).collect()
    }
    for t, n in cases.items():
        assert got[t] == n, (t, got[t])
    # duckdb twin agrees on the same strings
    import duckdb

    pat = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"
    for t, n in cases.items():
        (dn,) = duckdb.sql(
            "select len(regexp_extract_all(?, ?))", params=[t, pat]
        ).fetchone()
        assert dn == n, (t, dn)


def test_hashed_linear_score_surrogate_closed_form(spark):
    """Surrogate model replays closed-form: hand-compute md5 buckets in
    Python and check logit/prob/keep; empty docs score the bare bias."""
    import hashlib
    import math

    from paddle_spark.operators.textstats import hashed_linear_score

    rows = [(0, "the quick brown fox"), (1, ""), (2, "   "), (3, "one")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in hashed_linear_score(df).collect()}

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 4096

    for doc_id, text in rows:
        ws = [w for w in text.split() if w]
        wsum = sum((bucket(w) % 197) - 98 for w in ws)
        logit = wsum / 98.0 / len(ws) if ws else 0.0
        prob = 1.0 / (1.0 + math.exp(-logit))
        r = got[doc_id]
        assert r["n_tokens"] == len(ws)
        assert r["logit"] == round(logit, 6), (doc_id, r["logit"], logit)
        assert r["prob"] == round(prob, 6)
        assert r["keep"] == (prob >= 0.5)


def test_hashed_linear_score_trained_weights(spark):
    """Explicit-weights path: all-positive weights keep everything,
    all-negative drop everything; wrong length raises."""
    import pytest

    from paddle_spark.operators.textstats import hashed_linear_score

    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta")], "doc_id long, text string"
    )
    n = 64
    up = hashed_linear_score(df, n_buckets=n, weights=[2.0] * n)
    assert all(r["keep"] and r["logit"] == 2.0 for r in up.collect())
    down = hashed_linear_score(df, n_buckets=n, weights=[-2.0] * n, bias=1.0)
    assert all((not r["keep"]) and r["logit"] == -1.0 for r in down.collect())
    with pytest.raises(ValueError):
        hashed_linear_score(df, n_buckets=8, weights=[0.0] * 9)

"""BPE tokenizer (operators/bpe.py).

The merge loop is pinned against the PUBLISHED Sennrich et al. (2016)
worked example (low/lower/newest/widest) — an independently derivable
ground truth, not a replay of our own code — plus encoder/decoder
round-trip, saturation, and distribution invariants.
"""

import pytest
from pyspark.sql import functions as F

from paddle_spark.operators.bpe import (
    EOW,
    bpe_encode,
    detokenize,
    encode_word,
    train_bpe,
    train_merges,
    word_counts,
)

# the classic corpus from the BPE paper's worked example
SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


class TestTrain:
    def test_sennrich_published_merge_sequence(self):
        merges = train_merges(SENNRICH, 5)
        assert merges == [
            ("e", "s"),        # 9 (newest 6 + widest 3)
            ("es", "t"),       # 9
            ("est", EOW),      # 9
            ("l", "o"),        # 7 (low 5 + lower 2); ties ('o','w') -> lex
            ("lo", "w"),       # 7
        ]

    def test_deterministic_tie_break(self):
        # all pair counts equal: lexicographic order decides, and dict
        # insertion order must not leak into the result
        m1 = train_merges({"ab": 2, "cd": 2}, 3)
        m2 = train_merges({"cd": 2, "ab": 2}, 3)
        assert m1 == m2
        assert m1[0] == ("a", "b")  # 'a..' < 'c..'
        assert m1[1] == ("ab", EOW)  # '<' sorts before letters

    def test_singleton_pairs_not_memorized(self):
        # a word seen once never merges (cutoff at count 2)
        assert train_merges({"xyz": 1}, 10) == []

    def test_saturation_collapses_vocab(self):
        merges = train_merges(SENNRICH, 100)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in SENNRICH:
            assert encode_word(w, ranks) == [w + EOW]


class TestEncode:
    def test_unseen_word_segments_by_learned_units(self):
        # 'lowest' is NOT in the corpus; classic result: low + est</w>
        merges = train_merges(SENNRICH, 100)
        ranks = {p: i for i, p in enumerate(merges)}
        assert encode_word("lowest", ranks) == ["low", "est" + EOW]

    def test_empty_ranks_chars_out(self):
        assert encode_word("ab", {}) == ["a", "b", EOW]


class TestSpark:
    def test_train_partitioning_invariant(self, spark, documents):
        a = train_bpe(documents.repartition(1), n_merges=50)
        b = train_bpe(documents.repartition(7, "doc_id"), n_merges=50)
        assert a == b and len(a) == 50

    def test_word_counts_exact(self, spark):
        df = spark.createDataFrame(
            [(0, "a b a"), (1, "b c")], "doc_id long, text string"
        )
        got = {r["word"]: r["n"] for r in word_counts(df).collect()}
        assert got == {"a": 2, "b": 2, "c": 1}

    def test_encode_round_trip_and_saturation(self, spark, documents):
        d = documents.limit(60)
        merges = train_bpe(documents, n_merges=500)
        out = bpe_encode(d, merges, with_tokens=True)
        rows = out.collect()
        texts = {
            r["doc_id"]: " ".join((r["text"] or "").lower().split())
            for r in d.collect()
        }
        for r in rows:
            # saturated: one token per word
            assert r["n_tokens"] == r["n_words"]
            # detokenize inverts encode exactly (whitespace-normalized)
            assert detokenize(list(r["tokens"])) == texts[r["id"]]

    def test_encode_plan_map_only(self, spark, documents):
        merges = train_bpe(documents, n_merges=50)
        plan = (
            bpe_encode(documents, merges)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # encode adds no shuffle
        assert "CartesianProduct" not in plan

"""Dedup operator tests over the driver's documents table + crafted dups."""

import pytest
from pyspark.sql import functions as F

from paddle_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs_with_dups(spark, documents):
    """documents + planted exact/near duplicates of doc 0 and 1."""
    base = documents.select("doc_id", "text")
    rows = base.orderBy("doc_id").limit(2).collect()
    extra = spark.createDataFrame(
        [
            (100000, rows[0]["text"]),                      # exact dup of 0
            (100001, rows[0]["text"]),                      # exact dup of 0
            (100002, rows[1]["text"] + " extra tail"),      # near dup of 1
        ],
        "doc_id long, text string",
    )
    return base.unionByName(extra)


def test_exact_dedup_groups(docs_with_dups):
    groups = D.exact_dedup(docs_with_dups).filter(F.col("n_dups") > 1).collect()
    assert len(groups) == 1
    assert groups[0]["rep_id"] == 0
    assert groups[0]["n_dups"] == 3


def test_drop_exact_dups(docs_with_dups):
    n_total = docs_with_dups.count()
    kept = D.drop_exact_dups(docs_with_dups)
    assert kept.count() == n_total - 2
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 0 in kept_ids and 100000 not in kept_ids and 100001 not in kept_ids


def test_shingles():
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame([("a b c d",), ("x y",)], "text string")
    out = df.select(D.shingles_col(F.col("text"), 3).alias("s")).collect()
    assert out[0]["s"] == ["a b c", "b c d"]
    assert out[1]["s"] == ["x y"]  # shorter than k -> whole text


def test_minhash_lsh_finds_near_dup(docs_with_dups):
    pairs = D.minhash_dedup_candidates(docs_with_dups, num_perm=32, bands=8)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    # exact dups always collide on every band
    assert (0, 100000) in got and (0, 100001) in got and (100000, 100001) in got
    # near dup of doc 1 shares most shingles -> some band should collide
    assert (1, 100002) in got


def test_minhash_signature_deterministic(documents):
    s1 = D.minhash_signatures(documents.limit(20), num_perm=8)
    s2 = D.minhash_signatures(documents.limit(20), num_perm=8)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))


def test_ngram_jaccard(docs_with_dups):
    pairs = D.ngram_jaccard_pairs(docs_with_dups, threshold=0.5)
    got = {(r["a"], r["b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(0, 100000)] == 1.0
    assert got[(100000, 100001)] == 1.0
    assert 0.5 <= got[(1, 100002)] < 1.0


def test_simhash_near_dup(docs_with_dups):
    fp = D.simhash(docs_with_dups)
    vals = {r["doc_id"]: r["simhash"] for r in fp.collect()}
    assert vals[0] == vals[100000] == vals[100001]
    cands = D.simhash_candidates(fp, max_hamming=3)
    got = {(r["a"], r["b"]): r["hamming"] for r in cands.collect()}
    assert got[(0, 100000)] == 0
    assert (1, 100002) in got  # one extra token flips few bits


def test_embedding_near_dups(spark, embeddings):
    # plant a near-identical copy of vec 0
    base = embeddings.select("vec_id", "embedding")
    v0 = base.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    near = [float(x) * 1.001 for x in v0]
    extra = spark.createDataFrame([(900000, near)], "vec_id long, embedding array<float>")
    pairs = D.embedding_near_dups(base.unionByName(extra), threshold=0.999)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (0, 900000) in got


def test_embedding_near_dups_all_jvm(embeddings):
    """No Python UDF in the near-dup plan (stays codegen'd)."""
    plan = D.embedding_near_dups(embeddings.limit(10))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestClustering:
    """cluster_pairs / dedup_transitive: transitive closure of near-dup
    pairs (min-label-propagation connected components) + canonical flag."""

    def test_chain_needs_transitivity(self, spark):
        from paddle_spark.operators.dedup import cluster_pairs

        # 0-1-2-3 chain + 10-11 pair + isolated-by-absence 20
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
        )
        got = {r["doc_id"]: r["cluster_id"] for r in cluster_pairs(pairs).collect()}
        assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10}

    def test_edge_order_and_direction_irrelevant(self, spark):
        from paddle_spark.operators.dedup import cluster_pairs

        # same component expressed with reversed/asymmetric edges
        pairs = spark.createDataFrame(
            [(5, 4), (3, 4), (6, 5), (3, 6)], "id_a long, id_b long"
        )
        got = {r["doc_id"]: r["cluster_id"] for r in cluster_pairs(pairs).collect()}
        assert got == {3: 3, 4: 3, 5: 3, 6: 3}

    def test_dedup_transitive_canonicals(self, spark):
        from paddle_spark.operators.dedup import dedup_transitive

        docs = spark.range(0, 8).withColumnRenamed("id", "doc_id")
        pairs = spark.createDataFrame([(1, 2), (2, 5)], "id_a long, id_b long")
        out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
               for r in dedup_transitive(docs, pairs).collect()}
        assert out[1] == (1, True) and out[2] == (1, False) and out[5] == (1, False)
        # untouched docs are their own canonical singletons
        for d in (0, 3, 4, 6, 7):
            assert out[d] == (d, True)
        kept = sorted(d for d, (_, canon) in out.items() if canon)
        assert kept == [0, 1, 3, 4, 6, 7]

    def test_round_cap_and_long_chain(self, spark):
        from paddle_spark.operators.dedup import cluster_pairs

        n = 12  # diameter 11 — several propagation rounds
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "id_a long, id_b long"
        )
        got = {r["doc_id"]: r["cluster_id"] for r in cluster_pairs(pairs).collect()}
        assert got == {i: 0 for i in range(n + 1)}
        # capped rounds still return a frame (partially converged)
        part = cluster_pairs(pairs, max_rounds=1).collect()
        assert len(part) == n + 1


class TestParagraphDedup:
    def test_boilerplate_dropped_unique_kept(self, spark):
        from paddle_spark.operators.dedup import paragraph_dedup

        boiler = "Subscribe to our newsletter"
        docs = [
            (0, "unique zero\n\n" + boiler + "\n\nalso zero"),
            (1, "unique one\n\n" + boiler),
            (2, "unique two only"),
            (3, boiler),  # nothing survives
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.doc_id: r for r in paragraph_dedup(df).collect()}
        assert got[0].clean_text == "unique zero\n\nalso zero"
        assert (got[0].n_paras_kept, got[0].n_paras_dropped) == (2, 1)
        assert got[1].clean_text == "unique one"
        assert got[2].clean_text == "unique two only"
        assert got[2].n_paras_dropped == 0
        assert got[3].clean_text == "" and got[3].n_paras_kept == 0

    def test_normalized_matching_and_order(self, spark):
        from paddle_spark.operators.dedup import paragraph_dedup

        # case/whitespace-insensitive match; surviving order preserved
        docs = [
            (0, "A\n\n  shared FOOTER  \n\nB\n\nC"),
            (1, "shared footer\n\nD"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.doc_id: r.clean_text for r in paragraph_dedup(df).collect()}
        assert got[0] == "A\n\nB\n\nC"
        assert got[1] == "D"

    def test_threshold(self, spark):
        from paddle_spark.operators.dedup import paragraph_dedup

        docs = [(i, "common\n\nuniq%d" % i) for i in range(3)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        keep_all = paragraph_dedup(df, min_dup_docs=4).collect()
        assert all(r.n_paras_dropped == 0 for r in keep_all)
        strict = {r.doc_id: r.clean_text
                  for r in paragraph_dedup(df, min_dup_docs=2).collect()}
        assert strict == {0: "uniq0", 1: "uniq1", 2: "uniq2"}

    def test_repeated_para_within_one_doc_survives(self, spark):
        from paddle_spark.operators.dedup import paragraph_dedup

        # count is DISTINCT docs: twice in the same doc is not boilerplate
        df = spark.createDataFrame(
            [(0, "x\n\nx\n\ny"), (1, "z")], "doc_id long, text string"
        )
        got = {r.doc_id: r.clean_text for r in paragraph_dedup(df).collect()}
        assert got[0] == "x\n\nx\n\ny"


class TestSpanDedup:
    """ExactSubstr-style duplicated-span removal (dedup.span_dedup)."""

    def _run(self, spark, rows, k=4, min_count=2):
        from paddle_spark.operators.dedup import span_dedup

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r["doc_id"]: r for r in span_dedup(df, k=k, min_count=min_count).collect()
        }

    def test_cross_doc_span_removed_once_unique_survives(self, spark):
        boiler = "all rights reserved worldwide"
        rows = [
            (0, f"alpha beta gamma {boiler} delta"),
            (1, f"epsilon zeta {boiler} eta theta"),
            (2, "totally unique content here nothing shared"),
        ]
        got = self._run(spark, rows, k=4)
        assert got[0]["clean_text"] == "alpha beta gamma delta"
        assert got[1]["clean_text"] == "epsilon zeta eta theta"
        assert got[2]["clean_text"] == rows[2][1]
        assert got[2]["n_dup_spans"] == 0 and got[2]["n_removed"] == 0
        # each doc had exactly one duplicated 4-window, 4 tokens removed
        assert got[0]["n_dup_spans"] == 1 and got[0]["n_removed"] == 4

    def test_overlapping_spans_union(self, spark):
        # 5-token shared run -> two overlapping 4-windows union to 5 tokens
        shared = "one two three four five"
        rows = [(0, f"x {shared} y"), (1, f"p q {shared}")]
        got = self._run(spark, rows, k=4)
        assert got[0]["clean_text"] == "x y"
        assert got[0]["n_dup_spans"] == 2 and got[0]["n_removed"] == 5
        assert got[1]["clean_text"] == "p q"

    def test_within_doc_repeat_counts(self, spark):
        # same 4-gram twice INSIDE one doc: corpus-wide count 2 -> removed
        rows = [(0, "a b c d junk a b c d"), (1, "unrelated words entirely here")]
        got = self._run(spark, rows, k=4)
        assert got[0]["clean_text"] == "junk"
        assert got[1]["n_removed"] == 0

    def test_short_docs_pass_through(self, spark):
        rows = [(0, "one two three"), (1, "one two three"), (2, "")]
        got = self._run(spark, rows, k=4)  # shorter than k: no windows
        for i in (0, 1):
            assert got[i]["clean_text"] == "one two three"
            assert got[i]["n_dup_spans"] == 0
        assert got[2]["clean_text"] == "" and got[2]["n_tokens"] == 0

    def test_min_count_threshold(self, spark):
        shared = "w x y z"
        rows = [(0, f"a {shared}"), (1, f"b {shared}"), (2, f"c {shared}")]
        # min_count=4: three occurrences survive
        got = self._run(spark, rows, k=4, min_count=4)
        assert all(got[i]["n_removed"] == 0 for i in range(3))
        got = self._run(spark, rows, k=4, min_count=3)
        assert all(got[i]["clean_text"].split() == [c] for i, c in
                   zip(range(3), ["a", "b", "c"]))

    def test_partitioning_invariant(self, spark):
        from paddle_spark.operators.dedup import span_dedup

        rows = [(i, f"tok{i % 5} common run of words here tail{i}") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = {r["doc_id"]: r["clean_text"]
             for r in span_dedup(df.coalesce(1), k=4).collect()}
        b = {r["doc_id"]: r["clean_text"]
             for r in span_dedup(df.repartition(16), k=4).collect()}
        assert a == b


def test_words_col_array_remove_equivalence(spark):
    """r6 words_col (array_remove form) == the lambda-filter form on
    adversarial inputs: empty, blank, mixed whitespace, None."""
    from pyspark.sql import functions as F

    samples = ["", "  ", "a b", " a  b ", "\t\na\r\nb\x0b", None, "one",
               "x " * 200]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, s string"
    )
    old = F.filter(F.split(F.trim(F.col("s")), r"\s+"), lambda w: w != "")
    new = D.words_col(F.col("s"))
    assert (
        df.select(old.alias("a"), new.alias("b"))
        .filter("NOT (a <=> b)")
        .count()
        == 0
    )


def test_shingles_col_zip_form_equivalence(spark):
    """r6 shingles_col (arrays_zip form) == the per-index slice transform
    on short/edge/long docs for k in {2, 3, 5}."""
    from pyspark.sql import functions as F

    samples = ["", "one", "one two", "one two three", "a b c d e f g",
               " pad  ded   tokens ", "w " * 100, None]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, s string"
    )
    for k in (2, 3, 5):
        ws = D.words_col(F.col("s"))
        n = F.size(ws)
        idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
        old = F.when(
            n >= k,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, k))),
        ).otherwise(F.array(F.concat_ws(" ", ws)))
        new = D.shingles_col(F.col("s"), k)
        assert (
            df.select(old.alias("a"), new.alias("b"))
            .filter("NOT (a <=> b)")
            .count()
            == 0
        ), f"k={k}"

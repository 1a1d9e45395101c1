"""BM25 retrieval (operators/search.py) vs a plain-Python replay.

The operator's determinism contract: integer tf/df/dl/N, one double
division for avgdl, score = round(sum(idf*tf_norm), 3), rank ordered by
(rounded score DESC, id). The replay computes the identical formula with
math.log so any divergence in the Column math fails the equality.
"""

import math

from pyspark.sql import functions as F

from paddle_spark.operators.search import bm25_topk, build_inverted_index

DOCS = [
    (0, "spark shuffle join spark spark"),
    (1, "broadcast join small table"),
    (2, "shuffle partition skew salt shuffle"),
    (3, "parquet scan pushdown filter scan"),
    (4, "join join join hash hash"),
]
QUERIES = [
    (0, "spark join"),
    (1, "shuffle skew"),
    (2, "missing vocabulary words"),
]


def _python_bm25(docs, queries, k=5, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    out = []
    for qid, q in queries:
        terms = sorted(set(q.lower().split()), key=q.lower().split().index)
        scores = {}
        for t in set(terms):
            hits = {i: ws.count(t) for i, ws in toks.items() if t in ws}
            if not hits:
                continue
            df = len(hits)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            for i, tf in hits.items():
                dl = len(toks[i])
                tfn = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
                scores[i] = scores.get(i, 0.0) + idf * tfn
        ranked = sorted(
            ((round(s, 3), i) for i, s in scores.items()),
            key=lambda p: (-p[0], p[1]),
        )
        for rk, (s, i) in enumerate(ranked[:k], 1):
            out.append((qid, i, s, rk))
    return set(out)


def _frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id long, query string")
    return docs, queries


def test_index_relations_exact(spark):
    docs, _ = _frames(spark)
    postings, doc_lens, stats = build_inverted_index(docs)
    got = {(r["term"], r["id"]): r["tf"] for r in postings.collect()}
    assert got[("spark", 0)] == 3 and got[("join", 4)] == 3
    assert got[("scan", 3)] == 2
    dls = {r["id"]: r["dl"] for r in doc_lens.collect()}
    assert dls == {i: len(t.split()) for i, t in DOCS}
    srow = stats.collect()[0]
    assert srow["n_docs"] == 5
    assert srow["avgdl"] == sum(len(t.split()) for _, t in DOCS) / 5


def test_topk_matches_python_replay(spark):
    docs, queries = _frames(spark)
    got = {
        (r["query_id"], r["id"], r["score"], r["rk"])
        for r in bm25_topk(docs, queries).collect()
    }
    assert got == _python_bm25(DOCS, QUERIES)
    # sanity on the ordering itself: doc 0 (3x spark) tops query 0
    top = {(q, rk): i for q, i, s, rk in got}
    assert top[(0, 1)] == 0
    # query 2 has no matching vocabulary -> zero rows
    assert not [1 for q, *_ in got if q == 2]


def test_k_truncates(spark):
    docs, queries = _frames(spark)
    got = bm25_topk(docs, queries, k=1).collect()
    per_q = {}
    for r in got:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert all(v == 1 for v in per_q.values())


def test_duplicate_query_terms_count_once(spark):
    docs, _ = _frames(spark)
    q1 = spark.createDataFrame([(0, "join join join")], "query_id long, query string")
    q2 = spark.createDataFrame([(0, "join")], "query_id long, query string")
    a = {tuple(r) for r in bm25_topk(docs, q1).collect()}
    b = {tuple(r) for r in bm25_topk(docs, q2).collect()}
    assert a == b


def test_partitioning_invariant(spark):
    docs, queries = _frames(spark)
    a = {tuple(r) for r in bm25_topk(docs.repartition(1), queries).collect()}
    b = {
        tuple(r)
        for r in bm25_topk(docs.repartition(5, "doc_id"), queries).collect()
    }
    assert a == b


def test_fused_single_pass_matches_index_paths(spark):
    """r6 fusion: when no index is passed, doc_lens and postings derive
    from ONE persisted (id, dl0, probe-filtered-tokens) pass. All three
    entry shapes — fused, full index triple, bare-postings index — must
    produce identical rows (and match the Python replay via the fused
    path, which test_topk_matches_python_replay already pins)."""
    docs, queries = _frames(spark)
    fused = {tuple(r) for r in bm25_topk(docs, queries).collect()}
    triple = build_inverted_index(docs)
    via_triple = {
        tuple(r) for r in bm25_topk(docs, queries, use_index=triple).collect()
    }
    via_postings = {
        tuple(r)
        for r in bm25_topk(docs, queries, use_index=triple[0]).collect()
    }
    assert fused == via_triple == via_postings
    # blank/edge docs: a doc whose text tokenizes to nothing must be
    # excluded from doc_lens by the fused path exactly as before, and a
    # probe term repeated within a doc keeps its full tf
    docs2 = spark.createDataFrame(
        DOCS + [(5, "   "), (6, "spark spark spark spark")],
        "doc_id long, text string",
    )
    got = {
        (r["query_id"], r["id"], r["score"], r["rk"])
        for r in bm25_topk(docs2, queries).collect()
    }
    expect = _python_bm25(
        DOCS + [(6, "spark spark spark spark")], QUERIES
    )
    assert got == expect


def test_plan_no_udf_no_cartesian_broadcast_probe(spark):
    docs, queries = _frames(spark)
    plan = (
        bm25_topk(docs, queries)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # query-side probes ride as broadcast joins
    assert "BroadcastHashJoin" in plan

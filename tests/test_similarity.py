"""Similarity-search operator tests over the embeddings table."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from paddle_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb_np(embeddings):
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def _numpy_topk(ids, mat, qid, k=5):
    qi = np.where(ids == qid)[0][0]
    q = mat[qi]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    cos[qi] = -np.inf
    # match the plan's tie-break: cosine desc, then vec_id asc
    order = sorted(range(len(ids)), key=lambda i: (-round(cos[i], 6), ids[i]))
    return [ids[i] for i in order[:k]]


def test_brute_force_topk_matches_numpy(embeddings, emb_np):
    ids, mat = emb_np
    queries = embeddings.filter(F.col("vec_id") < 3)
    out = S.brute_force_topk(embeddings, queries, k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["cid"]))
    for qid in (0, 1, 2):
        spark_ids = [cid for _, cid in sorted(got[qid])]
        assert spark_ids == _numpy_topk(ids, mat, qid, 5), f"q{qid}"


def test_topk_ranks_contiguous(embeddings):
    out = S.brute_force_topk(embeddings.limit(50), embeddings.limit(2), k=3)
    for qid, grp in [(0, []), (1, [])]:
        ranks = [r["rank"] for r in out.filter(F.col("qid") == qid).collect()]
        assert sorted(ranks) == [1, 2, 3]


def test_lsh_topk_bucket_recall(embeddings):
    """LSH neighbors must be a plausible subset: every returned neighbor
    shares the query's bucket, and the #1 brute-force neighbor is found
    whenever it hashes into the same bucket."""
    queries = embeddings.filter(F.col("vec_id") < 5)
    exact = S.brute_force_topk(embeddings, queries, k=1)
    approx = S.lsh_topk(embeddings, queries, k=5, n_planes=4)
    ex = {r["qid"]: r["cid"] for r in exact.collect()}
    ap = {}
    for r in approx.collect():
        ap.setdefault(r["qid"], set()).add(r["cid"])
    planes = S.hyperplanes(64, 4, 42)
    b = embeddings.select(
        "vec_id",
        S.lsh_bucket_col(
            F.transform(F.col("embedding"), lambda x: x.cast("double")), planes
        ).alias("bucket"),
    )
    buckets = {r["vec_id"]: r["bucket"] for r in b.collect()}
    for qid, best in ex.items():
        if buckets[best] == buckets[qid]:
            assert best in ap.get(qid, set()), (qid, best)


def test_lsh_deterministic(embeddings):
    q = embeddings.limit(3)
    a = sorted(map(tuple, S.lsh_topk(embeddings, q, k=3).collect()))
    b = sorted(map(tuple, S.lsh_topk(embeddings, q, k=3).collect()))
    assert a == b


def test_ivf_assign(embeddings):
    cents = S.deterministic_centroids(embeddings, n_cells=4)
    assert len(cents) == 4
    out = S.ivf_assign(embeddings, cents)
    rows = out.collect()
    assert len(rows) == embeddings.count()
    cells = {r["cell"] for r in rows}
    assert cells <= {0, 1, 2, 3}
    # centroid vectors themselves land in their own cell with cosine ~1
    own = {r["vec_id"]: r for r in rows if r["vec_id"] < 4}
    ordered = sorted(own)
    for i, vid in enumerate(ordered):
        assert own[vid]["centroid_cosine"] >= 0.999999


def test_no_python_udf_in_plans(embeddings):
    q = embeddings.limit(2)
    for df in (
        S.brute_force_topk(embeddings.limit(20), q, k=2),
        S.lsh_topk(embeddings.limit(20), q, k=2),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bucketed_near_dups_recall_vs_exact(spark, embeddings):
    """Planted near-dups (tiny deterministic perturbation, cosine ~0.9997)
    must all be recovered by the banded LSH path, and every returned pair
    must appear in the exact pairwise result (precision 1.0)."""
    from paddle_spark.operators.dedup import embedding_near_dups

    base = embeddings.select("vec_id", "embedding").limit(200)
    # perturb: scale every coordinate by 1.02 and add a small constant to
    # the first one via JVM-side transform — near-identical direction
    planted = base.filter(F.col("vec_id") < 8).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: (x * 1.02 + F.when(i == 0, F.lit(0.01)).otherwise(F.lit(0.0))).cast("float")
        ).alias("embedding"),
    )
    u = base.unionByName(planted)
    approx = S.bucketed_near_dups(u, threshold=0.95, n_bands=8, planes_per_band=4)
    exact = embedding_near_dups(u, threshold=0.95)
    ap = {(r["a"], r["b"]) for r in approx.collect()}
    ex = {(r["a"], r["b"]) for r in exact.collect()}
    planted_pairs = {(v, v + 10000) for v in range(8)}
    assert planted_pairs <= ex, "planted dups must clear the exact threshold"
    assert planted_pairs <= ap, "banded LSH must recover every planted dup"
    assert ap <= ex, "LSH output must be a subset of exact pairs (precision 1)"


def test_bucketed_near_dups_no_cartesian(embeddings):
    """The candidate join must be a hash equi-join on (band, bucket) —
    never a cartesian/BNLJ product."""
    out = S.bucketed_near_dups(embeddings.limit(50))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_multi_probe_recall(spark):
    """Multi-probe LSH: planted near-twins that land ONE sign bit away
    from their query are invisible at n_probe=1 but recovered as n_probe
    grows; recall is monotone in n_probe and the plan stays an equi-join
    (never a cartesian)."""
    rng = np.random.RandomState(7)
    dim, n_planes = 16, 6
    planes = np.array(S.hyperplanes(dim, n_planes, seed=42))

    base = rng.normal(size=(40, dim))
    rows, qrows = [], []
    planted = {}
    for i, v in enumerate(base):
        qrows.append((i, [float(x) for x in v]))
        # twin: reflect v across its weakest plane -> flips exactly that
        # sign bit, tiny geometric move (guaranteed Hamming-1 neighbor)
        d = planes @ v
        j = int(np.argmin(np.abs(d)))
        p = planes[j]
        t = v - 2 * d[j] / (p @ p) * p * 1.001  # nudge past the plane
        rows.append((10_000 + i, [float(x) for x in t]))
        planted[i] = 10_000 + i
    # distractors so buckets aren't empty
    for i, v in enumerate(rng.normal(size=(200, dim))):
        rows.append((20_000 + i, [float(x) for x in v]))

    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(qrows, "vec_id long, embedding array<double>")

    def recall(n_probe):
        out = S.lsh_topk(
            corpus, queries, k=3, n_planes=n_planes, dim=dim, n_probe=n_probe
        )
        got = {}
        for r in out.collect():
            got.setdefault(r["qid"], set()).add(r["cid"])
        return sum(
            1 for q, t in planted.items() if t in got.get(q, set())
        ) / len(planted)

    r1, r2, rall = recall(1), recall(2), recall(n_planes + 1)
    assert r1 < 0.2          # twins are Hamming-1 by construction
    assert r2 >= r1
    assert rall >= 0.95      # probing every 1-bit flip recovers them
    # weakest-margin-first: 2 probes already recover most twins (the twin
    # flipped exactly the query's weakest plane)
    assert r2 >= 0.9
    plan = S.lsh_topk(
        corpus, queries, k=3, n_planes=n_planes, dim=dim, n_probe=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_n_probe_one_unchanged(embeddings):
    """n_probe=1 is byte-identical to the pre-knob behavior."""
    q = embeddings.filter(F.col("vec_id") < 3)
    a = sorted(map(tuple, S.lsh_topk(embeddings, q, k=3).collect()))
    b = sorted(map(tuple, S.lsh_topk(embeddings, q, k=3, n_probe=1).collect()))
    assert a == b


def test_ivf_train_rounds_improve_quantization(embeddings):
    """Each k-means round must not worsen mean cosine-to-centroid
    (monotone improvement up to rounding), stay deterministic, and keep
    driver state bounded at n_cells rows per round."""
    def mean_cos(cents):
        out = S.ivf_assign(embeddings, cents)
        rows = out.agg(F.avg("centroid_cosine")).collect()
        return rows[0][0]

    c0 = S.deterministic_centroids(embeddings, n_cells=8)
    c1 = S.ivf_train(embeddings, n_cells=8, n_rounds=1)
    c2 = S.ivf_train(embeddings, n_cells=8, n_rounds=2)
    m0, m1, m2 = mean_cos(c0), mean_cos(c1), mean_cos(c2)
    assert m1 >= m0 - 1e-6 and m2 >= m1 - 1e-6
    assert m1 > m0 + 0.01          # one round genuinely moves centroids
    # determinism
    again = S.ivf_train(embeddings, n_cells=8, n_rounds=1)
    assert again == c1
    # centroid count and dim preserved
    assert len(c1) == 8 and all(len(v) == 64 for _, v in c1)

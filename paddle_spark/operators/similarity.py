"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exact baseline (cross join + window),
  correct at any scale where |queries| is small and the corpus join is
  broadcast-or-shuffle as Catalyst chooses.
- LSH (random hyperplane) bucketing: the scale path — restrict candidate
  generation to same-bucket vectors; planes are deterministic (seeded
  NumPy on the driver, shipped as literals) so results are reproducible.
- IVF-lite: coarse quantization to deterministic centroids + nprobe search.

All distance math stays JVM-side (zip_with/aggregate); no Python UDFs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from paddle_spark.operators.dedup import cosine_sim_col


def _as_double(vec_col: str) -> Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self).

    Plan: broadcast(queries) cross-join corpus -> cosine -> per-query
    window top-k. With Q queries this is Q*N distance evals, map-only
    after the broadcast; the shuffle is only the final top-k aggregation.
    """
    c = corpus.select(
        F.col(id_col).alias("cid"), _as_double(vec_col).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(vec_col).alias("qv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            F.round(cosine_sim_col(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, shipped as literals)."""
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).round(6).tolist()


def _plane_dots(vec: Column, planes: list[list[float]]) -> list[Column]:
    """dot(vec, plane_j) for every hyperplane, JVM-side."""
    dots = []
    for plane in planes:
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dots.append(
            F.aggregate(
                F.zip_with(vec, lit_plane, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    return dots


def _bucket_from_dots(dots: list[Column]) -> Column:
    """Sign-bit fold: bucket = sum_j (dot_j > 0) << j. The SINGLE home of
    the bit convention — multi-probe reuses the same dot columns, so
    corpus buckets and query probe buckets can never desynchronize."""
    bucket = F.lit(0).cast("long")
    for j, dot in enumerate(dots):
        bucket = bucket + F.when(
            dot > 0, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from random hyperplane projections, JVM-side."""
    return _bucket_from_dots(_plane_dots(vec, planes))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    n_probe: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    The candidate join is an equi-join on bucket — at 10^9 vectors this is
    the difference between N*Q and (N/2^p)*Q distance evaluations. Recall
    is tunable two ways: n_planes (fewer planes = bigger buckets = higher
    recall/cost) and n_probe (multi-probe LSH): with ``n_probe`` > 1 each
    query ALSO probes the n_probe-1 Hamming-1 buckets whose flipped plane
    has the smallest projection margin |dot(q, plane)| — exactly the
    planes a true neighbor most likely lands across. The probe fan-out is
    query-side only (Q rows explode to Q*n_probe; corpus layout and the
    equi-join shape are untouched), so cost scales linearly in n_probe
    and the plan never degrades to a cartesian.
    """
    n_probe = max(1, min(int(n_probe), n_planes + 1))
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("cid"), _as_double(vec_col).alias("cv")
    ).withColumn("bucket", lsh_bucket_col(F.col("cv"), planes))
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(vec_col).alias("qv")
    )
    dots = _plane_dots(F.col("qv"), planes)
    base = _bucket_from_dots(dots)
    if n_probe > 1:
        # planes sorted by |margin| ascending; flip the weakest first
        # each struct carries its plane's PRECOMPUTED shiftleft bit mask —
        # the same integer convention as _bucket_from_dots (the single home
        # of the bit layout); sort order is unchanged because 1<<j is
        # monotonic in j (ties on equal margins still break by plane index)
        margins = F.array_sort(
            F.array(
                *[
                    F.struct(
                        F.abs(dots[j]).alias("m"),
                        F.shiftleft(F.lit(1).cast("long"), j).alias("mask"),
                    )
                    for j in range(len(planes))
                ]
            )
        )
        flips = F.slice(margins, 1, n_probe - 1)
        probes = F.concat(
            F.array(base),
            F.transform(flips, lambda s: base.bitwiseXOR(s["mask"])),
        )
    else:
        probes = F.array(base)
    q = q.withColumn("bucket", F.explode(probes))
    scored = (
        c.join(F.broadcast(q), (F.col("qid") != F.col("cid")) & (c.bucket == q.bucket))
        .select(
            "qid",
            "cid",
            F.round(cosine_sim_col(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def bucketed_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bands: int = 8,
    planes_per_band: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs via banded hyperplane LSH — the scale path
    that replaces ``dedup.embedding_near_dups``'s all-pairs theta join.

    Candidate generation is an equi-join on ``(band, bucket)`` after an
    explode to ``n_bands`` rows per vector: two vectors are candidates iff
    they share ALL ``planes_per_band`` sign bits in at least one band
    (minhash-LSH band construction applied to random hyperplanes). At 10^9
    vectors this is O(sum of bucket^2 per band) instead of O(N^2); recall
    for cosine >= 0.95 with 8x4 bands is ~1 - 3.5e-4 (P[same side of one
    plane] = 1 - theta/pi). Pairs found in several bands are deduped; the
    final cosine >= threshold filter makes the output a subset of the exact
    pairs (precision 1.0, recall tunable via bands).

    Returns (a, b, cosine) with a < b, matching embedding_near_dups.
    """
    planes = hyperplanes(dim, n_bands * planes_per_band, seed)
    v = emb.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                lsh_bucket_col(
                    F.col("v"),
                    planes[b * planes_per_band : (b + 1) * planes_per_band],
                ).alias("bkey"),
            )
            for b in range(n_bands)
        ]
    )
    e = v.select("id", "v", F.explode(band_entries).alias("bb")).select(
        "id", "v", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )
    a, b = e.alias("a"), e.alias("b")
    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("a"),
        F.col("b.id").alias("b"),
        F.round(cosine_sim_col(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
    )
    return cand.filter(F.col("cosine") >= threshold).dropDuplicates(["a", "b"])


def ivf_assign(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (centroids are driver-side literals — deterministic, broadcast-free).

    Returns (id, cell, cosine_to_centroid). The argmax is a JVM-side
    array_max over a transform — no shuffle at all.
    """
    v = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    scored = F.array(
        *[
            F.struct(
                F.round(
                    cosine_sim_col(
                        F.col("v"), F.array(*[F.lit(float(x)) for x in cvec])
                    ),
                    6,
                ).alias("cos"),
                F.lit(cid).alias("cell"),
            )
            for cid, cvec in centroids
        ]
    )
    best = F.array_max(scored)
    return v.select(
        F.col(id_col),
        best["cell"].alias("cell"),
        best["cos"].alias("centroid_cosine"),
    )


def ivf_train(
    emb: DataFrame,
    n_cells: int = 8,
    n_rounds: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """K-means refinement of the IVF coarse quantizer — the iterative
    algorithm expressed DataFrame-native, no RDDs, no driver-side corpus:

    each round = assign (map-only argmax over centroid literals, zero
    shuffle) -> posexplode(v) -> groupBy(cell, dim).avg (ONE shuffle of
    n_cells x dim partial sums thanks to map-side combine) -> collect
    exactly n_cells rows. Driver state is bounded at n_cells x dim
    floats per round regardless of corpus size; at 10^9 vectors the
    per-round cost is a scan plus that one tiny aggregation.

    Means round to 6 decimals so refined centroids are reproducible
    across engines (the exact-oracle contract); empty cells keep their
    previous centroid."""
    cents = deterministic_centroids(emb, n_cells, id_col, vec_col)
    v = emb.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    for _ in range(n_rounds):
        scored = F.array(
            *[
                F.struct(
                    F.round(
                        cosine_sim_col(
                            F.col("v"), F.array(*[F.lit(float(x)) for x in cvec])
                        ),
                        6,
                    ).alias("cos"),
                    F.lit(cid).alias("cell"),
                )
                for cid, cvec in cents
            ]
        )
        assigned = v.withColumn("cell", F.array_max(scored)["cell"])
        new_rows = (
            assigned.select("cell", F.posexplode("v").alias("dim", "val"))
            .groupBy("cell", "dim")
            .agg(F.round(F.avg("val"), 6).alias("m"))
            .groupBy("cell")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm")
            )
            .collect()
        )
        refined = {
            int(r["cell"]): [float(x["m"]) for x in r["dm"]] for r in new_rows
        }
        cents = [(cid, refined.get(cid, cvec)) for cid, cvec in cents]
    return cents


def deterministic_centroids(
    emb: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Pick the n_cells lowest-id vectors as centroids (deterministic
    seeding; a real deployment would run a few k-means rounds — each round
    is one groupBy(cell).agg(avg per dim), still DataFrame-native)."""
    rows = (
        emb.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
        .orderBy("id")
        .limit(n_cells)
        .collect()
    )
    return [(i, list(r["v"])) for i, r in enumerate(rows)]

"""Crawl-graph operators: host link graph + link-based quality rank.

Webtext pipelines gate and weight domains not only by content signals
(curate.domain_stats) but by link-graph centrality — Common Crawl
publishes harmonic-centrality host ranks and OpenWebText-style corpora
filter by inbound-link evidence. This module builds the host edge list
from extracted outlinks and computes a PageRank-style rank over it.

Determinism contract: classic PageRank iterates on floats, whose
shuffle-order-dependent summation breaks exact replay across engines.
`host_rank` therefore runs FIXED-POINT integer PageRank: ranks live in
micro-units (long), each contribution is an exact integer division
(`div`), and per-target sums are long sums (order-independent). Every
engine that replays the same unrolled iterations gets bit-identical
ranks — the same trick textstats.hashed_linear_score uses for its
surrogate model. Dangling hosts (no outlinks) simply leak their mass,
the standard simplification (Page et al. 1999 §2.5 note on dangling
links; re-normalization is a post-scale constant and gates nothing).

Scale: each iteration is one equi-join of edges with the rank table on
src (shuffle on src) plus one groupBy(dst) (map-side partial sum, then
shuffle on dst) plus one left join back to the host universe — all
hash-partitioned equi-joins, no broadcast of anything corpus-sized. At
10^12 pages the host universe is ~10^8 rows and the distinct host edge
list ~10^9-10^10: both flow through ordinary shuffles; AQE's skew split
handles mega-hubs (news hosts with 10^6 in-edges are one hot reduce key
in the contribution sum, which partial aggregation has already
collapsed to one row per map partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: ranks are stored in micro-units (1.0 == 1_000_000)
RANK_SCALE = 1_000_000


def host_edges(
    df: DataFrame, url_col: str = "url", html_col: str = "text"
) -> DataFrame:
    """Distinct host-level link edges (src_host, dst_host) harvested from
    a page frame: outlink extraction (functions.outlinks_col) + host
    normalization (functions.host_col) + self-loop drop + distinct.
    The explode is map-only; distinct is the one shuffle."""
    from paddle_spark.functions import host_col, outlinks_col

    return (
        df.select(
            host_col(F.col(url_col)).alias("src"),
            F.explode(outlinks_col(F.col(html_col))).alias("link"),
        )
        .select("src", host_col(F.col("link")).alias("dst"))
        .filter((F.col("dst") != "") & (F.col("src") != F.col("dst")))
        .distinct()
    )


def host_rank(
    edges: DataFrame,
    n_iter: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = RANK_SCALE,
) -> DataFrame:
    """Fixed-point integer PageRank over a (src, dst) host edge list.

    R0(h) = scale for every host in the graph (src or dst side).
    R_{t+1}(h) = base + (damping_num * sum_{(s,h) in E} R_t(s) div
    outdeg(s)) div damping_den, with base = (scale * (damping_den -
    damping_num)) div damping_den. All arithmetic is exact long math, so
    the result is independent of partitioning and replayable in any SQL
    engine by unrolling the same iterations (see the driver oracle).

    Returns (host, rank_u, rank): the raw micro-unit long and the
    float rendering rounded to 6 (one exact long/long division).
    """
    # The edge list, host universe and outdegree table are consumed by
    # EVERY iteration: materialize them once (localCheckpoint — the
    # standard iterative-algorithm hygiene here, same as cluster_pairs /
    # ivf_train) instead of letting each iteration re-derive the
    # edge-distinct shuffle; each iteration's rank table is checkpointed
    # too so iteration t's plan is O(1), not O(t), and Catalyst planning
    # time stays flat. Results are exact long math — identical with or
    # without the materialization.
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    hosts = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    base = (scale * (damping_den - damping_num)) // damping_den

    ranks = hosts.select("host", F.lit(scale).cast("long").alias("rank_u"))
    for i in range(n_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("host", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("host"),
                F.expr("rank_u div outdeg").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = hosts.join(contribs, "host", "left").select(
            "host",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_num} * coalesce(contrib, 0)) div {damping_den}"
                )
            ).cast("long").alias("rank_u"),
        )
        if i < n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "host",
        "rank_u",
        F.round(F.col("rank_u") / F.lit(float(scale)), 6).alias("rank"),
    )

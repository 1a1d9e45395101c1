"""Crawl-graph operators: host_edges harvesting + fixed-point PageRank.

The rank test replays the exact integer iteration in plain Python — the
operator's determinism contract is that ANY faithful replay (Python,
DuckDB, Spark at any partitioning) produces bit-identical rank_u longs.
"""

from pyspark.sql import functions as F

from paddle_spark.operators.graph import RANK_SCALE, host_edges, host_rank


def _python_pagerank(edges, n_iter=5, scale=RANK_SCALE, num=85, den=100):
    hosts = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (scale * (den - num)) // den
    rank = {h: scale for h in hosts}
    for _ in range(n_iter):
        contrib = {h: 0 for h in hosts}
        for s, d in edges:
            contrib[d] += rank[s] // outdeg[s]
        rank = {h: base + (num * contrib[h]) // den for h in hosts}
    return rank


def test_host_edges_harvest(spark):
    rows = [
        (
            "https://WWW.A.com/page",
            '<a href="https://b.com/x">1</a> <a href="HTTP://C.org/y?z=1">2</a>'
            ' <a href="https://a.com/self">self</a> <a href="/rel">rel</a>',
        ),
        ("https://b.com/p", '<a href="https://a.com/back">back</a>'),
        ("https://b.com/q", '<a href="https://a.com/other">dup host pair</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {(r["src"], r["dst"]) for r in host_edges(df).collect()}
    # self-loop dropped, relative link ignored, host-pair distinct,
    # www./case normalized
    assert got == {("a.com", "b.com"), ("a.com", "c.org"), ("b.com", "a.com")}


def test_host_rank_matches_python_replay(spark):
    # ring + hub: 0->1->2->3->0, everyone also links to the hub 'h'
    edges = [(f"n{i}", f"n{(i + 1) % 4}") for i in range(4)] + [
        (f"n{i}", "h") for i in range(4)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    expected = _python_pagerank(edges)
    got = {r["host"]: r["rank_u"] for r in host_rank(df).collect()}
    assert got == expected
    # the hub (4 in-edges) outranks every ring node (1 in-edge each)
    assert got["h"] > max(v for k, v in got.items() if k != "h")
    # dangling hub contributes nothing but still holds the base floor
    assert got["h"] >= (RANK_SCALE * 15) // 100


def test_host_rank_partitioning_invariant(spark):
    edges = [(f"s{i % 7}", f"s{(i * 3 + 1) % 7}") for i in range(40) if i % 7 != (i * 3 + 1) % 7]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = {r["host"]: r["rank_u"] for r in host_rank(df.coalesce(1)).collect()}
    b = {r["host"]: r["rank_u"] for r in host_rank(df.repartition(16)).collect()}
    assert a == b == _python_pagerank(sorted(set(edges)))


def test_host_rank_float_rendering(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    rows = {r["host"]: r for r in host_rank(df, n_iter=1).collect()}
    # a is dangling-in: base only; b gets a's full scale through outdeg 1
    assert rows["a"]["rank_u"] == 150000
    assert rows["b"]["rank_u"] == 150000 + (85 * RANK_SCALE) // 100
    assert rows["a"]["rank"] == 0.15
    assert rows["b"]["rank"] == 1.0

"""sitemap.xml parsing + frontier seeding tests."""

from __future__ import annotations

from paddle_spark.operators.sitemap import frontier_urls, sitemap_entries

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.example/p?x=1&amp;y=2</loc>
    <lastmod>2024-05-01</lastmod>
  </url>
  <url><loc>
      https://a.example/q
  </loc></url>
  <url><changefreq>daily</changefreq></url>
</urlset>
"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://b.example/sitemap1.xml</loc>
    <lastmod>2024-01-02T03:04:05Z</lastmod></sitemap>
  <sitemap><loc>https://b.example/sitemap2.xml</loc></sitemap>
</sitemapindex>
"""


def _df(spark, rows):
    return spark.createDataFrame(rows, "host string, sitemap_xml string")


def test_urlset_parses_locs_entities_lastmod(spark):
    got = sitemap_entries(_df(spark, [("a.example", URLSET)])).collect()
    rows = {(r["kind"], r["loc"]): r["lastmod"] for r in got}
    # entity unescape + whitespace trim; loc-less block dropped
    assert rows == {
        ("url", "https://a.example/p?x=1&y=2"): "2024-05-01",
        ("url", "https://a.example/q"): None,
    }


def test_sitemapindex_children_are_kind_sitemap(spark):
    got = sitemap_entries(_df(spark, [("b.example", INDEX)])).collect()
    rows = {(r["kind"], r["loc"]): r["lastmod"] for r in got}
    assert rows == {
        ("sitemap", "https://b.example/sitemap1.xml"): "2024-01-02T03:04:05Z",
        ("sitemap", "https://b.example/sitemap2.xml"): None,
    }
    # the <sitemapindex> open tag itself must not match the <sitemap> block
    assert len(got) == 2


def test_garbage_yields_zero_rows(spark):
    bad = [("c.example", "<html>not a sitemap</html>"),
           ("d.example", "\x00\xff binary soup"),
           ("e.example", "<urlset><url><loc></loc></url></urlset>")]
    assert sitemap_entries(_df(spark, bad)).count() == 0


def test_frontier_anti_joins_known_urls(spark):
    entries = sitemap_entries(_df(spark, [("a.example", URLSET)]))
    # known corpus already has /q (module canonical form); /p is new
    known = spark.createDataFrame(
        [("https://a.example/q",), ("https://other.example/z",)], "url string"
    )
    got = frontier_urls(entries, known).collect()
    assert [r["loc"] for r in got] == ["https://a.example/p?x=1&y=2"]
    assert got[0]["lastmod"] == "2024-05-01"


def test_frontier_plan_is_hash_anti_join(spark):
    entries = sitemap_entries(_df(spark, [("a.example", URLSET)]))
    known = spark.createDataFrame([("https://a.example/q",)], "url string")
    plan = frontier_urls(entries, known)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

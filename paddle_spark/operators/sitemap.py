"""sitemap.xml parsing — the crawl-frontier companion of robots.txt.

Sitemaps are how hosts advertise their URL inventory (sitemaps.org
protocol): ``<urlset>`` documents list page URLs with optional
``<lastmod>``, ``<sitemapindex>`` documents list child sitemaps. A
Common-Crawl-style pipeline consumes them to seed/refresh the frontier,
so bodies ride alongside the corpus exactly like robots.txt bodies do
(operators/robots.py) and parsing must be a DataFrame plan, not a
per-row XML library call.

Parsing plan: regexp_extract_all splits each body into its
``<url>``/``<sitemap>`` blocks (one explode), then per-block
regexp_extract pulls ``<loc>``/``<lastmod>`` and a replace chain
unescapes the five XML entities — all JVM-side Column ops, no UDF.
Namespace prefixes and CDATA are out of scope (documented subset;
real-web sitemaps overwhelmingly use the plain form).

Scale: bodies are host-sized; the explode fans one body into its ≤50k
entries (the spec's own cap) map-side. ``frontier_urls`` is one hash
anti-join of advertised locs against the known-url corpus — the
incremental-crawl seed step — with the canonicalized loc as join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_BLOCK = r"(?is)<url[\s>].*?</url>"
_MAP_BLOCK = r"(?is)<sitemap[\s>].*?</sitemap>"


def _xml_unescape(c):
    for ent, ch in [
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),  # ampersand LAST
    ]:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def sitemap_entries(
    df: DataFrame, host_col: str = "host", body_col: str = "sitemap_xml"
) -> DataFrame:
    """Parse sitemap bodies into (host, kind, loc, lastmod) rows.

    ``kind`` is ``'url'`` for page entries of a ``<urlset>`` and
    ``'sitemap'`` for children of a ``<sitemapindex>`` (feed those back
    through fetch -> sitemap_entries for one level of recursion, the
    protocol's own nesting limit). Blocks without a ``<loc>`` are
    dropped; ``lastmod`` is NULL when absent. Garbage bodies simply
    yield zero rows — regexp extraction never throws."""
    body = F.col(body_col)
    parts = []
    for kind, pat in [("url", _URL_BLOCK), ("sitemap", _MAP_BLOCK)]:
        blocks = F.regexp_extract_all(body, F.lit(pat), 0)
        e = (
            df.select(F.col(host_col).alias("host"), F.explode(blocks).alias("b"))
            .select(
                "host",
                F.lit(kind).alias("kind"),
                _xml_unescape(
                    F.regexp_extract(F.col("b"), r"(?is)<loc>\s*(.*?)\s*</loc>", 1)
                ).alias("loc"),
                F.nullif(
                    F.regexp_extract(
                        F.col("b"), r"(?is)<lastmod>\s*(.*?)\s*</lastmod>", 1
                    ),
                    F.lit(""),
                ).alias("lastmod"),
            )
            .where(F.col("loc") != "")
        )
        parts.append(e)
    return parts[0].unionByName(parts[1])


def frontier_urls(
    entries: DataFrame, known: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Advertised page URLs not yet in the corpus — the incremental-crawl
    seed: canonicalize both sides' urls and hash anti-join (left_anti on
    the canonical key; the known side carries only its key column into
    the exchange, so the join cost is O(|entries| + |known urls|), never
    corpus-row-sized)."""
    from paddle_spark.functions import canonical_url_col

    adv = entries.where(F.col("kind") == "url").select(
        "host", "loc", "lastmod", canonical_url_col(F.col("loc")).alias("ckey")
    )
    seen = known.select(canonical_url_col(F.col(url_col)).alias("ckey")).distinct()
    return adv.join(seen, "ckey", "left_anti").drop("ckey")

"""robots.txt parsing and URL gating (RFC 9309 deterministic core).

Politeness is a first-class stage of any Common-Crawl-style pipeline:
fetched `robots.txt` bodies ride alongside the page corpus, and the URL
frontier is gated by them. Both halves are pure DataFrame plans:

- `robots_rules` parses raw robots.txt bodies into (host, agent,
  directive, path) rows. The stateful part of the format — a rule
  belongs to the most recent RUN of consecutive ``User-agent`` lines —
  is expressed with window functions (lag + running sum forms group
  ids), not a Python parser: posexplode lines once, then everything is
  JVM-side.
- `robots_gate` applies the rules to a URL frame for one agent string:
  RFC 9309 group selection (a host's specific-agent group shadows its
  ``*`` group when present) and longest-path-match-wins with Allow
  beating Disallow on ties; URLs with no matching rule (or no robots at
  all) default to allowed.

Deterministic subset, documented: rule paths match as LITERAL prefixes
(the overwhelming majority of real rules); ``*``/``$`` pattern rules are
out of scope for the exact-replay contract. Agent matching is exact
token equality (lowercased), not substring product matching.

Scale: rules are host-sized (~10^8 rows at web scale, a few rules each)
— the gate is an equi-join on host followed by a per-URL window over the
handful of matching rules; mega-host URL skew is ordinary AQE territory,
and the rules side is pre-shrunk to one agent group per host before the
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robots_rules(
    df: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """Parse robots.txt bodies into one row per (host, agent, directive,
    path) — directives cross-producted over every agent named in their
    group header run, per RFC 9309 §2.1 grouping.

    Parsing plan: posexplode lines -> strip comments/whitespace ->
    regexp key:value split -> lag() marks the first line of each
    User-agent run -> running sum over the host's line order assigns
    group ids -> agents aggregate per group -> rules join back on
    (host, group) and explode the agent list. Empty-path Disallow lines
    (which mean "allow everything" in the wild) are dropped."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "line"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("line"),
    ).filter(F.col("line") != "")

    parsed = lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)).alias("key"),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:\s*(.*)$", 1)).alias("val"),
    ).filter(F.col("key").isin("user-agent", "allow", "disallow"))

    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("key") == "user-agent"
    starts_run = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    grouped = parsed.withColumn(
        "grp", F.sum(starts_run.cast("int")).over(w)
    ).filter(F.col("grp") > 0)  # rules before any User-agent line are orphans

    agents = (
        grouped.filter(is_ua)
        .groupBy("host", "grp")
        .agg(F.collect_set(F.lower(F.col("val"))).alias("agents"))
    )
    rules = grouped.filter(~is_ua & (F.col("val") != "")).select(
        "host", "grp", F.col("key").alias("directive"), F.col("val").alias("path")
    )
    return rules.join(agents, ["host", "grp"]).select(
        "host",
        F.explode("agents").alias("agent"),
        "directive",
        "path",
    ).distinct()


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    agent: str = "*",
) -> DataFrame:
    """Add an ``allowed`` flag to a URL frame under ``agent``'s rules.

    Group selection per RFC 9309 §2.2.1: hosts that name the agent
    explicitly use ONLY those rules; otherwise the ``*`` group applies.
    Decision per §2.2.2: the longest-path matching rule wins; on equal
    length Allow beats Disallow; no match (or no rules) => allowed."""
    from paddle_spark.functions import host_col

    agent = agent.lower()
    cand = rules.filter(F.col("agent").isin(agent, "*"))
    has_specific = cand.groupBy("host").agg(
        F.max((F.col("agent") == agent).cast("int")).alias("has_spec")
    )
    effective = (
        cand.join(has_specific, "host")
        .filter(
            (F.col("agent") == agent)
            | ((F.col("has_spec") == 0) & (F.col("agent") == "*"))
        )
        .select("host", "directive", "path")
    )

    u = urls.select(
        F.col(url_col),
        host_col(F.col(url_col)).alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract(url_col, r"^[a-z]+://[^/]*(/[^#?]*)", 1), F.lit("")),
            F.lit("/"),
        ).alias("path_"),
    )
    hits = u.join(effective, "host").filter(
        F.col("path_").startswith(F.col("path"))
    )
    w = (
        Window.partitionBy(url_col)
        .orderBy(
            F.length("path").desc(),
            F.when(F.col("directive") == "allow", 0).otherwise(1),
        )
    )
    verdict = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(url_col, (F.col("directive") == "allow").alias("allowed"))
    )
    return urls.join(verdict, url_col, "left").withColumn(
        "allowed", F.coalesce(F.col("allowed"), F.lit(True))
    )

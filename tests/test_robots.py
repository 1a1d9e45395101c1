"""robots.txt parsing + URL gating (operators/robots.py)."""

from paddle_spark.operators.robots import robots_gate, robots_rules

BODY_A = """# politeness file
User-agent: *
Disallow: /private
Allow: /private/ok

User-agent: goodbot
User-agent: otherbot
Disallow: /
Allow: /docs
"""

BODY_B = """Disallow: /orphan-rule-no-group
User-agent: *
Disallow:
Allow: /
"""


def _rules(spark, bodies):
    df = spark.createDataFrame(bodies, "host string, robots_txt string")
    return robots_rules(df)


def test_parse_groups_and_agents(spark):
    got = {
        (r["host"], r["agent"], r["directive"], r["path"])
        for r in _rules(spark, [("a.com", BODY_A)]).collect()
    }
    assert got == {
        ("a.com", "*", "disallow", "/private"),
        ("a.com", "*", "allow", "/private/ok"),
        # the two-UA run shares one group: both agents get both rules
        ("a.com", "goodbot", "disallow", "/"),
        ("a.com", "goodbot", "allow", "/docs"),
        ("a.com", "otherbot", "disallow", "/"),
        ("a.com", "otherbot", "allow", "/docs"),
    }


def test_parse_orphans_and_empty_disallow_dropped(spark):
    got = {
        (r["agent"], r["directive"], r["path"])
        for r in _rules(spark, [("b.com", BODY_B)]).collect()
    }
    # orphan rule (before any User-agent) and empty Disallow both vanish
    assert got == {("*", "allow", "/")}


def _gate(spark, urls, rules, agent="*"):
    udf = spark.createDataFrame([(u,) for u in urls], "url string")
    return {
        r["url"]: r["allowed"] for r in robots_gate(udf, rules, agent=agent).collect()
    }


def test_gate_longest_match_and_tie(spark):
    rules = _rules(spark, [("a.com", BODY_A)])
    got = _gate(
        spark,
        [
            "https://a.com/private/secret",   # /private disallow
            "https://a.com/private/ok/file",  # longer allow wins
            "https://a.com/public/x",         # no match -> allowed
            "https://a.com",                  # bare host -> path '/'
            "https://elsewhere.net/anything", # host without robots -> allowed
        ],
        rules,
    )
    assert got == {
        "https://a.com/private/secret": False,
        "https://a.com/private/ok/file": True,
        "https://a.com/public/x": True,
        "https://a.com": True,
        "https://elsewhere.net/anything": True,
    }


def test_gate_specific_agent_shadows_star(spark):
    rules = _rules(spark, [("a.com", BODY_A)])
    got = _gate(
        spark,
        ["https://a.com/private/secret", "https://a.com/docs/guide",
         "https://a.com/other"],
        rules,
        agent="goodbot",
    )
    # goodbot's own group applies; the * group (which would allow
    # /private/ok etc.) is shadowed entirely
    assert got == {
        "https://a.com/private/secret": False,  # Disallow: /
        "https://a.com/docs/guide": True,       # Allow: /docs (longer)
        "https://a.com/other": False,           # Disallow: /
    }


def test_gate_tie_allow_beats_disallow(spark):
    body = "User-agent: *\nAllow: /a\nDisallow: /a\n"
    rules = _rules(spark, [("t.com", body)])
    got = _gate(spark, ["https://t.com/a/x"], rules)
    assert got["https://t.com/a/x"] is True

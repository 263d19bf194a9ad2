"""RFC-9309 robots parser + gate vs a pure-Python referee.

The referee implements the RFC decision rule independently (stdlib
``re`` only — NOT urllib.robotparser, whose first-match semantics
predate RFC 9309's longest-match rule), so Spark and referee agreeing
is two implementations agreeing, not one implementation squared.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators.robots import (
    parse_robots_rules,
    robots_gate,
    select_agent_group,
    url_path_for_matching,
)


# ----------------------------------------------------------- referee

def ref_parse(body: str) -> list[tuple[str, str, str]]:
    """(agent, rule, path) triples, RFC group semantics."""
    out = []
    cur_agents: list[str] = []
    prev_was_agent = False
    for line in re.split(r"\r?\n", body):
        m = re.match(r"(?i)^[ \t]*(user-agent|allow|disallow)[ \t]*:[ \t]*([^#]*)", line)
        if not m:
            continue
        d, v = m.group(1).lower(), m.group(2).strip()
        if d == "user-agent":
            if not prev_was_agent:
                cur_agents = []
            if v.lower() not in cur_agents:
                cur_agents.append(v.lower())
            prev_was_agent = True
        else:
            for a in cur_agents:
                out.append((a, d, v))
            prev_was_agent = False
    return out


def ref_match(pattern: str, path: str) -> bool:
    ends = pattern.endswith("$")
    body = pattern[:-1] if ends else pattern
    rx = "^" + re.escape(body).replace(r"\*", ".*") + ("$" if ends else "")
    return re.match(rx, path) is not None


def ref_allowed(triples, agent: str, path: str) -> bool:
    agent = agent.lower()
    agents_named = {a for a, _, _ in triples}
    pick = agent if agent in agents_named else "*"
    best = None
    for a, rule, pat in triples:
        if a != pick or not pat:
            continue
        if ref_match(pat, path):
            key = (len(pat), rule == "allow")
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


# ------------------------------------------------------------- fixed

BODY = """# example robots
User-agent: googlebot
User-Agent: podbot
Disallow: /private
Allow: /private/ok
Crawl-delay: 7

User-agent: *
Disallow: /*.json$
Disallow: /tmp
allow: /tmp/keep*
Disallow:
"""


def test_parse_groups(spark):
    df = spark.createDataFrame([("h.example", BODY)], "host string, body string")
    rows = {
        (r.agent, r.rule, r.path)
        for r in parse_robots_rules(df).collect()
    }
    assert rows == set(ref_parse(BODY))
    # both agents of the first block share its rules
    assert ("googlebot", "disallow", "/private") in rows
    assert ("podbot", "allow", "/private/ok") in rows
    # empty Disallow survives parsing (gate drops it)
    assert ("*", "disallow", "") in rows


CASES = [
    ("podbot", "https://h.example/private/x", False),
    ("podbot", "https://h.example/private/ok/x", True),   # longer allow wins
    ("PodBot", "https://h.example/anything", True),        # case-insensitive agent
    ("otherbot", "https://h.example/tmp/x", False),
    ("otherbot", "https://h.example/tmp/keep/deep", True),
    ("otherbot", "https://h.example/data/file.json", False),   # $ anchor
    ("otherbot", "https://h.example/data/file.json.gz", True), # $ must not match
    ("otherbot", "https://h.example/", True),              # empty disallow = allow
    ("podbot", "https://other.example/private/x", True),   # unknown host
]


@pytest.mark.parametrize("agent,url,want", CASES)
def test_gate_fixed_cases(spark, agent, url, want):
    robots = spark.createDataFrame([("h.example", BODY)], "host string, body string")
    rules = parse_robots_rules(robots)
    frontier = spark.createDataFrame([(url,)], "fetch_url string")
    got = robots_gate(frontier, rules, agent, keep_decision=True).collect()
    assert len(got) == 1 and got[0].allowed is want
    # referee agrees
    path = url.split("h.example")[1] if "h.example" in url else "/"
    if url.startswith("https://h.example"):
        assert ref_allowed(ref_parse(BODY), agent, path or "/") is want


def test_gate_filters_and_keeps_columns(spark):
    robots = spark.createDataFrame([("h.example", BODY)], "host string, body string")
    rules = parse_robots_rules(robots)
    frontier = spark.createDataFrame(
        [("https://h.example/private/x", 1), ("https://h.example/ok", 2)],
        "fetch_url string, priority int",
    )
    out = robots_gate(frontier, rules, "podbot")
    assert out.columns == ["fetch_url", "priority"]
    assert [r.priority for r in out.collect()] == [2]


def test_select_agent_group_fallback(spark):
    rules = parse_robots_rules(
        spark.createDataFrame([("h", BODY)], "host string, body string")
    )
    star = select_agent_group(rules, "nobody")
    assert set(r.agent for r in star.collect()) == {"*"}
    mine = select_agent_group(rules, "podbot")
    assert set(r.agent for r in mine.collect()) == {"podbot"}


def test_path_for_matching(spark):
    df = spark.createDataFrame(
        [("https://h/a/b?x=1#frag",), ("https://h",), ("http://h:8080/p",)],
        "u string",
    )
    got = [r.p for r in df.select(url_path_for_matching(F.col("u")).alias("p")).collect()]
    assert got == ["/a/b?x=1", "/", "/p"]


# ---------------------------------------------------- property tests

_seg = st.text(alphabet="abz.*$/", min_size=0, max_size=6)
_path = st.text(alphabet="abz./", min_size=1, max_size=10).map(lambda s: "/" + s)


@settings(max_examples=25, deadline=None)
@given(
    pats=st.lists(st.tuples(st.sampled_from(["allow", "disallow"]), _seg),
                  min_size=1, max_size=6),
    paths=st.lists(_path, min_size=1, max_size=5),
)
def test_gate_matches_referee(spark, pats, paths):
    body = "User-agent: *\n" + "\n".join(
        f"{r.capitalize()}: {p}" for r, p in pats
    )
    robots = spark.createDataFrame([("h.example", body)], "host string, body string")
    rules = parse_robots_rules(robots)
    frontier = spark.createDataFrame(
        [(f"https://h.example{p}",) for p in paths], "fetch_url string"
    )
    got = {
        r.fetch_url: r.allowed
        for r in robots_gate(frontier, rules, "anybot", keep_decision=True).collect()
    }
    triples = ref_parse(body)
    for p in paths:
        assert got[f"https://h.example{p}"] is ref_allowed(triples, "anybot", p), (
            body, p
        )


def test_robots_sitemap_directives(spark):
    from crawler_apple_podcast_spark.operators.robots import sitemap_directives

    body = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://a.example/sm.xml\n"
        "sitemap:https://cdn.example/a.xml   \n"
        "# Sitemap: https://commented.example/no.xml\n"
        "SITEMAP: https://a.example/caps.xml"
    )
    df = spark.createDataFrame([("a.example", body)], "host string, body string")
    rows = sorted(
        (r.sitemap_url, r.line_no)
        for r in sitemap_directives(df).collect()
    )
    assert rows == [
        ("https://a.example/caps.xml", 5),
        ("https://a.example/sm.xml", 2),
        ("https://cdn.example/a.xml", 3),
    ]


def test_sitemap_lines_do_not_leak_into_rules(spark):
    from crawler_apple_podcast_spark.operators.robots import parse_robots_rules

    body = "User-agent: *\nSitemap: https://a.example/sm.xml\nDisallow: /x"
    df = spark.createDataFrame([("a.example", body)], "host string, body string")
    rules = parse_robots_rules(df).collect()
    assert {r.rule for r in rules} == {"disallow"}

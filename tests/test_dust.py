"""DUST rule mining: referee parity, edge derivations, coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators import dust


def _referee_rule(alias: str, canon: str) -> tuple[str, str]:
    """Python replay of the minimal-differing-middle derivation."""
    lp = 0
    while lp < min(len(alias), len(canon)) and alias[lp] == canon[lp]:
        lp += 1
    ra, rc = alias[::-1], canon[::-1]
    ls = 0
    while ls < min(len(ra), len(rc)) and ra[ls] == rc[ls]:
        ls += 1
    ls = min(ls, len(alias) - lp, len(canon) - lp)
    return (
        alias[lp : len(alias) - ls],
        canon[lp : len(canon) - ls],
    )


def test_rule_derivation_vs_referee(spark):
    cases = [
        # substitution
        ("https://s/story?id=42", "https://s/story/42"),
        # deletion (alias has extra suffix)
        ("https://s/story/42/index.html", "https://s/story/42"),
        # insertion (alias missing a segment)
        ("https://s/a/c", "https://s/a/b/c"),
        # repeated-char run straddling the boundary
        ("https://s/aaa/x", "https://s/aa/x"),
        # scheme difference
        ("http://s/p", "https://s/p"),
        # single differing char
        ("https://s/pX", "https://s/pY"),
    ]
    rows = [("s", f"f{i}", c) for i, (_, c) in enumerate(cases)] + [
        ("s", f"f{i}", a) for i, (a, _) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "host string, fingerprint string, url string")
    got = {
        r.example_alias: (r.alpha, r.beta)
        for r in dust.dust_rules(df, min_support=1).collect()
    }
    for alias, canon in cases:
        # the canonical is the lexicographic min of the pair
        lo, hi = sorted([alias, canon])
        want = _referee_rule(hi, lo)
        assert got[hi] == want, (hi, got[hi], want)


def test_star_pairing_is_linear_and_supports_add(spark):
    """A k-member duplicate group yields k-1 alias pairs (star against
    the min-URL canonical), and identical middles accumulate support
    across groups."""
    rows = []
    for g in range(10):
        rows.append(("h", f"f{g}", f"https://h/p/{g}"))
        rows.append(("h", f"f{g}", f"https://h/p?id={g}"))
        rows.append(("h", f"f{g}", f"https://h/p/{g}/index.html"))
    df = spark.createDataFrame(rows, "host string, fingerprint string, url string")
    pairs = dust.duplicate_alias_pairs(df, "url", "host", "fingerprint")
    assert pairs.count() == 20
    rules = {
        (r.alpha, r.beta): r.support
        for r in dust.dust_rules(df, min_support=2).collect()
    }
    assert rules[("?id=", "/")] == 10
    assert rules[("/index.html", "")] == 10


def test_rule_coverage_counts_frontier_hits(spark):
    docs = spark.createDataFrame(
        [("h", "f0", "https://h/p/1"), ("h", "f0", "https://h/p?id=1"),
         ("h", "f1", "https://h/p/2"), ("h", "f1", "https://h/p?id=2")],
        "host string, fingerprint string, url string",
    )
    rules = dust.dust_rules(docs, min_support=2)
    frontier = spark.createDataFrame(
        [("h", "https://h/q?id=9"), ("h", "https://h/q/9"),
         ("h", "https://h/r?id=3"), ("x", "https://x/q?id=4")],
        "host string, url string",
    )
    cov = dust.rule_coverage(frontier, rules).collect()
    assert len(cov) == 1
    assert cov[0].alpha == "?id=" and cov[0].n_hit == 2  # host x not joined


def test_plan_shape_group_and_pairback_share_key_and_coverage_broadcasts(spark):
    docs = spark.createDataFrame(
        [("h", "f0", "https://h/p/1"), ("h", "f0", "https://h/p?id=1")],
        "host string, fingerprint string, url string",
    )
    rules = dust.dust_rules(docs, min_support=1)
    p = rules._jdf.queryExecution().executedPlan().toString()
    # no cartesian anywhere; the pair-back join is an equi hash/merge join
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    frontier = spark.createDataFrame([("h", "https://h/q?id=9")], "host string, url string")
    pc = (
        dust.rule_coverage(frontier, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in pc

"""Robots parsing, budget computation, and the two-phase per-host gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators.politeness import (
    filter_disallowed,
    host_budgets,
    parse_robots,
    politeness_gate,
)


def test_parse_robots(spark, corpus):
    pages, _ = corpus
    robots = parse_robots(pages)
    rows = {r.host: r.crawl_delay for r in robots.collect()}
    assert "amp-api.podcasts.apple.com" in rows
    assert all(d in (1, 5, 10) for d in rows.values())


def test_host_budgets(spark, corpus):
    pages, _ = corpus
    budgets = host_budgets(parse_robots(pages), wave_seconds=20)
    for r in budgets.collect():
        assert r.budget >= 1


def _frontier(spark, n_hosts=3, per_host=20):
    rows = [
        (h * 1000 + i, f"https://host{h}.example/p/{i}", 0)
        for h in range(n_hosts)
        for i in range(per_host)
    ]
    return spark.createDataFrame(rows, "seed_index INT, fetch_url STRING, priority INT")


def test_gate_respects_budget_and_is_exact_topk(spark):
    f = _frontier(spark)
    budgets = spark.createDataFrame(
        [(f"host{h}.example", 5) for h in range(3)], "host STRING, budget INT"
    )
    sched, deferred = politeness_gate(
        f, budgets, key_cols=["seed_index", "fetch_url"], salt_n=4
    )
    per_host = (
        sched.withColumn("h", F.parse_url("fetch_url", F.lit("HOST")))
        .groupBy("h").count().collect()
    )
    assert all(r["count"] == 5 for r in per_host)
    assert sched.count() + deferred.count() == f.count()
    # scheduled ∩ deferred = ∅
    assert sched.join(deferred, ["seed_index", "fetch_url"], "inner").count() == 0


def test_gate_deterministic_and_priority_first(spark):
    rows = [(i, f"https://h.example/p/{i}", 1 if i < 10 else 0) for i in range(20)]
    f = spark.createDataFrame(rows, "seed_index INT, fetch_url STRING, priority INT")
    budgets = spark.createDataFrame([("h.example", 10)], "host STRING, budget INT")
    s1, _ = politeness_gate(f, budgets, key_cols=["seed_index", "fetch_url"])
    s2, _ = politeness_gate(f, budgets, key_cols=["seed_index", "fetch_url"])
    got1 = sorted(r.seed_index for r in s1.collect())
    got2 = sorted(r.seed_index for r in s2.collect())
    assert got1 == got2
    # all priority-0 rows (10 of them) win the 10 slots
    assert got1 == list(range(10, 20))


def test_default_budget_schedules_everything(spark):
    f = _frontier(spark)
    sched, deferred = politeness_gate(f, None, key_cols=["seed_index", "fetch_url"])
    assert sched.count() == f.count()
    assert deferred.count() == 0


def test_filter_disallowed(spark, corpus):
    pages, _ = corpus
    robots = parse_robots(pages)
    blocked_hosts = [r.host for r in robots.where(F.col("disallow") != "").collect()]
    if not blocked_hosts:
        return
    h = blocked_hosts[0]
    f = spark.createDataFrame(
        [(0, f"https://{h}/private/x", 0), (1, f"https://{h}/ok/x", 0)],
        "seed_index INT, fetch_url STRING, priority INT",
    )
    out = [r.seed_index for r in filter_disallowed(f, robots).collect()]
    assert out == [1]

"""Revalidation planning + 304 ledger-merge semantics
(operators/revalidate.py)."""

from __future__ import annotations

from crawler_apple_podcast_spark.operators.revalidate import (
    apply_revalidation_outcomes,
    revalidation_plan,
)

HIST = "url STRING, etag STRING, last_modified STRING, fetched_ts LONG, fingerprint STRING"
OUT = "url STRING, status LONG, etag STRING, last_modified STRING, fingerprint STRING, fetched_ts LONG"


def test_plan_decision_table(spark):
    schedule = spark.createDataFrame(
        [("new",), ("fresh",), ("stale_etag",), ("stale_lm",), ("stale_bare",)],
        "url STRING",
    )
    history = spark.createDataFrame(
        [
            ("fresh", '"e1"', None, 990, "f1"),
            ("stale_etag", '"e2"', None, 100, "f2"),
            ("stale_lm", None, "lm-3", 100, "f3"),
            ("stale_bare", None, None, 100, "f4"),
        ],
        HIST,
    )
    got = {
        r.url: (r.action, r.etag, r.last_modified)
        for r in revalidation_plan(schedule, history, now_ts=1000, ttl_s=50).collect()
    }
    assert got["new"] == ("fetch", None, None)
    assert got["fresh"] == ("skip", None, None)
    assert got["stale_etag"] == ("conditional", '"e2"', None)
    assert got["stale_lm"] == ("conditional", None, "lm-3")
    assert got["stale_bare"] == ("fetch", None, None)


def test_ttl_boundary_is_half_open(spark):
    # age == ttl is STALE (fresh iff now - fetched_ts < ttl)
    schedule = spark.createDataFrame([("u",)], "url STRING")
    history = spark.createDataFrame([("u", '"e"', None, 950, "f")], HIST)
    r = revalidation_plan(schedule, history, now_ts=1000, ttl_s=50).first()
    assert r.action == "conditional"


def test_outcome_merge_semantics(spark):
    history = spark.createDataFrame(
        [
            ("changed", '"old"', "lm-old", 100, "fp-old"),
            ("same", '"keep"', None, 100, "fp-keep"),
            ("errored", '"e"', None, 100, "fp-e"),
            ("untouched", None, "lm-u", 100, "fp-u"),
        ],
        HIST,
    )
    outcomes = spark.createDataFrame(
        [
            ("changed", 200, '"new"', "lm-new", "fp-new", 900),
            ("same", 304, None, None, None, 900),
            ("errored", 503, None, None, None, 900),
            ("born", 200, '"b"', None, "fp-b", 900),
            ("failed_first", 500, None, None, None, 900),
            ("ghost_304", 304, None, None, None, 900),
        ],
        OUT,
    )
    got = {
        r.url: (r.etag, r.last_modified, r.fetched_ts, r.fingerprint)
        for r in apply_revalidation_outcomes(history, outcomes).collect()
    }
    # 200 replaces validators + fingerprint
    assert got["changed"] == ('"new"', "lm-new", 900, "fp-new")
    # 304 refreshes ts, KEEPS fingerprint + validators
    assert got["same"] == ('"keep"', None, 900, "fp-keep")
    # errors leave the row exactly as it was
    assert got["errored"] == ('"e"', None, 100, "fp-e")
    assert got["untouched"] == (None, "lm-u", 100, "fp-u")
    # first-ever 200 inserts; failed or ghost first contacts do not
    assert got["born"] == ('"b"', None, 900, "fp-b")
    assert "failed_first" not in got and "ghost_304" not in got

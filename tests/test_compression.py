"""Prefix-delta frontier compression accounting (operators/compression).

Referee: plain-Python prefix-delta coder over the same rows.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators.compression import (
    common_prefix_len,
    prefix_delta_stats,
)


def _py_cpl(a: str, b: str) -> int:
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def test_common_prefix_len_matches_python(spark):
    cases = [
        ("https://a.example/x/1", "https://a.example/x/2"),
        ("abc", "abc"),
        ("abc", "abd"),
        ("abc", "xyz"),
        ("", "abc"),
        ("abc", ""),
        ("a", "a" * 40),
    ]
    df = spark.createDataFrame(cases, "a string, b string").select(
        "a", "b", common_prefix_len(F.col("a"), F.col("b")).alias("cpl")
    )
    for row in df.collect():
        assert row.cpl == _py_cpl(row.a, row.b), (row.a, row.b)


def test_common_prefix_len_null_propagates(spark):
    df = spark.createDataFrame(
        [("abc", None), (None, "abc"), (None, None)], "a string, b string"
    ).select(common_prefix_len(F.col("a"), F.col("b")).alias("cpl"))
    assert [r.cpl for r in df.collect()] == [None, None, None]


def _py_delta_bytes(urls: list[str], overhead: int = 2) -> tuple[int, int]:
    us = sorted(urls)
    raw = sum(len(u) for u in us)
    delta = len(us[0]) + sum(
        len(u) - _py_cpl(u, p) + overhead for p, u in zip(us, us[1:])
    )
    return raw, delta


def test_prefix_delta_stats_matches_python_coder(spark):
    rows = []
    for h in range(3):
        for i in range(7):
            rows.append(
                (f"h{h}.example", f"https://h{h}.example/dir{i % 2}/page/{i}")
            )
    # one-URL host: stored raw, zero savings from delta coding
    rows.append(("solo.example", "https://solo.example/only"))
    df = spark.createDataFrame(rows, "host string, url string")
    got = {
        r.host: r for r in prefix_delta_stats(df).collect()
    }
    by_host: dict[str, list[str]] = {}
    for h, u in rows:
        by_host.setdefault(h, []).append(u)
    for h, urls in by_host.items():
        raw, delta = _py_delta_bytes(urls)
        assert got[h].n_urls == len(urls)
        assert got[h].raw_bytes == raw, h
        assert got[h].delta_bytes == delta, h
        assert got[h].savings_milli == (1000 * (raw - delta)) // raw


def test_prefix_delta_stats_overhead_can_lose(spark):
    # zero shared prefixes -> every delta row pays the framing overhead,
    # savings_milli must go negative (floor division toward -inf, matching
    # DuckDB's // on integers).
    df = spark.createDataFrame(
        [("h", "aaaa"), ("h", "bbbb"), ("h", "cccc")], "host string, url string"
    )
    row = prefix_delta_stats(df).collect()[0]
    assert row.raw_bytes == 12
    assert row.delta_bytes == 12 + 4  # two framed rows x 2B overhead
    assert row.savings_milli < 0

"""Largest-remainder budget apportionment: exact-total, quota
closeness, Python-referee parity, bucket-rank correctness across
bucket counts, and determinism under repartition."""

from __future__ import annotations

import pytest

from crawler_apple_podcast_spark.operators.budget import apportion_budget


def _py_hamilton(scores: dict[str, int], total: int) -> dict[str, int]:
    s = sum(scores.values())
    base = {k: (v * total) // s for k, v in scores.items()}
    rem = {k: (v * total) % s for k, v in scores.items()}
    left = total - sum(base.values())
    for k in sorted(scores, key=lambda k: (-rem[k], k))[:left]:
        base[k] += 1
    return base


def _run(spark, scores: dict[str, int], total: int, **kw) -> dict[str, int]:
    df = spark.createDataFrame(
        list(scores.items()), "host string, score long"
    )
    return {
        r.host: r.alloc for r in apportion_budget(df, total, **kw).collect()
    }


def test_matches_python_referee(spark):
    scores = {f"h{i}": (i * 37) % 101 + 1 for i in range(50)}
    for total in (1, 7, 999, 10_000):
        assert _run(spark, scores, total) == _py_hamilton(scores, total)


def test_exact_total_and_quota_closeness(spark):
    scores = {f"h{i}": 2**i for i in range(20)}  # extreme skew
    out = _run(spark, scores, 1000)
    assert sum(out.values()) == 1000
    s = sum(scores.values())
    for k, v in scores.items():
        assert (v * 1000) // s <= out[k] <= (v * 1000) // s + 1


def test_bucket_count_invariance(spark):
    scores = {f"h{i:03d}": 10 for i in range(30)}  # all-tied remainders
    a = _run(spark, scores, 100, n_buckets=2)
    b = _run(spark, scores, 100, n_buckets=1024)
    assert a == b == _py_hamilton(scores, 100)
    # ties broken by key asc: the +1s land on the lexicographically first
    assert a["h000"] == 4 and a["h029"] == 3


def test_partition_independence(spark):
    scores = {f"h{i}": (i * 13) % 7 + 1 for i in range(40)}
    df = spark.createDataFrame(list(scores.items()), "host string, score long")
    a = {r.host: r.alloc for r in apportion_budget(df, 500).collect()}
    b = {
        r.host: r.alloc
        for r in apportion_budget(df.repartition(11), 500).collect()
    }
    assert a == b == _py_hamilton(scores, 500)


def test_zero_score_rows_get_base_zero(spark):
    out = _run(spark, {"a": 0, "b": 5, "c": 5}, 7)
    assert out["a"] == 0 and sum(out.values()) == 7


def test_rejects_bad_args(spark):
    df = spark.createDataFrame([("a", 1)], "host string, score long")
    with pytest.raises(ValueError):
        apportion_budget(df, -1)
    with pytest.raises(ValueError):
        apportion_budget(df, 10, n_buckets=7)


# ------------------------------------------- temperature mixture


def test_mixture_apportion_flattens_and_sums_exact(spark):
    """tau=0.5 quotas: exact total, and the head/tail alloc ratio is
    ~sqrt of the count ratio (flattened), not the count ratio."""
    import math

    from crawler_apple_podcast_spark.operators.budget import mixture_apportion

    counts = {"big": 1_000_000, "mid": 10_000, "small": 100}
    df = spark.createDataFrame(
        list(counts.items()), "source string, n_docs long"
    )
    out = {r.source: r for r in mixture_apportion(df, 10_000).collect()}
    assert sum(r.alloc for r in out.values()) == 10_000
    for k, n in counts.items():
        assert out[k].n == n
        assert out[k].weight == math.floor(math.sqrt(n) * 1000 + 0.5)
    # proportional would give small ~1 of 10k; sqrt gives ~90
    assert out["small"].alloc >= 80
    ratio = out["big"].alloc / out["small"].alloc
    assert abs(ratio - math.sqrt(counts["big"] / counts["small"])) < 2

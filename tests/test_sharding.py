"""Rendezvous shard assignment (operators/sharding.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators.sharding import (
    rendezvous_shard,
    rendezvous_shard_arith,
    shard_params,
)
from crawler_apple_podcast_spark.operators.similarity import SIMHASH_M


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(400).select(
        F.concat(F.lit("https://s.ex/k/"), F.col("id").cast("string")).alias("url")
    )


def _assign(df):
    return {r.url: r.shard for r in df.collect()}


def test_hrw_invariant_growing_shards_never_moves_between_survivors(spark, keys):
    # THE rendezvous property: going 12 -> 16 shards, every key either
    # keeps its shard or moves to a NEW shard (12..15) — never from one
    # surviving shard to another.  Holds for both weight families.
    for fn in (rendezvous_shard, rendezvous_shard_arith):
        a = _assign(fn(keys, "url", 12))
        b = _assign(fn(keys, "url", 16))
        moved = {k for k in a if a[k] != b[k]}
        assert all(b[k] >= 12 for k in moved), fn.__name__
        # and some keys really do move (the new shards win sometimes)
        assert moved, fn.__name__


def test_arith_family_matches_python_referee(spark, keys):
    P, Q = shard_params(8)
    got = _assign(rendezvous_shard_arith(keys, "url", 8))
    for i in range(0, 400, 37):
        url = f"https://s.ex/k/{i}"
        cs = sum(ord(c) for c in url)
        w = [(cs * P[j] + Q[j]) % SIMHASH_M for j in range(8)]
        assert got[url] == w.index(max(w)), url


def test_production_family_is_reasonably_balanced(spark, keys):
    counts = (
        rendezvous_shard(keys, "url", 8)
        .groupBy("shard")
        .count()
        .collect()
    )
    sizes = {r.shard: r["count"] for r in counts}
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) < 3 * min(sizes.values())

"""Bucketed url_seen store: result parity with a plain anti-join AND
the plan property the module exists for — the seen side scans its
buckets in place (exactly one Exchange in the join plan: the candidate
side's)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_apple_podcast_spark.plans.bucketed_seen import (
    append_bucketed_seen,
    bucketed_anti_join,
    seen_exchange_count,
    write_bucketed_seen,
)


@pytest.fixture()
def seen_table(spark):
    name = "url_seen_bucketed_test"
    seen = spark.range(0, 1000, 2).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string")).alias("fetch_url")
    )
    write_bucketed_seen(seen, table=name, buckets=8)
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def _candidates(spark, n=1000):
    return spark.range(n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string")).alias("fetch_url"),
        (F.col("id") % 3).cast("int").alias("priority"),
    )


def test_bucketed_anti_join_matches_plain(spark, seen_table):
    cand = _candidates(spark)
    got = bucketed_anti_join(cand, seen_table)
    want = cand.join(spark.table(seen_table), "fetch_url", "left_anti")
    assert sorted(r.fetch_url for r in got.collect()) == sorted(
        r.fetch_url for r in want.collect()
    )
    # every odd id survives, every even id is seen
    assert got.count() == 500


def test_seen_side_does_not_shuffle(spark, seen_table):
    got = bucketed_anti_join(_candidates(spark), seen_table)
    # one Exchange total: the candidates' routing shuffle; the seen
    # side reads its buckets in place
    assert seen_exchange_count(got) == 1
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan


def test_append_preserves_buckets_and_results(spark, seen_table):
    extra = spark.range(1, 20, 2).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string")).alias("fetch_url")
    )
    append_bucketed_seen(extra, table=seen_table)
    got = bucketed_anti_join(_candidates(spark), seen_table)
    assert got.count() == 500 - 10  # ten more ids now seen
    assert seen_exchange_count(got) == 1

"""Continuous-aggregate hierarchy: rollup-of-rollup equals direct
aggregation, avg derivable, incremental-refresh locality."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators.rollup import (
    rollup_coarser,
    rollup_hierarchy,
    rollup_level0,
)


def _events(spark, n=500):
    base = datetime.datetime(2024, 5, 23, 0, 0, 0)
    rows = [
        (
            i,
            base + datetime.timedelta(seconds=37 * i),
            ["click", "view"][i % 2],
            round(0.01 * ((i * 7) % 1000), 2),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
    )


def _key(df):
    return {
        (str(r.bucket), r.event_type): (r.n_events, r.sum_cents, r.min_cents, r.max_cents)
        for r in df.collect()
    }


def test_hierarchy_equals_direct_at_every_grain(spark):
    e = _events(spark)
    levels = rollup_hierarchy(e, ("minute", "hour", "day"))
    for grain in ("minute", "hour", "day"):
        direct = rollup_level0(e, grain)
        assert _key(levels[grain]) == _key(direct), grain


def test_avg_derivable_and_states_consistent(spark):
    e = _events(spark)
    hour = rollup_hierarchy(e, ("minute", "hour"))["hour"]
    rows = hour.collect()
    assert all(r.min_cents <= r.max_cents for r in rows)
    # avg at read time = sum/count; totals conserve through levels
    tot = hour.agg(F.sum("n_events"), F.sum("sum_cents")).first()
    assert tot[0] == e.count()
    exact = e.select(F.sum(F.round(F.col("value") * 100).cast("long"))).first()[0]
    assert tot[1] == exact


def test_incremental_refresh_touches_only_dirty_buckets(spark):
    """Appending events inside one hour changes only that hour's row
    after re-rolling the affected minute slice — the continuous-
    aggregate refresh contract."""
    e = _events(spark, 400)
    minute = rollup_level0(e, "minute").cache()
    hour_before = _key(rollup_coarser(minute, "hour"))
    extra = _events(spark, 500).where(F.col("event_id") >= 400)  # later events
    minute_after = rollup_level0(e.unionByName(extra), "minute")
    hour_after = _key(rollup_coarser(minute_after, "hour"))
    changed = {k for k in hour_after if hour_after[k] != hour_before.get(k)}
    dirty_hours = {
        (str(r[0]), r[1])
        for r in extra.select(
            F.date_trunc("hour", "ts"), "event_type"
        ).distinct().collect()
    }
    assert changed == dirty_hours

"""Hypertable-style continuous aggregates: multi-resolution time
rollups where every coarser level aggregates the FINER MATERIALIZED
level, never the raw events.

TimescaleDB's continuous aggregates / Druid's rollup segments solve
the same problem a crawl-metrics store has: the fetch log at 10^10
rows is queried at minute/hour/day grain, and recomputing day-grain
from raw events rescans everything.  The fix is restricting level-0 to
RE-AGGREGATABLE partial states — count, sum, min, max (avg = sum/count
at read time, distinct = the T54 HLL sketch column) — so level k+1 is
a tiny groupBy over level k: day-grain touches 24 rows per key where
raw-grain touches millions, and an incremental refresh only recomputes
the buckets a new wave dirtied.

Exactness note (cross-engine): values are quantized to integer cents
BEFORE level 0, so every sum up the hierarchy is exact integer
arithmetic — float sums would re-associate differently per level and
drift against the oracle.  The hierarchy property itself (rollup of
the rollup == direct aggregation at the coarse grain) is what the
driver oracle checks: DuckDB aggregates RAW events at the coarse
grain, Spark serves the same answer from the fine-grain materialized
frame.

Scale shape: level 0 is one map-side-combined groupBy over events;
each further level groups ~bucket_ratio fewer rows (pure win); all
levels share the key column so a storage layout bucketed by key keeps
every refresh shuffle-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: re-aggregatable partial-state columns produced at every level
_STATE = ("n_events", "sum_cents", "min_cents", "max_cents")


def rollup_level0(
    events: DataFrame,
    grain: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Finest materialized level: one row per (bucket, key) with the
    re-aggregatable partial states over integer cents."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        events.groupBy(
            F.date_trunc(grain, F.col(ts_col)).alias("bucket"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("sum_cents"),
            F.min(cents).alias("min_cents"),
            F.max(cents).alias("max_cents"),
        )
    )


def rollup_coarser(finer: DataFrame, grain: str) -> DataFrame:
    """Aggregate a materialized level to a coarser grain — the
    continuous-aggregate refresh step; touches only the finer rollup
    rows, never raw events."""
    key_cols = [c for c in finer.columns if c not in ("bucket", *_STATE)]
    return (
        finer.groupBy(
            F.date_trunc(grain, F.col("bucket")).alias("bucket"), *key_cols
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )


def rollup_hierarchy(
    events: DataFrame,
    grains: tuple[str, ...] = ("minute", "hour", "day"),
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> dict[str, DataFrame]:
    """The full continuous-aggregate hierarchy: ``grains[0]`` from raw
    events, every later grain from its predecessor's frame."""
    out = {grains[0]: rollup_level0(events, grains[0], ts_col, key_col, value_col)}
    for prev, g in zip(grains, grains[1:]):
        out[g] = rollup_coarser(out[prev], g)
    return out

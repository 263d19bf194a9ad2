"""Gap-based sessionization of event/fetch logs.

Crawl operations read their own logs constantly: "how bursty are our
fetches per host", "did the pacer actually space requests", "what does
a retry storm look like".  The standard shape for all of these is
gap-based sessionization — split each key's event stream wherever the
inter-event gap exceeds a threshold, then aggregate per session.

Semantics (the classic lag/flag/cumsum construction):

    boundary(e) = ts(e) - ts(prev event of same key) > gap  (or first)
    session_seq = running count of boundaries per key, in ts order

Time is compared in integer MICROSECONDS (``unix_micros`` /
DuckDB ``epoch_us``) — never a seconds cast, whose sub-second
truncation makes two engines disagree about events exactly ``gap``
apart.

Scale shape: ONE shuffle total.  The lag/cumsum windows partition by
the key (one Exchange); the per-session aggregate groups on
``(key, session_seq)``, and hash-partitioning by ``key`` already
satisfies the aggregate's clustered-distribution requirement (the
partitioning keys are a subset of the grouping keys), so Catalyst
reuses the window's Exchange — asserted in the plan-shape tests.
Within-key ordering is a per-partition sort, never global.  Skew note:
a single pathological key (one host emitting a large fraction of the
log) serializes its own window; pre-split such keys by day/shard
upstream if a log is truly host-degenerate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _micros(ts: Column) -> Column:
    """Epoch microseconds.  Parquet logs are usually TIMESTAMP_NTZ,
    which ``unix_micros`` rejects; the cast is epoch-preserving because
    the session timezone is pinned to UTC (session.py), matching
    DuckDB's ``epoch_us`` reading of the same NTZ values."""
    return F.unix_micros(ts.cast("timestamp"))


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Append ``session_seq`` (1-based per-key session index) to every
    event.  ``order_tiebreak`` (e.g. an event id) makes the within-key
    order total when timestamps can collide — without it, equal
    timestamps would make the lag, and therefore the output,
    nondeterministic."""
    order = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    us = _micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    boundary = F.when(
        prev.isNull() | ((us - prev) > F.lit(int(gap_seconds) * 1_000_000)),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_seq",
        F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    id_col: str,
) -> DataFrame:
    """One row per session: ``<key_col>``, ``session_seq``,
    ``n_events``, ``first_id``/``last_id`` (min/max of ``id_col``),
    ``start_us``/``end_us`` (epoch micros), ``duration_us`` — all
    integer columns, so the DuckDB oracle matches by value hash."""
    s = sessionize(df, key_col, ts_col, gap_seconds, order_tiebreak=id_col)
    us = _micros(F.col(ts_col))
    return (
        s.groupBy(key_col, "session_seq")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min(id_col).cast("long").alias("first_id"),
            F.max(id_col).cast("long").alias("last_id"),
            F.min(us).cast("long").alias("start_us"),
            F.max(us).cast("long").alias("end_us"),
        )
        .withColumn("duration_us", (F.col("end_us") - F.col("start_us")))
    )

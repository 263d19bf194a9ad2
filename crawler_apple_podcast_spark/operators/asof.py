"""As-of (point-in-time) join — the custom operator Spark's join
zoo lacks, built as a union + keyed window instead of a join.

Crawl-side need: "which robots.txt policy / content version / host
reputation was ACTIVE when this fetch happened?"  The right side is a
slowly-changing dimension (versions at irregular times, `content_history`
/ robots snapshots); the left side is an event log.  An equi-join can't
express "latest right row with t_r <= t_l", a theta-join explodes to a
range product, and per-row lookups don't distribute.

Spark shape — NO join at all: union both sides (right rows carry their
attrs in a struct, left rows a NULL), one window per key ordered by
``(t, side)`` with right-before-left on ties, and
``last(attrs, ignorenulls=True)`` carries the newest right struct
forward onto every left row.  ONE shuffle of |L|+|R| slim rows on the
key; no range explosion, no skew beyond the key's own event share —
this is also the efficient plan for the equivalent RANGE join against
``content_history``'s ``[valid_from, valid_to]`` intervals, since the
interval table IS the version table this operator consumes directly.

Ties: a right version at exactly t_l is visible to that left row
(inclusive as-of, matching DuckDB's ``ASOF JOIN ... ON l.t >= r.t``
which the driver oracle uses).  Right keys must be unique per
``(key, t)`` — true by construction for version tables; duplicate
right timestamps would make the carried struct order-dependent, so
``strict`` mode (default) fails loudly instead of guessing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_t: str = "t",
    right_t: str = "t",
    strict: bool = True,
) -> DataFrame:
    """Left as-of join: every ``left`` row plus the attrs of the latest
    ``right`` row for the same key with ``right_t <= left_t`` (NULLs if
    none yet).  Right attr columns (everything but key/time) come back
    flattened under their own names; they must not collide with left
    column names.

    ``strict=True`` raises at plan time if a right attr name collides
    with a left column (silent shadowing is how as-of bugs hide).
    Uniqueness of right ``(key, t)`` is the caller's contract —
    version tables have it by construction.
    """
    rattrs = [c for c in right.columns if c not in (key_col, right_t)]
    if strict:
        clash = set(rattrs) & set(left.columns)
        if clash:
            raise ValueError(f"right attr columns collide with left: {sorted(clash)}")
    lcols = left.columns
    r = right.select(
        F.col(key_col),
        F.col(right_t).cast("long").alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*rattrs).alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key_col],
    )
    l = left.select(
        F.col(key_col),
        F.col(left_t).cast("long").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c) for c in lcols if c != key_col],
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = r.unionByName(l).withColumn(
        "_carried", F.last("_r", ignorenulls=True).over(w)
    )
    return u.where(F.col("_side") == 1).select(
        *lcols, *[F.col("_carried")[a].alias(a) for a in rattrs]
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    point_t: str = "t",
    from_col: str = "valid_from_wave",
    to_col: str = "valid_to_wave",
) -> DataFrame:
    """Range join of a point table against non-overlapping validity
    intervals (``content_history``'s output shape: per key, intervals
    ``[from, to]`` inclusive with NULL ``to`` = open): each point row
    gains the attrs of the interval containing its time, NULL if it
    falls in no interval (before the first version).

    Because the intervals are non-overlapping and sorted per key, the
    containing interval is exactly the as-of match on ``from`` — so
    this is the one-shuffle union+window plan, not a range-predicate
    join (which Spark would execute as a per-key product).  The ``to``
    bound then only needs a post-filter: a match whose interval closed
    before the point means the point predates the NEXT interval's
    start, which cannot happen for contiguous histories and NULLs out
    the attrs for gapped ones.
    """
    # the as-of consumes from_col as the time axis, so carry a copy as
    # a payload attr — the containment test below needs it back
    ivl = intervals.withColumn("_ivl_from", F.col(from_col))
    j = asof_join(points, ivl, key_col, point_t, from_col)
    inside = F.col("_ivl_from").isNotNull() & (
        F.col(to_col).isNull() | (F.col(point_t) <= F.col(to_col))
    )
    rattrs = [c for c in intervals.columns if c not in (key_col, from_col)]
    return j.select(
        *[c for c in points.columns],
        *[F.when(inside, F.col(c)).otherwise(F.lit(None)).alias(c) for c in rattrs],
        F.when(inside, F.col("_ivl_from")).otherwise(F.lit(None)).alias(from_col),
    )

"""Retry scheduling: backoff arithmetic, latest-attempt gate, attempt
cap, due-slice shaping."""

from __future__ import annotations

from crawler_apple_podcast_spark.operators.retry import due_retries, schedule_retries

FL_SCHEMA = "seed_index INT, fetch_url STRING, wave INT, fetch_ok BOOLEAN"


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_backoff_and_gates(spark):
    fl = spark.createDataFrame(
        [
            # u1: failed once at wave 0 -> due 0 + 2^1 = 2
            (0, "u1", 0, False),
            # u2: failed w0, failed w1 -> 2 failures, due 1 + 4 = 5
            (0, "u2", 0, False), (0, "u2", 1, False),
            # u3: failed w0 then SUCCEEDED w1 -> latest ok, absent
            (0, "u3", 0, False), (0, "u3", 1, True),
            # u4: 4 failures > max_attempts=3 -> abandoned, absent
            (0, "u4", 0, False), (0, "u4", 1, False),
            (0, "u4", 2, False), (0, "u4", 3, False),
            # u5: succeeded only -> absent
            (1, "u5", 2, True),
        ],
        FL_SCHEMA,
    )
    out = _rows(schedule_retries(fl, max_attempts=3))
    assert out == {(0, "u1", 1, 2), (0, "u2", 2, 5)}


def test_due_slice_shapes_frontier_rows(spark):
    fl = spark.createDataFrame(
        [(0, "u1", 0, False), (0, "u2", 0, False), (0, "u2", 1, False)],
        FL_SCHEMA,
    )
    sched = schedule_retries(fl, max_attempts=5)
    # at wave 2: only u1 (due 2); u2 due at 5
    due2 = _rows(due_retries(sched, 2))
    assert due2 == {(0, "u1", 1)}
    assert due_retries(sched, 1).count() == 0
    due5 = _rows(due_retries(sched, 5))
    assert due5 == {(0, "u1", 1), (0, "u2", 2)}
    assert due_retries(sched, 5).columns == ["seed_index", "url", "priority"]

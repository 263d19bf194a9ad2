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


# ------------------------------------------------ property: invariants

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 6), st.booleans()),
        min_size=1, max_size=40, unique_by=lambda t: (t[0], t[1]),
    ),
    st.integers(0, 4),
)
def test_retry_invariants_property(spark, spec, cap):
    """Random (url_key, wave, ok) logs x random caps: (1) scheduled
    keys are exactly those whose latest attempt failed with failures <=
    cap, (2) due_wave = last_wave + 2^failures, (3) due_retries slices
    monotonically in the current wave."""
    rows = [(k % 3, f"u{k}", w, ok) for (k, w), ok in
            {(k, w): ok for k, w, ok in spec}.items()]
    fl = spark.createDataFrame(rows, "seed_index INT, fetch_url STRING, wave INT, fetch_ok BOOLEAN")
    out = {r.fetch_url: (r.failures, r.due_wave)
           for r in schedule_retries(fl, max_attempts=cap).collect()}
    # python replay
    by_key: dict[str, list[tuple[int, bool]]] = {}
    for _, u, w, ok in rows:
        by_key.setdefault(u, []).append((w, ok))
    expect = {}
    for u, atts in by_key.items():
        atts.sort()
        fails = sum(1 for _, ok in atts if not ok)
        if not atts[-1][1] and fails <= cap:
            expect[u] = (fails, atts[-1][0] + 2 ** fails)
    assert out == expect
    sched = schedule_retries(fl, max_attempts=cap)
    n_prev = -1
    for wave in range(0, 8, 2):
        n = due_retries(sched, wave).count()
        assert n >= n_prev
        n_prev = n

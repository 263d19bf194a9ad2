"""Gap sessionization: hand-computed splits, tie determinism,
single-event sessions, and the one-Exchange plan claim."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
import pytest

from crawler_apple_podcast_spark.operators import sessions as SES


def _ts(minute: int, second: int = 0, micro: int = 0):
    return datetime(2024, 1, 1, minute // 60, minute % 60, second, micro)


@pytest.fixture(scope="module")
def log(spark):
    rows = [
        # host a: 3 events tight, 10-min gap, 2 events tight
        (0, "a", _ts(0)),
        (1, "a", _ts(1)),
        (2, "a", _ts(2)),
        (3, "a", _ts(12)),
        (4, "a", _ts(13)),
        # host b: singleton
        (5, "b", _ts(5)),
        # host c: two events exactly gap apart (NOT a boundary: > not >=)
        (6, "c", _ts(0)),
        (7, "c", _ts(5)),
        # host c: one microsecond past the gap IS a boundary
        (8, "c", _ts(10, 0, 1)),
    ]
    return spark.createDataFrame(rows, "event_id LONG, host STRING, ts TIMESTAMP").cache()


def test_hand_computed_sessions(spark, log):
    out = {
        (r.host, r.session_seq): (r.n_events, r.first_id, r.last_id, r.duration_us)
        for r in SES.session_stats(log, "host", "ts", 300, "event_id").collect()
    }
    assert out[("a", 1)] == (3, 0, 2, 120_000_000)
    assert out[("a", 2)] == (2, 3, 4, 60_000_000)
    assert out[("b", 1)] == (1, 5, 5, 0)
    # 6 -> 7 is exactly 300 s: same session; 7 -> 8 is 300 s + 1 us: split
    assert out[("c", 1)] == (2, 6, 7, 300_000_000)
    assert out[("c", 2)] == (1, 8, 8, 0)
    assert len(out) == 5


def test_equal_timestamps_are_deterministic(spark):
    rows = [(i, "h", _ts(0)) for i in range(6)]
    df = spark.createDataFrame(rows, "event_id LONG, host STRING, ts TIMESTAMP")
    a = SES.sessionize(df, "host", "ts", 60, order_tiebreak="event_id")
    b = SES.sessionize(
        df.repartition(4), "host", "ts", 60, order_tiebreak="event_id"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # all-simultaneous events form exactly one session
    assert a.agg(F.max("session_seq")).first()[0] == 1


def test_single_exchange_plan(spark, log):
    p = (
        SES.session_stats(log, "host", "ts", 300, "event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the groupBy must reuse the window's hashpartitioning(host)
    assert p.count("Exchange") == 1


# ------------------------------------------------ property: random streams

from hypothesis import given, settings, strategies as st

_event = st.tuples(
    st.sampled_from(["a", "b", "c"]),
    st.integers(min_value=0, max_value=3_000_000),  # epoch micros
)


def _py_sessions(events, gap_us):
    """Referee: per-key sorted (us, id) streams split at > gap_us."""
    by_key = {}
    for i, (k, us) in enumerate(events):
        by_key.setdefault(k, []).append((us, i))
    out = {}
    for k, evs in by_key.items():
        evs.sort()
        seq, prev = 0, None
        cur = []
        for us, i in evs:
            if prev is None or us - prev > gap_us:
                if cur:
                    out[(k, seq)] = cur
                seq += 1
                cur = []
            cur.append((us, i))
            prev = us
        out[(k, seq)] = cur
    return {
        key: (
            len(evs),
            min(i for _, i in evs),
            max(i for _, i in evs),
            min(us for us, _ in evs),
            max(us for us, _ in evs),
        )
        for key, evs in out.items()
    }


@settings(max_examples=8, deadline=None)
@given(st.lists(_event, min_size=1, max_size=40))
def test_sessionize_matches_python_referee(spark, events):
    import datetime as dt

    gap_s = 1  # 1 s gap vs offsets up to 3 s: both split outcomes occur
    rows = [
        (i, k, datetime(2024, 1, 1) + dt.timedelta(microseconds=us))
        for i, (k, us) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id LONG, host STRING, ts TIMESTAMP")
    # spark start_us/end_us are absolute epoch micros; the referee works
    # in offsets from 2024-01-01, so shift by that epoch
    epoch = int(datetime(2024, 1, 1).timestamp()) * 1_000_000
    got = {
        (r.host, r.session_seq): (r.n_events, r.first_id, r.last_id,
                                  r.start_us - epoch, r.end_us - epoch)
        for r in SES.session_stats(df, "host", "ts", gap_s, "event_id").collect()
    }
    assert got == _py_sessions(events, gap_s * 1_000_000)

"""As-of join: referee parity, tie inclusivity, left semantics,
collision guard, one-shuffle plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators.asof import asof_join


def _l(spark, rows):
    return spark.createDataFrame(rows, "k LONG, t LONG, ev LONG")


def _r(spark, rows):
    return spark.createDataFrame(rows, "k LONG, t LONG, v LONG")


def _referee(lrows, rrows):
    out = {}
    for k, t, ev in lrows:
        best = None
        for rk, rt, v in rrows:
            if rk == k and rt <= t and (best is None or rt > best[0]):
                best = (rt, v)
        out[(k, t, ev)] = best[1] if best else None
    return out


def test_matches_referee_with_ties_and_gaps(spark):
    lrows = [(1, 0, 100), (1, 5, 101), (1, 7, 102), (2, 3, 103), (3, 9, 104)]
    rrows = [(1, 0, 10), (1, 5, 20), (1, 8, 30), (2, 4, 40)]
    got = {
        (r.k, r.t, r.ev): r.v
        for r in asof_join(_l(spark, lrows), _r(spark, rrows), "k").collect()
    }
    assert got == _referee(lrows, rrows)
    # inclusivity: left at t=5 sees right version AT 5, not the older one
    assert got[(1, 5, 101)] == 20
    # gap: left before any version and key with no versions get NULL
    assert got[(2, 3, 103)] is None and got[(3, 9, 104)] is None


def test_multiple_right_attrs_flattened(spark):
    left = _l(spark, [(1, 6, 1)])
    right = spark.createDataFrame(
        [(1, 2, 7, "allow")], "k LONG, t LONG, delay LONG, policy STRING"
    )
    row = asof_join(left, right, "k").first()
    assert (row.delay, row.policy) == (7, "allow")


def test_collision_guard(spark):
    left = _l(spark, [(1, 0, 1)])
    right = spark.createDataFrame([(1, 0, 2)], "k LONG, t LONG, ev LONG")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "k")


def test_single_exchange_plan(spark):
    p = (
        asof_join(_l(spark, [(1, 0, 1)]), _r(spark, [(1, 0, 2)]), "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Exchange") == 1
    assert "Join" not in p  # union + window, literally no join operator


# ----------------------------------------------------- interval join


def test_interval_join_on_content_history_shape(spark):
    from crawler_apple_podcast_spark.operators.asof import interval_join

    intervals = spark.createDataFrame(
        [
            ("u1", 1, "A", 0, 4, 3),
            ("u1", 2, "B", 5, 9, 2),
            ("u1", 3, "C", 10, None, 1),
            ("u2", 1, "X", 3, None, 1),
        ],
        "url STRING, version LONG, fingerprint STRING,"
        " valid_from_wave LONG, valid_to_wave LONG, n_obs LONG",
    )
    points = spark.createDataFrame(
        [("u1", 0), ("u1", 4), ("u1", 7), ("u1", 10), ("u1", 99),
         ("u2", 0), ("u2", 5), ("u3", 1)],
        "url STRING, t LONG",
    )
    got = {
        (r.url, r.t): r.fingerprint
        for r in interval_join(points, intervals, "url").collect()
    }
    assert got == {
        ("u1", 0): "A", ("u1", 4): "A", ("u1", 7): "B",
        ("u1", 10): "C", ("u1", 99): "C",
        ("u2", 0): None,          # before the first version
        ("u2", 5): "X",
        ("u3", 1): None,          # key with no intervals
    }


def test_interval_join_gapped_history_nulls_out(spark):
    from crawler_apple_podcast_spark.operators.asof import interval_join

    intervals = spark.createDataFrame(
        [("u", 1, "A", 0, 2, 1), ("u", 2, "B", 8, None, 1)],
        "url STRING, version LONG, fingerprint STRING,"
        " valid_from_wave LONG, valid_to_wave LONG, n_obs LONG",
    )
    points = spark.createDataFrame([("u", 5)], "url STRING, t LONG")
    row = interval_join(points, intervals, "url").first()
    # t=5 falls in the gap (2, 8): as-of matches A but containment fails
    assert row.fingerprint is None and row.valid_from_wave is None


# ------------------------------------------------ property: random logs


from hypothesis import given, settings, strategies as st  # noqa: E402


@given(
    lrows=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 30), st.integers(0, 999)),
        max_size=25,
        unique_by=lambda r: (r[0], r[1], r[2]),
    ),
    rrows=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 30), st.integers(0, 999)),
        max_size=15,
        unique_by=lambda r: (r[0], r[1]),   # unique (key, t): the contract
    ),
)
@settings(max_examples=12, deadline=None)
def test_asof_property_random_logs(spark, lrows, rrows):
    got = sorted(
        (r.k, r.t, r.ev, r.v)
        for r in asof_join(_l(spark, lrows), _r(spark, rrows), "k").collect()
    )
    ref = _referee(lrows, rrows)
    want = sorted((k, t, ev, ref[(k, t, ev)]) for k, t, ev in lrows)
    assert got == want

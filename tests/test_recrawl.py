from __future__ import annotations

import pytest

from crawler_apple_podcast_spark.operators.recrawl import (
    due_frontier,
    revisit_schedule,
)


@pytest.fixture(scope="module")
def history(spark):
    # u_static never changes, u_hot changes every fetch, u_half changes
    # on 1 of 2 intervals, u_once is a single observation.
    rows = (
        [("u_static", w, 7) for w in range(5)]
        + [("u_hot", w, w) for w in range(4)]
        + [("u_half", 0, 1), ("u_half", 1, 1), ("u_half", 2, 2)]
        + [("u_once", 3, 9)]
    )
    return spark.createDataFrame(rows, "url string, wave long, fingerprint long")


def test_policy_endpoints(spark, history):
    out = {r.url: r for r in revisit_schedule(history).collect()}
    s = out["u_static"]
    assert (s.n_obs, s.n_changes, s.change_milli, s.next_interval) == (5, 0, 0, 16)
    assert s.next_due == 4 + 16
    h = out["u_hot"]
    assert (h.n_changes, h.change_milli, h.next_interval) == (3, 1000, 1)
    assert out["u_half"].change_milli == 500
    assert out["u_half"].next_interval == 16 - (15 * 500) // 1000
    o = out["u_once"]
    assert (o.n_obs, o.change_milli, o.next_interval, o.next_due) == (1, None, 1, 4)


def test_wave_order_not_input_order(spark):
    # Shuffled input rows must not change the adjacent-change count.
    rows = [("u", 2, 1), ("u", 0, 0), ("u", 1, 0), ("u", 3, 1)]
    out = revisit_schedule(
        spark.createDataFrame(rows, "url string, wave long, fingerprint long")
    ).collect()[0]
    assert (out.n_changes, out.change_milli) == (1, 333)


def test_single_exchange_plan(spark, history):
    # Window and groupBy share the url key: exactly one shuffle.
    plan = revisit_schedule(history)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_due_frontier(spark, history):
    sched = revisit_schedule(history)
    # u_half: change_milli 500 -> interval 9 -> due at wave 11, not 5
    due = {r.url for r in due_frontier(sched, 5).collect()}
    assert due == {"u_hot", "u_once"}
    assert {r.url for r in due_frontier(sched, 11).collect()} == {
        "u_hot", "u_once", "u_half"
    }
    assert {r.url for r in due_frontier(sched, 3).collect()} == set()


def test_snapshot_diff_statuses(spark):
    from crawler_apple_podcast_spark.operators.recrawl import snapshot_diff

    old = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "url string, fingerprint long"
    )
    new = spark.createDataFrame(
        [("a", 1), ("b", 9), ("d", 4)], "url string, fingerprint long"
    )
    out = {r.url: r.status for r in snapshot_diff(old, new).collect()}
    assert out == {"a": "same", "b": "changed", "c": "gone", "d": "new"}


# --------------------------------------------- SCD2 content history


def _ref_history(rows):
    """Python referee: rows = [(url, wave, fp)] -> {(url, version):
    (fp, valid_from, valid_to, n_obs)}."""
    by_url: dict[str, list[tuple[int, int]]] = {}
    for u, w, fp in rows:
        by_url.setdefault(u, []).append((w, fp))
    out = {}
    for u, obs in by_url.items():
        obs.sort()
        versions: list[list[tuple[int, int]]] = []
        for w, fp in obs:
            if not versions or versions[-1][-1][1] != fp:
                versions.append([])
            versions[-1].append((w, fp))
        for i, v in enumerate(versions, start=1):
            valid_to = versions[i][0][0] - 1 if i < len(versions) else None
            out[(u, i)] = (v[0][1], v[0][0], valid_to, len(v))
    return out


def test_content_history_matches_referee(spark, history):
    from crawler_apple_podcast_spark.operators.recrawl import content_history

    rows = [(r.url, r.wave, r.fingerprint) for r in history.collect()]
    got = {
        (r.url, r.version): (
            r.fingerprint, r.valid_from_wave, r.valid_to_wave, r.n_obs
        )
        for r in content_history(history).collect()
    }
    assert got == _ref_history(rows)
    # spot-check semantics: u_hot has one version per wave, closed
    # spans except the last
    hot = sorted(k for k in got if k[0] == "u_hot")
    assert len(hot) == 4
    assert [got[k][2] for k in hot] == [0, 1, 2, None]
    # u_static is one open version covering all 5 observations
    assert got[("u_static", 1)] == (7, 0, None, 5)


def test_content_history_single_exchange(spark, history):
    from crawler_apple_podcast_spark.operators.recrawl import content_history

    p = (
        content_history(history)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Exchange") == 1

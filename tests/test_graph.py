"""Connected components (operators/graph.py): chains, cliques, cycles
collapse to min-id components; fixpoint terminates; singletons absent."""

from __future__ import annotations

from crawler_apple_podcast_spark.operators.graph import (
    connected_components,
    dedup_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a LONG, doc_b LONG")


def _result(df):
    return {r.id: r.component for r in df.collect()}


def test_chain_and_separate_pair(spark):
    # chain 1-2-3-4 plus pair 9-7 (reversed order) plus cycle 5-6-5
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (9, 7), (5, 6), (6, 5)])
    out = _result(connected_components(e))
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 9: 7, 5: 5, 6: 5}


def test_long_chain_converges(spark):
    # diameter 19: forces several propagation rounds
    e = _edges(spark, [(i, i + 1) for i in range(20, 0, -1)])
    out = _result(connected_components(e))
    assert set(out.values()) == {1}
    assert len(out) == 21


def test_dedup_components_columns(spark):
    e = _edges(spark, [(10, 11), (11, 12)])
    rows = {(r.doc_id, r.component) for r in dedup_components(e).collect()}
    assert rows == {(10, 10), (11, 10), (12, 10)}

"""Connected components (operators/graph.py): chains, cliques, cycles
collapse to min-id components; fixpoint terminates; singletons absent."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from crawler_apple_podcast_spark.operators.graph import (
    connected_components,
    dedup_components,
    pagerank,
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


# ----------------------------------------------------------- pagerank

def ref_pagerank(edges, iters=3, scale=10**12, d=850):
    """Pure-Python integer power iteration (dict arithmetic, same
    floor-division update rule, independently coded)."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    sc = {v: scale // n for v in nodes}
    for _ in range(iters):
        inc = {v: 0 for v in nodes}
        for u, v in edges:
            inc[v] += sc[u] // out[u]
        dang = sum(sc[v] for v in nodes if v not in out)
        sc = {
            v: ((1000 - d) * (scale // n) + d * (inc[v] + dang // n)) // 1000
            for v in nodes
        }
    return sc


def _edges_df(spark, edges):
    return spark.createDataFrame(list(edges), "src long, dst long")


def test_pagerank_matches_referee_with_dangling(spark):
    # 0->1->2->0 cycle plus 3 feeding 0 and a dangling sink 4
    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (3, 4), (1, 4)]
    got = {
        r.node: r.rank_scaled
        for r in pagerank(_edges_df(spark, edges), iterations=3).collect()
    }
    assert got == ref_pagerank(edges, iters=3)
    # sink 4 has no out-edges but still holds mass
    assert got[4] > 0


def test_pagerank_uniform_on_symmetric_cycle(spark):
    edges = [(i, (i + 1) % 6) for i in range(6)]
    got = {
        r.node: r.rank_scaled
        for r in pagerank(_edges_df(spark, edges), iterations=4).collect()
    }
    assert len(set(got.values())) == 1  # symmetry preserved exactly
    assert got == ref_pagerank(edges, iters=4)


@settings(max_examples=15, deadline=None)
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
    ),
    iters=st.integers(min_value=1, max_value=4),
)
def test_pagerank_matches_referee_random_graphs(spark, edges, iters):
    got = {
        r.node: r.rank_scaled
        for r in pagerank(
            _edges_df(spark, edges), iterations=iters
        ).collect()
    }
    assert got == ref_pagerank(sorted(edges), iters=iters)


def test_select_component_representatives(spark):
    from pyspark.sql import functions as F

    from crawler_apple_podcast_spark.operators.graph import (
        dedup_components,
        select_component_representatives,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    # doc 3 has the best score in {1,2,3}; 10 and 11 tie -> min id wins
    scores = spark.createDataFrame(
        [(1, 5), (2, 7), (3, 9), (10, 4), (11, 4)], "doc_id long, score long"
    )
    out = select_component_representatives(
        dedup_components(pairs), scores
    ).collect()
    keep = {r.doc_id for r in out if r.keep}
    assert keep == {3, 10}
    assert {r.doc_id: r.component for r in out} == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10
    }
    # exactly one keeper per component
    from collections import Counter

    c = Counter(r.component for r in out if r.keep)
    assert all(v == 1 for v in c.values())


def test_incremental_cc_equals_batch_on_union(spark):
    from crawler_apple_podcast_spark.operators.graph import (
        connected_components_incremental,
    )

    old = [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)]
    # new wave: extends comp{1,2,3} with a new doc; FUSES comps {10,11}
    # and {20,21} through a new doc; adds a fresh pair; and a new doc
    # (id 5) UNDERCUTS comp {10,...} mins so the whole merged component
    # must relabel to 5; plus an intra-component confirmation (30,31)
    new = [(3, 100), (11, 50), (50, 20), (5, 10), (200, 201), (30, 31)]
    committed = connected_components(_edges(spark, old)).localCheckpoint()
    got = _result(
        connected_components_incremental(committed, _edges(spark, new))
    )
    want = _result(connected_components(_edges(spark, old + new)))
    assert got == want
    # and nothing is emitted twice
    n = connected_components_incremental(committed, _edges(spark, new)).count()
    assert n == len(want)


@given(
    old=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=12
    ),
    new=st.lists(
        st.tuples(st.integers(0, 45), st.integers(0, 45)), min_size=1, max_size=12
    ),
)
@settings(max_examples=8, deadline=None)
def test_incremental_cc_random_graphs(spark, old, new):
    from crawler_apple_podcast_spark.operators.graph import (
        connected_components_incremental,
    )

    old = [(a, b) for a, b in old if a != b] or [(0, 1)]
    new = [(a, b) for a, b in new if a != b] or [(40, 41)]
    committed = connected_components(_edges(spark, old)).localCheckpoint()
    got = _result(
        connected_components_incremental(committed, _edges(spark, new))
    )
    want = _result(connected_components(_edges(spark, old + new)))
    # incremental emits every committed vertex (even if its component
    # has no new edge) plus new-edge vertices == batch's vertex set
    assert got == want


def test_incremental_cc_heals_null_committed_component(spark):
    """A contract-violating NULL component in the committed table heals
    to the vertex's own id instead of NULLing the label-edge filter
    (which would silently DROP every wave edge touching that vertex)."""
    from crawler_apple_podcast_spark.operators.graph import (
        connected_components_incremental,
    )

    committed = spark.createDataFrame(
        [(7, None), (8, 8)], "id LONG, component LONG"
    )
    new_edges = spark.createDataFrame([(7, 42)], "doc_a LONG, doc_b LONG")
    got = {
        (r.id, r.component)
        for r in connected_components_incremental(committed, new_edges).collect()
    }
    # the 7~42 merge must survive: both label to min(7, 42) = 7
    assert got == {(7, 7), (8, 8), (42, 7)}

"""DSIR-style importance scoring: Python replay referee, target-
likeness separation, weight bounds, zero-token docs."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from crawler_apple_podcast_spark.operators import importance as IMP

B = 32


def _bucket(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:6], 16) % B


@pytest.fixture(scope="module")
def corpus(spark):
    # Two disjoint vocabularies; the target slice speaks only vocab A.
    rows = [
        (0, "apple apple banana"),
        (1, "banana apple"),
        (2, "zebra yak xylo"),
        (3, "yak yak zebra"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING").cache()


def _python_scores(rows, target_ids):
    ccnt, tcnt = {}, {}
    for doc_id, text in rows:
        for t in [x for x in text.split(" ") if x]:
            b = _bucket(t)
            ccnt[b] = ccnt.get(b, 0) + 1
            if doc_id in target_ids:
                tcnt[b] = tcnt.get(b, 0) + 1
    w = {b: tcnt.get(b, 0) * IMP.SCALE // c for b, c in ccnt.items()}
    out = {}
    for doc_id, text in rows:
        toks = [x for x in text.split(" ") if x]
        out[doc_id] = (len(toks), sum(w[_bucket(t)] for t in toks))
    return out


def test_matches_python_replay(spark, corpus):
    rows = [(0, "apple apple banana"), (1, "banana apple"),
            (2, "zebra yak xylo"), (3, "yak yak zebra"), (4, "")]
    target = corpus.where(F.col("doc_id") < 2)
    expect = _python_scores(rows, {0, 1})
    got = {
        r.doc_id: (r.n_tokens, r.importance_raw)
        for r in IMP.importance_scores(corpus, target, "doc_id", "text", B).collect()
    }
    assert got == expect


def test_target_docs_score_higher(spark, corpus):
    """Docs sharing the target's vocabulary outscore disjoint docs —
    the selection property the operator exists for."""
    target = corpus.where(F.col("doc_id") < 2)
    got = {
        r.doc_id: r.importance_raw
        for r in IMP.importance_scores(corpus, target, "doc_id", "text", B).collect()
    }
    assert min(got[0], got[1]) > max(got[2], got[3])
    assert got[4] == 0  # zero-token doc present, scores 0


def test_weight_bound_when_target_subset(spark, corpus):
    """target ⊆ corpus  =>  every bucket weight <= SCALE, so
    importance_raw <= n_tokens * SCALE."""
    target = corpus.where(F.col("doc_id") % 2 == 0)
    out = IMP.importance_scores(corpus, target, "doc_id", "text", B).collect()
    assert all(0 <= r.importance_raw <= r.n_tokens * IMP.SCALE for r in out)


def test_partition_independent(spark, corpus):
    target = corpus.where(F.col("doc_id") < 2)
    a = set(map(tuple, IMP.importance_scores(corpus, target, "doc_id", "text", B).collect()))
    b = set(
        map(
            tuple,
            IMP.importance_scores(
                corpus.repartition(7, "text"), target, "doc_id", "text", B
            ).collect(),
        )
    )
    assert a == b

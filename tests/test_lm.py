from __future__ import annotations

from crawler_apple_podcast_spark.operators.lm import (
    bigram_continuation_score,
    bigram_instances,
)


def test_bigram_instances(spark):
    docs = spark.createDataFrame(
        [(1, "a b  c"), (2, "x"), (3, "")], "doc_id int, text string"
    )
    rows = sorted(
        (r.doc_id, r.w1, r.w2) for r in bigram_instances(docs).collect()
    )
    # double space yields an empty token that tokens() drops
    assert rows == [(1, "a", "b"), (1, "b", "c")]


def test_continuation_score_against_hand_counts(spark):
    # corpus: "a b" x3, "a c" x1  ->  C(a,.)=4, P(b|a)=750, P(c|a)=250
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c"), (5, "solo")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in bigram_continuation_score(docs).collect()}
    assert out[1].score_milli == 750 and out[1].n_bigrams == 1
    assert out[4].score_milli == 250
    assert (out[5].n_bigrams, out[5].score_milli) == (0, -1)


def test_repeated_text_scores_higher_than_salad(spark):
    common = [(i, "the quick brown fox jumps") for i in range(10)]
    salad = [(100, "zqx wvu tsr qpo nml")]
    docs = spark.createDataFrame(
        common + salad, "doc_id int, text string"
    )
    out = {r.doc_id: r.score_milli for r in bigram_continuation_score(docs).collect()}
    assert out[0] == 1000   # every bigram fully predictable
    assert out[100] == 1000  # unique bigrams, but each prefix unique too
    # mix a shared-prefix competitor in: prefix 'the' now splits
    docs2 = spark.createDataFrame(
        common + [(200, "the slow brown fox naps")], "doc_id int, text string"
    )
    out2 = {r.doc_id: r.score_milli for r in bigram_continuation_score(docs2).collect()}
    assert out2[200] < out2[0] < 1000

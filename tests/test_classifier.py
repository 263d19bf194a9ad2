"""Hashed-BoW classifier gate: Python md5 replay referee, partition
independence, weight-swap linearity, zero-token verdicts."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from crawler_apple_podcast_spark.operators import classifier as CLS

B = 64


def _bucket(token: str, buckets: int = B) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:6], 16) % buckets


def _weight(bucket: int, lo: int = -1000, hi: int = 1000) -> int:
    span = hi - lo + 1
    return int(hashlib.md5(str(bucket).encode()).hexdigest()[:6], 16) % span + lo


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma alpha"),
        (1, "beta beta"),
        (2, ""),
        (3, "  "),
        (4, "delta"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING").cache()


def test_matches_python_replay(spark, docs):
    w = CLS.hash_weights(spark, B)
    out = {
        r.doc_id: (r.n_tokens, r.score_raw, r.label)
        for r in CLS.classifier_score(docs, "doc_id", "text", w, B).collect()
    }
    for doc_id, text in [(0, "alpha beta gamma alpha"), (1, "beta beta"), (4, "delta")]:
        toks = [t for t in text.split(" ") if t]
        score = sum(_weight(_bucket(t)) for t in toks)
        label = "keep" if score >= 0 else "drop"
        assert out[doc_id] == (len(toks), score, label)
    # zero-token docs are present with score 0 and 'keep' (threshold 0)
    assert out[2] == (0, 0, "keep")
    assert out[3] == (0, 0, "keep")


def test_partition_independent(spark, docs):
    w = CLS.hash_weights(spark, B)
    a = set(map(tuple, CLS.classifier_score(docs, "doc_id", "text", w, B).collect()))
    b = set(
        map(
            tuple,
            CLS.classifier_score(
                docs.repartition(5, "text"), "doc_id", "text", w, B
            ).collect(),
        )
    )
    assert a == b


def test_unit_weights_count_occurrences(spark, docs):
    """With W == 1 everywhere the dot product degenerates to the
    occurrence count — the linearity sanity check."""
    ones = spark.range(B).select(
        F.col("id").alias("_bucket"), F.lit(1).cast("long").alias("_weight_milli")
    )
    out = CLS.classifier_score(docs, "doc_id", "text", ones, B).collect()
    assert all(r.score_raw == r.n_tokens for r in out)
    assert all(r.label == "keep" for r in out)


def test_threshold_gates(spark, docs):
    ones = spark.range(B).select(
        F.col("id").alias("_bucket"), F.lit(1).cast("long").alias("_weight_milli")
    )
    out = {
        r.doc_id: r.label
        for r in CLS.classifier_score(
            docs, "doc_id", "text", ones, B, threshold=2
        ).collect()
    }
    assert out[0] == "keep" and out[1] == "keep"
    assert out[4] == "drop" and out[2] == "drop"


# ------------------------------------------------ property: random corpora

from hypothesis import given, settings, strategies as st

_token = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters=" \t\n\r"),
    min_size=1,
    max_size=6,
)
_text = st.lists(_token, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(st.lists(_text, min_size=1, max_size=10))
def test_classifier_matches_hashlib_referee_on_random_text(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    w = CLS.hash_weights(spark, B)
    got = {
        r.doc_id: (r.n_tokens, r.score_raw)
        for r in CLS.classifier_score(df, "doc_id", "text", w, B).collect()
    }
    for i, t in enumerate(texts):
        toks = [x for x in t.split(" ") if x]
        want = (len(toks), sum(_weight(_bucket(x)) for x in toks))
        assert got[i] == want, (i, t, got[i], want)

"""Eval-set decontamination: hand-computable overlaps, hash/string
mode agreement, threshold semantics, short-doc edge."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from crawler_apple_podcast_spark.operators import decontaminate as DC

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_hand_computable_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f"),          # shares grams with eval doc 100
            (2, "p q r s t u"),          # disjoint
            (3, "x y"),                  # < n tokens: no grams, must survive
        ],
        "doc_id INT, text STRING",
    )
    ev = spark.createDataFrame([(100, "z a b c d e")], "doc_id INT, text STRING")
    for hashed in (True, False):
        kept = _ids(DC.decontaminate(corpus, ev, "doc_id", "text", 5, 1, hashed))
        assert kept == {2, 3}, hashed
        hits = {
            r.doc_id: r.n_contaminated
            for r in DC.contamination_hits(corpus, ev, "doc_id", "text", 5, hashed).collect()
        }
        # doc 1 shares exactly 'a b c d e' (one distinct 5-gram)
        assert hits == {1: 1}, hashed


def test_min_hits_threshold(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id INT, text STRING"  # grams abcde,bcdef,cdefg
    )
    ev = spark.createDataFrame([(9, "a b c d e f")], "doc_id INT, text STRING")
    # shares 2 grams (abcde, bcdef): dropped at min_hits<=2, kept at 3
    assert _ids(DC.decontaminate(corpus, ev, "doc_id", "text", 5, 2)) == set()
    assert _ids(DC.decontaminate(corpus, ev, "doc_id", "text", 5, 3)) == {1}


def test_hash_and_string_modes_agree_on_documents(spark, docs):
    ev = docs.where(F.col("doc_id") % 37 == 0)
    a = _ids(DC.decontaminate(docs, ev, "doc_id", "text", 5, 1, use_hashes=True))
    b = _ids(DC.decontaminate(docs, ev, "doc_id", "text", 5, 1, use_hashes=False))
    assert a == b
    # eval docs with >= 5 tokens remove themselves
    long_eval = {
        r.doc_id
        for r in ev.where(F.size(F.filter(F.split("text", " "), lambda x: x != "")) >= 5).collect()
    }
    assert long_eval.isdisjoint(a)

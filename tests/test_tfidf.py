"""TF-IDF top-k vs a Counter-based Python referee, plus ranking
invariants on the sf0.001 documents table."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators.tfidf import term_frequencies, tfidf_topk

SF = "/root/testdata/sf0.001"


def ref_topk(texts: dict[int, str], k: int, idf_scale: int = 1000):
    tf = {d: Counter(t for t in txt.split(" ") if t) for d, txt in texts.items()}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    n = len(texts)
    out = set()
    for d, c in tf.items():
        scored = sorted(
            ((t, f, f * ((n * idf_scale) // df[t])) for t, f in c.items()),
            key=lambda x: (-x[2], x[0]),
        )
        for rk, (t, f, s) in enumerate(scored[:k], start=1):
            out.add((d, t, f, s, rk))
    return out


def _df(spark, texts):
    return spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )


def test_fixed_corpus(spark):
    texts = {
        0: "the cat sat on the mat",
        1: "the dog sat",
        2: "cat cat cat rare",
        3: "",
    }
    got = {tuple(r) for r in tfidf_topk(_df(spark, texts), k=3).collect()}
    assert got == ref_topk(texts, 3)
    # 'rare' (df=1) must outrank 'cat' (df=2) in doc 2 despite tf 1 vs 3
    doc2 = sorted((r for r in got if r[0] == 2), key=lambda r: r[4])
    assert doc2[0][1] == "cat"  # tf=3 * idf(4000//2=2000) = 6000
    assert doc2[1][1] == "rare"  # tf=1 * idf(4000//1=4000) = 4000


def test_term_frequencies_counts(spark):
    texts = {0: "a b a  a", 1: "b"}
    got = {
        (r.doc_id, r.term): r.tf
        for r in term_frequencies(_df(spark, texts)).collect()
    }
    assert got == {(0, "a"): 3, (0, "b"): 1, (1, "b"): 1}


_word = st.text(alphabet="abcxyz", min_size=1, max_size=4)


@settings(max_examples=20, deadline=None)
@given(
    texts=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.lists(_word, min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    k=st.integers(min_value=1, max_value=6),
)
def test_matches_referee(spark, texts, k):
    got = {tuple(r) for r in tfidf_topk(_df(spark, texts), k=k).collect()}
    assert got == ref_topk(texts, k)


def test_sf0001_rank_invariants(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = tfidf_topk(d, k=5)
    per_doc = out.groupBy("doc_id").agg(
        F.count("*").alias("c"),
        F.min("rk").alias("lo"),
        F.max("rk").alias("hi"),
    )
    bad = per_doc.where(
        (F.col("c") > 5) | (F.col("lo") != 1) | (F.col("hi") != F.col("c"))
    ).count()
    assert bad == 0

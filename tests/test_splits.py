"""Leakage-safe split: components never straddle, singletons keep
their own id, proportions track the bucket rate."""

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators import splits as SPL


def _frames(spark):
    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    # chain 0-1-2 one component; 10-11 another; rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "doc_a LONG, doc_b LONG"
    )
    return docs, pairs


def test_components_never_straddle_split(spark):
    docs, pairs = _frames(spark)
    out = SPL.leakage_safe_split(docs, pairs, "doc_id", holdout_milli=300)
    sides = (
        out.groupBy("component")
        .agg(F.countDistinct("split").alias("n_sides"))
        .collect()
    )
    assert all(r.n_sides == 1 for r in sides)
    by_id = {r.doc_id: (r.component, r.split) for r in out.collect()}
    assert by_id[0][0] == by_id[1][0] == by_id[2][0] == 0
    assert by_id[0][1] == by_id[1][1] == by_id[2][1]
    assert by_id[10][0] == by_id[11][0] == 10
    assert by_id[42] == (42, by_id[42][1])  # singleton keeps own id
    assert len(by_id) == 200  # left join loses nothing


def test_split_is_deterministic_and_roughly_proportional(spark):
    docs, pairs = _frames(spark)
    a = SPL.leakage_safe_split(docs, pairs, "doc_id", holdout_milli=300)
    b = SPL.leakage_safe_split(docs, pairs, "doc_id", holdout_milli=300)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    frac = a.where(F.col("split") == "holdout").count() / 200
    assert 0.15 < frac < 0.45  # 200 components, rate 0.3


def test_growing_corpus_never_flips_existing_components(spark):
    """Stability contract: adding NEW docs (new components) leaves
    every old component's side unchanged."""
    docs, pairs = _frames(spark)
    small = SPL.leakage_safe_split(docs, pairs, "doc_id", holdout_milli=300)
    grown = docs.unionByName(
        docs.sparkSession.range(200, 400).select(F.col("id").alias("doc_id"))
    )
    big = SPL.leakage_safe_split(grown, pairs, "doc_id", holdout_milli=300)
    old = {r.doc_id: r.split for r in small.collect()}
    new = {r.doc_id: r.split for r in big.collect()}
    assert all(new[k] == v for k, v in old.items())

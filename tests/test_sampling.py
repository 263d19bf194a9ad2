"""Deterministic stratified sampling: reproducibility, monotonicity in
rate, incremental stability under corpus growth, NULL handling, and
rate accuracy."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from crawler_apple_podcast_spark.operators import sampling as SAMP


@pytest.fixture(scope="module")
def corpus(spark):
    # 4000 keyed rows over two strata, 3:1 skewed
    return spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod("id", F.lit(4)) < 3, F.lit("en")).otherwise(F.lit("other")).alias("lang"),
    ).cache()


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_deterministic_and_partition_independent(spark, corpus):
    out1 = _ids(SAMP.sample_stratified(corpus, "lang", "doc_id", {"en": 500, "other": 200}))
    out2 = _ids(
        SAMP.sample_stratified(
            corpus.repartition(7, "lang"), "lang", "doc_id", {"en": 500, "other": 200}
        )
    )
    assert out1 == out2
    assert out1


def test_monotone_in_rate(spark, corpus):
    lo = _ids(SAMP.sample_stratified(corpus, "lang", "doc_id", {"en": 300, "other": 100}))
    hi = _ids(SAMP.sample_stratified(corpus, "lang", "doc_id", {"en": 600, "other": 100}))
    assert lo < hi  # strictly more rows, and a superset


def test_incremental_under_growth(spark, corpus):
    """A grown corpus keeps exactly the previously-kept rows: the
    decision is per-key, never a function of the dataset."""
    rates = {"en": 400, "other": 400}
    small = corpus.where(F.col("doc_id") < 1000)
    kept_small = _ids(SAMP.sample_stratified(small, "lang", "doc_id", rates))
    kept_full = _ids(SAMP.sample_stratified(corpus, "lang", "doc_id", rates))
    assert kept_small == {i for i in kept_full if i < 1000}


def test_default_rate_and_null_stratum(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, None), (3, "xx")], "doc_id INT, lang STRING"
    )
    # default 1000 keeps every unknown/NULL stratum row
    out = SAMP.sample_stratified(df, "lang", "doc_id", {"en": 1000}, default_milli=1000)
    assert _ids(out) == {1, 2, 3}
    # default 0 drops them
    out0 = SAMP.sample_stratified(df, "lang", "doc_id", {"en": 1000}, default_milli=0)
    assert _ids(out0) == {1}


def test_null_key_always_dropped(spark):
    df = spark.createDataFrame([(None, "en"), (7, "en")], "doc_id INT, lang STRING")
    out = SAMP.sample_stratified(df, "lang", "doc_id", {"en": 1000})
    assert _ids(out) == {7}


def test_rate_accuracy(spark, corpus):
    """Observed keep fraction within ~4 sigma of the rate (md5 buckets
    are uniform; n=3000 'en' rows, sigma = sqrt(p(1-p)/n) ~ 0.9%)."""
    out = SAMP.sample_stratified(corpus, "lang", "doc_id", {"en": 500, "other": 0})
    n_en = corpus.where(F.col("lang") == "en").count()
    frac = out.count() / n_en
    assert abs(frac - 0.5) < 0.04


def test_bucket_matches_duckdb(spark):
    """The bucket arithmetic is the cross-engine contract — check it
    literally against DuckDB on a key sample."""
    import duckdb

    keys = [str(i) for i in range(50)]
    spark_rows = dict(
        spark.createDataFrame([(k,) for k in keys], "k STRING")
        .select("k", SAMP.hash_bucket_milli(F.col("k")).alias("b"))
        .collect()
    )
    con = duckdb.connect()
    for k in keys:
        (dk,) = con.execute(
            f"SELECT CAST('0x' || substr(md5('{k}'), 1, 6) AS BIGINT) % 1000"
        ).fetchone()
        assert spark_rows[k] == dk


# --------------------------------------- property: sampling invariants

from hypothesis import given, settings, strategies as st

_KEYS = st.text(min_size=0, max_size=12)
_STRATA = st.sampled_from(["en", "other", "xx", None])


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(_KEYS, _STRATA), min_size=1, max_size=40, unique_by=lambda t: t[0]),
    st.integers(0, 1000),
    st.integers(0, 1000),
)
def test_sampling_invariants_property(spark, rows, r_lo, r_hi):
    """Arbitrary unicode keys x arbitrary rates: (1) output is a subset
    of the input, (2) decisions are per-key deterministic across
    repartitionings, (3) raising a rate only adds rows, (4) every kept
    row's bucket is under its stratum's rate."""
    lo, hi = min(r_lo, r_hi), max(r_lo, r_hi)
    df = spark.createDataFrame(rows, "k STRING, lang STRING")
    kept_lo = {
        r.k
        for r in SAMP.sample_stratified(df, "lang", "k", {"en": lo, "other": lo}, lo).collect()
    }
    out_hi = SAMP.sample_stratified(
        df.repartition(5), "lang", "k", {"en": hi, "other": hi}, hi
    ).collect()
    kept_hi = {r.k for r in out_hi}
    in_keys = {k for k, _ in rows}
    assert kept_lo <= kept_hi <= in_keys  # (1)+(3)
    rerun = {
        r.k
        for r in SAMP.sample_stratified(df.coalesce(1), "lang", "k", {"en": hi, "other": hi}, hi).collect()
    }
    assert rerun == kept_hi  # (2)
    assert all(r._bucket < hi for r in out_hi)  # (4): all strata share rate hi


def test_split_assign_leakage_safe_and_complete(spark):
    rows = [(i, f"host{i % 9}") for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    out = SAMP.split_assign(df, "host").collect()
    assert all(r.split in ("train", "val", "test") for r in out)
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, set()).add(r.split)
    assert all(len(s) == 1 for s in by_host.values())  # no host straddles


def test_split_assign_fractions_must_sum(spark):
    import pytest

    df = spark.createDataFrame([(1, "h")], "doc_id long, host string")
    with pytest.raises(ValueError):
        SAMP.split_assign(df, "host", [("train", 500), ("test", 400)])


def test_split_assign_stable_under_growth(spark):
    small = spark.createDataFrame(
        [(i, f"h{i}") for i in range(50)], "doc_id long, host string"
    )
    big = spark.createDataFrame(
        [(i, f"h{i}") for i in range(200)], "doc_id long, host string"
    )
    s = {(r.doc_id, r.split) for r in SAMP.split_assign(small, "host").collect()}
    b = {(r.doc_id, r.split) for r in SAMP.split_assign(big, "host").collect()}
    assert s <= b

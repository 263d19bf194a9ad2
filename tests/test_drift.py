"""Histogram drift: Python referee parity, one-sided buckets, zero
drift on identical snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators.drift import histogram_drift


def _df(spark, buckets):
    return spark.createDataFrame([(b,) for b in buckets], "bucket LONG")


def _ref(cur, ref):
    ta, tb = len(cur), len(ref)
    out = {}
    for b in set(cur) | set(ref):
        pa = cur.count(b) * 1000 // ta
        pb = ref.count(b) * 1000 // tb
        c = (pa - pb) ** 2 // (pa + pb) if pa + pb else 0
        out[b] = (cur.count(b), ref.count(b), pa, pb, c)
    return out


def test_matches_referee_including_one_sided(spark):
    cur = [0] * 50 + [1] * 30 + [2] * 20          # bucket 2 new
    ref = [0] * 40 + [1] * 55 + [3] * 5           # bucket 3 gone
    got = {
        r.bucket: (r.n_cur, r.n_ref, r.cur_milli, r.ref_milli, r.contrib_milli)
        for r in histogram_drift(_df(spark, cur), _df(spark, ref)).collect()
    }
    assert got == _ref(cur, ref)
    # one-sided buckets alarm with their full share
    assert got[2][4] == 200  # (200-0)^2 // 200
    assert got[3][4] == 50


def test_identical_snapshots_zero_drift(spark):
    xs = [0, 0, 1, 2, 2, 2]
    out = histogram_drift(_df(spark, xs), _df(spark, xs))
    assert out.agg(F.sum("contrib_milli")).first()[0] == 0

"""HLL distinct sketches: merge law, accuracy bound, tolerance gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators import sketches as SK


def _urls(spark, n_hosts=4, per_host=2000, waves=5):
    base = spark.range(n_hosts * per_host)
    return base.select(
        F.concat(F.lit("h"), F.pmod("id", F.lit(n_hosts)).cast("string")).alias(
            "host"
        ),
        # ~25% collision rate inside a host so distinct < rows
        F.concat(
            F.lit("/p"), (F.col("id") % (n_hosts * per_host * 3 // 4)).cast("string")
        ).alias("url"),
        F.pmod("id", F.lit(waves)).alias("wave"),
    )


def test_merge_law_union_of_waves_within_bound(spark):
    """The cross-wave rollup (union of per-wave sketches) stays within
    the sketch error bound of the exact count, under ANY input
    partitioning.  NOTE neither byte-identity with a direct single
    sketch nor estimate-identity across partitionings holds for
    DataSketches HLL (sparse-vs-dense promotion and the
    order-dependent HIP estimator) — the BOUND is the operative
    contract (documented in operators/sketches.py)."""
    u = _urls(spark)
    exact = {
        r.host: r.n
        for r in u.groupBy("host").agg(F.countDistinct("url").alias("n")).collect()
    }
    per_wave = SK.hll_build(u, ["host", "wave"], "url")
    rolled = {
        r.host: r.distinct_est
        for r in SK.hll_estimate(SK.hll_merge(per_wave, ["host"])).collect()
    }
    for h, n in exact.items():
        assert abs(rolled[h] - n) <= 0.05 * n, (h, rolled[h], n)
    # a differently-partitioned build may yield a different estimate
    # (order-dependent HIP estimator) but must honor the same bound
    per_wave2 = SK.hll_build(u.repartition(13, "url"), ["host", "wave"], "url")
    rolled2 = {
        r.host: r.distinct_est
        for r in SK.hll_estimate(SK.hll_merge(per_wave2, ["host"])).collect()
    }
    for h, n in exact.items():
        assert abs(rolled2[h] - n) <= 0.05 * n, (h, rolled2[h], n)


def test_estimate_within_tolerance_and_gate(spark):
    u = _urls(spark)
    exact = {
        r.host: r.n for r in u.groupBy("host").agg(
            F.countDistinct("url").alias("n")
        ).collect()
    }
    est = {
        r.host: r.distinct_est
        for r in SK.hll_estimate(SK.hll_build(u, ["host"], "url")).collect()
    }
    for h, n in exact.items():
        assert abs(est[h] - n) <= 0.05 * n, (h, est[h], n)
    gate = SK.distinct_within_tolerance(u, ["host"], "url", tol_milli=50)
    rows = gate.collect()
    assert all(r.within_tol for r in rows)
    assert {r.host: r.n_distinct for r in rows} == exact


# ------------------------------------------- Misra-Gries heavy hitters


def test_heavy_hitters_exact_vs_referee(spark):
    from collections import Counter

    from crawler_apple_podcast_spark.operators import sketches as SK

    rows = (
        [("hot",)] * 900
        + [("warm",)] * 300
        + [(f"c{i}",) for i in range(800) for _ in range(1)]
    )
    df = spark.createDataFrame(rows, "host STRING").repartition(8)
    k = 5
    got = {
        r.host: r.n_exact
        for r in SK.heavy_hitters_exact(df, "host", k).collect()
    }
    cnt = Counter(h for h, in rows)
    n = len(rows)
    want = {h: c for h, c in cnt.items() if c * k > n}
    assert got == want
    assert "hot" in got  # 900/2000 > 1/5


def test_heavy_hitter_candidates_superset_guarantee(spark):
    """Every key above the n/k bar appears among the per-partition
    candidates, across several partitionings."""
    from collections import Counter

    from crawler_apple_podcast_spark.operators import sketches as SK

    rows = [(f"k{i % 7}",) for i in range(700)] + [("dom",)] * 200
    cnt = Counter(h for h, in rows)
    n = len(rows)
    for parts in (1, 4, 16):
        df = spark.createDataFrame(rows, "host STRING").repartition(parts)
        cands = {
            r.host for r in SK.heavy_hitter_candidates(df, "host", 8).collect()
        }
        for h, c in cnt.items():
            if c * 8 > n:
                assert h in cands, (parts, h)

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


def _latencies(spark, n=40_000, hosts=7):
    # deterministic skewed integer latencies: host h0 is hot (half the
    # rows) and slow-tailed; value spread is irregular so percentile
    # ranks do not fall on round boundaries
    base = spark.range(n)
    return base.select(
        F.when(F.pmod("id", F.lit(2)) == 0, F.lit("h0"))
        .otherwise(F.concat(F.lit("h"), F.pmod("id", F.lit(hosts)).cast("string")))
        .alias("host"),
        (
            F.pmod(F.xxhash64("id"), F.lit(400))
            + F.when(F.pmod("id", F.lit(97)) == 0, F.lit(5000)).otherwise(F.lit(0))
        ).alias("lat_ms"),
    )


def test_exact_percentiles_vs_numpy_referee(spark):
    """Lower (type-1) discrete quantile: sorted[ceil(p*n/1000)-1]."""
    import math

    df = _latencies(spark)
    rows = df.collect()
    by_host: dict[str, list[int]] = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r.lat_ms)
    got = {r.host: r for r in SK.exact_percentiles(df, "host", "lat_ms").collect()}
    assert set(got) == set(by_host)
    for h, vals in by_host.items():
        vals.sort()
        n = len(vals)
        assert got[h].n == n
        for p in (500, 950, 990):
            want = vals[math.ceil(p * n / 1000) - 1]
            assert got[h][f"p{p}"] == want, (h, p, got[h][f"p{p}"], want)


def test_histogram_merge_is_exact(spark):
    """Per-wave histograms union to EXACTLY the whole-corpus histogram
    (counts add), so rolled-up percentiles equal direct ones — the
    property HLL only honors within a bound."""
    df = _latencies(spark, n=10_000).withColumn(
        "wave", F.pmod(F.xxhash64("lat_ms"), F.lit(3))
    )
    parts = [
        SK.value_histogram(df.where(F.col("wave") == w), "host", "lat_ms")
        for w in (0, 1, 2)
    ]
    merged = SK.merge_histograms(*parts)
    direct = SK.value_histogram(df, "host", "lat_ms")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    p_m = SK.percentiles_from_histogram(merged, "host", "lat_ms").collect()
    p_d = SK.exact_percentiles(df, "host", "lat_ms").collect()
    assert sorted(map(tuple, p_m)) == sorted(map(tuple, p_d))


def test_percentiles_window_and_group_share_one_exchange(spark):
    """The rank pick adds no shuffle beyond the histogram build: the
    cumulative window and the final groupBy both partition on the key,
    so the executed plan has exactly two Exchanges total (raw->hist,
    hist->key) and no sort of raw rows."""
    df = _latencies(spark, n=5_000)
    plan = (
        SK.exact_percentiles(df, "host", "lat_ms")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 2, plan


# ------------------------------------------------- count-min sketch


def test_cm_partial_matrices_are_exactly_additive(spark):
    """cm(A) + cm(B) == cm(A union B) elementwise — the mergeability
    law that lets per-wave sketches roll up under any partitioning."""
    import numpy as np

    df = _latencies(spark, n=6_000)
    a = df.where(F.pmod(F.xxhash64("lat_ms"), F.lit(2)) == 0)
    b = df.where(F.pmod(F.xxhash64("lat_ms"), F.lit(2)) != 0)
    w, d = 1 << 10, 4
    whole = SK.cm_build(df, "host", w, d)
    parts = SK.cm_build(a, "host", w, d) + SK.cm_build(b, "host", w, d)
    assert np.array_equal(whole, parts)
    assert whole.sum() == d * 6_000


def test_cm_estimate_bounds(spark):
    """Hard one-sided bound (never undercounts) for every key, and the
    loose overcount bound holds at d=4."""
    df = _latencies(spark, n=20_000)
    rows = SK.freq_within_bound(df, "host", w=1 << 12, d=4).collect()
    assert rows
    assert all(r.ge_exact for r in rows)
    assert all(r.within_bound for r in rows)


def test_cm_estimate_exact_on_sparse_keys(spark):
    """With w >> distinct keys, collisions are absent and the estimate
    equals the exact count for every key."""
    df = _latencies(spark, n=5_000)
    sk = SK.cm_build(df, "host", w=1 << 14, d=4)
    exact = df.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    got = SK.cm_estimate(exact, sk, "host", w=1 << 14).collect()
    assert all(r.freq_est == r.n for r in got)

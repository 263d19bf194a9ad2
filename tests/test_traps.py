from __future__ import annotations

from pyspark.sql import functions as F

from crawler_apple_podcast_spark.operators.traps import (
    detect_url_traps,
    trap_gate,
    url_template,
)


def test_url_template(spark):
    df = spark.createDataFrame(
        [
            ("https://a.example/cal/2024/03/15",),
            ("https://a.example/item?id=99&page=3",),
            ("https://a.example",),
            ("https://a.example/p/x#frag7",),
        ],
        "u string",
    )
    out = [r[0] for r in df.select(url_template(F.col("u"))).collect()]
    assert out == [
        "/cal/{N}/{N}/{N}",
        "/item?id={N}&page={N}",
        "/",
        "/p/x",
    ]


def _trap_pages(spark):
    rows = [(f"https://t.example/s/{i}", 1) for i in range(30)]  # trap
    rows += [(f"https://t.example/a/{i}", i) for i in range(30)]  # diverse
    rows += [(f"https://t.example/few/{i}", 1) for i in range(5)]  # too few
    return spark.createDataFrame(rows, "url string, fingerprint int")


def test_detect_and_gate(spark):
    traps = detect_url_traps(_trap_pages(spark), min_urls=20, max_diversity_milli=200)
    by_t = {r.template: r for r in traps.collect()}
    assert by_t["/s/{N}"].is_trap and by_t["/s/{N}"].diversity_milli == 33
    assert not by_t["/a/{N}"].is_trap  # diversity 1000
    assert not by_t["/few/{N}"].is_trap  # under min_urls
    frontier = spark.createDataFrame(
        [("https://t.example/s/555",), ("https://t.example/a/555",),
         ("https://other.example/s/555",)],
        "fetch_url string",
    )
    kept = {r.fetch_url for r in trap_gate(frontier, traps).collect()}
    # template match is per-host: other.example's /s/{N} is not trapped
    assert kept == {"https://t.example/a/555", "https://other.example/s/555"}


def test_duplicate_fetches_counted_once(spark):
    rows = [("https://t.example/s/1", 1)] * 5 + [("https://t.example/s/2", 2)]
    df = spark.createDataFrame(rows, "url string, fingerprint int")
    [r] = detect_url_traps(df, min_urls=1, max_diversity_milli=1000).collect()
    assert (r.n_urls, r.n_fps, r.diversity_milli) == (2, 2, 1000)


def _trap_corpus(spark, n_pages=30):
    import json

    from crawler_apple_podcast_spark.datagen.corpus import api_url

    data = [{"id": f"e{i}", "title": f"ep {i}"} for i in range(3)]
    rows = []
    for off in range(10, 10 * (n_pages + 1), 10):
        payload = {
            "next": f"/v1/catalog/us/podcasts/999/episodes?l=en-US&offset={off + 10}",
            "data": data,  # IDENTICAL payload on every page: a trap
        }
        rows.append((api_url("999", off), bytearray(json.dumps(payload).encode())))
    pages = spark.createDataFrame(rows, "url string, html binary")
    seeds = spark.createDataFrame([(0, api_url("999", 10))], "seed_index int, url string")
    return pages, seeds


def test_wave_loop_trap_gate_cuts_infinite_pagination(spark):
    from crawler_apple_podcast_spark.plans.wave_loop import WaveConfig, run_crawl

    pages, seeds = _trap_corpus(spark)
    base = run_crawl(
        spark, pages, seeds, WaveConfig(max_waves=60, use_politeness=False)
    )
    # ungated: walks the whole chain (30 pages + the final dead-cursor miss)
    assert base.fetch_log.count() == 31

    gated = run_crawl(
        spark,
        pages,
        seeds,
        WaveConfig(
            max_waves=60,
            use_politeness=False,
            trap_min_urls=5,
            trap_max_diversity_milli=300,
        ),
    )
    n = gated.fetch_log.count()
    # the gate fires once 5 same-fingerprint URLs accumulate: the chain
    # stops within a wave of that, nowhere near the 30-page chain
    assert 5 <= n <= 7


def test_wave_loop_trap_gate_no_false_positive_on_real_corpus(spark, corpus):
    from crawler_apple_podcast_spark.plans.wave_loop import WaveConfig, run_crawl

    pages, seeds = corpus
    base = run_crawl(spark, pages, seeds, WaveConfig(use_politeness=False))
    gated = run_crawl(
        spark,
        pages,
        seeds,
        WaveConfig(use_politeness=False, trap_min_urls=3),
    )
    key = ["seed_index", "offset", "pos"]
    assert sorted(map(tuple, base.episodes.select(*key).collect())) == sorted(
        map(tuple, gated.episodes.select(*key).collect())
    )
